"""Unified-services fact pipeline — parity with reference
processing/service_process.py as pure functions.

Reference lifecycle (SURVEY §3 entry point 3): four service scans with
time→string fixups (:19-42), remission enriched via servicios_pos join +
rename/drop alignment (:120-127), per-branch ``tipo_servicio`` tags
(:130-133), POSITIONAL 4-way union (:135 — column order load-bearing,
SURVEY §4), doctor-region derivation (:140-142), then 8 star joins with
the hour/date dims each joined twice under renames (:146-153) and a
left region_aux + inner region join (:152-153).

The union here aligns columns EXPLICITLY to one schema before the
positional union — same result as the reference when its alignment is
right, but immune to its silent column-order footgun.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cleaning import repair_municipio

ALIGNED_COLS = [
    "id_usuario", "id_medico", "fecha_solicitud", "hora_solicitud",
    "fecha_atencion", "hora_atencion", "diagnostico", "tipo_servicio",
]


def align_services(
    citas: DataFrame,
    urgencias: DataFrame,
    hospitalizaciones: DataFrame,
    remisiones: DataFrame,
    servicios_pos: DataFrame,
) -> DataFrame:
    """Schema-align the four service branches and union them
    (reference service_process.py:120-135)."""
    c = citas.drop("codigo_cita").withColumn(
        "tipo_servicio", F.lit("Cita General")
    )
    u = urgencias.drop("codigo_urgencia").withColumn(
        "tipo_servicio", F.lit("Urgencia")
    )
    h = hospitalizaciones.drop(
        "codigo_hospitalizacion", "duracion_hospitalizacion"
    ).withColumn("tipo_servicio", F.lit("Hospitalización"))
    r = (
        remisiones.join(
            servicios_pos,
            remisiones.servicio_pos == servicios_pos.id_servicio_pos,
            "inner",
        )
        .drop(
            "codigo_remision", "id_medico_remite", "servicio_pos",
            "id_servicio_pos", "costo",
        )
        .withColumnRenamed("descripcion", "diagnostico")
        .withColumnRenamed("hora_remision", "hora_solicitud")
        .withColumnRenamed("fecha_remision", "fecha_solicitud")
        .withColumn("tipo_servicio", F.lit("Remision"))
    )
    aligned = [df.select(*ALIGNED_COLS) for df in (c, u, h, r)]
    out = aligned[0]
    for branch in aligned[1:]:
        out = out.union(branch)  # positional, schemas pre-aligned
    return out


def build_fact_servicio(
    services: DataFrame,
    medico: DataFrame,
    ips: DataFrame,
    dim_usuario: DataFrame,
    dim_medico: DataFrame,
    dim_hora: DataFrame,
    dim_fecha: DataFrame,
    dim_region: DataFrame,
) -> DataFrame:
    """Reference service_process.py:140-158 as one lazy plan, with the
    role-playing hour/date dims joined twice under role-specific
    aliases."""
    region_aux = medico.join(
        ips.select(
            "id_ips", repair_municipio(F.col("municipio")).alias("municipio")
        ),
        on="id_ips",
        how="inner",
    ).select("cedula", "municipio")

    hora_sol = dim_hora.select(
        F.col("hora_id").alias("hora_solicitud_id"),
        F.col("hora_label").alias("hora_solicitud"),
    )
    hora_ate = dim_hora.select(
        F.col("hora_id").alias("hora_atencion_id"),
        F.col("hora_label").alias("hora_atencion"),
    )
    fecha_sol = dim_fecha.select(
        F.col("fecha_id").alias("fecha_solicitud_id"),
        F.col("fecha").alias("fecha_solicitud_str"),
    )
    fecha_ate = dim_fecha.select(
        F.col("fecha_id").alias("fecha_atencion_id"),
        F.col("fecha").alias("fecha_atencion_str"),
    )

    s = services.withColumn(
        "fecha_solicitud_str", F.date_format("fecha_solicitud", "yyyy-MM-dd")
    ).withColumn(
        "fecha_atencion_str", F.date_format("fecha_atencion", "yyyy-MM-dd")
    )

    merged = (
        s.join(
            F.broadcast(dim_usuario.select("usuario_id", "identificacion")),
            s.id_usuario == F.col("identificacion"),
            "inner",
        )
        .join(
            F.broadcast(dim_medico.select("medico_id", "cedula")),
            F.col("id_medico") == F.col("cedula"),
            "inner",
        )
        .drop("cedula")
        .join(F.broadcast(hora_sol), on="hora_solicitud", how="inner")
        .join(F.broadcast(hora_ate), on="hora_atencion", how="inner")
        .join(F.broadcast(fecha_sol), on="fecha_solicitud_str", how="inner")
        .join(F.broadcast(fecha_ate), on="fecha_atencion_str", how="inner")
        .join(
            F.broadcast(region_aux),
            F.col("id_medico") == region_aux.cedula,
            "left",
        )
        .join(F.broadcast(dim_region), on="municipio", how="inner")
    )
    return merged.select(
        "fecha_solicitud_id", "hora_solicitud_id", "fecha_atencion_id",
        "hora_atencion_id", "usuario_id", "medico_id", "region_id",
        "tipo_servicio", "diagnostico",
    )
