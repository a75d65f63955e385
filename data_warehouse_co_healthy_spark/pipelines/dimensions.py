"""Dimension builders — parity with the reference ``Dimension`` class
(reference dimension.py:10-154), re-expressed as pure DataFrame→DataFrame
functions with IN-ENGINE surrogate keys.

The reference gets surrogate keys from warehouse serial columns via a
write-then-JDBC-read-back round-trip (SURVEY §1.1); here every dim gets a
deterministic ``row_number`` over its natural key (SURVEY §7 hard-part
(a)) — reproducible, no I/O, and the key column names match what the
fact pipelines join on (usuario_id, cotizante_id, medico_id, …).

Scale posture: dims are small by construction (dedup of bounded
attribute domains); a global row_number window on a dim is a single
small partition by design, and every fact join against them broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.dates import date_dim, hour_dim

__all__ = [
    "with_surrogate_key",
    "dim_usuario",
    "dim_cotizante",
    "dim_medico",
    "dim_medicamento",
    "dim_centro_medico",
    "dim_fecha",
    "dim_hora",
    "dim_region",
    "dim_enfermedad",
    "dim_empresa",
    "dim_demografica",
]


def with_surrogate_key(df: DataFrame, key_name: str, *order_cols: str) -> DataFrame:
    """Deterministic surrogate key: row_number over the natural-key
    ordering (replaces the reference's DB-serial read-back).

    The unpartitioned window funnels the frame through ONE partition —
    acceptable for DIMENSIONS (all ≤ ~100k rows; determinism is worth
    one small shuffle), and exactly why fact tables here carry their
    natural/composite keys instead: for billions of rows use
    zipWithIndex or monotonically_increasing_id + a dense-rank fixup,
    trading contiguity for parallelism."""
    w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in order_cols])
    return df.withColumn(key_name, F.row_number().over(w).cast("long"))


def dim_usuario(beneficiario: DataFrame, cotizante: DataFrame) -> DataFrame:
    """Users = contributors ∪ beneficiaries, by-name union after both id
    columns are renamed to ``identificacion`` (reference dimension.py:31-41)."""
    contrib = (
        cotizante.select("cedula", "nombre", "fecha_nacimiento", "sexo")
        .withColumnRenamed("cedula", "identificacion")
    )
    benef = (
        beneficiario.select(
            "id_beneficiario", "nombre", "fecha_nacimiento", "sexo"
        ).withColumnRenamed("id_beneficiario", "identificacion")
    )
    merged = contrib.unionByName(benef).dropDuplicates()
    return with_surrogate_key(merged, "usuario_id", "identificacion")


def dim_cotizante(cotizante: DataFrame) -> DataFrame:
    """Contributor dim: demographic attrs split out (reference
    dimension.py:23-28 drop list); enriched with demografica_id by the
    payment/retreat pipelines."""
    d = cotizante.drop(
        "id_ips", "direccion", "estado_civil", "estracto",
        "tipo_discapacidad", "salario_base",
    ).dropDuplicates()
    return with_surrogate_key(d, "cotizante_id", "cedula")


def dim_medico(medico: DataFrame) -> DataFrame:
    """Doctor dim (reference dimension.py:53-58)."""
    d = medico.drop(
        "subespecialidad", "id_ips", "Direccion_Consultorio"
    ).dropDuplicates()
    return with_surrogate_key(d, "medico_id", "cedula")


def dim_medicamento(medicamentos: DataFrame) -> DataFrame:
    """Medicine dim from the drug catalog (reference dimension.py:61-73):
    drop pharmaceutical form, rename the Spanish headers."""
    renames = [
        ("Código", "codigo"),
        ("Nombre Genérico", "nombre"),
        ("Presentación", "presentacion"),
        ("Laboratorio y Registro", "laboratorio_registro"),
        ("Precio", "precio"),
        ("Tipo Medicamento", "tipo_medicamento"),
    ]
    d = medicamentos.drop("Forma Farmacéutica")
    for old, new in renames:
        d = d.withColumnRenamed(old, new)
    return with_surrogate_key(d.dropDuplicates(), "medicamento_id", "codigo")


def dim_centro_medico(ips: DataFrame) -> DataFrame:
    """Medical-center dim (reference dimension.py:44-50): rename
    tipo_ips, constant ``activo`` flag."""
    d = (
        ips.select("id_ips", "nombre", "direccion", "tipo_ips", "municipio")
        .withColumnRenamed("tipo_ips", "tipo_centro_medico")
        .withColumn("activo", F.lit(True))
        .dropDuplicates()
    )
    return with_surrogate_key(d, "centro_medico_id", "id_ips")


def dim_fecha(
    spark: SparkSession,
    start: str = "2006-01-01",
    end: str = "2010-12-31",
) -> DataFrame:
    """Generated date dim (reference dimension.py:76-118 via pandas;
    here in-plan — see functions/dates.py). fecha_id = days since start
    + 1, which is also deterministic and order-free."""
    d = date_dim(spark, start, end)
    return d.withColumn(
        "fecha_id",
        (F.datediff(F.to_date("fecha"), F.to_date(F.lit(start))) + 1).cast(
            "long"
        ),
    )


def dim_hora(spark: SparkSession) -> DataFrame:
    """Hour dim — generated in-engine; the reference only reads an
    externally-provided one (service_process.py:104)."""
    return hour_dim(spark)


def dim_region(regiones: DataFrame) -> DataFrame:
    """Region dim from the open-data fixture (reference dimension.py:
    121-133, Socrata xdk5-pm3f stand-in)."""
    d = regiones.select("municipio", "departamento", "region").dropDuplicates()
    return with_surrogate_key(d, "region_id", "municipio", "departamento")


def dim_enfermedad(preexistencias: DataFrame) -> DataFrame:
    """Disease dim (reference dimension.py:136-140 — its redundant
    distinct().dropDuplicates() collapses to one distinct here).
    Column is exposed as ``nombre`` (renamed at payment_process.py:63)."""
    d = (
        preexistencias.select("enfermedad")
        .distinct()
        .withColumnRenamed("enfermedad", "nombre")
    )
    return with_surrogate_key(d, "enfermedad_id", "nombre")


def dim_empresa(empresa: DataFrame) -> DataFrame:
    """Company dim (reference dimension.py:143-146)."""
    return with_surrogate_key(empresa.dropDuplicates(), "empresa_id", "nit")


def dim_demografica(cotizante: DataFrame) -> DataFrame:
    """Demographic attribute dim split out of contributor (reference
    dimension.py:149-154); recovered by 5-column attribute join
    (payment_process.py:136)."""
    d = cotizante.select(
        "direccion", "estado_civil", "estracto", "tipo_discapacidad",
        "salario_base",
    ).dropDuplicates()
    return with_surrogate_key(
        d, "demografica_id",
        "direccion", "estado_civil", "estracto", "tipo_discapacidad",
        "salario_base",
    )
