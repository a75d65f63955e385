"""Medical-formula fact pipeline — parity with reference
processing/medical_formula_process.py, as one pure function.

Reference lifecycle (SURVEY §3 entry point 1): scan → split/explode the
semicolon medicine list (:26-28) → push dims + JDBC read-back for ids →
4 chained inner star joins (:116-119) → fact select (:121) → CSV + REST
sinks, executing the plan twice. Here: one lazy plan, in-engine keys,
single action per sink; the inner date join still drops facts outside
the dim_fecha window — preserved reference semantics (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_medicines(formulas: DataFrame) -> DataFrame:
    """1NF-normalize the formula grain: one row per prescribed medicine
    (reference medical_formula_process.py:26-28)."""
    return (
        formulas.withColumn(
            "medicamentos_recetados", F.split("medicamentos_recetados", ";")
        )
        .withColumn("medicamento_idx", F.explode("medicamentos_recetados"))
    )


def build_fact_medical_formula(
    formulas: DataFrame,
    dim_usuario: DataFrame,
    dim_medico: DataFrame,
    dim_medicamento: DataFrame,
    dim_fecha: DataFrame,
) -> DataFrame:
    """4-way star join at medicine grain (reference
    medical_formula_process.py:116-121). All dims broadcast."""
    f = explode_medicines(formulas).withColumn(
        "fecha", F.date_format("fecha", "yyyy-MM-dd")
    )
    merged = (
        f.join(
            F.broadcast(dim_usuario.select("usuario_id", "identificacion")),
            f.id_usuario == F.col("identificacion"),
            "inner",
        )
        .join(
            F.broadcast(dim_medico.select("medico_id", "cedula")),
            F.col("id_medico") == F.col("cedula"),
            "inner",
        )
        .join(
            F.broadcast(dim_medicamento.select("medicamento_id", "codigo")),
            F.col("medicamento_idx") == F.col("codigo"),
            "inner",
        )
        .join(
            F.broadcast(dim_fecha.select("fecha_id", "fecha")),
            on="fecha",
            how="inner",
        )
    )
    return merged.select(
        "fecha_id", "usuario_id", "medico_id", "medicamento_id",
        "Codigo_Formula",
    )
