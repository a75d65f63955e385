"""Pipeline runner — O1 parity (reference process.py:1-11 imports and
runs the 4 pipelines sequentially, each rebuilding its own dims).

Here the runner builds every dimension ONCE and caches it (the
reference re-scans Postgres per Dimension method call — SURVEY §4
"double-execution avoidance"), then derives all four facts from the
shared dims. Pure function: sources in, {dims + facts} out; callers
choose sinks (sources/writers.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import dimensions as dims
from . import medical_formula, payment, retreat, service


def run_all(
    spark: SparkSession, src: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """Build the full warehouse: 11 dimensions + 4 facts."""
    d = {
        "dim_usuario": dims.dim_usuario(
            src["beneficiario"], src["cotizante"]
        ),
        "dim_cotizante": dims.dim_cotizante(src["cotizante"]),
        "dim_medico": dims.dim_medico(src["medico"]),
        "dim_medicamento": dims.dim_medicamento(src["medicamentos"]),
        "dim_centro_medico": dims.dim_centro_medico(src["ips"]),
        "dim_fecha": dims.dim_fecha(spark),
        "dim_hora": dims.dim_hora(spark),
        "dim_region": dims.dim_region(src["regiones_co"]),
        "dim_enfermedad": dims.dim_enfermedad(src["preexistencias"]),
        "dim_empresa": dims.dim_empresa(src["empresa"]),
        "dim_demografica": dims.dim_demografica(src["cotizante"]),
    }
    # shared dims feed every fact: cache so the 4 fact plans don't
    # rebuild them (the reference re-extracts per pipeline)
    for v in d.values():
        v.cache()
    services = service.align_services(
        src["citas_generales"],
        src["urgencias"],
        src["hospitalizaciones"],
        src["remisiones"],
        src["servicios_pos"],
    )
    facts = {
        "fact_medical_formula": medical_formula.build_fact_medical_formula(
            src["formulas_medicas"],
            d["dim_usuario"],
            d["dim_medico"],
            d["dim_medicamento"],
            d["dim_fecha"],
        ),
        "fact_facturacion": payment.build_fact_facturacion(
            src["pagos"],
            src["cotizante"],
            src["empresa_cotizante"],
            src["preexistencias"],
            d["dim_cotizante"],
            d["dim_centro_medico"],
            d["dim_empresa"],
            d["dim_enfermedad"],
            d["dim_fecha"],
        ),
        "fact_retiro": retreat.build_fact_retiro(
            src["retiros"],
            src["cotizante"],
            d["dim_centro_medico"],
            d["dim_region"],
            d["dim_cotizante"],
            d["dim_fecha"],
        ),
        "fact_servicio": service.build_fact_servicio(
            services,
            src["medico"],
            src["ips"],
            d["dim_usuario"],
            d["dim_medico"],
            d["dim_hora"],
            d["dim_fecha"],
            d["dim_region"],
        ),
    }
    return {**d, **facts}
