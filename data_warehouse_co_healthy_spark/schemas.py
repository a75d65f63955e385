"""Explicit StructType schemas.

The reference infers every schema by sampling Python rows
(18 ``createDataFrame(result, column_names)`` sites, e.g. reference
dimension.py:18, processing/medical_formula_process.py:24 — SURVEY §1.3),
which is its main fragility (manual ``astype(str)`` patches at
service_process.py:24-39). Here every table the engine touches has a
declared schema; inference is never relied on.

Two families:
  TESTDATA — the driver's TPC-H-ish fixture tables (FIXTURES.md §B).
  REFERENCE — the CO_healthy operational tables the parity pipelines
  consume (FIXTURES.md §A, reconstructed from the columns the reference
  code touches).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: tuple) -> T.StructType:
    return T.StructType(
        [T.StructField(name, dtype, True) for name, dtype in fields]
    )


STR = T.StringType()
I32 = T.IntegerType()
I64 = T.LongType()
DBL = T.DoubleType()
TS = T.TimestampType()
DATE = T.DateType()
BOOL = T.BooleanType()

# --------------------------------------------------------------------------
# Driver fixture tables (/root/testdata/sf*/ — FIXTURES.md §B)
# --------------------------------------------------------------------------

TESTDATA: dict[str, T.StructType] = {
    "region": _s(("r_regionkey", I32), ("r_name", STR)),
    "nation": _s(("n_nationkey", I32), ("n_name", STR), ("n_regionkey", I32)),
    "customer": _s(
        ("c_custkey", I64), ("c_name", STR), ("c_nationkey", I32),
        ("c_acctbal", DBL), ("c_mktsegment", STR),
    ),
    "supplier": _s(
        ("s_suppkey", I64), ("s_name", STR), ("s_nationkey", I32),
        ("s_acctbal", DBL),
    ),
    "part": _s(
        ("p_partkey", I64), ("p_name", STR), ("p_brand", STR),
        ("p_type", STR), ("p_size", I32), ("p_retailprice", DBL),
    ),
    "orders": _s(
        ("o_orderkey", I64), ("o_custkey", I64), ("o_orderstatus", STR),
        ("o_totalprice", DBL), ("o_orderdate", TS), ("o_orderpriority", STR),
    ),
    "lineitem": _s(
        ("l_orderkey", I64), ("l_partkey", I64), ("l_suppkey", I64),
        ("l_linenumber", I32), ("l_quantity", DBL), ("l_extendedprice", DBL),
        ("l_discount", DBL), ("l_tax", DBL), ("l_returnflag", STR),
        ("l_linestatus", STR), ("l_shipdate", TS),
    ),
    "events": _s(
        ("event_id", I64), ("ts", TS), ("user_id", I64),
        ("event_type", STR), ("value", DBL), ("props", STR),
    ),
    "documents": _s(
        ("doc_id", I64), ("text", STR), ("lang", STR), ("source", STR),
        ("n_chars", I64),
    ),
    "embeddings": _s(
        ("vec_id", I64), ("embedding", T.ArrayType(T.FloatType())),
        ("label", I32),
    ),
}

TESTDATA_TABLES = tuple(TESTDATA)

# --------------------------------------------------------------------------
# CO_healthy operational source tables (FIXTURES.md §A; columns cited from
# /root/reference — e.g. cotizante drop-list at dimension.py:26 plus selects
# at payment_process.py:137-138,151 and retreat_process.py:149-153)
# --------------------------------------------------------------------------

REFERENCE: dict[str, T.StructType] = {
    # dimension.py:17-19
    "beneficiario": _s(
        ("id_beneficiario", STR), ("nombre", STR),
        ("fecha_nacimiento", DATE), ("sexo", STR),
    ),
    "cotizante": _s(
        ("cedula", STR), ("nombre", STR), ("fecha_nacimiento", DATE),
        ("sexo", STR), ("tipo_cotizante", STR), ("nivel_escolaridad", STR),
        ("fecha_afiliacion", DATE), ("proviene_otra_eps", I32),
        ("id_ips", STR), ("direccion", STR), ("estado_civil", STR),
        ("estracto", I32), ("tipo_discapacidad", STR), ("salario_base", DBL),
    ),
    # dimension.py:46-49, service_process.py:72-85
    "ips": _s(
        ("id_ips", STR), ("nombre", STR), ("direccion", STR),
        ("tipo_ips", STR), ("municipio", STR),
    ),
    # dimension.py:55-56
    "medico": _s(
        ("cedula", STR), ("nombre", STR), ("especialidad", STR),
        ("subespecialidad", STR), ("id_ips", STR),
        ("Direccion_Consultorio", STR),
    ),
    # dimension.py:138-139, payment_process.py:145-150
    "preexistencias": _s(("id_usuario", STR), ("enfermedad", STR)),
    # dimension.py:144-146
    "empresa": _s(("nit", STR), ("nombre", STR)),
    # payment_process.py:142-149
    "empresa_cotizante": _s(("cotizante", STR), ("empresa", STR)),
    # medical_formula_process.py:23-28
    "formulas_medicas": _s(
        ("Codigo_Formula", STR), ("id_usuario", STR), ("id_medico", STR),
        ("fecha", DATE), ("medicamentos_recetados", STR),
    ),
    # payment_process.py:124
    "pagos": _s(
        ("id_usuario", STR), ("fecha_pago", DATE), ("valor_pagado", DBL),
    ),
    # retreat_process.py:24
    "retiros": _s(
        ("id_usuario", STR), ("fecha_retiro", DATE), ("cambio_a_eps", STR),
    ),
    # service_process.py:22-40 (times arrive as HH:mm:ss strings, §1.2)
    "citas_generales": _s(
        ("codigo_cita", STR), ("id_usuario", STR), ("id_medico", STR),
        ("fecha_solicitud", DATE), ("hora_solicitud", STR),
        ("fecha_atencion", DATE), ("hora_atencion", STR),
        ("diagnostico", STR),
    ),
    "urgencias": _s(
        ("codigo_urgencia", STR), ("id_usuario", STR), ("id_medico", STR),
        ("fecha_solicitud", DATE), ("hora_solicitud", STR),
        ("fecha_atencion", DATE), ("hora_atencion", STR),
        ("diagnostico", STR),
    ),
    "hospitalizaciones": _s(
        ("codigo_hospitalizacion", STR), ("duracion_hospitalizacion", I32),
        ("id_usuario", STR), ("id_medico", STR),
        ("fecha_solicitud", DATE), ("hora_solicitud", STR),
        ("fecha_atencion", DATE), ("hora_atencion", STR),
        ("diagnostico", STR),
    ),
    # service_process.py:117-127
    "remisiones": _s(
        ("codigo_remision", STR), ("id_usuario", STR), ("id_medico", STR),
        ("id_medico_remite", STR), ("servicio_pos", STR),
        ("fecha_remision", DATE), ("hora_remision", STR),
        ("fecha_atencion", DATE), ("hora_atencion", STR),
    ),
    "servicios_pos": _s(
        ("id_servicio_pos", STR), ("descripcion", STR), ("costo", DBL),
    ),
    # dimension.py:62-71 (medicamentos.xls headers)
    "medicamentos": _s(
        ("Código", STR), ("Nombre Genérico", STR),
        ("Forma Farmacéutica", STR), ("Presentación", STR),
        ("Laboratorio y Registro", STR), ("Precio", DBL),
        ("Tipo Medicamento", STR),
    ),
    # dimension.py:123-131 (Socrata xdk5-pm3f stand-in)
    "regiones_co": _s(
        ("municipio", STR), ("departamento", STR), ("region", STR),
    ),
}
