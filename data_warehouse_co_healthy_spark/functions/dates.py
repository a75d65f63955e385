"""Date functions & the generated date dimension (SURVEY §2.8 F4-F7).

The reference builds dim_fecha with pandas ``pd.date_range`` + dict
lookups for Spanish month/day names (reference dimension.py:76-118):
months lowercase (dimension.py:91-104), weekdays capitalized
(dimension.py:80-88), weekend = Sat/Sun via pandas ``weekday.isin([5,6])``
(Monday=0). Here it is pure Spark: ``sequence(to_date(s), to_date(e))``
+ explode, names via an explicit CASE map (NOT the JVM locale — SURVEY
§7 hard-part (c)), weekend via ``dayofweek isin (1,7)`` (Spark
Sunday=1 — the pandas↔Spark numbering mismatch is hard-part (d)).

Date keys are exposed as ``yyyy-MM-dd`` STRINGS at the edges because the
reference equi-joins facts to dim_fecha on a string key (SURVEY §1.2,
medical_formula_process.py:119 et al.) — the engine reproduces that
contract exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# Spanish names, explicit mapping (reference dimension.py:80-104).
SPANISH_MONTHS = {
    1: "enero", 2: "febrero", 3: "marzo", 4: "abril", 5: "mayo",
    6: "junio", 7: "julio", 8: "agosto", 9: "septiembre", 10: "octubre",
    11: "noviembre", 12: "diciembre",
}
# Keyed by Spark dayofweek (Sunday=1 .. Saturday=7).
SPANISH_DAYS = {
    1: "Domingo", 2: "Lunes", 3: "Martes", 4: "Miércoles", 5: "Jueves",
    6: "Viernes", 7: "Sábado",
}


def _case_map(col: Column, mapping: dict[int, str]) -> Column:
    expr = F.lit(None).cast("string")
    for k, v in mapping.items():
        expr = F.when(col == k, v).otherwise(expr)
    return expr


def spanish_month(month_num: Column) -> Column:
    return _case_map(month_num, SPANISH_MONTHS)


def spanish_day(spark_dayofweek: Column) -> Column:
    return _case_map(spark_dayofweek, SPANISH_DAYS)


def _sql_case(col_sql: str, mapping: dict[int, str]) -> str:
    branches = " ".join(
        f"WHEN {col_sql} = {k} THEN '{v}'" for k, v in mapping.items()
    )
    return f"CASE {branches} END"


def date_dim(
    spark: SparkSession,
    start: str = "2006-01-01",
    end: str = "2010-12-31",
) -> DataFrame:
    """dim_fecha, generated in-plan (replaces reference dimension.py:76-118).

    Columns match FIXTURES.md golden content: fecha (yyyy-MM-dd string
    key), anio, mes_numero, mes (Spanish lowercase), dia_numero,
    dia_semana (Spanish capitalized), es_fin_de_semana. 1826 rows for the
    reference's 2006-2010 range.
    """
    d = spark.sql(
        f"SELECT explode(sequence(to_date('{start}'), to_date('{end}'))) AS d"
    )
    dow = F.dayofweek("d")
    return d.select(
        F.date_format("d", "yyyy-MM-dd").alias("fecha"),
        F.year("d").cast("long").alias("anio"),
        F.month("d").cast("long").alias("mes_numero"),
        spanish_month(F.month("d")).alias("mes"),
        F.dayofmonth("d").cast("long").alias("dia_numero"),
        spanish_day(dow).alias("dia_semana"),
        dow.isin(1, 7).alias("es_fin_de_semana"),
    )


def hour_dim(spark: SparkSession) -> DataFrame:
    """dim_hora, generated in-engine (the reference only READS an
    externally-provided one, service_process.py:104,148-149 — SURVEY §1.1).
    24×60 minute labels HH:mm:ss matching the stringified service times."""
    return spark.sql(
        """
        SELECT
            CAST(id AS BIGINT) + 1 AS hora_id,
            CAST(id DIV 60 AS INT) AS hora,
            CAST(id % 60 AS INT) AS minuto,
            lpad(CAST(id DIV 60 AS STRING), 2, '0') || ':' ||
            lpad(CAST(id % 60 AS STRING), 2, '0') || ':00' AS hora_label
        FROM range(1440)
        """
    )


# ---------------------------------------------------------------------------
# Declared queries (t2 gate)
# ---------------------------------------------------------------------------


def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: date_format + year/month/day/dayofweek extraction over the
    orders dates (reference formats at dimension.py:115 etc.)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("fecha"),
        F.year("o_orderdate").cast("long").alias("anio"),
        F.month("o_orderdate").cast("long").alias("mes_numero"),
        F.dayofmonth("o_orderdate").cast("long").alias("dia_numero"),
        F.dayofweek("o_orderdate").cast("long").alias("dia_semana_num"),
    )


def month_name_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: number→Spanish-name mapping applied to real data (reference
    dict lookup dimension.py:108-112), orders per Spanish month name."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(spanish_month(F.month("o_orderdate")).alias("mes"))
        .groupBy("mes")
        .agg(F.count("*").alias("n_orders"))
    )


def date_dim_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: the generated dim_fecha itself (sf-independent, golden
    1826-row content for the reference's 2006-2010 window)."""
    return date_dim(spark)


def hour_dim_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_hora generated in-engine (1440 minute labels)."""
    return hour_dim(spark)


def cast_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: int→boolean via when(c==1) (reference retreat_process.py:153
    proviene_otra_eps)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 2 == 1, True)
        .otherwise(False)
        .alias("es_impar"),
    )


def time_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: time-of-day → HH:mm:ss string label (reference
    service_process.py:24-39 astype(str)), joined against the generated
    dim_hora exactly as service_process.py:148-149 joins hora_label."""
    e = load_table(spark, sf_dir, "events")
    h = hour_dim(spark)
    lbl = e.select(
        "event_id",
        F.concat(
            F.date_format("ts", "HH:mm"), F.lit(":00")
        ).alias("hora_label"),
    )
    return lbl.join(F.broadcast(h), on="hora_label", how="inner").select(
        "event_id", "hora_label", "hora_id"
    )


_MES_SQL = _sql_case("mes_numero", SPANISH_MONTHS)
# DuckDB dayofweek: Sunday=0..Saturday=6 → +1 aligns with Spark.
_DIA_SQL = _sql_case("dow_spark", SPANISH_DAYS)

QUERIES = {
    "date_parts": date_parts,
    "month_name_mapping": month_name_mapping,
    "date_dim_generate": date_dim_generate,
    "hour_dim_generate": hour_dim_generate,
    "cast_bool": cast_bool,
    "time_label": time_label,
}

ORACLES = {
    "date_parts": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS fecha,
               year(o_orderdate) AS anio,
               month(o_orderdate) AS mes_numero,
               day(o_orderdate) AS dia_numero,
               dayofweek(o_orderdate) + 1 AS dia_semana_num
        FROM orders
    """,
    "month_name_mapping": f"""
        SELECT {_sql_case('month(o_orderdate)', SPANISH_MONTHS)} AS mes,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "date_dim_generate": f"""
        WITH days AS (
            SELECT unnest(generate_series(DATE '2006-01-01',
                                          DATE '2010-12-31',
                                          INTERVAL 1 DAY))::DATE AS d
        ), parts AS (
            SELECT strftime(d, '%Y-%m-%d') AS fecha,
                   year(d) AS anio,
                   month(d) AS mes_numero,
                   day(d) AS dia_numero,
                   dayofweek(d) + 1 AS dow_spark
            FROM days
        )
        SELECT fecha, anio, mes_numero, {_MES_SQL} AS mes,
               dia_numero, {_DIA_SQL} AS dia_semana,
               dow_spark IN (1, 7) AS es_fin_de_semana
        FROM parts
    """,
    "hour_dim_generate": """
        SELECT i + 1 AS hora_id,
               (i // 60)::INT AS hora,
               (i % 60)::INT AS minuto,
               lpad((i // 60)::VARCHAR, 2, '0') || ':' ||
               lpad((i % 60)::VARCHAR, 2, '0') || ':00' AS hora_label
        FROM (SELECT unnest(generate_series(0, 1439)) AS i)
    """,
    "cast_bool": """
        SELECT n_nationkey,
               CASE WHEN n_nationkey % 2 = 1 THEN TRUE ELSE FALSE END
                   AS es_impar
        FROM nation
    """,
    "time_label": """
        WITH h AS (
            SELECT i + 1 AS hora_id,
                   lpad((i // 60)::VARCHAR, 2, '0') || ':' ||
                   lpad((i % 60)::VARCHAR, 2, '0') || ':00' AS hora_label
            FROM (SELECT unnest(generate_series(0, 1439)) AS i)
        )
        SELECT event_id, strftime(ts, '%H:%M') || ':00' AS hora_label,
               h.hora_id
        FROM events
        JOIN h ON strftime(ts, '%H:%M') || ':00' = h.hora_label
    """,
}
