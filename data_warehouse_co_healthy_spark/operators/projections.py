"""Projection / filter / column operators (SURVEY §2.3, P1-P8).

Reference sites: select (dimension.py:19,34,131,152 + 20 more), drop
(dimension.py:26,56,65), rename (dimension.py:37-38,48-49), lit
(dimension.py:49, service_process.py:130-133), CASE WHEN chains
(retreat_process.py:122-132, service_process.py:75-85), fillna
(payment_process.py:162). Row filter is absent in the reference (P8) but
part of any query surface.

Every query here is declarative DataFrame API → Catalyst prunes columns
and pushes filters into the parquet scan; at 100 TB these run as
scan-only jobs with no shuffle (fillna_left_join shuffles once for its
aggregation, with map-side partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


# P1/P2 — projection.
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select named columns (reference dimension.py:19 et al.)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# P3 — column drop.
def project_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop columns (reference dimension.py:26,56,65)."""
    return load_table(spark, sf_dir, "supplier").drop("s_acctbal")


# P4 — rename.
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withColumnRenamed (reference dimension.py:37-38,48-49)."""
    return (
        load_table(spark, sf_dir, "region")
        .withColumnRenamed("r_regionkey", "region_id")
        .withColumnRenamed("r_name", "region_name")
    )


# P5 — literal/tag columns.
def lit_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """constant columns (reference dimension.py:49 ``activo``,
    service_process.py:130-133 ``tipo_servicio`` tags)."""
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        F.lit(True).alias("activo"),
        F.lit("nation").alias("tipo_registro"),
    )


# P6 — CASE WHEN chain.
def case_when_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise chain (reference retreat_process.py:122-132 accent
    repair; service_process.py:75-85). Buckets customer balances."""
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "deudor")
        .when(F.col("c_acctbal") < 1000, "bajo")
        .when(F.col("c_acctbal") < 5000, "medio")
        .otherwise("alto")
    )
    return (
        c.select("c_mktsegment", bucket.alias("bucket"))
        .groupBy("c_mktsegment", "bucket")
        .agg(F.count("*").alias("n"))
    )


# P7 — null fill after left-join miss (reference payment_process.py:162).
def fillna_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer LEFT JOIN order-aggregates; misses become 0 — mirrors
    ``fillna(0, subset=["empresa_id"])``."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_totalprice").alias("total_spent"),
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select("c_custkey", "c_name", "n_orders", "total_spent")
        .na.fill({"n_orders": 0, "total_spent": 0.0})
    )


# P8 — row filter with pushdown.
def filter_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter pushed to the parquet scan (absent in reference, SURVEY
    §2.3-P8; `.explain` shows PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )


QUERIES = {
    "project_select": project_select,
    "project_drop": project_drop,
    "project_rename": project_rename,
    "lit_tag": lit_tag,
    "case_when_bucket": case_when_bucket,
    "fillna_left_join": fillna_left_join,
    "filter_rows": filter_rows,
}

ORACLES = {
    "project_select": "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "project_drop": "SELECT s_suppkey, s_name, s_nationkey FROM supplier",
    "project_rename": (
        "SELECT r_regionkey AS region_id, r_name AS region_name FROM region"
    ),
    "lit_tag": (
        "SELECT n_nationkey, n_name, TRUE AS activo,"
        " 'nation' AS tipo_registro FROM nation"
    ),
    "case_when_bucket": """
        SELECT c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN 'deudor'
                    WHEN c_acctbal < 1000 THEN 'bajo'
                    WHEN c_acctbal < 5000 THEN 'medio'
                    ELSE 'alto' END AS bucket,
               count(*) AS n
        FROM customer
        GROUP BY 1, 2
    """,
    "fillna_left_join": """
        SELECT c.c_custkey, c.c_name,
               coalesce(o.n_orders, 0) AS n_orders,
               coalesce(o.total_spent, 0.0) AS total_spent
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey, count(*) AS n_orders,
                   sum(o_totalprice) AS total_spent
            FROM orders GROUP BY o_custkey
        ) o ON c.c_custkey = o.o_custkey
    """,
    "filter_rows": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount >= 0.05 AND l_quantity < 24
    """,
}
