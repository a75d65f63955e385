"""SQL-text API surface: the same engine driven through ``spark.sql``.

The reference is DataFrame-API only (every site in SURVEY §2 builds
plans with method chains); a Spark-native engine also exposes the full
ANSI-SQL text surface over the same tables. Two proofs:

- ``sql_api_revenue``: a join+agg written as SQL text over
  ``catalog.register_views`` temp views — Catalyst plans it identically
  to the DataFrame build (same broadcast + partial-agg plan).
- ``sql_udf_token_count``: a VECTORIZED (Arrow) pandas UDF registered
  with ``spark.udf.register`` and called from SQL text — the supported
  path for custom scalar logic in the SQL surface; still
  oracle-checked because the UDF's semantics are reproduced in SQL.

Scale posture: identical to the DataFrame twins — SQL text changes
nothing about the physical plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table


def sql_api_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by customer nation, written as SQL text (q5's little
    sibling) — proves view registration + the ANSI SQL surface."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


def sql_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF registered into the SQL function namespace and called
    from SQL text; aggregates its output per source. The UDF is built
    inside the call (pandas_udf type parsing needs a live session)."""

    @pandas_udf("long")
    def ws_token_count(texts: pd.Series) -> pd.Series:
        # Arrow-vectorized: one pandas call per batch, never per row.
        return texts.str.split().str.len().astype("int64")

    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    spark.udf.register("ws_token_count", ws_token_count)
    return spark.sql(
        """
        SELECT source,
               sum(ws_token_count(text)) AS total_tokens,
               count(*) AS n_docs
        FROM documents
        GROUP BY source
        """
    )


QUERIES = {
    "sql_api_revenue": sql_api_revenue,
    "sql_udf_token_count": sql_udf_token_count,
}

ORACLES = {
    "sql_api_revenue": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*)::BIGINT AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "sql_udf_token_count": """
        SELECT source,
               sum(len(regexp_split_to_array(trim(text), '\\s+')))::BIGINT
                   AS total_tokens,
               count(*)::BIGINT AS n_docs
        FROM documents
        GROUP BY source
    """,
}

NO_ORACLE: dict[str, str] = {}
