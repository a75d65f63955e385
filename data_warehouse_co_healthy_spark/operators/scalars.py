"""Scalar / generator functions: split, explode, JSON, time buckets
(SURVEY §2.8 F1-F3 + engine-added JSON/window-bucket surface).

Reference sites: ``split(col, ";")`` + ``explode`` 1NF-normalize the
prescribed-medicines list (medical_formula_process.py:26-27) — the only
array usage in the reference, transient between split and explode
(SURVEY §1.2).

Scale posture: split/explode run inside whole-stage codegen (Generate
node) — no shuffle; the downstream aggregate partial-aggregates
map-side. get_json_object is JVM-side JSON path evaluation (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2: split a delimited string column into an array and explode to
    one row per element — the medical-formula grain change
    (medical_formula_process.py:26-28) applied to document tokens.
    Token frequencies across the corpus."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )


def explode_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 grain invariant surfaced as data: per-doc exploded row count ==
    array size (SURVEY §5.4 property |explode| = Σ sizes)."""
    d = load_table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    return ex.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events props column (engine-added;
    the reference ingests Socrata JSON driver-side, dimension.py:123-130
    — here it stays JVM-side and distributed)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def json_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract-then-aggregate over JSON payloads."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("n"),
        )
    )


def time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window aggregation over events — the BATCH analog of
    the Structured Streaming demo (same window semantics,
    streaming/events.py); hourly event counts and value sums."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").getField("start").alias("bucket"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


def try_cast_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant casts: try_cast turns unparseable values into NULL
    instead of failing the job (critical under ANSI mode, where a single
    bad record in 100 TB would otherwise kill the query); try_divide
    guards div-by-zero the same way. Counts numeric tokens per doc."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    return (
        tok.select(
            "doc_id", F.expr("try_cast(t AS bigint)").alias("num")
        )
        .groupBy("doc_id")
        .agg(
            F.count("num").alias("n_numeric"),
            F.count("*").alias("n_tokens"),
            F.round(
                F.expr("try_divide(count(num), count(num) - count(num))"),
                4,
            ).alias("div_zero_is_null"),
        )
    )


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function gallery (the cleaning surface behind SURVEY
    §2.3-P6): translate for character-class repair (the scalable form
    of the reference's 9-branch accent CASE WHEN,
    retreat_process.py:122-132), zero-padded key formatting, edit
    distance, reversal — all JVM built-ins, codegen'd."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.translate("c_name", "#", "-").alias("cleaned"),
        F.levenshtein(F.lower("c_name"), F.lit("customer")).cast("long").alias(
            "lev_dist"
        ),
        F.reverse("c_name").alias("reversed"),
        F.instr("c_name", "0").cast("long").alias("first_zero_pos"),
    )


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function gallery over the embeddings array<float> column
    (SURVEY §1.2 array surface): size, element access, min/max,
    slice-sum — scalar outputs so the oracle hash is exact."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias(
            "first_val"
        ),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.round(
            F.expr(
                "aggregate(transform(slice(embedding, 1, 8), "
                "x -> cast(x AS double)), 0.0D, (a, x) -> a + x)"
            ),
            6,
        ).alias("head8_sum"),
    )


def explode_outer_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode: docs are flattened to their long (>12
    char) tokens, and docs with NONE survive as a NULL row —
    ``explode`` would silently drop them (the classic lost-parent-rows
    bug when flattening optional nested data)."""
    d = load_table(spark, sf_dir, "documents")
    longs = F.expr(
        "filter(split(lower(text), ' '), w -> length(w) > 12)"
    )
    return d.select(
        "doc_id", F.explode_outer(longs).alias("long_token")
    )


def rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup (hypertable continuous-aggregate
    pattern): daily stats are RE-AGGREGATED from the hourly rollup, not
    from raw events — sums of counts and sums compose losslessly across
    grains. At 100 TB this is how dashboards stay cheap: the raw fact
    is touched once per grain-1 window; every coarser grain reads the
    previous rollup (1000× smaller)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.window("ts", "1 hour").getField("start").alias("h"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            # exact-decimal re-aggregable partial: the day rollup
            # re-sums hourly sums, so order-independence matters twice
            # (functions/numeric.py posture)
            F.sum(F.col("value").cast("decimal(18,6)")).alias("tv"),
        )
    )
    return (
        hourly.groupBy(
            F.date_trunc("DAY", "h").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("tv"), 2).cast("double").alias("total_value"),
            F.count("*").alias("n_hours"),
        )
    )


def ingest_watermarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-load bookkeeping: per event_type high-watermark
    (max ts), max id, and row count — the state an incremental ingest
    job persists after each run so the next run reads only
    ``ts > high_watermark``. Pairs with ``cross_snapshot_dedup`` (the
    content-level incremental gate). One partial-agg'd scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max("ts").alias("high_watermark"),
        F.max("event_id").alias("max_event_id"),
        F.count("*").alias("n_rows"),
    )


QUERIES = {
    "split_explode": split_explode,
    "rollup_multires": rollup_multires,
    "try_cast_tokens": try_cast_tokens,
    "string_functions": string_functions,
    "array_functions": array_functions,
    "explode_outer_rare_tokens": explode_outer_rare_tokens,
    "explode_grain": explode_grain,
    "json_extract": json_extract,
    "json_group_stats": json_group_stats,
    "time_bucket_agg": time_bucket_agg,
    "ingest_watermarks": ingest_watermarks,
}

ORACLES = {
    "rollup_multires": """
        WITH hourly AS (
            SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, event_type,
                   count(*) AS n,
                   sum(CAST(value AS DECIMAL(18,6))) AS tv
            FROM events GROUP BY 1, 2
        )
        SELECT date_trunc('day', h) AS day, event_type,
               sum(n)::BIGINT AS n_events,
               CAST(round(sum(tv), 2) AS DOUBLE) AS total_value,
               count(*)::BIGINT AS n_hours
        FROM hourly GROUP BY 1, 2
    """,
    "explode_outer_rare_tokens": """
        SELECT doc_id, t.tok AS long_token
        FROM documents
        LEFT JOIN LATERAL (
            SELECT unnest(list_filter(string_split(lower(text), ' '),
                                      w -> length(w) > 12)) AS tok
        ) t ON true
    """,
    "array_functions": """
        SELECT vec_id,
               len(embedding)::BIGINT AS dim,
               round(embedding[1]::DOUBLE, 6) AS first_val,
               round(list_max(embedding)::DOUBLE, 6) AS max_val,
               round(list_min(embedding)::DOUBLE, 6) AS min_val,
               round(list_sum(list_slice(embedding, 1, 8)::DOUBLE[]), 6)
                   AS head8_sum
        FROM embeddings
    """,
    "string_functions": """
        SELECT c_custkey,
               lpad(c_custkey::VARCHAR, 10, '0') AS padded_key,
               translate(c_name, '#', '-') AS cleaned,
               levenshtein(lower(c_name), 'customer')::BIGINT AS lev_dist,
               reverse(c_name) AS reversed,
               coalesce(strpos(c_name, '0'), 0)::BIGINT AS first_zero_pos
        FROM customer
    """,
    "try_cast_tokens": """
        SELECT doc_id,
               count(num)::BIGINT AS n_numeric,
               count(*)::BIGINT AS n_tokens,
               NULL::DOUBLE AS div_zero_is_null
        FROM (
            SELECT doc_id, TRY_CAST(t AS BIGINT) AS num
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                  FROM documents)
        )
        GROUP BY doc_id
    """,
    "split_explode": """
        SELECT token, count(*) AS freq FROM (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ) WHERE token <> '' GROUP BY token
    """,
    "explode_grain": """
        SELECT doc_id, count(*) AS n_tokens FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ) GROUP BY doc_id
    """,
    "json_extract": """
        SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k
        FROM events
    """,
    "json_group_stats": """
        SELECT event_type,
               sum(k)::BIGINT AS sum_k, max(k) AS max_k, count(*) AS n
        FROM (
            SELECT event_type,
                   json_extract_string(props, '$.k')::BIGINT AS k
            FROM events
        ) GROUP BY event_type
    """,
    "ingest_watermarks": """
        SELECT event_type,
               max(ts) AS high_watermark,
               max(event_id) AS max_event_id,
               count(*) AS n_rows
        FROM events GROUP BY event_type
    """,
    "time_bucket_agg": """
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
               count(*) AS n, sum(value) AS total_value
        FROM events GROUP BY 1, 2
    """,
}
