"""SparkSession factory.

The reference scatters four ``SparkSession.builder`` calls across modules
(reference: dimension.py:13, processing/medical_formula_process.py:11-14,
processing/payment_process.py:9-12, processing/retreat_process.py:10-13,
processing/service_process.py:11-14) with no tuning beyond ``spark.jars``.
Here: one factory, scale-aware defaults.

Scale posture (local[32] test rig, but designed for a 1000-executor
cluster):
  - AQE on (runtime partition coalescing, skew-join splitting, dynamic
    broadcast conversion) — the single most important 100 TB knob.
  - shuffle.partitions sized to cores locally; on a real cluster AQE's
    coalescing makes the initial number mostly a ceiling.
  - session timezone pinned UTC so results are reproducible and comparable
    with the DuckDB oracle (DuckDB timestamps are UTC-naive).
  - Arrow enabled for any pandas interchange (vectorized, not per-row).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data_warehouse_co_healthy_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # ANSI off: the engine's semantics follow classic Spark/SQL NULL-on-
        # bad-cast behavior, matching DuckDB's permissive try-cast-less reads
        # for the oracle harness and the reference's lenient type handling.
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
