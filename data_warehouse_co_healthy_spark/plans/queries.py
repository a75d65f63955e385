"""Central query registry — the t2 correctness surface.

Merges every operator module's declared (query, oracle) pairs. The
driver runs each ``QUERIES[name]`` on Spark at sf0.01 and the matching
``ORACLES[name]`` on DuckDB over the same parquet and compares
row-count + schema + order-insensitive value hash (TESTDATA.md;
``__spark_entry__.py`` re-exports these).

Invariant enforced by tests/test_registry.py: every query has either an
oracle or an explicit entry in NO_ORACLE with a reason.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..functions import dates
from ..operators import (
    aggregates,
    joins,
    projections,
    scalars,
    setops,
    temporal,
    warehouse,
    windows,
)
from . import sqlapi, tpch, tpch2

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    projections,
    joins,
    aggregates,
    setops,
    windows,
    scalars,
    dates,
    temporal,
    warehouse,
    tpch,
    tpch2,
    sqlapi,
)

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _fn
    ORACLES.update(_m.ORACLES)

# Queries intentionally without a SQL oracle (driver falls back to the
# weaker rows-only check) — each with the reason.
NO_ORACLE: dict[str, str] = {
    "approx_distinct": "HLL sketch values are implementation-defined",
    "approx_quantiles": "GK sketch values are implementation-defined; "
    "bounded error vs exact percentiles asserted in tests/test_plans.py",
    "hll_mergeable_rollup": "DataSketches HLL estimates are "
    "implementation-defined; bounded error vs exact distinct counts "
    "asserted in tests/test_plans.py",
    "rolling_active_users_hll": "HLL estimates are implementation-"
    "defined; bounded error vs the exact rolling_active_users twin "
    "asserted in tests/test_plans.py",
}


def register_llm_modules() -> None:
    """LLM-pipeline operators register late (heavier imports).
    Idempotent — repeat calls are no-ops."""
    if "dedup_exact" in QUERIES:
        return
    from ..llm import (  # noqa: PLC0415
        dedup,
        filters,
        multimodal,
        similarity,
        text,
        training,
    )

    for m in (dedup, filters, multimodal, similarity, text, training):
        for name, fn in m.QUERIES.items():
            if name in QUERIES:
                raise ValueError(f"duplicate query name: {name}")
            QUERIES[name] = fn
        ORACLES.update(m.ORACLES)
        NO_ORACLE.update(getattr(m, "NO_ORACLE", {}))
