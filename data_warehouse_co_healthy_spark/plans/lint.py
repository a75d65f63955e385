"""Plan-quality linter as a library API.

The full-registry test (tests/test_plan_lint.py) enforces these rules
on every declared query; this module exposes the same checks to USERS
of the engine, so any ad-hoc query can be gated before it ships to a
1000-executor cluster:

    from data_warehouse_co_healthy_spark.plans.lint import (
        assert_scalable_plan,
    )
    assert_scalable_plan(df)            # raises with the offending plan
    assert_scalable_plan(df, allow={"single_partition"})  # documented

Checked antipatterns — each one is benign at fixture scale and a
cluster-killer at 100 TB:

- ``cartesian``: CartesianProduct — O(|L|·|R|) rows.
- ``nested_loop``: BroadcastNestedLoopJoin — a join that degraded off
  the hash path (usually an inequality-only condition).
- ``single_partition``: Exchange SinglePartition — a global shuffle
  into ONE task. Legitimate for scalar aggregates and tiny-dim key
  assignment; fatal for fact-scale data.
- ``python_row_udf``: BatchEvalPython — a row-at-a-time Python UDF in
  the plan (the ~10-100x-slower-than-Arrow path). Pandas/Arrow
  evaluation (ArrowEvalPython / MapInPandas / MapInArrow) is allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RULES: dict[str, str] = {
    "cartesian": "CartesianProduct",
    "nested_loop": "BroadcastNestedLoopJoin",
    "single_partition": "Exchange SinglePartition",
    "python_row_udf": "BatchEvalPython",
}


def plan_findings(df: DataFrame) -> dict[str, bool]:
    """Which antipatterns the physical plan of ``df`` contains."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {rule: marker in plan for rule, marker in RULES.items()}


def assert_scalable_plan(
    df: DataFrame, allow: frozenset[str] | set[str] = frozenset()
) -> None:
    """Raise ``ValueError`` if the plan contains a scale antipattern
    not explicitly allowed. ``allow`` entries are RULES keys — forcing
    the caller to name (and thereby document) each exception."""
    unknown = set(allow) - set(RULES)
    if unknown:
        raise ValueError(f"unknown lint rules in allow: {sorted(unknown)}")
    hits = [
        rule
        for rule, found in plan_findings(df).items()
        if found and rule not in allow
    ]
    if hits:
        plan = df._jdf.queryExecution().executedPlan().toString()
        raise ValueError(
            f"plan contains scale antipatterns {hits}:\n{plan}"
        )
