"""Physical-plan shape assertions — the 100 TB posture, pinned by test.

Correctness says WHAT each query returns; these tests pin HOW Spark will
execute it: filters reach the parquet scan (PushedFilters), small dims
broadcast instead of shuffling, hot paths stay inside whole-stage
codegen, and map-side-reducible aggregations don't multiply rows through
an exchange. A regression here is invisible at sf0.01 but fatal at 100 TB.
"""

from __future__ import annotations

from data_warehouse_co_healthy_spark.llm import dedup
from data_warehouse_co_healthy_spark.operators import joins
from data_warehouse_co_healthy_spark.plans import tpch
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_push_to_parquet_scan(spark):
    plan = _plan(tpch.q6_forecast_revenue(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed or "IsNotNull" in pushed, pushed
    # column pruning: the scan must not read unused wide columns
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_returnflag" not in read_schema
    assert "l_extendedprice" in read_schema


def test_star_join_broadcasts_dims(spark):
    plan = _plan(joins.star_join_revenue(spark, SF_DIR))
    # nation + region are hinted; customer is small enough for auto-
    # broadcast — at minimum the two hinted dims must broadcast.
    assert plan.count("BroadcastHashJoin") >= 2
    # the fact side must NOT broadcast (it's the big side at scale)
    assert "BroadcastExchange" not in plan.split("lineitem.parquet")[0]


def test_role_playing_dim_broadcasts_both_roles(spark):
    plan = _plan(joins.role_playing_dim(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2


def test_q1_partial_aggregation(spark):
    """The classic agg must partial-aggregate before the exchange
    (HashAggregate(partial) -> Exchange -> HashAggregate(final))."""
    from data_warehouse_co_healthy_spark.operators import aggregates

    plan = _plan(aggregates.q1_pricing_summary(spark, SF_DIR))
    first_agg = plan.index("HashAggregate")
    first_exchange = plan.index("Exchange")
    assert first_exchange < first_agg or "partial" in plan.lower()


def test_minhash_has_single_agg_exchange(spark):
    """The signature matrix must NOT multiply rows per permutation
    through a shuffle: one spread repartition + one groupBy exchange."""
    # cold-plan: _signature_wide persists since round 10, and a cache
    # MATERIALIZED by an earlier test changes how the subtree prints
    # (finalized AQE stages under InMemoryRelation repeat "Exchange"
    # lines) — same remedy as tests/test_shuffle_budgets.py
    spark.catalog.clearCache()
    plan = _plan(dedup._signature_wide(spark, SF_DIR))
    assert plan.count("Exchange") <= 2, plan.count("Exchange")
    # all 16 permutation mins in ONE aggregate, not 16 plans
    assert plan.count("HashAggregate") <= 2


def test_semi_join_stays_semi(spark):
    """left_semi must not degrade to inner+distinct."""
    plan = _plan(joins.semi_join(spark, SF_DIR))
    assert "LeftSemi" in plan


def test_asof_join_avoids_nested_loop(spark):
    """The as-of must be a window over ONE user_id shuffle, never a
    BroadcastNestedLoopJoin (the fate of naive inequality joins)."""
    from data_warehouse_co_healthy_spark.operators import temporal

    plan = _plan(temporal.asof_join(spark, SF_DIR))
    assert "NestedLoop" not in plan
    assert "WindowExec" in plan or "Window" in plan


def test_range_join_is_equi_bucketed(spark):
    """The range join must execute as an equi hash/SMJ join on the
    bucket key, not a nested-loop over the inequality."""
    from data_warehouse_co_healthy_spark.operators import temporal

    plan = _plan(temporal.range_join_activity(spark, SF_DIR))
    assert "NestedLoop" not in plan


def test_interval_overlap_join_is_equi_bucketed(spark):
    """The interval-overlap join must execute as an equi join on
    (user_id, bucket) with the exact predicate as a post-filter — never
    a nested-loop over the interval inequalities."""
    from data_warehouse_co_healthy_spark.operators import temporal

    plan = _plan(temporal.interval_overlap_join(spark, SF_DIR))
    assert "NestedLoop" not in plan


def test_approx_quantiles_bounded_rank_error(spark):
    """The GK sketch guarantees RANK error (≤ 1/accuracy), not value
    error: the fraction of values ≤ each reported quantile must sit
    within 1.5% of the target quantile."""
    from pyspark.sql import functions as F

    from data_warehouse_co_healthy_spark.catalog import load_table
    from data_warehouse_co_healthy_spark.operators.aggregates import (
        approx_quantiles,
    )
    from tests.conftest import SF_DIR

    rows = approx_quantiles(spark, SF_DIR).collect()
    # the query is self-verifying: the sketch-vs-exact bound booleans
    # must all hold ...
    for r in rows:
        assert r.p50_ok and r.p90_ok and r.p99_ok, r
    # ... and the reported EXACT percentiles must have exact rank
    events = load_table(spark, SF_DIR, "events").select(
        "event_type", "value"
    )
    for r in rows:
        grp = events.filter(F.col("event_type") == r.event_type)
        n = grp.count()
        for q, got in (("0.5", r.p50), ("0.9", r.p90), ("0.99", r.p99)):
            rank = grp.filter(F.col("value") <= got).count() / n
            assert abs(rank - float(q)) <= 0.015, (r.event_type, q, got, rank)


def test_hll_mergeable_rollup_bounded_error(spark):
    """HLL estimates (per group AND the sketch-union grand total) must
    sit within 3% of exact distinct counts, and the union must NOT be
    the sum of the parts (orderkeys recur across return flags — a
    mergeable sketch deduplicates across groups, addition would not)."""
    from pyspark.sql import functions as F

    from data_warehouse_co_healthy_spark.catalog import load_table
    from data_warehouse_co_healthy_spark.operators.aggregates import (
        hll_mergeable_rollup,
    )
    from tests.conftest import SF_DIR

    got = {
        r.l_returnflag: r
        for r in hll_mergeable_rollup(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    exact["ALL"] = li.select("l_orderkey").distinct().count()
    assert set(got) == set(exact)
    for k, r in got.items():
        assert r.n_exact == exact[k], (k, r.n_exact, exact[k])
        # self-verifying bound: the sketch-union estimate sat within 5%
        assert r.hll_ok, k
    # mergeability is real dedup: orderkeys recur across return flags,
    # so the union total is strictly below the sum of the parts
    assert got["ALL"].n_exact < sum(
        r.n_exact for k, r in got.items() if k != "ALL"
    )


def test_rolling_hll_tracks_exact_wau(spark):
    """The sketch twin must track the exact rolling distinct actives
    within HLL error (lgK=12 → ~2%; assert 5% headroom) on every day."""
    from data_warehouse_co_healthy_spark.operators import temporal

    exact = (
        temporal.rolling_active_users(spark, SF_DIR)
        .toPandas()
        .set_index("report_day")
        .active_users
    )
    est = (
        temporal.rolling_active_users_hll(spark, SF_DIR)
        .toPandas()
        .set_index("report_day")
        .active_users_est
    )
    assert set(exact.index) == set(est.index)
    rel = ((est - exact).abs() / exact).max()
    assert rel <= 0.05, rel


def test_bloom_probe_filters_fact_scan(spark):
    """The Bloom probe must sit in the lineitem SCAN stage (a Filter
    with the hash tests directly over the fact scan), before any join
    — that placement is the entire point of the runtime filter."""
    plan = _plan(joins.bloom_prefilter_join(spark, SF_DIR))
    scan_pos = plan.index("lineitem.parquet")
    # the probe expression references xxhash64 over l_suppkey and must
    # appear before (above) the scan text in the same stage section
    probe_pos = plan.index("xxhash64")
    join_pos = plan.index("BroadcastHashJoin")
    assert probe_pos < scan_pos, "probe filter not fused with the scan"
    assert join_pos < probe_pos, (
        "probe must be below the join in the plan tree (runs first)"
    )


def test_cumulative_distinct_single_exchange(spark):
    """Both windows must ride ONE user_id exchange (two sorts, no
    second shuffle)."""
    from data_warehouse_co_healthy_spark.operators import windows

    plan = _plan(windows.cumulative_distinct(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_intra_label_cosine_matches_bruteforce(spark):
    """The O(n·d) sum-identity must equal the O(n^2) pairwise mean."""
    import itertools

    import numpy as np

    from data_warehouse_co_healthy_spark.llm import similarity

    got = {
        r.label: (r.n, r.mean_intra_cosine)
        for r in similarity.intra_label_cosine(spark, SF_DIR).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        v = np.asarray(r.embedding, dtype=np.float64)
        by_label.setdefault(r.label, []).append(v / np.linalg.norm(v))
    for label, vecs in by_label.items():
        n = len(vecs)
        if n < 2:
            continue
        mean = np.mean(
            [a @ b for a, b in itertools.combinations(vecs, 2)]
        )
        # pairs counted once in brute force; identity counts ordered
        # pairs — means coincide
        assert abs(got[label][1] - mean) < 1e-3, (label, got[label], mean)
        assert got[label][0] == n


def test_seasonal_decompose_identity_and_centering(spark):
    """Decomposition invariants: trend+seasonal+resid reconstructs the
    series exactly (to rounding); seasonal means are centered near
    zero per event type; the trend is smoother than the raw series
    (lower lag-1 difference variance)."""
    from data_warehouse_co_healthy_spark.operators.temporal import (
        seasonal_decompose_hourly,
    )

    out = seasonal_decompose_hourly(spark, SF_DIR).toPandas()
    assert len(out) > 0
    recon = out.trend + out.seasonal + out.resid
    assert (recon - out.n).abs().max() <= 2e-4
    for _, g in out.groupby("event_type"):
        # mean of seasonal over the series ~ 0 (centered effects)
        assert abs(g.seasonal.mean()) < 1.0, g.seasonal.mean()
        s = g.sort_values("bucket")
        raw_rough = s.n.diff().var()
        trend_rough = s.trend.diff().var()
        assert trend_rough < raw_rough, (trend_rough, raw_rough)


def test_incremental_agg_refresh_is_split_invariant(spark):
    """MV maintenance correctness: the merged (stored partials + delta
    partials) view must be IDENTICAL for any base/delta boundary —
    including the degenerate all-delta (empty MV) and all-base (empty
    batch) splits — because COUNT and exact-decimal SUM partials merge
    associatively. Split-invariance + the all-delta case together imply
    equality with the full recompute (which the DuckDB oracle also
    pins cross-engine)."""
    from data_warehouse_co_healthy_spark.operators.warehouse import (
        incremental_agg_refresh,
    )

    def snap(split):
        out = incremental_agg_refresh(spark, SF_DIR, split_date=split)
        return sorted(
            (r["ship_month"], r["l_returnflag"], r["n_rows"],
             r["sum_qty"], r["revenue"], round(r["avg_qty"], 9))
            for r in out.collect()
        )

    all_delta = snap("1990-01-01")   # everything arrives as the batch
    mid = snap("1997-06-01")
    late = snap("1998-06-01")
    all_base = snap("2005-01-01")    # MV already holds everything
    assert all_delta == mid == late == all_base
    assert len(mid) > 50  # months × returnflags actually materialized


def test_profile_columns_exact_ndv_and_single_expand(spark):
    """The table profile must (a) report column-grain facts that hold at
    every fixture scale — zero nulls, key NDV == row count, the 3-status
    / 5-priority enums — with min/max rendered from the NATIVE ordering
    (numeric, not lexicographic), and (b) plan exactly one Expand: the
    multi-count(DISTINCT) strategy costs scan×(n_cols+1), not one job
    per column."""
    from data_warehouse_co_healthy_spark.operators.aggregates import (
        profile_columns,
    )

    df = profile_columns(spark, SF_DIR)
    rows = {r["col_name"]: r for r in df.collect()}
    assert len(rows) == 6
    n = rows["o_orderkey"]["n_rows"]
    assert all(r["n_null"] == 0 for r in rows.values())
    assert rows["o_orderkey"]["n_distinct"] == n
    assert rows["o_orderstatus"]["n_distinct"] == 3
    assert rows["o_orderpriority"]["n_distinct"] == 5
    assert rows["o_orderstatus"]["min_repr"] == "F"
    # native numeric ordering: a lexicographic min of the string repr
    # would start with '1' only by accident — pin that the rendered min
    # parses back to a number <= the rendered max
    lo = float(rows["o_totalprice"]["min_repr"])
    hi = float(rows["o_totalprice"]["max_repr"])
    assert 0 < lo < hi
    # exactly two Expands: the scan-side multi-distinct rewrite (the
    # scan×(n_cols+1) cost this strategy pays once) and the 1-row
    # stack() unpivot — NOT one job per column
    assert _plan(df).count("Expand") == 2


def test_sql_lateral_topk_matches_pandas_nlargest(spark):
    """Independent reference for the LATERAL top-k — pandas
    sort+groupby+head, not the SQL text the oracle shares."""
    import pandas as pd

    from data_warehouse_co_healthy_spark.plans.sqlapi import (
        sql_lateral_topk,
    )

    cust = pd.read_parquet(
        f"{SF_DIR}/customer.parquet",
        columns=["c_name", "c_nationkey", "c_acctbal"],
    )
    nation = pd.read_parquet(
        f"{SF_DIR}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    j = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    want = (
        j.sort_values(
            ["n_name", "c_acctbal", "c_name"],
            ascending=[True, False, True],
        )
        .groupby("n_name")
        .head(3)
    )
    got = sql_lateral_topk(spark, SF_DIR).collect()
    assert len(got) == len(want)
    want_set = {
        (r.n_name, r.c_name, round(r.c_acctbal, 4))
        for r in want.itertuples()
    }
    got_set = {
        (r["n_name"], r["c_name"], round(r["c_acctbal"], 4)) for r in got
    }
    assert got_set == want_set


def test_sql_recursive_hierarchy_matches_python_walk(spark):
    """Independent reference for the recursive CTE — an explicit
    breadth-first walk in Python over the same parent function."""
    import pandas as pd

    from data_warehouse_co_healthy_spark.plans.sqlapi import (
        sql_recursive_hierarchy,
    )

    part = pd.read_parquet(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_retailprice"]
    )
    price = dict(zip(part["p_partkey"], part["p_retailprice"]))
    keys = sorted(price)
    want: dict[int, tuple[int, int, float]] = {}
    for root in range(1, 10):
        if root not in price:
            continue
        frontier, depth = {root}, 0
        nodes: dict[int, int] = {root: 0}
        while frontier:
            depth += 1
            frontier = {
                k for k in keys if k >= 10 and k // 10 in frontier
            }
            for k in frontier:
                nodes[k] = depth
        want[root] = (
            len(nodes),
            max(nodes.values()),
            round(sum(price[k] for k in nodes), 2),
        )
    got = {r["root"]: r for r in sql_recursive_hierarchy(spark, SF_DIR).collect()}
    assert set(got) == set(want)
    for root, (n_nodes, max_depth, total) in want.items():
        r = got[root]
        assert r["n_nodes"] == n_nodes
        assert r["max_depth"] == max_depth
        assert abs(r["subtree_price"] - total) < 1e-6
