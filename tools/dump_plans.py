"""Regenerate PLANS.md: formatted physical plans of the headline
queries at sf0.1 on the tuned session. Run: python tools/dump_plans.py"""

from __future__ import annotations

import io
import sys

sys.path.insert(0, "/root/repo")

from data_warehouse_co_healthy_spark.session import get_spark  # noqa: E402

SHOWCASE = [
    ("q6_forecast_revenue", "filter pushdown + column pruning"),
    ("star_join_revenue", "all-broadcast star join, one fact scan"),
    ("fact_formula_star", "flagship: one shuffle (collect_list), rest broadcast"),
    ("minhash_signatures", "one wide partial-agg shuffle, no row blow-up"),
    ("asof_join", "union-merge window, no nested-loop"),
    ("dedup_cluster_labels", "iterative label propagation"),
    ("q21_waiting_supplier", "EXISTS/NOT-EXISTS as ONE grouped agg, no self-joins"),
    ("contamination_overlap", "corpus grams vs broadcast eval-set gram table"),
    ("media_phash_buckets", "no-join near-dup: codegen array folds + hash window"),
    ("gapfill_forward", "dense grid + LOCF sharing one user_id shuffle"),
    ("interval_overlap_join", "interval x interval as bucketized equi-join"),
    ("topk_agg_per_group", "sort-free top-k: partial-agg'd collect + slice"),
    (
        "duplicate_spans",
        "span-grain Lee-et-al dedup: fp groupBy + dup join + per-doc "
        "islands, no pair join",
    ),
    ("dq_expectation_report", "N rules = one conditional-sum scan"),
    (
        "fact_facturacion_star",
        "CO payment pipeline: broadcast dims, left-miss fillna, one fact scan",
    ),
    (
        "fact_service_star",
        "CO service pipeline: 4-way union + role-playing dims, all broadcast",
    ),
    (
        "supplier_scorecard",
        "multi-metric entity rollup with exact-decimal money sums",
    ),
    (
        "hybrid_search_rrf",
        "RRF fusion, join-free since round 10: legs UNIONed, ONE "
        "query_id exchange carried through rank windows + fusion agg",
    ),
    (
        "snm_adjacent_pairs",
        "sorted-neighborhood dedup: blocked window, signature lead()",
    ),
    (
        "exact_substring_matches",
        "verbatim shared runs: gram join + per-diagonal islands, no all-pairs",
    ),
    (
        "seasonal_decompose_hourly",
        "trend/seasonal/residual: two windows over one hourly grain",
    ),
    (
        "profile_columns",
        "exact NDVs for 6 columns: ONE scan, one Expand, one agg",
    ),
    (
        "ngram_containment_pairs",
        "asymmetric near-dup: capped posting join, gram+pair shuffles only",
    ),
    (
        "pca_whiten_embeddings",
        "whitening projection: map-only Arrow stage, zero exchanges",
    ),
    (
        "attribution_report",
        "multi-touch attribution: join-free conversion binding, "
        "user-keyed windows",
    ),
    (
        "kaplan_meier_churn",
        "KM survival: one user-grain shuffle, calendar-sized tail",
    ),
    (
        "sql_lateral_topk",
        "LATERAL decorrelated to map-side partial WindowGroupLimit "
        "+ broadcast dim join — no nested loop",
    ),
    (
        "sql_recursive_hierarchy",
        "recursive CTE as depth-bounded UnionLoop, hash join per level",
    ),
    (
        "ohlc_daily",
        "OHLC bars: min_by/max_by in ONE partial-agg scan, no window",
    ),
    (
        "js_divergence_sources",
        "pairwise JSD: token-grain self-join, fan-out bounded by "
        "|sources|^2 per key",
    ),
    (
        "holt_forecast_by_nation",
        "grouped forecasting: one Arrow task per series key",
    ),
    (
        "hill_tail_index",
        "global top-k as map-side WindowGroupLimit, x_(k+1) as 1-row "
        "broadcast",
    ),
    (
        "clamped_balance_window",
        "Lindley reflection: nonlinear clamp as two codegen windows",
    ),
    (
        "zorder_layout_profile",
        "Morton layout planner: codegen div/mod interleave, one data "
        "scan to the (zfile, lfile) grain, tiny re-aggregates",
    ),
    (
        "ann_pq_adc",
        "PQ-ADC ANN: codebooks ride the closure, encode + LUT-gather "
        "are Arrow map-only stages, the ONLY exchange is the final "
        "per-query ranking window",
    ),
    (
        "tfidf_cosine_pairs",
        "round-9 rewrite: DF/IDF + norms as two windows, pair "
        "self-join exchange-free off the tok-partitioned cache",
    ),
    (
        "ivf_index_probe_topk",
        "persisted IVF serve: stored-quantizer probe, partition-"
        "pruned vector scan (cell IN-list as PartitionFilters)",
    ),
    (
        "jpeg_decode_stats",
        "vendored T.81 decode: two chained Arrow stages, zero "
        "exchanges — media decode is scan-shaped at any scale",
    ),
    (
        "skew_hybrid_join",
        "round-10 showcase: hybrid skew join — hot keys broadcast, "
        "cold keys shuffled, one union re-agg",
    ),
    (
        "pysource_rowgroup_docs",
        "round-10 showcase: Python DataSource at production sizing — "
        "BatchEvalPython-free Arrow scan, ONE agg exchange",
    ),
    (
        "html_extract_text",
        "round-10 showcase: stdlib-parser main-text extraction — "
        "pure map-side Arrow stage, zero exchanges",
    ),
    (
        "matryoshka_topk",
        "round-10 showcase: join-free truncation audit — one brute "
        "pass scores full+prefix cosine, two rank windows share ONE "
        "query_id exchange, recall rolls up in place (9 -> 3)",
    ),
    (
        "retrieval_ndcg",
        "round-10 showcase: eval tail = one window over the persisted "
        "scoring frame + left-BROADCAST of the fused shortlist — "
        "three pair-grain hash joins removed (11 -> 7)",
    ),
]


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark("plans")
    queries = entrymod.queries()
    out = io.StringIO()
    out.write(
        "# PLANS — physical plans of showcase queries (sf0.1, tuned "
        "session)\n\nRegenerate with `python tools/dump_plans.py`. "
        "Plans are pre-execution (AQE initial); runtime re-planning can "
        "only improve them.\n"
    )
    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    for name, why in SHOWCASE:
        df = queries[name](spark, "/root/testdata/sf0.1")
        out.write(f"\n## {name} — {why}\n\n```\n{fmt(df).strip()}\n```\n")

    # dynamic partition pruning: needs a PARTITIONED fact on disk, so
    # it is built here rather than read from the flat fixture parquet
    import re
    import tempfile

    from data_warehouse_co_healthy_spark.operators import warehouse

    dpp_dir = tempfile.mkdtemp(prefix="dpp_plan_")
    warehouse.build_partitioned_sales(
        spark, "/root/testdata/sf0.1", dpp_dir
    )
    q = warehouse.partition_pruned_revenue(spark, dpp_dir, "1995")
    plan = re.sub(re.escape(dpp_dir), "<dpp_dir>", fmt(q))
    out.write(
        "\n## partition_pruned_revenue — dynamic partition pruning: "
        "dim filter prunes the partitioned fact scan at runtime\n\n"
        "The fact scan's `PartitionFilters` carries a "
        "`dynamicpruningexpression(order_month IN dynamicpruning#N)` "
        "subquery fed by the filtered month dim — only matching "
        "`order_month=` directories are listed and read "
        "(tests/test_layout.py additionally pins result equality vs "
        "the statically-filtered compute).\n\n"
        f"```\n{plan.strip()}\n```\n"
    )
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(out.getvalue())
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
