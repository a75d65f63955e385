"""Structural perf-regression guard: the bench headline queries must
not silently grow data-sized exchanges. A new hash/range shuffle in one
of these plans is a cluster-cost regression at 100 TB even when the
sf0.1 wall-clock barely moves — pin the budget, not the milliseconds.

Ceilings are the audited counts from SHUFFLES.md (tools/shuffle_audit.py)
at the time of pinning; lowering a count is always fine, raising one
must be a deliberate, reviewed change to this table.
"""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_DIR

# query -> max allowed (hash + range) exchanges in the static plan
BUDGETS = {
    "fact_formula_star": 1,
    "q1_pricing_summary": 1,
    "q3_shipping_priority": 1,
    "q5_local_supplier": 1,
    "q18_large_orders": 1,
    "star_join_revenue": 1,
    "role_playing_dim": 1,
    "window_topk_per_group": 1,
    "dedup_exact": 1,
    "minhash_signatures": 1,
    "minhash_lsh_pairs": 3,
    "cosine_topk": 1,
    "asof_join": 1,
    "semantic_dedup": 1,
    "ann_ivf_kmeans": 1,
    "fact_facturacion_star": 2,
    "bpe_segment": 1,
    "image_decode_stats": 0,
    # single brute-force pass scoring both cosines per pair: ONE hash
    # exchange on query_id shared by both rank windows AND the final
    # aggregate (round-10 rewrite from two passes + pair self-join)
    "matryoshka_topk": 1,
    # map-side canonicalization, then count+2×countDistinct at the
    # 55-key canonical grain: Expand + two aggregate phases — only the
    # first exchange is data-sized, the rest move <= |canonicals| rows
    "url_canonical_dedup": 2,
    "attribution_report": 3,
    "kaplan_meier_churn": 2,
    # round-5 bench additions (upper bounds per the SHUFFLES.md header:
    # persisted subtrees print once per consumer, execute once)
    "js_divergence_sources": 7,
    "holt_forecast_by_nation": 2,
    "ohlc_daily": 1,
    "gini_by_nation": 2,
    "ks_two_sample": 2,
    "weighted_median_by_group": 1,
    "conversion_latency": 3,
    # round-6 bench additions (CO parity floor) + per-round plan of the
    # iterative pagerank
    "fact_retiro_star": 1,
    "fact_service_star": 2,
    "pagerank_near_dup": 2,
    # zorder profile: 1 data-sized exchange (the (zfile, lfile) grain
    # groupBy); the other 4 are <=16-row zone/stack re-aggregates
    "zorder_layout_profile": 5,
    # round-8 bench additions (twelfth-rotation flagships) + the two
    # reworked dedup operators
    "kcore_near_dup": 1,
    "kmeans_embeddings": 1,
    "ann_pq_refine": 5,
    # eval harness composing three pipelines once each (justified in
    # SHUFFLES.md; r8 deduped 20 -> 15, r10's RRF union-fusion rework
    # brought the plan-text count to 7)
    # round-10 eval-tail shave: one window exchange over the persisted
    # scoring frame + a left-BROADCAST of the eval-sized fused
    # shortlist replaced three pair-grain hash joins (was 7)
    "retrieval_ndcg": 3,
    # round-10 rework (join-free RRF fusion): ONE repartition(query_id)
    # carried through the per-leg rank window, the pair-grain fusion
    # aggregate and the final window via the subset-partitioning rule,
    # plus the lexical pair groupBy — was 6 (each leg's window + both
    # full-join sides re-shuffling on the pair key)
    "hybrid_search_rrf": 2,
    # fp-count groupBy + keep-join + pair join + island window (+
    # fixture-only spread round-robins)
    "exact_substring_matches": 7,
    # fp groupBy + dup join + per-doc island window (+ spread)
    "duplicate_spans": 4,
    # round-9 rework (VERDICT r8 item 8, 11 -> 7 cache-deduped in
    # SHUFFLES.md): TF groupBy, DF window (tok), norm window (doc_id),
    # repartition(tok) feeding the exchange-free self-join, pair
    # groupBy (+ 2 fixture-only spread round-robins). The plan TEXT
    # this test counts prints the persisted wn subtree once per pair
    # side, so the raw ceiling is 9 (executes once — the audit
    # dedupes it)
    "tfidf_cosine_pairs": 9,
    # round-10 bench additions (fourteenth-rotation flagships; the
    # streaming drains stay unpinned — their plan is the drained sink
    # scan, not the stateful stream): the DataSource agg's single
    # groupBy; the pure map-side HTML extraction (zero exchanges); the
    # hybrid skew join's hot/cold split (hot-key count agg, cold
    # shuffle join sides, union re-agg); the EWMA window sort; the
    # QI-grain audit's two aggregation grains
    "pysource_rowgroup_docs": 1,
    "html_extract_text": 0,
    "skew_hybrid_join": 4,
    "ewma_smoother": 1,
    "l_diversity_audit": 2,
    # round-10 cache-dedup sweep (multi-instantiated shared subplans
    # now persist() once — vocab/sketch/shortlist-grain caches, see
    # each docstring's CACHING note): pinned at the post-shave raw
    # hash counts so a dropped cache resurfaces here
    "pmi_bigrams": 4,
    "bigram_perplexity": 4,
    "bm25_search": 5,
    "unigram_surprisal": 3,
    "ann_ivf": 3,
    "tfidf_top_terms": 6,
    "minhash_jaccard_estimate": 6,
    "dsir_importance": 3,
    "mix_sources_weighted": 2,
    "length_matched_sample": 3,
    "contamination_overlap": 4,
    "bootstrap_ci": 3,
    "population_stability_index": 4,
    "intra_label_cosine": 2,
    "vocab_oov_rate": 4,
    "ngram_jaccard_pairs": 3,
    "ngram_containment_pairs": 3,
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_headline_query_stays_within_shuffle_budget(spark, name):
    from data_warehouse_co_healthy_spark.plans import queries as reg

    reg.register_llm_modules()
    # cold-plan the query: a cache MATERIALIZED by an earlier test in
    # the same session changes how persisted subtrees print (nested
    # InMemoryTableScan children appear per consumer), inflating the
    # regex count order-dependently — observed on js_divergence_sources
    # after the oracle test collected it
    spark.catalog.clearCache()
    df = reg.QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = len(re.findall(r"Exchange hashpartitioning", plan)) + len(
        re.findall(r"Exchange rangepartitioning", plan)
    )
    assert n <= BUDGETS[name], (
        f"{name}: {n} data shuffles planned, budget {BUDGETS[name]} — "
        "either remove the new exchange or deliberately raise the "
        "budget here and in SHUFFLES.md"
    )
