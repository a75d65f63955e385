"""Robustness battery: every text-facing operator must survive an
adversarial corpus — empty text, whitespace-only, single characters,
apostrophes/quotes (SQL-injection-shaped tokens), unicode accents,
repeated-token soup — without crashing (including under ANSI division
semantics) and with sane outputs. The driver fixtures never contain
these, so this is the guard the fixture sweep can't provide."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

EDGE_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en", "srcA"),
    (1, "the quick brown fox jumps over the lazy dog", "en", "srcA"),
    (2, "", "en", "srcA"),                       # empty text
    (3, "   ", "en", "srcB"),                    # whitespace only
    (4, "x", "zh", "srcB"),                      # single char
    (5, "o'neill's don't it's 'quoted' \"double\"", "en", "srcB"),
    (6, "café résumé naïve façade über señor", "fr", "srcC"),
    (7, "a a a a a a a a a a a a a a a a", "en", "srcC"),  # repetition
    (8, "tab\tseparated\twords and\nnewline split", "en", "srcC"),
    (9, "the quick brown fox jumps over the lazy cat", "en", "srcC"),
    # backslash-bearing tokens: the SQL-literal escaping trap for any
    # operator that inlines corpus symbols into generated SQL (BPE)
    (10, "c:\\dir\\file back\\slash \\ end\\", "en", "srcC"),
    # BM25 query terms present → the edge-corpus oracle-equality test
    # for bm25_search compares real scores, not empty-vs-empty
    (11, "spark merge vector spark spark merge plan", "en", "srcA"),
    (12, "vector search with spark", "en", "srcB"),
]


@pytest.fixture(scope="module")
def edge_dir(spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="edge_corpus_")
    docs = pd.DataFrame(
        EDGE_DOCS, columns=["doc_id", "text", "lang", "source"]
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    # matching embeddings table (same ids, 8-dim unit-ish vectors,
    # two labels) so the semantic-side operators run too
    vecs = [
        [((i * 7 + j * 3) % 11 - 5) / 5.0 for j in range(8)]
        for i in range(len(EDGE_DOCS))
    ]
    emb = pa.table(
        {
            "vec_id": pa.array(range(len(EDGE_DOCS)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(
                [i % 2 for i in range(len(EDGE_DOCS))], pa.int32()
            ),
        }
    )
    pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
    return d


EDGE_QUERIES = [
    "snm_adjacent_pairs",
    "hybrid_search_rrf",
    "hard_negatives",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "tfidf_cosine_pairs",
    "exact_substring_matches",
    "token_count",
    "vocab_growth_heaps",
    "text_quality",
    "langid_heuristic",
    "gopher_quality_flags",
    "char_entropy",
    "unigram_surprisal",
    "bigram_perplexity",
    "bm25_search",
    "doc_fingerprint",
    "bpe_merges",
    "bpe_segment",
    "bootstrap_ci",
    "population_stability_index",
    "epoch_shuffle",
    "shard_assignment",
    "ngram_novelty",
    "simhash_docs",
    "minhash_signatures",
    "repetition_ratio",
    "cosine_topk",
    "retrieval_ndcg",
    "embedding_norms",
    "clean_corpus",
    "heavy_hitters_tokens",
    "pmi_bigrams",
    "tfidf_top_terms",
    "approx_topk_tokens",
    "chunk_dedup_reassemble",
    "chunk_copy_pairs",
    "chunk_documents",
    "pack_sequences",
    "pack_sequences_text",
    "pii_redaction",
    "dedup_editdist_rerank",
    "dedup_keep_best",
    "dedup_cluster_labels",
    "dedup_connected_components",
    "dedup_cc_star",
    "pagerank_near_dup",
    "dedup_graph_triangles",
    "token_length_histogram",
    "vocab_oov_rate",
    "chi2_source_lang",
    "roc_auc_by_source",
    "corpus_mix_entropy",
    "mix_sources_weighted",
    "contamination_overlap",
    "dsir_importance",
    "temperature_sampling_weights",
    "train_val_test_split",
    "quality_classifier",
    "semantic_dedup",
    "kcenter_coreset",
    "dedup_embedding_cosine",
    "minhash_jaccard_estimate",
    "lsh_bucket_stats",
    "lsh_eval_vs_exact",
    "incremental_lsh_pairs",
    "cross_snapshot_dedup",
    "source_overlap_matrix",
    "filter_ablation_report",
]


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_does_not_crash(spark, edge_dir, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, edge_dir)
    rows = df.collect()
    assert rows is not None  # materialized without raising


def test_edge_exact_dup_pair_found(spark, edge_dir):
    """Docs 0 and 1 are identical — SNM and exact dedup must agree."""
    from data_warehouse_co_healthy_spark.llm import dedup

    snm = dedup.snm_adjacent_pairs(spark, edge_dir).toPandas()
    assert ((snm.doc_a == 0) & (snm.doc_b == 1) & (snm.jac == 1.0)).any()
    exact = dedup.dedup_exact(spark, edge_dir).toPandas()
    assert (exact.n_copies >= 2).any()


def test_edge_bpe_handles_apostrophes(spark, edge_dir):
    """Apostrophe- AND backslash-bearing tokens flow through the
    fold-SQL escaping (backslashes must be escaped BEFORE quotes):
    segmentation conserves characters for every word in docs 5/10."""
    from data_warehouse_co_healthy_spark.llm import training

    stats = training.bpe_segment(spark, edge_dir).toPandas()
    assert (stats.n_tokens >= stats.n_words).all()
    merges = training.bpe_merges(spark, edge_dir).toPandas()
    assert len(merges) == training.BPE_MERGES


def test_edge_bpe_backslash_merge_is_exact(spark, edge_dir):
    """Force merges whose symbols CONTAIN backslashes by training on a
    backslash-dense corpus; the learned merge table must match an
    independent pure-Python BPE trainer exactly. This is the guard for
    the fold-SQL literal escaping (backslash-then-quote order)."""
    import os
    import tempfile

    from data_warehouse_co_healthy_spark.llm import training

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a\\b a\\b a\\b a\\b",
                "a\\b a\\b c'd c'd",
                "a\\b \\'x \\'x",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    d = tempfile.mkdtemp(prefix="edge_bs_")
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)

    got = training.bpe_merges(spark, d).toPandas()

    # independent reference trainer (pure python, same tie-break)
    from collections import Counter

    vocab = Counter()
    for text in docs.text:
        for w in text.lower().split():
            vocab[tuple(w)] += 1
    want = []
    for rank in range(1, training.BPE_MERGES + 1):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, l, r, c))
        new_vocab: Counter = Counter()
        for sym, cnt in vocab.items():
            out: list[str] = []
            for x in sym:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab

    got_rules = list(zip(got["rank"], got.left, got.right, got.pair_count))
    assert [(int(a), b, c, int(d2)) for a, b, c, d2 in got_rules] == want


def test_edge_bpe_pair_exhaustion_returns_partial(spark):
    """A corpus of all single-char words has ZERO adjacent pairs —
    bpe_merges must return an empty merge table, not crash on the NULL
    argmax (ADVICE r3)."""
    import os
    import tempfile

    from data_warehouse_co_healthy_spark.llm import training

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a b c", "x y z"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
        }
    )
    docs["n_chars"] = docs.text.str.len().astype("int64")
    d = tempfile.mkdtemp(prefix="edge_1ch_")
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    got = training.bpe_merges(spark, d).toPandas()
    assert len(got) == 0
    # and the consumer still segments: every word is its single char
    stats = training.bpe_segment(spark, d).toPandas()
    assert (stats.n_tokens == stats.n_words).all()


def test_edge_bm25_matches_oracle(spark, edge_dir):
    """bm25_search must agree with the DuckDB oracle ON THE EDGE CORPUS
    — the zero-token docs (2, 3) must not skew avgdl/n_docs (ADVICE
    r3: stats run over dl>0 docs on both engines)."""
    import duckdb

    from data_warehouse_co_healthy_spark.llm import text as llm_text

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet')"
    )
    try:
        got = llm_text.bm25_search(spark, edge_dir).toPandas()
        want = con.sql(llm_text.ORACLES["bm25_search"]).df()
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = want.sort_values("doc_id").reset_index(drop=True)
        assert len(got) > 0, "edge corpus must hit the BM25 query terms"
        assert list(got.doc_id) == list(want.doc_id)
        assert (got.bm25 - want.bm25).abs().max() <= 1e-3
    finally:
        con.close()
