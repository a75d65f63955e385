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
    "token_count",
    "text_quality",
    "langid_heuristic",
    "char_entropy",
    "unigram_surprisal",
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
    """Apostrophe-bearing tokens flow through the fold-SQL escaping:
    segmentation conserves characters for every word in doc 5."""
    from data_warehouse_co_healthy_spark.llm import training

    stats = training.bpe_segment(spark, edge_dir).toPandas()
    assert (stats.n_tokens >= stats.n_words).all()
    merges = training.bpe_merges(spark, edge_dir).toPandas()
    assert len(merges) == training.BPE_MERGES
