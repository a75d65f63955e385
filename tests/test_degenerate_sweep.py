"""Degenerate-warehouse sweep: EVERY registry query must execute —
under ANSI semantics, the driver's mode — on a schema-identical
warehouse built entirely from the degenerate shapes the driver
fixtures never produce.

Round 6's five ADVICE bugs were one class: an unguarded expression
meets an input shape the fixture can't generate (a size-1 A/B arm, a
zero-variance group, a zero-norm vector, an empty join side). The
static divide lint (tests/test_plan_lint.py) catches the division
subclass; this sweep is the DYNAMIC guard for the whole class — it
runs all ~293 queries end-to-end on data where every such shape is
present at once:

- a ZERO embedding vector, exact-duplicate vectors, a size-1 label,
- one user owning nearly all events, a size-1 event-type arm,
  zero-variance values, identical timestamps,
- empty / whitespace-only / single-char / exact-duplicate documents,
  a size-1 source and a size-1 language,
- zero prices, zero quantities, a single returnflag group, one
  shipdate (length-1 time series), an order with no lineitems,
  regions with no nations.

Pass = the query returns (possibly zero rows) without raising. A crash
here is a real 100 TB incident: at scale, some partition or filtered
slice ALWAYS degenerates to these shapes.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from data_warehouse_co_healthy_spark.plans import queries as reg

reg.register_llm_modules()

_TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _write(dir_path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    def t(name, cols, schema):
        pq.write_table(
            pa.table(cols, schema=pa.schema(schema)),
            f"{dir_path}/{name}.parquet",
        )

    t("region",
      {"r_regionkey": [0, 1, 2, 3, 4],
       "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]},
      [("r_regionkey", pa.int32()), ("r_name", pa.string())])

    # regions 2-4 have NO nations (empty join side downstream)
    t("nation",
      {"n_nationkey": [0, 1, 2],
       "n_name": ["ALPHA", "BRAVO", "CHARLIE"],
       "n_regionkey": [0, 0, 1]},
      [("n_nationkey", pa.int32()), ("n_name", pa.string()),
       ("n_regionkey", pa.int32())])

    # one mktsegment, one zero balance
    t("customer",
      {"c_custkey": [1, 2], "c_name": ["cust#1", "cust#2"],
       "c_nationkey": [0, 1], "c_acctbal": [0.0, 10.0],
       "c_mktsegment": ["BUILDING", "BUILDING"]},
      [("c_custkey", pa.int64()), ("c_name", pa.string()),
       ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
       ("c_mktsegment", pa.string())])

    t("supplier",
      {"s_suppkey": [1, 2], "s_name": ["supp#1", "supp#2"],
       "s_nationkey": [0, 2], "s_acctbal": [0.0, 5.0]},
      [("s_suppkey", pa.int64()), ("s_name", pa.string()),
       ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())])

    # zero size, zero retail price
    t("part",
      {"p_partkey": [1, 2], "p_name": ["zero part", "plain part"],
       "p_brand": ["Brand#0", "Brand#0"],
       "p_type": ["ECONOMY", "ECONOMY"],
       "p_size": [0, 1], "p_retailprice": [0.0, 100.0]},
      [("p_partkey", pa.int64()), ("p_name", pa.string()),
       ("p_brand", pa.string()), ("p_type", pa.string()),
       ("p_size", pa.int32()), ("p_retailprice", pa.float64())])

    # order 3 has NO lineitems; single orderdate; equal totals
    t("orders",
      {"o_orderkey": [1, 2, 3], "o_custkey": [1, 1, 2],
       "o_orderstatus": ["O", "O", "F"],
       "o_totalprice": [100.0, 100.0, 100.0],
       "o_orderdate": [_TS, _TS, _TS],
       "o_orderpriority": ["1-URGENT", "1-URGENT", "1-URGENT"]},
      [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
       ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
       ("o_orderdate", pa.timestamp("us")),
       ("o_orderpriority", pa.string())])

    # single returnflag/linestatus group, one shipdate, a zero-quantity
    # zero-price row, zero discount/tax everywhere
    t("lineitem",
      {"l_orderkey": [1, 1, 2, 2],
       "l_partkey": [1, 2, 2, 2], "l_suppkey": [1, 1, 2, 2],
       "l_linenumber": [1, 2, 1, 2],
       "l_quantity": [0.0, 1.0, 1.0, 1.0],
       "l_extendedprice": [0.0, 100.0, 100.0, 100.0],
       "l_discount": [0.0, 0.0, 0.0, 0.0],
       "l_tax": [0.0, 0.0, 0.0, 0.0],
       "l_returnflag": ["N", "N", "N", "N"],
       "l_linestatus": ["O", "O", "O", "O"],
       "l_shipdate": [_TS, _TS, _TS, _TS]},
      [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
       ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
       ("l_quantity", pa.float64()),
       ("l_extendedprice", pa.float64()),
       ("l_discount", pa.float64()), ("l_tax", pa.float64()),
       ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
       ("l_shipdate", pa.timestamp("us"))])

    # user 1 owns 6 of 7 events; 'purchase' is a size-1 arm; all
    # values equal (zero variance); five IDENTICAL timestamps (zero
    # deltas); user 2 is a size-1 user with a zero value
    ts = [_TS] * 5 + [_TS + dt.timedelta(hours=1), _TS]
    t("events",
      {"event_id": [1, 2, 3, 4, 5, 6, 7],
       "ts": ts,
       "user_id": [1, 1, 1, 1, 1, 1, 2],
       "event_type": ["view", "view", "view", "view", "view",
                      "purchase", "view"],
       "value": [2.5, 2.5, 2.5, 2.5, 2.5, 2.5, 0.0],
       "props": ["{}", "{}", "{}", "{}", "{}", "", "{}"]},
      [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
       ("user_id", pa.int64()), ("event_type", pa.string()),
       ("value", pa.float64()), ("props", pa.string())])

    docs = [
        (0, "", "en", "srcA"),                      # empty
        (1, "   ", "en", "srcA"),                   # whitespace only
        (2, "a", "zz", "srcA"),                     # 1 char, 1-doc lang
        (3, "a a a a a a a a", "en", "srcA"),       # repetition soup
        (4, "the quick brown fox jumps over the lazy dog", "en",
         "srcA"),
        (5, "the quick brown fox jumps over the lazy dog", "en",
         "srcA"),                                   # exact duplicate
        (6, "café über naïve façade", "fr", "srcA"),
        (7, "lonely source document", "en", "lonely"),  # 1-doc source
    ]
    t("documents",
      {"doc_id": [d[0] for d in docs],
       "text": [d[1] for d in docs],
       "lang": [d[2] for d in docs],
       "source": [d[3] for d in docs],
       "n_chars": [len(d[1]) for d in docs]},
      [("doc_id", pa.int64()), ("text", pa.string()),
       ("lang", pa.string()), ("source", pa.string()),
       ("n_chars", pa.int64())])

    # 20 vectors (> every clustering constant): vec 0 is the ZERO
    # vector (norm 0), vecs 1-2 identical (dup ties), vec 3 constant,
    # vec 4 float32-subnormal-range, rest seeded gaussians; label 7 is
    # size-1 (n*(n-1) == 0 class)
    rng = np.random.default_rng(99)
    emb = rng.standard_normal((20, 64)).astype(np.float32)
    emb[0] = 0.0
    emb[2] = emb[1]
    emb[3] = 0.125
    emb[4] = np.float32(1e-38)
    labels = [7] + [1] * 10 + [2] * 9
    t("embeddings",
      {"vec_id": list(range(20)),
       "embedding": [v.tolist() for v in emb],
       "label": labels},
      [("vec_id", pa.int64()),
       ("embedding", pa.list_(pa.float32())),
       ("label", pa.int32())])


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degen_warehouse"))
    _write(d)
    return d


@pytest.fixture(scope="module")
def ansi(spark):
    """The driver runs vanilla Spark 4 (ANSI ON); the tuned test
    session is ANSI-off by design. Degenerate shapes crash precisely
    under ANSI (DIVIDE_BY_ZERO, CAST_OVERFLOW), so the sweep flips the
    runtime conf for its duration."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", sorted(reg.QUERIES))
def test_query_survives_degenerate_warehouse(ansi, degen_dir, name):
    rows = reg.QUERIES[name](ansi, degen_dir).collect()
    # sanity on what does come back: no query may emit a non-finite
    # double (inf OR NaN) — undefined values must surface as NULL
    for r in rows:
        for v in r:
            if isinstance(v, float):
                assert math.isfinite(v), f"{name}: non-finite in {r}"


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    """Tier 2: every table ZERO rows, schema-identical. At scale this
    is a pruned-away partition, an over-tight filter, a first load —
    the engine must return empty results, not IndexError/ZeroDivision
    from a driver-side trainer's collect()."""
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("empty_warehouse"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        src = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(src.slice(0, 0), f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", sorted(reg.QUERIES))
def test_query_survives_empty_warehouse(ansi, empty_dir, name):
    reg.QUERIES[name](ansi, empty_dir).collect()


@pytest.fixture(scope="module")
def tiny_emb_dir(spark, tmp_path_factory):
    """Tier 3 (targeted): 1 < n < every clustering constant — the gap
    between the 20-vector degenerate tier and the zero-row tier. A
    3-vector corpus slice must train 3 centroids, not index
    centroids[K_CLUSTERS-1]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("tiny_emb"))
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((3, 64)).astype(np.float32)
    pq.write_table(
        pa.table(
            {"vec_id": [0, 1, 2],
             "embedding": [v.tolist() for v in emb],
             "label": [0, 1, 0]},
            schema=pa.schema(
                [("vec_id", pa.int64()),
                 ("embedding", pa.list_(pa.float32())),
                 ("label", pa.int32())]
            ),
        ),
        f"{d}/embeddings.parquet",
    )
    return d


@pytest.mark.parametrize(
    "name",
    ["kmeans_embeddings", "semantic_dedup", "ann_ivf_kmeans",
     "kcenter_coreset", "pq_encode", "ann_pq_adc", "ann_pq_refine",
     "cosine_topk_pandas", "pca_whiten_embeddings",
     "mahalanobis_outliers", "quality_classifier"],
)
def test_trainers_survive_fewer_rows_than_clusters(
    ansi, tiny_emb_dir, name
):
    reg.QUERIES[name](ansi, tiny_emb_dir).collect()
