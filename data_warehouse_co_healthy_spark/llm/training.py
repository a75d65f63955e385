"""Training-set preparation operators (engine-added capability —
SURVEY §7.7 / BASELINE.json north-star): shard assignment and embedding
k-means. (Sequence packing lives in text.py:pack_sequences.)

Scale posture: sharding avoids any GLOBAL sort — it orders within hash
shards, so it parallelizes as one window per shard. K-means is the
canonical iterative algorithm: per-iteration work is one broadcast of
k×d centroid floats + one codegen'd scan + one k-cardinality aggregate
(exactly MLlib's dataflow, expressed on the DataFrame API).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table, spread
from ..functions.numeric import nz, snap_round

N_SHARDS = 16  # output shards for training-data files


def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: shard =
    md5(doc_id) mod N_SHARDS, position within shard = rank by a SECOND
    md5 slice (decorrelated from the shard hash). Reproduces the
    "shuffle the corpus, split into N files" step without rand() and
    without a global sort — one hash-partitioned window per shard.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    h = F.md5(F.col("doc_id").cast("string"))
    shard = (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % N_SHARDS
    ).alias("shard")
    order_key = F.conv(F.substring(h, 16, 15), 16, 10).cast("long")
    keyed = d.select("doc_id", shard, order_key.alias("ok"))
    w = Window.partitionBy("shard").orderBy("ok", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


N_EPOCHS = 3  # epochs materialized by epoch_shuffle


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch training order: every epoch re-shuffles the corpus
    deterministically by seeding the shard/position hashes with the
    epoch number — md5(epoch || ':' || doc_id) — so epoch 0's order is
    decorrelated from epoch 1's without rand() (resumable, replayable,
    same plan every run). The per-epoch dataflow is shard_assignment's:
    shard from one hash slice, in-shard position from a second,
    decorrelated slice.

    Scale posture: the epoch dimension is a size-N_EPOCHS explode (map
    side, no join); windows partition on (epoch, shard) — N_EPOCHS ×
    N_SHARDS independent sort tasks, each 1/N_SHARDS of the corpus. No
    global sort, no single-partition exchange at any epoch count.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    keyed = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(N_EPOCHS - 1))
        ).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat_ws(":", F.col("epoch"), F.col("doc_id"))
        ).alias("h"),
    )
    shard = (
        F.conv(F.substring("h", 1, 15), 16, 10).cast("long") % N_SHARDS
    ).alias("shard")
    ok = F.conv(F.substring("h", 16, 15), 16, 10).cast("long").alias("ok")
    w = Window.partitionBy("epoch", "shard").orderBy("ok", "doc_id")
    return (
        keyed.select("doc_id", "epoch", shard, ok)
        .select(
            "doc_id",
            "epoch",
            "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
    )


K_CLUSTERS = 8  # k-means cluster count
KM_ITERS = 5    # fixed Lloyd iterations (deterministic plan count)


def _assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2), ties to
    the lowest cluster id. Arrow-batched numpy: one (batch × k) distance
    matrix per Arrow batch against the closure-broadcast k×d centroid
    array. Chosen over k codegen'd zip_with expressions deliberately —
    with fresh centroid literals every Lloyd iteration, Catalyst+Janino
    recompile a k·d-node expression tree per iteration (~2 s/iter at
    k=8, d=64), while the numpy matmul plan is constant-size and the
    per-row work is a vectorized BLAS call. Same dataflow either way:
    centroids ride along as a broadcast, the scan stays distributed."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    C = np.asarray(centroids, dtype=np.float64)

    def assign_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            # (m - C)² expanded via matmul: O(n·k·d) flops, O(n·k) memory
            d2 = (
                (m * m).sum(1)[:, None]
                - 2.0 * (m @ C.T)
                + (C * C).sum(1)[None, :]
            )
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cid": d2.argmin(1).astype("int32"),
                    "dist": np.maximum(d2.min(1), 0.0),
                }
            )

    return emb.mapInPandas(
        assign_batches,
        schema="vec_id long, embedding array<float>, cid int, dist double",
    )


# Trained coarse quantizers are MODEL ARTIFACTS: k×d floats, trained
# once per dataset and reused by every consumer (cluster assignment,
# semantic dedup, IVF probing) — exactly how a production system
# persists a FAISS/MLlib model instead of retraining per query. The
# memo is keyed by the dataset path; same data → same deterministic
# centroids, so results are unchanged, only the redundant retraining
# goes away. Process-local by design (at scale this is a small file
# next to the index).
_CENTROIDS: dict[str, list[list[float]]] = {}


def trained_centroids(
    spark: SparkSession, sf_dir: str
) -> list[list[float]]:
    if sf_dir not in _CENTROIDS:
        emb = spread(load_table(spark, sf_dir, "embeddings")).select(
            "vec_id", "embedding"
        )
        _CENTROIDS[sf_dir] = lloyd_centroids(emb)
    return _CENTROIDS[sf_dir]


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embeddings table: deterministic init
    (the K_CLUSTERS lowest vec_ids' vectors), KM_ITERS fixed iterations.
    Returns (vec_id, cid, dist) — the cluster assignment used for
    semantic dedup buckets, topic balancing, and IVF coarse quantizers.

    Per iteration: centroids (k×d floats) collect to the driver and
    re-enter the plan as literals (broadcast-by-value, like MLlib);
    the update is one (cid, dim)-grain exact-DECIMAL aggregate —
    partial-aggregated map-side, so the shuffle carries k×d rows per
    partition and the fixpoint is partition-order-independent (see
    lloyd_centroids). Oracled since round 7: a DuckDB recursive CTE
    replays the identical init/assign/update loop and value-hashes
    (vec_id, cid, dist); tests additionally pin determinism and
    monotone inertia.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    centroids = trained_centroids(spark, sf_dir)
    if not centroids:
        return spark.createDataFrame(
            [], "vec_id bigint, cid int, dist double"
        )
    return _assign(emb, centroids).select(
        "vec_id", "cid", snap_round(F.col("dist"), 4).alias("dist")
    )


def lloyd_centroids(emb: DataFrame) -> list[list[float]]:
    """The trained centroids themselves (k×d floats on the driver) —
    reused by kmeans_embeddings and as the IVF coarse quantizer in
    similarity.ann_ivf_kmeans.

    Each centroid update sums EXACT DECIMALS: every float32 component
    is cast float→double (exact) →DECIMAL(26,8), and the per-(cid,
    dim) sum of those decimals is exact, so the update is independent
    of partition/arrival order — the pagerank trick (commit 0f8974c)
    applied to Lloyd's, which is what makes the fixpoint replayable by
    a DuckDB recursive-CTE oracle. The cast agreement was verified
    empirically: 0 mismatches over every component at sf0.01 AND sf0.1
    (the float→decimal cast WITHOUT the double hop diverges in the
    last digit — Spark uses the float's shortest repr, DuckDB the
    exact binary value). centroid = double(sum)/n in IEEE — identical
    on both engines given the identical sum. Residual cross-engine
    risk (same documented class as pagerank): an argmin between two
    near-exactly-equidistant centroids (~1e-13) could assign
    differently; no such tie exists in the fixtures.

    The shuffle per iteration carries (cid, dim)-grain partial-agg
    rows (k×d per task after map-side combine) — same O(k·d) driver
    traffic as the previous float-fold, now order-exact."""
    init = emb.orderBy("vec_id").limit(K_CLUSTERS).collect()
    if not init:
        # empty corpus slice: no centroids to train — consumers
        # early-return empty frames (not a crash)
        return []
    centroids = [list(r.embedding) for r in init]
    cached = emb.persist()
    try:
        for _ in range(KM_ITERS):
            parts = (
                _assign(cached, centroids)
                .select("cid", F.posexplode("embedding").alias("pos", "v"))
                .groupBy("cid", "pos")
                .agg(
                    F.sum(
                        F.col("v").cast("double").cast("decimal(26,8)")
                    ).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            new = {
                (r["cid"], r["pos"]): float(r["s"]) / r["n"]
                for r in parts
            }
            # empty clusters keep their previous centroid. Iterate
            # len(centroids), NOT K_CLUSTERS: a slice with 1..K-1 rows
            # trains that many centroids (init is the available rows)
            # — indexing centroids[K_CLUSTERS-1] would IndexError. The
            # oracle's init (QUALIFY k < K) caps the same way.
            centroids = [
                [
                    new.get((c, p), centroids[c][p])
                    for p in range(len(centroids[c]))
                ]
                for c in range(len(centroids))
            ]
    finally:
        cached.unpersist()
    return centroids


SEMDEDUP_COS = 0.35  # within-cell near-dup cosine threshold


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster embeddings with
    the trained k-means quantizer, then WITHIN each cell greedily keep
    a vector only if its cosine to every already-kept cell member is
    below SEMDEDUP_COS (vec_id order → deterministic). Near-dup
    semantics live entirely inside cells, so the pairwise work is
    n/k-bounded per cell instead of corpus-quadratic — the reason
    semantic dedup scales where brute-force pairwise cannot.

    The in-cell greedy pass is a grouped applyInPandas (numpy matmul
    per cell, Arrow-batched); everything before it is the k-means
    dataflow. Returns every vector with its cell, keep/drop flag, and
    the max cosine to the kept set that justified a drop.

    Oracled since round 7: the DuckDB oracle replays the k-means
    fixpoint (see _KMEANS_REC) and then the in-cell greedy as a second
    recursive CTE — one member per cell per iteration in vec_id order,
    the kept set carried as a LIST column, cosines summed as snapped
    DECIMAL terms (order-independent). Residual cross-engine risk: a
    max-cosine within ~1e-15 of SEMDEDUP_COS would flip a keep flag;
    no fixture pair is anywhere near that close to the threshold.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    cents = trained_centroids(spark, sf_dir)
    if not cents:
        return spark.createDataFrame(
            [],
            "vec_id bigint, cid int, kept boolean, max_cos_kept double",
        )
    assigned = _assign(emb, cents).select(
        "vec_id", "embedding", "cid"
    )

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        # errstate: a zero vector normalizes to a NaN row by IEEE
        # design; its cosines are undefined -> reported as NULL below
        with np.errstate(invalid="ignore", divide="ignore"):
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        kept_rows: list[int] = []
        kept, max_cos = [], []
        for i in range(len(pdf)):
            if kept_rows:
                sims = mat[kept_rows] @ mat[i]
                # FINITE max only: a zero vector's cosines are NaN —
                # plain max() would poison the whole cell after the
                # first zero-vector keep (NaN < threshold is False,
                # dropping every later member); undefined similarity
                # must neither block a keep nor justify a drop. SQL
                # max ignores NULLs the same way.
                finite = sims[np.isfinite(sims)]
                mc = float(finite.max()) if finite.size else None
            else:
                mc = 0.0
            ok = mc is None or mc < SEMDEDUP_COS
            if ok:
                kept_rows.append(i)
            kept.append(ok)
            # RAW cosine out of the Arrow task; the engine-portable
            # snap_round happens in the select below (Python round()
            # is banker's, F.round is HALF_UP — the recurring trap).
            # None (zero-vector member) -> NULL: no defined cosine.
            max_cos.append(mc)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cid": pdf["cid"],
                "kept": kept,
                "max_cos_kept": max_cos,
            }
        )

    return assigned.groupBy("cid").applyInPandas(
        dedup_cell,
        schema="vec_id long, cid int, kept boolean, max_cos_kept double",
    ).select(
        "vec_id",
        "cid",
        "kept",
        snap_round(F.col("max_cos_kept"), 4).alias("max_cos_kept"),
    )


DSIR_BUCKETS = 512       # hashed-feature space (scale knob)
LR_ITERS = 20       # fixed Adam iterations (deterministic plan count)
LR_RATE = 0.3       # Adam step size
LR_TARGET_LABEL = 0  # one-vs-rest positive class


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine quality-classifier training + corpus scoring: a
    logistic-regression LINEAR PROBE over the embedding column, fit by
    batch gradient descent against a weak binary label (embedding
    cluster == LR_TARGET_LABEL stands in for "looks like the curated
    target"), then every vector scored. This is the embed-then-linear-
    head quality-filter recipe of CCNet/GPT-3-era pipelines, with the
    head trained BY the engine instead of imported.

    Dataflow (MLlib's treeAggregate pattern): each optimizer iteration
    is one Arrow-batched partial-gradient pass — every batch emits a
    single (d+1)-dim sum row via mapInPandas (numpy matmul, no per-row
    Python), the driver reduces the ~n_partitions partials, then takes
    a class-balanced Adam step (the imbalance-robust choice for a rare
    "curated" class); driver traffic is O(d) per iteration, never
    rows. LR_ITERS is fixed, so the plan count is deterministic, and
    the per-iteration plan is constant-size (weights ride a closure
    broadcast — no literal-tree recompilation, the same trade
    ``_assign`` documents). Scoring is one final broadcast-weights
    pass. At 100 TB: train on a hash-sampled subset
    (`sample_hash_mod`), score the full corpus — the scoring pass
    below is already that shape.
    """
    w_final = train_linear_probe(spark, sf_dir)
    if w_final is None:
        return spark.createDataFrame(
            [],
            "vec_id bigint, label bigint, score double, pred bigint",
        )
    return score_linear_probe(_probe_inputs(spark, sf_dir), w_final)


def _probe_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        (F.col("label") == LR_TARGET_LABEL).cast("double").alias("y"),
        F.expr("transform(embedding, x -> cast(x AS double))").alias(
            "emb"
        ),
    )


_PROBE_WEIGHTS: dict[tuple, "object"] = {}


def _probe_cache_key(sf_dir: str) -> tuple:
    """Cache key for trained probe weights: (path, data fingerprint).
    The fingerprint folds in mtime+size of the embeddings fixture
    (file or directory of part-files), so rewriting the data at the
    same path invalidates the cache instead of silently reusing stale
    weights."""
    import os  # noqa: PLC0415

    p = os.path.join(sf_dir, "embeddings.parquet")
    parts: list[tuple[str, int, int]] = []
    try:
        if os.path.isdir(p):
            for root, dirs, files in os.walk(p):
                dirs.sort()  # deterministic traversal for nested layouts
                rel = os.path.relpath(root, p)
                for f in sorted(files):
                    st = os.stat(os.path.join(root, f))
                    parts.append(
                        (os.path.join(rel, f), st.st_mtime_ns, st.st_size)
                    )
        else:
            st = os.stat(p)
            parts.append(("", st.st_mtime_ns, st.st_size))
    except OSError:
        pass
    return (sf_dir, tuple(parts))


def clear_probe_cache() -> None:
    """Drop all cached probe weights (tests use this to force a real
    retrain when asserting determinism)."""
    _PROBE_WEIGHTS.clear()


def train_linear_probe(spark: SparkSession, sf_dir: str):
    """Distributed trainer behind ``quality_classifier`` (docstring
    there): class-balanced logistic gradient via Arrow-batched partial
    sums, Adam updates on the driver, O(d) traffic per iteration.
    Returns the (d+1) weight vector (bias last); cached per
    (sf_dir, data fingerprint) so batch scoring and the streaming
    scorer share one training run without ever serving stale weights
    after a rewrite."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    cache_key = _probe_cache_key(sf_dir)
    if cache_key in _PROBE_WEIGHTS:
        return _PROBE_WEIGHTS[cache_key]

    e = _probe_inputs(spark, sf_dir).persist()
    try:
        counts = e.agg(
            F.count("*").alias("n"), F.sum("y").alias("npos")
        ).collect()[0]
        n_total, n_pos = counts["n"], counts["npos"]
        if not n_total:
            # empty corpus slice: no probe to train — callers
            # early-return an empty scored frame (not a crash)
            _PROBE_WEIGHTS[cache_key] = None
            return None
        # class-balanced loss weights: each class contributes half the
        # total gradient mass regardless of its share of the corpus
        # max(.., 1): a single-class corpus slice (every doc passes or
        # every doc fails the heuristic label) makes one class empty —
        # the balanced weights degrade to plain weighting instead of a
        # driver-side ZeroDivisionError; on two-class data identical
        w_pos = n_total / (2.0 * max(n_pos, 1))
        w_neg = n_total / (2.0 * max(n_total - n_pos, 1))
        dim = len(e.select("emb").first()["emb"])
        w = np.zeros(dim + 1)  # bias last

        def grad_partials(w_vec: np.ndarray):
            def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    x = np.stack(pdf["emb"].to_numpy())
                    y = pdf["y"].to_numpy()
                    z = x @ w_vec[:-1] + w_vec[-1]
                    p = 1.0 / (1.0 + np.exp(-z))
                    err = (p - y) * np.where(y == 1.0, w_pos, w_neg)
                    g = np.concatenate([err @ x, [err.sum()]])
                    yield pd.DataFrame({"j": range(len(g)), "g": g})

            return f

        schema = "j long, g double"
        m = np.zeros(dim + 1)
        v = np.zeros(dim + 1)
        b1, b2, eps = 0.9, 0.999, 1e-8
        for it in range(1, LR_ITERS + 1):
            parts = (
                e.select("emb", "y")
                .mapInPandas(grad_partials(w), schema)
                .groupBy("j")
                .agg(F.sum("g").alias("g"))
                .collect()
            )
            g = np.zeros(dim + 1)
            for r in parts:
                g[r["j"]] = r["g"]
            g /= n_total
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            m_hat = m / (1 - b1**it)
            v_hat = v / (1 - b2**it)
            w = w - LR_RATE * m_hat / (np.sqrt(v_hat) + eps)

        _PROBE_WEIGHTS[cache_key] = w
        return w
    finally:
        e.unpersist()


def score_linear_probe(e: DataFrame, w_final) -> DataFrame:
    """Stateless broadcast-weights scoring pass over (vec_id, y, emb)
    rows — works identically on a batch DataFrame and a streaming one
    (train-offline / serve-online)."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf["emb"].to_numpy())
            z = x @ w_final[:-1] + w_final[-1]
            p = 1.0 / (1.0 + np.exp(-z))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["y"].astype("int64"),
                    "score": np.round(p, 4),
                    "pred": (p >= 0.5).astype("int64"),
                }
            )

    return e.mapInPandas(
        score, "vec_id long, label long, score double, pred long"
    )


BPE_MERGES = 8  # merge rules learned (fixed → deterministic plan count)
_VOCAB_ROWS_PER_TASK = 100_000  # per-task vocab slice for BPE rounds
# Driver fast path: a vocabulary at or under this many distinct words
# is collected and merged in pure Python (the corpus-side explode +
# word-count stays distributed; the O(vocab·merges) loop runs where a
# tiny working set is cheapest — the same bounded-collect pattern as
# k×d k-means centroids or the PQ training sample). Above it, the
# distributed fold loop runs — identical rules, pinned by a test that
# forces both paths on the same corpus.
BPE_DRIVER_VOCAB_MAX = 65_536


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016): learn
    the first BPE_MERGES merge rules from the corpus. Each iteration
    counts adjacent symbol pairs across the WORD-grain vocabulary
    (occurrence-weighted), picks the most frequent pair (ties broken
    count-desc, then lexicographically — deterministic), and rewrites
    the vocabulary with that pair merged via a left-to-right codegen
    fold. Returns the merge table — the tokenizer artifact every
    in-house data pipeline ends up training on its own corpus.

    Scale posture: the corpus collapses to word-grain counts in ONE
    occurrence shuffle up front; every subsequent iteration works on
    the vocabulary frame (|vocab| rows, Zipf-bounded ≪ corpus), pair
    counts partial-agg map-side, and the driver sees ONE argmax row
    per iteration (max_by aggregate — no sort, no top-k exchange).
    Lineage is truncated per iteration (localCheckpoint) so the plan
    stays constant-size across merges. The merge list itself is O(1).

    Small-vocabulary fast path: when the word-grain vocabulary fits
    BPE_DRIVER_VOCAB_MAX rows, the merge loop runs in pure Python on
    the collected vocab instead of paying BPE_MERGES rounds of Spark
    job latency over a near-empty frame (measured 2.9s → 0.4s at
    sf0.1, where the synthetic corpus has 31 distinct words). The two
    paths learn IDENTICAL rules — same counts, same tie-break —
    pinned by a test that forces both on the same corpus.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    word_counts = (
        d.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    return _bpe_merges_from_counts(spark, word_counts)


def _bpe_merges_from_counts(
    spark: SparkSession, word_counts: DataFrame
) -> DataFrame:
    """The BPE merge loop over a precomputed (word, cnt) frame — split
    out so consumers that already paid a corpus word-count shuffle
    (``bpe_segment``'s per-source rollup) can train the rules off it
    instead of scanning the corpus a second time."""
    vocab = word_counts.select(
        F.expr("transform(split(word, ''), x -> x)").alias("s"),
        "cnt",
    ).filter(F.size("s") > 0)
    # Size-probe with ONE bounded action (round-10 optimization pass):
    # head(MAX + 1) either returns the ENTIRE vocabulary (≤ MAX rows →
    # the driver fast-path already has every row it needs, no
    # checkpoint, no count, no second collect — the old sequence paid
    # three near-empty jobs here) or proves the vocabulary is big, in
    # which case the distributed loop pays the checkpoint it actually
    # needs. The Python merge loop is row-order independent (Counter
    # accumulation + explicit (count desc, pair asc) tie-break), so
    # head()'s partition order is as good as collect()'s.
    probe = vocab.head(BPE_DRIVER_VOCAB_MAX + 1)
    if len(probe) <= BPE_DRIVER_VOCAB_MAX:
        rows = [(tuple(r["s"]), int(r["cnt"])) for r in probe]
        merges = _bpe_merge_rules_python(rows, BPE_MERGES)
        return _merges_df(spark, merges)
    vocab = vocab.localCheckpoint()
    n_vocab = vocab.count()
    # Distributed path: right-size the iteration frame — the vocab
    # inherits the corpus groupBy's full shuffle width, so without a
    # coalesce each fixed round schedules a full task fan-out over
    # near-empty partitions.
    vocab = vocab.coalesce(max(1, n_vocab // _VOCAB_ROWS_PER_TASK + 1))
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, BPE_MERGES + 1):
        # size >= 2 guard PLUS a total expression: Spark's sequence()
        # runs DESCENDING when the stop is below the start, and
        # optimizer-inferred generator filters can evaluate hoisted
        # subexpressions before the guard short-circuits (see the
        # ngram_jaccard_pairs note) — greatest() keeps the sequence
        # ascending and try_element_at keeps the i + 1 probe total on
        # the size-1 words the filter discards
        pairs = vocab.filter(F.size("s") >= 2).select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(s) - 1, 1)), "
                    "i -> struct(try_element_at(s, i) AS l, "
                    "try_element_at(s, i + 1) AS r))"
                )
            ).alias("p"),
            "cnt",
        ).groupBy("p.l", "p.r").agg(F.sum("cnt").alias("pc"))
        best = pairs.agg(
            F.min(F.struct((-F.col("pc")).alias("neg"), "l", "r")).alias(
                "b"
            )
        ).collect()[0]["b"]
        if best is None:
            # corpus exhausted its adjacent pairs before BPE_MERGES
            # iterations (all-single-char words, or fully merged):
            # return the merges learned so far instead of crashing on
            # the NULL argmax struct
            break
        left, right, count = best["l"], best["r"], -best["neg"]
        merges.append((rank, left, right, int(count)))
        # left-to-right adjacent-pair merge as a codegen fold: append
        # each symbol unless it completes the (l, r) pair with the
        # accumulator's tail, in which case the tail is replaced by the
        # merged symbol (standard leftmost-first BPE semantics)
        vocab = vocab.select(
            F.expr(_merge_fold_sql("s", left, right)).alias("s"),
            "cnt",
        ).localCheckpoint()
    return _merges_df(spark, merges)


def _bpe_merge_rules_python(
    vocab: list[tuple[tuple[str, ...], int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Reference-exact BPE merge loop over an in-memory vocabulary:
    same occurrence-weighted counts and (count desc, pair asc)
    tie-break as the distributed fold path."""
    from collections import Counter  # noqa: PLC0415

    work = Counter()
    for sym, cnt in vocab:
        work[tuple(sym)] += cnt
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for sym, cnt in work.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (left, right), count = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, int(count)))
        new_work: Counter = Counter()
        for sym, cnt in work.items():
            out: list[str] = []
            for x in sym:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            new_work[tuple(out)] += cnt
        work = new_work
    return merges


def _merges_df(
    spark: SparkSession, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    ).select(
        "rank",
        "left",
        "right",
        F.concat("left", "right").alias("merged"),
        "pair_count",
    )


def _sql_str(s: str) -> str:
    """Escape a symbol for embedding in a Spark SQL single-quoted
    string literal: backslashes FIRST (else the quote-escape's own
    backslash would be doubled), then single quotes."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_fold_sql(inner: str, left: str, right: str) -> str:
    """One BPE merge applied to the symbol-array expression ``inner``
    as a left-to-right adjacent-pair fold (leftmost-first semantics)."""
    l_sql = _sql_str(left)
    r_sql = _sql_str(right)
    m_sql = _sql_str(left + right)
    return (
        f"aggregate({inner}, cast(array() AS array<string>), "
        "(acc, x) -> IF(size(acc) > 0 AND "
        f"element_at(acc, -1) = '{l_sql}' AND x = '{r_sql}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{m_sql}')), "
        "concat(acc, array(x))))"
    )


def bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the engine-trained BPE merge table to segment the corpus
    and report per-source tokenization stats (token count, tokens per
    word, chars per token — the compression numbers that decide
    whether a tokenizer fits a corpus). The trainer↔consumer pair
    mirrors quality_classifier/streaming_quality_scores: train once,
    apply everywhere.

    Scale posture: segmentation runs once per DISTINCT word (vocab
    grain, Zipf-bounded ≪ corpus) as BPE_MERGES chained codegen folds;
    the corpus word stream then broadcast-joins the segmented vocab
    (vocab ≪ corpus, the unigram_surprisal trade) and reduces per
    source. The merge list itself is O(BPE_MERGES) driver rows."""
    d = spread(load_table(spark, sf_dir, "documents"))
    # occurrence-weighted rollup: the corpus collapses to
    # (source, word, n_occ) in its ONE shuffle; segmentation folds run
    # once per (source, word) — Zipf-bounded — and the final stats are
    # weighted sums, so nothing downstream of the first aggregate is
    # corpus-sized (previously the vocab join ran at exploded-word
    # grain: identical results, one corpus-sized join more)
    wc = (
        d.select(
            "source",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word"),
        )
        .filter(F.length("word") > 0)
        .groupBy("source", "word")
        .agg(F.count("*").alias("n_occ"))
        # lazy: materializes inside the trainer's vocabulary probe (the
        # first action over this frame) instead of as its own job; the
        # checkpoint still makes the rollup run once for its two
        # consumers (trainer + segmentation) and keeps the fold plan's
        # lineage flat (round-10 optimization pass)
        .localCheckpoint(eager=False)
    )
    # train the rules off the SAME rollup (summed over source) — the
    # trainer's word counts are identical, and the corpus is scanned
    # exactly once instead of once per role
    vocab_counts = wc.groupBy("word").agg(F.sum("n_occ").alias("cnt"))
    rules = [
        (r["left"], r["right"])
        for r in _bpe_merges_from_counts(spark, vocab_counts)
        .orderBy("rank")
        .collect()
    ]
    expr = "ws"
    for left, right in rules:
        expr = _merge_fold_sql(expr, left, right)
    per_word = wc.select(
        "source",
        "n_occ",
        F.expr("transform(split(word, ''), x -> x)").alias("ws"),
        F.length("word").cast("long").alias("n_chars"),
    ).select(
        "source",
        "n_occ",
        F.size(F.expr(expr)).cast("long").alias("n_tokens"),
        "n_chars",
    )
    return per_word.groupBy("source").agg(
        F.sum("n_occ").alias("n_words"),
        F.sum(F.col("n_occ") * F.col("n_tokens")).alias("n_tokens"),
        snap_round(
            F.sum(F.col("n_occ") * F.col("n_tokens"))
            / nz(F.sum("n_occ")),
            4,
        ).alias("tokens_per_word"),
        snap_round(
            F.sum(F.col("n_occ") * F.col("n_chars"))
            / nz(F.sum(F.col("n_occ") * F.col("n_tokens"))),
            4,
        ).alias("chars_per_token"),
    )


DSIR_TARGET_LANG = "en"  # the distribution we select TOWARD


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the log-likelihood ratio of a hashed-unigram model of the
    TARGET distribution (here lang = 'en' docs stand in for the
    high-quality target) against the RAW corpus model. High scores =
    documents that look like the target; downstream sampling keeps
    documents proportionally (the resampling step is ``weighted_sample``
    / ``mix_sources_weighted``).

    Dataflow: one token explode -> one DSIR_BUCKETS-cardinality count
    aggregate building BOTH models in a single pass (count + count-if-
    target) -> add-1-smoothed log-ratio per bucket -> broadcast the
    DSIR_BUCKETS-row weight table back onto the token stream -> per-doc
    sum. Two shuffles total (bucket agg, doc agg), both map-side
    combined; the weight table is O(buckets), never corpus-sized.

    Determinism across engines: the log-ratio is quantized ONCE per
    bucket — round(ln(ratio), 6) cast to DECIMAL(12,6) — so the
    per-document score is an exact decimal sum (order-independent),
    converted to double only at the end. Hashing is the md5-portable
    slice used by shard_assignment so Spark and the oracle bucket
    identically.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .select(
            "doc_id",
            "lang",
            F.pmod(
                F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast(
                    "long"
                ),
                F.lit(DSIR_BUCKETS),
            ).alias("b"),
        )
    )
    is_tgt = (F.col("lang") == DSIR_TARGET_LANG).cast("long")
    # bucket-grain (DSIR_BUCKETS rows) — persisted because the model
    # totals below derive from it; before round 10 `totals` re-ran the
    # whole corpus tokenize as a third scan, yet Σ_b n_raw IS tot_raw
    # exactly (integer sums over a partition of the token stream)
    counts = toks.groupBy("b").agg(
        F.count("*").alias("n_raw"),
        F.sum(is_tgt).alias("n_tgt"),
    ).persist()
    totals = counts.agg(
        F.sum("n_raw").alias("tot_raw"),
        F.sum("n_tgt").alias("tot_tgt"),
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log(
                ((F.col("n_tgt") + 1) / (F.col("tot_tgt") + DSIR_BUCKETS))
                / ((F.col("n_raw") + 1) / (F.col("tot_raw") + DSIR_BUCKETS))
            ),
            6,
        )
        .cast("decimal(12,6)")
        .alias("w"),
    )
    return (
        toks.join(F.broadcast(weights), on="b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("w").cast("double").alias("dsir_logratio"),
        )
    )


PCA_K = 16       # retained components (64 -> 16: 4x cheaper ANN)
PCA_EPS = 1e-6   # whitening ridge: keeps 1/sqrt(lambda) finite


def pca_moments(emb: DataFrame) -> tuple:
    """One distributed pass over the embeddings producing the exact
    sufficient statistics of PCA: row count n, coordinate sum s (d),
    and the raw second-moment (Gram) matrix G = X^T X (d x d).

    Scale posture: per-Arrow-batch numpy partials (one m.T @ m per
    batch — BLAS, not per-row Python), reduced IN-ENGINE by an
    element-wise zip_with fold to a single row before collect, so
    driver traffic is O(d^2) regardless of partition count — the same
    two-level combine lloyd_centroids uses. At d=64 the collected
    payload is 4096 doubles; nothing row-scaled ever reaches the
    driver."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    probe = emb.select("embedding").limit(1).collect()
    if not probe:
        # empty corpus slice — callers early-return on n == 0
        return 0, None, None
    dim = len(probe[0].embedding)

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(m)],
                    "s": [m.sum(0).tolist()],
                    "g": [(m.T @ m).ravel().tolist()],
                }
            )

    row = (
        emb.mapInPandas(
            partials, schema="n long, s array<double>, g array<double>"
        )
        .agg(
            F.sum("n").alias("n"),
            F.aggregate(
                F.collect_list("s"),
                F.array_repeat(F.lit(0.0), dim),
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            ).alias("s"),
            F.aggregate(
                F.collect_list("g"),
                F.array_repeat(F.lit(0.0), dim * dim),
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            ).alias("g"),
        )
        .collect()[0]
    )
    n = int(row.n)
    s = np.asarray(row.s)
    g = np.asarray(row.g).reshape(dim, dim)
    return n, s, g


def pca_whiten_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA whitening of the embedding table — the standard projection
    step before indexing/clustering (Jégou & Chum 2012 showed whitening
    fixes co-occurrence over-counting in retrieval): project each
    vector onto the top-PCA_K eigenvectors of the sample covariance and
    rescale each coordinate to unit variance.

    Spark-first dataflow: ONE pass builds exact (n, sum, Gram)
    sufficient statistics (pca_moments — in-engine two-level combine,
    O(d^2) to the driver); the d x d eigendecomposition runs on the
    driver with numpy (d=64 — never data-scaled); the resulting d x k
    whitening matrix is closed over (Spark broadcasts it with the task)
    and applied map-only via one BLAS matmul per Arrow batch. No
    shuffle touches the projection itself.

    Determinism: eigh on the same float64 covariance is deterministic;
    eigenvector sign is fixed by making each component's
    largest-magnitude coordinate positive. NO_ORACLE (eigensolve is not
    SQL-expressible) — pinned against an independent pure-numpy PCA of
    the same rows plus whitened-covariance/orthogonality invariants in
    tests/test_llm.py."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    n, s, g = pca_moments(emb)
    if not n:
        return spark.createDataFrame(
            [], "vec_id bigint, label int, proj array<double>"
        )
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # enforce exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:PCA_K]
    lam = evals[order]
    v = evecs[:, order]
    # sign convention: largest-|coordinate| of each component positive
    flip = np.sign(v[np.abs(v).argmax(axis=0), np.arange(v.shape[1])])
    v = v * flip[None, :]
    w = v / np.sqrt(lam + PCA_EPS)[None, :]

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            z = (m - mean[None, :]) @ w
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "proj": list(z),
                }
            )

    return emb.mapInPandas(
        project, schema="vec_id long, label int, proj array<double>"
    )


KCENTER_K = 16  # coreset size


def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-Center-Greedy coreset selection (Sener & Savarese 2018,
    "Active Learning for CNNs: A Core-Set Approach"): iteratively pick
    the vector farthest from the already-selected set, KCENTER_K
    times — the diversity-maximizing data-selection primitive
    (2-approximation of the k-center cover radius) used to choose
    representative training subsets from embedding space.

    Spark shape per round: ONE map-only Arrow pass computes each
    vector's distance to the single newest center (running min-distance
    carried in-plan as a column, so round r does O(n·d) work, not
    O(n·r·d)), then an output-sized global top-1 argmax (ties to the
    lower vec_id). Driver traffic is one (id, distance) row per round;
    centers are closed over per task. Lineage is truncated per round
    with localCheckpoint like the other iterative operators. Output:
    the selected coreset in pick order with each pick's covering
    radius (the max-min distance at selection time — monotonically
    non-increasing). Seeded deterministically at the lowest vec_id.

    Oracled since round 7: a DuckDB recursive CTE replays the greedy —
    one pick per iteration, per-point min-distance carried as state,
    distances as exact-decimal term sums (residual: a farthest-point
    tie within ~1e-15 could pick differently; none exists in the
    fixtures). Additionally pinned equal to an independent pure-numpy
    k-center-greedy run in tests/test_llm.py."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    seeds = emb.orderBy("vec_id").limit(1).collect()
    if not seeds:
        # empty corpus slice: nothing to select — not a crash
        return spark.createDataFrame(
            [], "pick int, vec_id bigint, radius double"
        )
    seed = seeds[0]
    picks = [(int(seed.vec_id), 0.0)]
    state = emb.select(
        "vec_id",
        "embedding",
        F.lit(float("inf")).alias("mind"),
    ).localCheckpoint()
    for _ in range(KCENTER_K - 1):
        c = np.asarray(
            [
                r.embedding
                for r in state.filter(
                    F.col("vec_id") == picks[-1][0]
                ).collect()
            ][0],
            dtype=np.float64,
        )

        def update(batches, c=c):
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf["embedding"].to_numpy()).astype(
                    np.float64
                )
                d = np.sqrt(((m - c[None, :]) ** 2).sum(1))
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "embedding": pdf["embedding"],
                        "mind": np.minimum(pdf["mind"].to_numpy(), d),
                    }
                )

        state = state.mapInPandas(
            update,
            schema="vec_id long, embedding array<float>, mind double",
        ).localCheckpoint()
        # argmax over NOT-yet-selected points only: with n < KCENTER_K
        # the loop would otherwise re-pick covered points forever
        cand = (
            state.filter(
                ~F.col("vec_id").isin([v for v, _ in picks])
            )
            .orderBy(F.desc("mind"), "vec_id")
            .limit(1)
            .collect()
        )
        if not cand:
            break
        far = cand[0]
        picks.append((int(far.vec_id), float(far.mind)))
    return spark.createDataFrame(
        [(i, vid, r) for i, (vid, r) in enumerate(picks)],
        "pick int, vec_id long, radius double",
    ).select(
        "pick",
        "vec_id",
        # snap_round, not Python round(): banker's vs HALF_UP — the
        # recurring trap; also what lets the oracle share the rule
        snap_round(F.col("radius"), 6).alias("radius"),
    )


MAHA_TOP = 25  # reported strongest outliers


def mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outlier detection on the embedding table: squared
    Mahalanobis distance of every vector from the corpus mean under the
    sample covariance — the classical gate for corrupt/degenerate
    embeddings before they poison ANN indexes or k-means seeds (a
    chi-square(d) tail test in the Gaussian model).

    Reuses pca_moments' one-pass exact sufficient statistics (O(d^2)
    driver traffic); the d x d precision matrix is a driver-side
    ridge-regularized inverse (PCA_EPS on the diagonal — also makes the
    inverse well-defined if some direction is degenerate), then one
    map-only pass scores every vector with two BLAS ops per Arrow
    batch. Output: the MAHA_TOP strongest outliers (global top-k over a
    scalar score — output-sized, TakeOrderedAndProject, no global
    sort). NO_ORACLE (matrix inverse is not SQL-expressible) — pinned
    1e-6-equal to an independent pure-numpy computation in
    tests/test_llm.py."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    n, s, g = pca_moments(emb)
    if not n:
        return spark.createDataFrame(
            [], "vec_id bigint, label int, maha_sq double"
        )
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0 + PCA_EPS * np.eye(len(mean))
    prec = np.linalg.inv(cov)
    prec = (prec + prec.T) / 2.0

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            c = m - mean[None, :]
            d2 = np.einsum("ij,jk,ik->i", c, prec, c)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "maha_sq": np.round(d2, 8),
                }
            )

    scored = emb.mapInPandas(
        score, schema="vec_id long, label int, maha_sq double"
    )
    return scored.orderBy(
        F.col("maha_sq").desc(), "vec_id"
    ).limit(MAHA_TOP)


QUERIES = {
    "shard_assignment": shard_assignment,
    "epoch_shuffle": epoch_shuffle,
    "quality_classifier": quality_classifier,
    "bpe_merges": bpe_merges,
    "bpe_segment": bpe_segment,
    "kmeans_embeddings": kmeans_embeddings,
    "semantic_dedup": semantic_dedup,
    "dsir_importance": dsir_importance,
    "pca_whiten_embeddings": pca_whiten_embeddings,
    "mahalanobis_outliers": mahalanobis_outliers,
    "kcenter_coreset": kcenter_coreset,
}

# Recursive-CTE replay of Lloyd's k-means (VERDICT r6 item 2): because
# the Spark side accumulates centroid updates in exact DECIMAL (see
# lloyd_centroids), the fixpoint is partition-order-independent and
# DuckDB can replay it: init = the K lowest vec_ids' vectors, then per
# iteration an argmin assignment (squared L2 summed as snapped
# DECIMAL(38,30) terms — order-independent inside DuckDB too) and an
# exact-DECIMAL(26,8) per-(cid, dim) mean. Shared by the
# kmeans_embeddings and semantic_dedup oracles. Residual risk
# (pagerank class, documented in lloyd_centroids): a near-exact
# equidistant argmin tie could flip an assignment.
_KMEANS_REC = f"""
    WITH RECURSIVE
    e AS MATERIALIZED (
        SELECT vec_id, u.u.i::BIGINT - 1 AS pos,
               CAST(u.u.c AS DOUBLE) AS x
        FROM (SELECT vec_id,
                     unnest(list_transform(embedding,
                            (c, i) -> {{'c': c, 'i': i}})) AS u
              FROM embeddings) u
    ),
    init AS MATERIALIZED (
        SELECT CAST(0 AS BIGINT) AS it,
               dense_rank() OVER (ORDER BY vec_id) - 1 AS cid,
               pos, x AS c
        FROM e
        WHERE vec_id IN (SELECT vec_id FROM embeddings
                         ORDER BY vec_id LIMIT {K_CLUSTERS})
    ),
    rec AS (
        SELECT * FROM init
        UNION ALL
        SELECT z.* FROM (
            WITH cur AS MATERIALIZED (
                SELECT * FROM rec WHERE it < {KM_ITERS}
            ),
            asg AS MATERIALIZED (
                SELECT vec_id, cid FROM (
                    SELECT d.vec_id, d.cid,
                           row_number() OVER (
                               PARTITION BY d.vec_id
                               ORDER BY d.d2, d.cid
                           ) AS rk
                    FROM (
                        SELECT e.vec_id, cur.cid,
                               sum(CAST((e.x - cur.c) * (e.x - cur.c)
                                   AS DECIMAL(38,30))) AS d2
                        FROM e JOIN cur ON cur.pos = e.pos
                        GROUP BY e.vec_id, cur.cid
                    ) d
                ) r WHERE rk = 1
            ),
            upd AS MATERIALIZED (
                SELECT a.cid, e.pos,
                       CAST(sum(CAST(CAST(e.x AS DOUBLE)
                                AS DECIMAL(26,8)))
                            AS DOUBLE) / count(*) AS cnew
                FROM e JOIN asg a USING (vec_id)
                GROUP BY a.cid, e.pos
            )
            SELECT cur.it + 1 AS it, cur.cid, cur.pos,
                   COALESCE(u.cnew, cur.c) AS c
            FROM cur LEFT JOIN upd u
                   ON u.cid = cur.cid AND u.pos = cur.pos
        ) z
    ),
    fin AS MATERIALIZED (SELECT cid, pos, c FROM rec WHERE it = {KM_ITERS}),
    d2f AS MATERIALIZED (
        SELECT d.vec_id, d.cid, d.d2,
               row_number() OVER (
                   PARTITION BY d.vec_id ORDER BY d.d2, d.cid) AS rk
        FROM (
            SELECT e.vec_id, fin.cid,
                   sum(CAST((e.x - fin.c) * (e.x - fin.c)
                       AS DECIMAL(38,30))) AS d2
            FROM e JOIN fin ON fin.pos = e.pos
            GROUP BY e.vec_id, fin.cid
        ) d
    ),
    asgf AS MATERIALIZED (
        SELECT vec_id, cid, d2 FROM d2f WHERE rk = 1
    )
"""

# Recursive-CTE replay of the BPE trainer (VERDICT r6 item 2): the
# greedy merge loop is a unique fixpoint — integer pair counts, total
# (count DESC, l, r) tie-break, leftmost-first rewrite — so DuckDB can
# replay it exactly. One recursion step per merge; the rewrite's
# leftmost-first overlap semantics (e.g. 'aaaa' + (a,a) -> [aa, aa])
# are the gaps-and-islands parity rule: within each maximal run of
# consecutive match positions, merges land on every EVEN offset.
_BPE_REC = f"""
    WITH RECURSIVE
    wc AS MATERIALIZED (
        SELECT source, word, count(*)::BIGINT AS n_occ
        FROM (SELECT source,
                     unnest(string_split_regex(lower(text), '\\s+'))
                         AS word
              FROM documents) t
        WHERE length(word) > 0
        GROUP BY source, word
    ),
    words AS MATERIALIZED (
        SELECT word, sum(n_occ)::BIGINT AS cnt,
               row_number() OVER (ORDER BY word)::BIGINT AS wid
        FROM wc GROUP BY word
    ),
    init AS MATERIALIZED (
        SELECT CAST(0 AS BIGINT) AS it, wid, cnt,
               u.u.i::BIGINT AS pos, u.u.c AS sym,
               CAST(NULL AS VARCHAR) AS l, CAST(NULL AS VARCHAR) AS r,
               CAST(NULL AS BIGINT) AS pc
        FROM (SELECT wid, cnt,
                     unnest(list_transform(string_split(word, ''),
                            (c, i) -> {{'c': c, 'i': i}})) AS u
              FROM words) u
    ),
    rec AS (
        SELECT * FROM init
        UNION ALL
        SELECT z.* FROM (
            WITH cur AS MATERIALIZED (
                SELECT * FROM rec WHERE it < {BPE_MERGES}
            ),
            adj AS MATERIALIZED (
                SELECT a.wid, a.pos AS i, a.sym AS l, b.sym AS r, a.cnt
                FROM cur a
                JOIN cur b ON b.wid = a.wid AND b.pos = a.pos + 1
            ),
            best AS MATERIALIZED (
                SELECT l, r, sum(cnt)::BIGINT AS pc
                FROM adj GROUP BY l, r
                ORDER BY pc DESC, l, r LIMIT 1
            ),
            kept AS MATERIALIZED (
                SELECT wid, i
                FROM (
                    SELECT wid, i,
                           (i - min(i) OVER (PARTITION BY wid, grp))
                               % 2 = 0 AS k
                    FROM (
                        SELECT m.wid, m.i,
                               m.i - row_number() OVER (
                                   PARTITION BY m.wid ORDER BY m.i
                               ) AS grp
                        FROM adj m, best b
                        WHERE m.l = b.l AND m.r = b.r
                    ) g
                ) kk WHERE k
            )
            SELECT nxt.it, nxt.wid, nxt.cnt,
                   row_number() OVER (
                       PARTITION BY nxt.wid ORDER BY nxt.pos
                   )::BIGINT AS pos,
                   nxt.sym, nxt.l, nxt.r, nxt.pc
            FROM (
                SELECT cur.it + 1 AS it, cur.wid, cur.cnt, cur.pos,
                       CASE WHEN km.i IS NOT NULL THEN b.l || b.r
                            ELSE cur.sym END AS sym,
                       b.l, b.r, b.pc
                FROM cur
                CROSS JOIN best b
                LEFT JOIN kept km
                       ON km.wid = cur.wid AND km.i = cur.pos
                LEFT JOIN kept kd
                       ON kd.wid = cur.wid AND kd.i = cur.pos - 1
                WHERE kd.i IS NULL
            ) nxt
        ) z
    )
"""

_KCENTER_REC = f"""
    WITH RECURSIVE
    e AS MATERIALIZED (
        SELECT vec_id, u.u.i::BIGINT - 1 AS pos,
               CAST(u.u.c AS DOUBLE) AS x
        FROM (SELECT vec_id,
                     unnest(list_transform(embedding,
                            (c, i) -> {{'c': c, 'i': i}})) AS u
              FROM embeddings) u
    ),
    gre AS (
        SELECT CAST(0 AS BIGINT) AS it, e0.vec_id,
               'infinity'::DOUBLE AS mind,
               e0.vec_id = s.seed AS picked,
               s.seed AS pick_vid, 0.0::DOUBLE AS pick_radius
        FROM (SELECT DISTINCT vec_id FROM e) e0,
             (SELECT min(vec_id) AS seed FROM e) s
        UNION ALL
        SELECT z.* FROM (
            WITH st AS MATERIALIZED (
                SELECT * FROM gre WHERE it < {KCENTER_K - 1}
            ),
            ctr AS MATERIALIZED (
                SELECT pos, x FROM e
                WHERE vec_id = (SELECT max(pick_vid) FROM st)
            ),
            nd AS MATERIALIZED (
                SELECT st.it, st.vec_id,
                       least(st.mind, sqrt(CAST(dd.dsum AS DOUBLE)))
                           AS mind,
                       st.picked
                FROM st JOIN (
                    SELECT e.vec_id,
                           sum(CAST((e.x - ctr.x) * (e.x - ctr.x)
                               AS DECIMAL(38,30))) AS dsum
                    FROM e JOIN ctr USING (pos)
                    GROUP BY e.vec_id
                ) dd ON dd.vec_id = st.vec_id
            ),
            pick AS MATERIALIZED (
                SELECT vec_id AS pv, mind AS pr FROM nd
                WHERE NOT picked
                ORDER BY mind DESC, vec_id LIMIT 1
            )
            SELECT nd.it + 1 AS it, nd.vec_id, nd.mind,
                   nd.picked OR nd.vec_id = p.pv AS picked,
                   p.pv AS pick_vid, p.pr AS pick_radius
            FROM nd, pick p
        ) z
    )
"""

ORACLES = {
    "kcenter_coreset": _KCENTER_REC + """
        SELECT DISTINCT it::INT AS pick, pick_vid AS vec_id,
               CAST(round(CAST(pick_radius AS DECIMAL(18,8)), 6)
                    AS DOUBLE) AS radius
        FROM gre
    """,
    "kmeans_embeddings": _KMEANS_REC + """
        SELECT vec_id, cid::INT AS cid,
               CAST(round(CAST(greatest(CAST(d2 AS DOUBLE), 0.0)
                    AS DECIMAL(18,8)), 4) AS DOUBLE) AS dist
        FROM asgf
    """,
    "semantic_dedup": _KMEANS_REC + f"""
        , mem AS MATERIALIZED (
            SELECT vec_id, cid,
                   row_number() OVER (
                       PARTITION BY cid ORDER BY vec_id)::BIGINT AS rk
            FROM asgf
        ),
        nrm AS MATERIALIZED (
            SELECT vec_id,
                   sqrt(CAST(sum(CAST(x * x AS DECIMAL(38,30)))
                        AS DOUBLE)) AS nrm
            FROM e GROUP BY vec_id
        ),
        un AS MATERIALIZED (
            SELECT e.vec_id, e.pos, e.x / n.nrm AS ux
            FROM e JOIN nrm n USING (vec_id)
        ),
        gre AS (
            SELECT 1::BIGINT AS it, cid, vec_id, TRUE AS kept,
                   0.0::DOUBLE AS mc, [vec_id] AS kept_ids
            FROM mem WHERE rk = 1
            UNION ALL
            SELECT g.it + 1, g.cid, m.vec_id,
                   mx.mc < {SEMDEDUP_COS} AS kept, mx.mc,
                   CASE WHEN mx.mc < {SEMDEDUP_COS}
                        THEN list_append(g.kept_ids, m.vec_id)
                        ELSE g.kept_ids END
            FROM gre g
            JOIN mem m ON m.cid = g.cid AND m.rk = g.it + 1
            CROSS JOIN LATERAL (
                SELECT max(CAST(s.p AS DOUBLE)) AS mc FROM (
                    SELECT sum(CAST(a.ux * b.ux AS DECIMAL(38,30)))
                        AS p
                    FROM unnest(g.kept_ids) AS kl(k)
                    JOIN un a ON a.vec_id = kl.k
                    JOIN un b ON b.vec_id = m.vec_id
                            AND b.pos = a.pos
                    GROUP BY kl.k
                ) s
            ) mx
        )
        SELECT vec_id, cid::INT AS cid, kept,
               CAST(round(CAST(mc AS DECIMAL(18,8)), 4) AS DOUBLE)
                   AS max_cos_kept
        FROM gre
    """,
    "bpe_merges": _BPE_REC + """
        SELECT DISTINCT it AS rank, l AS "left", r AS "right",
               l || r AS merged, pc AS pair_count
        FROM rec WHERE it >= 1
    """,
    "bpe_segment": _BPE_REC + """
        , final AS MATERIALIZED (
            SELECT wid, count(*)::BIGINT AS n_tokens
            FROM rec WHERE it = (SELECT max(it) FROM rec)
            GROUP BY wid
        )
        SELECT wc.source,
               sum(wc.n_occ)::BIGINT AS n_words,
               sum(wc.n_occ * f.n_tokens)::BIGINT AS n_tokens,
               CAST(round(CAST(
                   sum(wc.n_occ * f.n_tokens)::DOUBLE / sum(wc.n_occ)
                   AS DECIMAL(18,8)), 4) AS DOUBLE) AS tokens_per_word,
               CAST(round(CAST(
                   sum(wc.n_occ * length(w.word))::DOUBLE
                   / sum(wc.n_occ * f.n_tokens)
                   AS DECIMAL(18,8)), 4) AS DOUBLE) AS chars_per_token
        FROM wc
        JOIN words w USING (word)
        JOIN final f ON f.wid = w.wid
        GROUP BY wc.source
    """,
    "dsir_importance": f"""
        WITH toks AS (
            SELECT doc_id,
                   (lang = '{DSIR_TARGET_LANG}')::BIGINT AS is_tgt,
                   ('0x' || substr(md5(tok), 1, 15))::BIGINT
                       % {DSIR_BUCKETS} AS b
            FROM (
                SELECT doc_id, lang,
                       unnest(string_split_regex(lower(text), '\\s+'))
                           AS tok
                FROM documents
            )
            WHERE length(tok) > 0
        ), counts AS (
            SELECT b, count(*) AS n_raw, sum(is_tgt) AS n_tgt
            FROM toks GROUP BY b
        ), totals AS (
            SELECT count(*) AS tot_raw, sum(is_tgt) AS tot_tgt FROM toks
        ), weights AS (
            SELECT b,
                   round(ln(((n_tgt + 1) / (tot_tgt + {DSIR_BUCKETS}))
                          / ((n_raw + 1) / (tot_raw + {DSIR_BUCKETS}))),
                         6)::DECIMAL(12,6) AS w
            FROM counts, totals
        )
        SELECT doc_id, count(*) AS n_toks,
               CAST(sum(w) AS DOUBLE) AS dsir_logratio
        FROM toks JOIN weights USING (b)
        GROUP BY doc_id
    """,
    "shard_assignment": f"""
        WITH keyed AS (
            SELECT doc_id,
                   ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                       % {N_SHARDS} AS shard,
                   ('0x' || substr(md5(doc_id::VARCHAR), 16, 15))::BIGINT
                       AS ok
            FROM documents
        )
        SELECT doc_id, shard,
               row_number() OVER (
                   PARTITION BY shard ORDER BY ok, doc_id
               )::BIGINT AS pos
        FROM keyed
    """,
    "epoch_shuffle": f"""
        WITH keyed AS (
            SELECT doc_id, epoch,
                   md5(epoch::VARCHAR || ':' || doc_id::VARCHAR) AS h
            FROM documents,
                 generate_series(0, {N_EPOCHS - 1}) AS g(epoch)
        ), sliced AS (
            SELECT doc_id, epoch,
                   ('0x' || substr(h, 1, 15))::BIGINT % {N_SHARDS}
                       AS shard,
                   ('0x' || substr(h, 16, 15))::BIGINT AS ok
            FROM keyed
        )
        SELECT doc_id, epoch::INT AS epoch, shard,
               row_number() OVER (
                   PARTITION BY epoch, shard ORDER BY ok, doc_id
               )::BIGINT AS pos
        FROM sliced
    """,
}

NO_ORACLE = {
    "quality_classifier": "the gradient step is transcendental — "
    "sigmoid goes through exp, whose last ulp differs across libm "
    "implementations (JVM StrictMath-adjacent vs DuckDB's libstdc++), "
    "so unlike the algebraic fixpoints oracled in r6/r7 (kmeans/PQ/"
    "pagerank/k-center: +,*,/,sqrt only, all IEEE-exact or "
    "order-pinned) no snap can make LR_ITERS chained exp/Adam "
    "iterations replayable; separation of the label classes and "
    "accuracy-above-baseline asserted in tests/test_llm.py",
    "pca_whiten_embeddings": "the d x d eigensolve is outside SQL; "
    "asserted equal (1e-8) to an independent pure-numpy PCA of the "
    "same rows, with whitened-covariance ~ identity and component-"
    "orthogonality invariants — tests/test_llm.py",
    "mahalanobis_outliers": "the d x d precision-matrix inverse is "
    "outside SQL; asserted equal (1e-6) to an independent pure-numpy "
    "computation over the same rows — tests/test_llm.py",
}
