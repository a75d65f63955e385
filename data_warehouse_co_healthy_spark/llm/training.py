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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table, spread

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


K_CLUSTERS = 8  # k-means cluster count
KM_ITERS = 5    # fixed Lloyd iterations (deterministic plan count)


def _assign(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2), ties to
    the lowest cluster id. Distances are k codegen'd aggregate/zip_with
    expressions over the broadcast centroid literals — no UDF, no
    explode."""
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(float(v)) for v in c]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )
    return emb.select(
        "vec_id",
        "embedding",
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cid"),
        F.array_min(dists).alias("dist"),
    )


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embeddings table: deterministic init
    (the K_CLUSTERS lowest vec_ids' vectors), KM_ITERS fixed iterations.
    Returns (vec_id, cid, dist) — the cluster assignment used for
    semantic dedup buckets, topic balancing, and IVF coarse quantizers.

    Per iteration: centroids (k×d floats) collect to the driver and
    re-enter the plan as literals (broadcast-by-value, like MLlib);
    the update is one groupBy(cid) with d per-dimension avg aggregates
    — partial-aggregated map-side, so the shuffle carries k rows per
    partition. No oracle: iterative fixpoint is outside single-query
    SQL; tests pin determinism and that inertia decreases monotonically.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    centroids = lloyd_centroids(emb)
    return _assign(emb, centroids).select(
        "vec_id", "cid", F.round("dist", 4).alias("dist")
    )


def lloyd_centroids(emb: DataFrame) -> list[list[float]]:
    """The trained centroids themselves (k×d floats on the driver) —
    reused by kmeans_embeddings and as the IVF coarse quantizer in
    similarity.ann_ivf_kmeans."""
    dim = len(emb.select("embedding").first()[0])
    init = emb.orderBy("vec_id").limit(K_CLUSTERS).collect()
    centroids = [list(r.embedding) for r in init]
    for _ in range(KM_ITERS):
        assigned = _assign(emb, centroids)
        stats = (
            assigned.groupBy("cid")
            .agg(
                *[
                    F.avg(F.col("embedding")[i]).alias(f"c{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        by_cid = {r["cid"]: [r[f"c{i}"] for i in range(dim)] for r in stats}
        # empty clusters keep their previous centroid
        centroids = [by_cid.get(c, centroids[c]) for c in range(K_CLUSTERS)]
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
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    assigned = _assign(emb, lloyd_centroids(emb)).select(
        "vec_id", "embedding", "cid"
    )

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        kept_rows: list[int] = []
        kept, max_cos = [], []
        for i in range(len(pdf)):
            if kept_rows:
                sims = mat[kept_rows] @ mat[i]
                mc = float(sims.max())
            else:
                mc = 0.0
            ok = mc < SEMDEDUP_COS
            if ok:
                kept_rows.append(i)
            kept.append(ok)
            max_cos.append(round(mc, 4))
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
    )


QUERIES = {
    "shard_assignment": shard_assignment,
    "kmeans_embeddings": kmeans_embeddings,
    "semantic_dedup": semantic_dedup,
}

ORACLES = {
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
}

NO_ORACLE = {
    "kmeans_embeddings": "iterative fixpoint (Lloyd's) is outside "
    "single-query SQL; determinism + monotone inertia asserted in "
    "tests/test_llm.py",
    "semantic_dedup": "depends on the k-means fixpoint plus a greedy "
    "sequential in-cell pass; keep-set invariants asserted in "
    "tests/test_llm.py",
}
