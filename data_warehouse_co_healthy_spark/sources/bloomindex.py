"""File-level Bloom-filter index for point lookups on plain parquet —
the data-skipping complement to min/max zone maps (``zone_map_profile``)
and Z-ordering: range layouts prune range predicates, but a point
lookup on a HIGH-CARDINALITY, unclustered column (order id, user id,
content hash) overlaps every file's [min, max] box and scans the whole
table. A per-file Bloom filter answers "might file F contain value v?"
from a sidecar that is KBs per file where the data is GBs — the same
pattern as Delta's Bloom filter index, here on plain parquet.

Design:
  - BUILD is one distributed aggregation: tag each row with its
    ``input_file_name()``, compute the k Bloom bit positions per value
    IN-ENGINE (xxhash64 with k seeds — engine-side hashing, so probe
    hashing is engine-side too and can never drift from the build),
    and collect the DISTINCT positions per file into a sorted array.
    The sidecar is written as parquet next to the data.
  - PROBE hashes the lookup value with the same engine expressions
    (a 1-row plan), loads the sidecar (file-count-sized, tiny), keeps
    files whose position sets contain all k probe bits, and reads ONLY
    those files. False positives cost an extra file read, never a
    wrong result; false negatives cannot happen.

Scale: the sidecar holds ≤ min(n_distinct·k, BLOOM_BITS) positions per
file; probing is driver-side set membership over n_files entries —
the same driver cost as Spark's own file listing. Rebuild after
compaction (file names change), like any file-level index — and this
is ENFORCED: ``bloom_prune_files`` diffs the indexed file set against
a fresh listing and raises a rebuild-me ValueError on drift, and
``compact_parquet`` drops matching ``__bloom_*`` sidecars so a stale
index cannot outlive the rewrite it indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_BITS = 1 << 16   # bit-space per file (8 KiB equivalent)
BLOOM_K = 5            # hash functions


def _positions_expr(col):
    """Array of BLOOM_K bit positions for a column value, computed
    with engine hashing (xxhash64 under distinct seed columns);
    positive modulo to stay in [0, BLOOM_BITS). The value is
    canonicalized to STRING first — xxhash64 is type-sensitive
    (int 7 and bigint 7 hash differently), and the probe side passes
    a Python literal whose Spark type need not match the indexed
    column's; hashing the string form makes build and probe agree for
    any integer/string key type."""
    s = col.cast("string")
    return F.array(
        *[
            F.pmod(F.xxhash64(s, F.lit(seed)), F.lit(BLOOM_BITS)).cast(
                "long"
            )
            for seed in range(BLOOM_K)
        ]
    )


def _sidecar_path(path: str, col: str) -> str:
    return f"{path.rstrip('/')}__bloom_{col}"


def build_bloom_index(spark: SparkSession, path: str, col: str) -> int:
    """Build (or rebuild) the per-file Bloom sidecar for ``col``.
    Returns the number of files indexed."""
    rows = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), F.col(col).alias("v")
    )
    index = (
        rows.select("file", F.explode(_positions_expr(F.col("v"))).alias("p"))
        .groupBy("file")
        .agg(F.array_sort(F.collect_set("p")).alias("positions"))
    )
    index.write.mode("overwrite").parquet(_sidecar_path(path, col))
    return spark.read.parquet(_sidecar_path(path, col)).count()


def _norm_file(uri: str) -> str:
    """Normalize a file URI for set comparison: ``input_file_name()``
    (sidecar build) and ``DataFrame.inputFiles()`` (fresh listing)
    render the scheme differently (``file:///p`` vs ``file:/p``)."""
    from urllib.parse import unquote, urlparse  # noqa: PLC0415

    p = urlparse(uri)
    return unquote(p.path) if p.scheme else uri


def bloom_prune_files(
    spark: SparkSession, path: str, col: str, value
) -> tuple[list[str], int]:
    """(files that MIGHT contain value, total indexed files). Probe
    positions are computed with the same engine expressions as the
    build — hashing can never drift between the two sides.

    Staleness is ENFORCED here, not just documented: the sidecar keys
    on file names, so any rewrite (``compact_parquet``, overwrite,
    vacuum) invalidates it. The probe compares the indexed file set
    against a fresh footer-level listing (``inputFiles()`` — no data
    scan) and raises a clear rebuild-me ValueError instead of letting
    the read die later with a raw path-not-found, or — worse — quietly
    miss rows that moved into files the index has never seen."""
    from . import hadoopfs  # noqa: PLC0415

    sidecar = _sidecar_path(path, col)
    if not hadoopfs.exists(spark, sidecar):
        raise FileNotFoundError(
            f"no bloom index sidecar at {sidecar} for column {col!r} "
            f"of {path} (compaction drops stale sidecars); build one "
            "with build_bloom_index()"
        )
    probe = (
        spark.range(1)
        .select(_positions_expr(F.lit(value)).alias("ps"))
        .first()["ps"]
    )
    entries = spark.read.parquet(sidecar).collect()
    current = {_norm_file(f) for f in spark.read.parquet(path).inputFiles()}
    indexed = {_norm_file(r["file"]) for r in entries}
    if indexed != current:
        missing = sorted(indexed - current)[:3]
        unseen = sorted(current - indexed)[:3]
        raise ValueError(
            f"bloom index {_sidecar_path(path, col)} is stale for {path}: "
            f"{len(indexed - current)} indexed files no longer exist "
            f"{missing}, {len(current - indexed)} data files are unindexed "
            f"{unseen}; rebuild with build_bloom_index() after "
            "compaction/rewrites"
        )
    keep = [
        r["file"]
        for r in entries
        if set(probe) <= set(r["positions"])
    ]
    return keep, len(entries)


def read_point_lookup(
    spark: SparkSession, path: str, col: str, value
) -> DataFrame:
    """Point lookup through the Bloom sidecar: read only the files
    that might contain ``value``, then apply the exact predicate.
    Equality with the full scan is guaranteed (no false negatives);
    tests additionally measure the file-skipping rate."""
    keep, _total = bloom_prune_files(spark, path, col, value)
    if not keep:
        return (
            spark.read.parquet(path).filter(F.col(col) == value).limit(0)
        )
    # basePath: reading an explicit file list must still derive any
    # hive partition columns from the directory layout — without it a
    # partitioned table's partition columns silently vanish from the
    # pruned read's schema
    return (
        spark.read.option("basePath", path)
        .parquet(*keep)
        .filter(F.col(col) == value)
    )
