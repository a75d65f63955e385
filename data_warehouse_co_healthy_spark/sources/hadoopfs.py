"""Thin wrapper over the Hadoop FileSystem API (py4j, via the active
SparkSession's JVM) so warehouse-maintenance utilities — versioned
snapshots, vacuum, compaction, partition-layout discovery — run
identically on local FS, HDFS, and S3A/GCS/ABFS. Hadoop resolves the
concrete ``FileSystem`` implementation from the path's scheme and the
job's Hadoop configuration, which is exactly how every distributed
write in Spark itself resolves storage; a bare local path routes to
``LocalFileSystem``, so the SAME code path is exercised by the test
suite and by a cluster run.

Only the operations the maintenance utilities need are wrapped, each a
single JVM round-trip on metadata (never data): list, exists, delete,
rename, mkdirs. Listings are O(children) name strings to the driver —
the same cost Spark's own file index pays — never file contents.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path``, scheme-resolved via the
    session's Hadoop configuration."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _active_spark(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError(
            "no active SparkSession: pass one explicitly to the "
            "filesystem utility"
        )
    return s


def list_children(
    spark: SparkSession | None, path: str, dirs_only: bool = False
) -> list[str]:
    """Child NAMES (not full paths) of a directory; [] if it doesn't
    exist."""
    s = _active_spark(spark)
    fs, jpath = _fs_path(s, path)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        if dirs_only and not st.isDirectory():
            continue
        out.append(st.getPath().getName())
    return out


def exists(spark: SparkSession | None, path: str) -> bool:
    s = _active_spark(spark)
    fs, jpath = _fs_path(s, path)
    return bool(fs.exists(jpath))


def delete(spark: SparkSession | None, path: str) -> bool:
    """Recursive delete; False if the path didn't exist."""
    s = _active_spark(spark)
    fs, jpath = _fs_path(s, path)
    return bool(fs.delete(jpath, True))


def rename(spark: SparkSession | None, src: str, dst: str) -> None:
    """Atomic-on-HDFS directory rename (on S3A this is a copy+delete —
    for strict atomicity there, layer a manifest/catalog commit on
    top, which is precisely what table formats like Delta/Iceberg
    add)."""
    s = _active_spark(spark)
    fs, jsrc = _fs_path(s, src)
    jdst = s._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(jsrc, jdst):
        raise OSError(f"rename failed: {src} -> {dst}")


def versions_in(spark: SparkSession | None, path: str) -> list[int]:
    """Sorted snapshot numbers found as ``version=N`` child dirs."""
    return sorted(
        int(name.split("=", 1)[1])
        for name in list_children(spark, path, dirs_only=True)
        if name.startswith("version=")
    )


def touch(spark: SparkSession | None, path: str) -> None:
    """Create an empty file (the atomic-commit primitive: one file
    CREATE is atomic on HDFS and a single PUT on S3, unlike directory
    renames)."""
    s = _active_spark(spark)
    fs, jpath = _fs_path(s, path)
    out = fs.create(jpath, True)
    out.close()
