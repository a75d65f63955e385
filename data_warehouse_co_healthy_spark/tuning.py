"""Cluster-shape-aware configuration advisor: turn (input size,
executor shape) into the three knobs that decide whether a 100 TB run
spills or flows — ``spark.sql.shuffle.partitions``,
``spark.sql.files.maxPartitionBytes``, and broadcast threshold. The
arithmetic is the standard sizing discipline written down and tested,
instead of re-derived ad hoc per job.

Reasoning encoded here:
- A shuffle partition must fit in ONE task's working memory several
  times over (hash tables, sort buffers, dual buffering) —
  ``SAFETY_FACTOR``× headroom over the raw partition bytes, against
  the per-core share of executor memory.
- Partition COUNT should also be ≥ PARALLELISM_MULT × total cores so
  AQE has units to coalesce/split and stragglers don't serialize the
  stage tail; AQE coalesces excess partitions cheaply, so erring high
  is the safe side (the advisor returns the max of both bounds).
- Scan partitions (``maxPartitionBytes``) target the same per-task
  memory bound, clamped to sane parquet-split sizes.
- Broadcast threshold: a broadcast table materializes deserialized on
  EVERY executor and must leave the per-core share mostly untouched.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

SAFETY_FACTOR = 4          # working-memory headroom per task
PARALLELISM_MULT = 2       # partitions per core floor (AQE coalesces)
MIN_SPLIT_BYTES = 16 << 20   # 16 MiB: below this, task overhead wins
MAX_SPLIT_BYTES = 1 << 30    # 1 GiB: above this, stragglers/retries win
BROADCAST_FRACTION = 0.05  # of per-core memory share


@dataclass(frozen=True)
class ClusterShape:
    n_executors: int
    cores_per_executor: int
    executor_mem_bytes: int

    @property
    def total_cores(self) -> int:
        return self.n_executors * self.cores_per_executor

    @property
    def mem_per_core(self) -> int:
        return self.executor_mem_bytes // self.cores_per_executor


def advise_conf(
    shuffle_input_bytes: int, shape: ClusterShape
) -> dict[str, str]:
    """Spark conf for a job whose largest shuffle moves
    ``shuffle_input_bytes`` across ``shape``. Returns the three knobs
    as a ready-to-apply dict (values stringified the way
    ``SparkConf.set`` wants them)."""
    if shuffle_input_bytes < 0:
        raise ValueError("shuffle_input_bytes must be >= 0")
    if min(
        shape.n_executors, shape.cores_per_executor,
        shape.executor_mem_bytes,
    ) <= 0:
        raise ValueError(f"implausible cluster shape: {shape}")
    target_partition = max(1, shape.mem_per_core // SAFETY_FACTOR)
    by_memory = math.ceil(shuffle_input_bytes / target_partition)
    by_parallelism = PARALLELISM_MULT * shape.total_cores
    shuffle_partitions = max(by_memory, by_parallelism)
    split = min(
        MAX_SPLIT_BYTES, max(MIN_SPLIT_BYTES, target_partition)
    )
    broadcast = max(1 << 20, int(shape.mem_per_core * BROADCAST_FRACTION))
    return {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.files.maxPartitionBytes": str(split),
        "spark.sql.autoBroadcastJoinThreshold": str(broadcast),
    }


def partition_fits(
    shuffle_input_bytes: int, n_partitions: int, shape: ClusterShape
) -> bool:
    """Would the mean shuffle partition fit a task's working memory
    with SAFETY_FACTOR headroom? The go/no-go a pre-flight check asks
    before submitting with a hand-picked partition count."""
    if n_partitions <= 0:
        return False
    mean = shuffle_input_bytes / n_partitions
    return mean * SAFETY_FACTOR <= shape.mem_per_core
