"""Sizing-advisor arithmetic: the 100 TB pre-flight numbers must obey
the invariants the docstrings claim, at realistic and degenerate
shapes."""

from __future__ import annotations

import pytest

from data_warehouse_co_healthy_spark.tuning import (
    MAX_SPLIT_BYTES,
    MIN_SPLIT_BYTES,
    SAFETY_FACTOR,
    ClusterShape,
    advise_conf,
    partition_fits,
)

TB = 1 << 40
GB = 1 << 30

BIG = ClusterShape(  # the brief's reference cluster
    n_executors=1000, cores_per_executor=8, executor_mem_bytes=64 * GB
)
LOCAL = ClusterShape(
    n_executors=1, cores_per_executor=32, executor_mem_bytes=128 * GB
)


def test_100tb_on_1000_executors_fits_and_parallelizes():
    conf = advise_conf(100 * TB, BIG)
    n = int(conf["spark.sql.shuffle.partitions"])
    # every advised partition must fit a task with full headroom
    assert partition_fits(100 * TB, n, BIG)
    # and saturate the cluster
    assert n >= 2 * BIG.total_cores
    split = int(conf["spark.sql.files.maxPartitionBytes"])
    assert MIN_SPLIT_BYTES <= split <= MAX_SPLIT_BYTES
    # scan partitions obey the same memory bound as shuffle partitions
    assert split * SAFETY_FACTOR <= BIG.mem_per_core
    bc = int(conf["spark.sql.autoBroadcastJoinThreshold"])
    assert bc * 8 <= BIG.executor_mem_bytes  # modest per-executor cost


def test_small_input_floors_at_parallelism_not_one_partition():
    conf = advise_conf(1 * GB, BIG)
    assert (
        int(conf["spark.sql.shuffle.partitions"]) == 2 * BIG.total_cores
    )


def test_memory_bound_dominates_when_input_is_huge():
    tiny = ClusterShape(
        n_executors=2, cores_per_executor=2, executor_mem_bytes=4 * GB
    )
    conf = advise_conf(10 * TB, tiny)
    n = int(conf["spark.sql.shuffle.partitions"])
    assert n > 2 * tiny.total_cores  # memory bound, not core floor
    assert partition_fits(10 * TB, n, tiny)
    assert not partition_fits(10 * TB, 2 * tiny.total_cores, tiny)


def test_local_rig_advice_matches_session_defaults_scale():
    """On the local[32]/128 GiB test rig at fixture sizes, the advisor
    lands near the session factory's own choices (the factory hardcodes
    cores-based partitions; the advisor's floor agrees)."""
    conf = advise_conf(200 << 20, LOCAL)  # sf0.1-ish shuffle volume
    assert int(conf["spark.sql.shuffle.partitions"]) == 64  # 2 x cores


def test_degenerate_inputs_raise_or_reject():
    with pytest.raises(ValueError):
        advise_conf(-1, BIG)
    with pytest.raises(ValueError):
        advise_conf(1, ClusterShape(0, 8, 1 * GB))
    assert not partition_fits(1 * TB, 0, BIG)
