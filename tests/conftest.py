"""Shared fixtures: one SparkSession per test run, a DuckDB connection
with the fixture views registered, and the oracle-compare helper that
mimics the driver's t2 gate (sorted columns, sorted rows, rounded
floats, order-insensitive compare). Canonicalization and the strict
comparison are the SAME code the driver-simulation tool uses
(tools/check_oracle.py) — a second, more lenient copy here is exactly
how an int-vs-float oracle bug stayed invisible until the driver's
value-hash caught it."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from data_warehouse_co_healthy_spark.schemas import TESTDATA_TABLES
from data_warehouse_co_healthy_spark.session import get_spark
from tools.check_oracle import canonicalize, compare_strict

# Default the local oracle mirror to the DRIVER's scale (sf0.01) so
# summation-order / precision flakes surface locally before the driver
# sees them; export SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for a
# fast opt-in iteration loop.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()




def assert_matches_oracle(spark, duck, fn, sql, name=""):
    got = canonicalize(fn(spark, SF_DIR).toPandas())
    want = canonicalize(duck.sql(sql).df())
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    problems = compare_strict(got, want)
    if problems:  # pragma: no cover - diagnostic path
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False,
                atol=1e-3, rtol=1e-6,
            )
            kind = "driver-hash divergence (values numerically equal)"
        except AssertionError:
            kind = "value mismatch"
        raise AssertionError(
            f"{name}: {kind} vs oracle\n" + "\n".join(problems)
        )
