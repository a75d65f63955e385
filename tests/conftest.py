"""Shared fixtures: one SparkSession per test run, a DuckDB connection
with the fixture views registered, and the oracle-compare helper that
mimics the driver's t2 gate (sorted columns, sorted rows, rounded
floats, order-insensitive compare)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from data_warehouse_co_healthy_spark.schemas import TESTDATA_TABLES
from data_warehouse_co_healthy_spark.session import get_spark

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


def canonicalize(df: pd.DataFrame, ndigits: int = 4) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, float columns
    rounded, rows sorted by every column's string form."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(ndigits)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: round(v, ndigits)
                if isinstance(v, float) and not math.isnan(v)
                else v
            )
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def assert_matches_oracle(spark, duck, fn, sql, name=""):
    got = canonicalize(fn(spark, SF_DIR).toPandas())
    want = canonicalize(duck.sql(sql).df())
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    try:
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=1e-3,
            rtol=1e-6,
        )
    except AssertionError as e:  # pragma: no cover - diagnostic path
        raise AssertionError(f"{name}: value mismatch vs oracle\n{e}") from e
