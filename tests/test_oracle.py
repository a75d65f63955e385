"""The local mirror of the driver's t2 gate: every registered query with
an oracle must hash-match DuckDB on the fixture parquet (sf0.01 — the
driver's own scale — by default; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for a faster opt-in)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
WITH_ORACLE = sorted(set(QUERIES) & set(ORACLES))


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.schema.fieldNames()


def test_all_queries_declared():
    from data_warehouse_co_healthy_spark.plans.queries import NO_ORACLE

    missing = set(QUERIES) - set(ORACLES) - set(NO_ORACLE)
    assert not missing, f"queries with no oracle and no declared reason: {missing}"


def test_no_orphan_oracles():
    orphans = set(ORACLES) - set(QUERIES)
    assert not orphans, f"oracles without queries: {orphans}"


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, QUERIES[name], ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    from tests.conftest import SF_DIR

    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
