"""Driver-simulation: run every __spark_entry__ query on a VANILLA
SparkSession (Spark 4 defaults — ANSI on) at a given sf_dir and compare
with its DuckDB oracle the way the driver's t2 gate does (row count,
column names, order-insensitive rounded values).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession


def canonicalize(df: pd.DataFrame, ndigits: int = 4) -> pd.DataFrame:
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
    order = df.astype(str).sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_warehouse_co_healthy_spark.schemas import TESTDATA_TABLES

    duck = duckdb.connect()
    for t in TESTDATA_TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"  rows-only  {name}: {len(got)} rows "
                      f"({time.time() - t0:.1f}s)")
                n_pass += 1
                continue
            want = duck.sql(oracles[name]).df()
            g, w = canonicalize(got), canonicalize(want)
            if len(g) != len(w):
                raise AssertionError(f"rows {len(g)} != {len(w)}")
            if list(g.columns) != list(w.columns):
                raise AssertionError(
                    f"cols {list(g.columns)} != {list(w.columns)}"
                )
            pd.testing.assert_frame_equal(
                g, w, check_dtype=False, check_exact=False,
                atol=1e-3, rtol=1e-6,
            )
            print(f"  MATCH      {name}: {len(g)} rows "
                  f"({time.time() - t0:.1f}s)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            msg = str(e).splitlines()[0][:160]
            print(f"  FAIL       {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail at {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
