"""Independent pure-Python/numpy references for the time-series
statistics whose DuckDB oracles mirror the engine's own construction —
a shared-construction oracle can't catch a shared mistake, so these
recompute from the raw parquet with different machinery (pandas
groupby + numpy), not SQL."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


def _orders_daily() -> pd.Series:
    df = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])
    day = pd.to_datetime(df["o_orderdate"]).dt.date
    # float64 sum is fine for the REFERENCE: assertions use tolerances
    return df.groupby(day)["o_totalprice"].sum().sort_index()


def test_theil_sen_matches_numpy_median_of_slopes(spark):
    from data_warehouse_co_healthy_spark.operators.temporal import (
        theil_sen_slope,
    )

    df = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])
    dt = pd.to_datetime(df["o_orderdate"])
    mi = dt.dt.year * 12 + dt.dt.month
    monthly = df.groupby(mi)["o_totalprice"].sum()
    xs = monthly.index.to_numpy(dtype=np.float64)
    ys = monthly.to_numpy(dtype=np.float64)
    slopes = [
        (ys[j] - ys[i]) / (xs[j] - xs[i])
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    ]
    want = float(np.median(slopes))

    row = theil_sen_slope(spark, SF_DIR).collect()[0]
    assert row["n_pairs"] == len(slopes)
    assert abs(row["theil_sen_slope"] - want) < 1e-3, (
        row["theil_sen_slope"], want,
    )


def test_holt_matches_pure_python_replay(spark):
    from data_warehouse_co_healthy_spark.operators.temporal import (
        HOLT_1A,
        HOLT_1B,
        HOLT_A,
        HOLT_B,
        holt_forecast,
    )

    daily = _orders_daily()
    ys = daily.to_numpy(dtype=np.float64)
    lvl, trd = ys[0], ys[1] - ys[0]
    want = {str(daily.index[0]): (lvl, trd, None, None)}
    for day, y in zip(daily.index[1:], ys[1:]):
        fc = lvl + trd
        new_lvl = HOLT_A * y + HOLT_1A * (lvl + trd)
        trd = HOLT_B * (new_lvl - lvl) + HOLT_1B * trd
        lvl = new_lvl
        want[str(day)] = (lvl, trd, fc, abs(y - fc))

    got = holt_forecast(spark, SF_DIR).collect()
    assert len(got) == len(want)
    # engine sums in exact decimal, reference in float64: the daily
    # revenue totals agree to ~1e-6 relative, and the recursion is a
    # contraction (alpha<1), so a loose relative tolerance is correct
    for r in got:
        wl, wt, wf, we = want[r["day"]]
        assert abs(r["level"] - wl) <= 1e-6 * max(1.0, abs(wl)), r["day"]
        assert abs(r["trend"] - wt) <= 1e-4 * max(1.0, abs(wl)), r["day"]
        if wf is None:
            assert r["forecast"] is None and r["abs_err"] is None
        else:
            assert abs(r["forecast"] - wf) <= 1e-4 * max(1.0, abs(wf))


def test_gapfill_linear_matches_pandas_interpolation(spark):
    from data_warehouse_co_healthy_spark.operators.temporal import (
        gapfill_linear,
    )

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev["event_type"] == "purchase"].copy()
    # events.ts is parquet TIMESTAMP(NANOS) → pandas datetime64[ns]
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    daily = (
        ev.groupby(["user_id", "day"])["value"]
        .sum()
        .round(4)
        .rename("day_value")
        .reset_index()
    )
    want: dict[tuple[int, str], tuple[bool, float]] = {}
    for uid, grp in daily.groupby("user_id"):
        grp = grp.set_index(pd.to_datetime(grp["day"]))
        grid = grp["day_value"].reindex(
            pd.date_range(grp.index.min(), grp.index.max(), freq="D")
        )
        interp = grid.interpolate(method="time")
        for day, v in interp.items():
            obs = not pd.isna(grid[day])
            want[(uid, day.strftime("%Y-%m-%d"))] = (obs, float(v))

    got = gapfill_linear(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        obs, v = want[(r["user_id"], r["day"])]
        assert r["observed"] == obs, (r["user_id"], r["day"])
        assert abs(r["interp_value"] - v) < 1e-3, (
            r["user_id"], r["day"], r["interp_value"], v,
        )
