"""Aggregation operators (SURVEY §2.5 — absent in the reference, required
by the engine's query surface and the t2 harness).

The reference has zero groupBy/agg (grep-verified, SURVEY §2.5); its facts
carry measures (valor_pagado payment_process.py:161, Precio dimension.py:69)
for downstream BI, so the engine ships the full standard agg surface:
groupBy().agg(), distinct aggregates, HAVING, rollup/cube, pivot.

Scale posture: all of these hash-aggregate with map-side partial
aggregation (ObjectHashAggregate/HashAggregate partial → final), so the
shuffle carries only group cardinality, not row cardinality. countDistinct
expands to a two-phase aggregate; approx_count_distinct (HLL) is the
100 TB-friendly variant and is exposed alongside.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import (
    MONEY,
    money_avg,
    money_avg_sql,
    money_sum,
    money_sum_sql,
    nz,
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical wide-agg scan (8 aggregates, 2 group cols).
    Whole-stage-codegen'd single-pass partial agg → tiny shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # money sums/avgs accumulate in exact decimal (order-independent —
    # see functions/numeric.py); quantity is integral so its double sum
    # is already exact
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            money_avg(F.col("l_extendedprice")).alias("avg_price"),
            money_avg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def count_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expand-based two-phase distinct aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("spent"),
        )
        .filter(F.col("n_orders") >= 3)
    )


def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; NULL grouping slots coalesced to 'ALL' so
    the oracle hash is unambiguous."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping-set combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
        )
    )


def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list → single-pass, no extra distinct job)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            F.coalesce("O", F.lit(0.0)).alias("qty_open"),
            F.coalesce("F", F.lit(0.0)).alias("qty_filled"),
        )
    )


def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — an arbitrary subset of the cube (by
    returnflag, by linestatus, grand total — but NOT the pair), via the
    SQL surface. GROUPING() disambiguates real NULLs from slots."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gs"
    )
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               sum(l_quantity) AS sum_qty,
               (grouping(l_returnflag) * 2 + grouping(l_linestatus))
                   AS grouping_id
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def percentiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (order-statistics agg).
    At 100 TB swap `percentile` for `approx_percentile` (t-digest,
    mergeable map-side) — declared here with the exact form so the
    oracle can pin values."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


WINSOR_LO, WINSOR_HI = 0.05, 0.95


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics via winsorization: values are
    CLAMPED into each group's [p05, p95] before the mean/stddev —
    the outlier-resistant profile for heavy-tailed measures (payment
    amounts, token counts). Two aggregates over the same grouping: one
    exact-percentile pass (group-cardinality result, broadcast back),
    one clamped-moment pass. At 100 TB swap the exact percentile for
    approx_percentile (mergeable t-digest) — the clamp join and second
    aggregate are unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile(l_extendedprice, {WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(l_extendedprice, {WINSOR_HI})").alias("hi"),
    )
    clamped = li.join(F.broadcast(bounds), on="l_returnflag").select(
        "l_returnflag",
        F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
        .alias("v"),
        ((F.col("l_extendedprice") < F.col("lo"))
         | (F.col("l_extendedprice") > F.col("hi"))).alias("clipped"),
    )
    # moments from EXACT decimal sums (functions/numeric.py posture):
    # avg/stddev over doubles depend on partial-agg merge order, so the
    # mean and the sample stddev are derived arithmetically from
    # order-independent decimal Σv and Σv² — identical doubles on both
    # engines. (Same math as stddev_samp; only the accumulation is
    # exact.)
    s1 = F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
    s2 = F.sum(
        (F.col("v") * F.col("v")).cast("decimal(30,12)")
    ).cast("double")
    n = F.count(F.lit(1))
    return clamped.groupBy("l_returnflag").agg(
        F.round(s1 / n, 4).alias("winsor_mean"),
        F.round(
            F.sqrt((s2 - (s1 * s1) / n) / (n - 1)), 4
        ).alias("winsor_std"),
        F.sum(F.col("clipped").cast("long")).alias("n_clipped"),
        F.count("*").alias("n"),
    )


def central_tendency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (exact interpolated) and most-frequent value per group —
    the order-statistic + mode pair every profiling pass wants. Mode
    tie-break: smallest value (deterministic, mirrored in the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.asc("l_quantity")
    )
    modes = (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    medians = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty")
    )
    return medians.join(modes, on="l_returnflag")


def correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, sample
    covariance, and OLS slope/intercept of extendedprice on quantity —
    single-pass streaming aggregates (Welford-style merge), so they
    partial-aggregate map-side like any sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qp"
        ),
        F.round(
            F.expr("regr_slope(l_extendedprice, l_quantity)"), 4
        ).alias("slope"),
        F.round(
            F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4
        ).alias("intercept"),
    )


def _user_arm() -> Column:
    """Deterministic 2-arm assignment from the md5-portable user hash —
    the ONE recipe shared by ab_test_report and did_report (a drifted
    copy would silently put users in different arms across the two
    experiment readouts)."""
    return (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % 2
    )


DID_PRE_DAY = 15  # day-of-month boundary: ≤ = pre-period, shared w/oracle


def did_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator per event type — the
    quasi-experimental companion to ``ab_test_report``: when treatment
    wasn't randomized per event but rolled out at a point in TIME, the
    causal read is (treated post − treated pre) − (control post −
    control pre), which cancels both the stable group gap and the
    common time trend. Arms come from the same md5-portable user hash
    as ab_test_report; periods split on day-of-month ≤ DID_PRE_DAY.

    All four cells' n/Σx/Σx² come from ONE conditional-sum aggregate
    (no per-cell subqueries, no second shuffle) with Σ in EXACT
    decimal, then the DiD point estimate and its pooled standard error
    are scalar double trees identical on both engines."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value").cast(MONEY)
    treated = _user_arm() == 1
    post = F.dayofmonth("ts") > DID_PRE_DAY
    cells = {
        "tp": treated & post,
        "tr": treated & ~post,
        "cp": ~treated & post,
        "cr": ~treated & ~post,
    }
    aggs = []
    for tag, cond in cells.items():
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{tag}"),
            F.sum(F.when(cond, x)).cast("double").alias(f"sx_{tag}"),
            F.sum(F.when(cond, x * x)).cast("double").alias(f"sxx_{tag}"),
        ]
    g = ev.groupBy("event_type").agg(*aggs)

    def mean(tag):
        return F.col(f"sx_{tag}") / F.col(f"n_{tag}")

    def var_over_n(tag):
        n = F.col(f"n_{tag}")
        return (
            (F.col(f"sxx_{tag}") - F.col(f"sx_{tag}") * F.col(f"sx_{tag}") / n)
            / (n - 1)
        ) / n

    did = (mean("tp") - mean("tr")) - (mean("cp") - mean("cr"))
    se = F.sqrt(
        var_over_n("tp") + var_over_n("tr")
        + var_over_n("cp") + var_over_n("cr")
    )
    # a cell with ≤1 event makes the (n−1) variance divisor 0 — drop
    # such event types BEFORE dividing (ANSI throws, it doesn't NULL)
    g = g.filter(
        F.least(
            F.col("n_tp"), F.col("n_tr"), F.col("n_cp"), F.col("n_cr")
        )
        > 1
    )
    return g.select(
        "event_type",
        (F.col("n_tp") + F.col("n_tr")).alias("n_treated"),
        (F.col("n_cp") + F.col("n_cr")).alias("n_control"),
        F.round(mean("tp") - mean("tr"), 4).alias("treated_delta"),
        F.round(mean("cp") - mean("cr"), 4).alias("control_delta"),
        F.round(did, 4).alias("did"),
        F.round(did / se, 4).alias("z"),
    )


def spearman_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extendedprice per
    return flag — the monotonic-association twin of
    ``correlation_stats``'s Pearson (robust to outliers and any
    monotone transform; Pearson-vs-Spearman disagreement is the classic
    nonlinearity flag).

    Tied values get AVERAGE ranks via ``2·avg_rank = 2·rank + ties − 1``
    (kept doubled so ranks stay integral), and Spearman is Pearson on
    those ranks — affine-invariant, so the doubling cancels. Rank
    products accumulate in exact decimal; the closed-form correlation is
    the only float op, bit-deterministic from identical exact sums.

    Scale posture: the rank windows partition by the LOW-cardinality
    flag (3 groups), so each window task sorts N/3 rows — fine to
    ~100 GB/group, and the documented 100 TB swap is the same one
    quality_calibration names: distinct-value-grain ECDF ranks (both
    measures here have bounded distinct values) joined back to the
    joint (flag, qty, price) aggregate, which makes every stage
    key-grain."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    li = load_table(spark, sf_dir, "lineitem")
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wqt = Window.partitionBy("l_returnflag", "l_quantity")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wpt = Window.partitionBy("l_returnflag", "l_extendedprice")
    ranked = li.select(
        "l_returnflag",
        (2 * F.rank().over(wq) + F.count("*").over(wqt) - 1)
        .cast("decimal(20,0)")
        .alias("rx"),
        (2 * F.rank().over(wp) + F.count("*").over(wpt) - 1)
        .cast("decimal(20,0)")
        .alias("ry"),
    )
    st = ranked.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    varx = nd * F.col("sxx").cast("double") - (
        F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    vary = nd * F.col("syy").cast("double") - (
        F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    # constant-column groups have zero rank variance — drop them (the
    # correlation is undefined) instead of dividing by sqrt(0), which
    # throws under the ANSI driver session (acf/roc_auc posture)
    return (
        st.filter((varx > 0) & (vary > 0))
        .select(
            "l_returnflag",
            "n",
            F.round(
                (
                    nd * F.col("sxy").cast("double")
                    - F.col("sx").cast("double")
                    * F.col("sy").cast("double")
                )
                / F.sqrt(varx * vary),
                6,
            ).alias("spearman"),
        )
    )


HILL_K = 100  # tail order statistics for the Hill estimator


def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the power-law tail index of customer spend —
    the heavy-tail diagnostic behind capacity planning and whale-risk
    analysis (α ≤ 2 means infinite variance: means/CLT-based readouts
    are unreliable; `revenue_pareto` shows the curve, this one number
    says HOW heavy): α̂ = 1 / mean(ln(x_(i) / x_(k+1))) over the top-k
    order statistics.

    The global rank is row_number + rk ≤ k+1, which Catalyst executes
    as a WindowGroupLimit — each map task emits at most k+1 rows before
    the single final exchange, so the 'global sort' is top-k-sized, not
    data-sized. x_(k+1) joins back as a 1-row broadcast."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("spend")
    )
    ranked = spend.select(
        "spend",
        F.row_number()
        .over(Window.orderBy(F.col("spend").desc(), F.col("o_custkey")))
        .alias("rk"),
    ).filter(F.col("rk") <= HILL_K + 1)
    xk1 = ranked.filter(F.col("rk") == HILL_K + 1).select(
        F.col("spend").alias("x_k1")
    )
    # if the whole top-k ties with x_(k+1) (heavy ties at tiny SFs),
    # the mean log-ratio is exactly 0 — α is undefined; emit NULL
    # instead of dividing (ANSI throws, it doesn't NULL)
    mean_log = F.avg(F.log(F.col("spend") / F.col("x_k1")))
    return (
        ranked.filter(F.col("rk") <= HILL_K)
        .crossJoin(F.broadcast(xk1))
        .agg(
            F.count("*").alias("k"),
            F.when(mean_log > 0.0, 1.0 / mean_log).alias("alpha"),
        )
        .select("k", F.round("alpha", 4).alias("hill_alpha"))
    )


def weighted_median_by_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted median per group — the order statistic a plain median
    misses whenever rows carry unequal mass (here: the price point at
    which half the QUANTITY sits below, per return flag; the right
    "typical price" for mixed small/bulk lines).

    Definition: the smallest value whose cumulative weight reaches half
    the total. Cumulative weights accumulate in EXACT decimal over a
    deterministic (value, orderkey, partkey) ordering, so the boundary
    row is identical on any engine — no float cumsum drift can flip
    membership at the tw/2 threshold. Windows partition by the group
    key; same per-group-sort posture (and documented distinct-value
    swap at extreme scale) as spearman_by_group."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    li = load_table(spark, sf_dir, "lineitem")
    # explicit ROWS frame: Spark's default for an ordered window is
    # RANGE (peer rows share the END-of-group cumsum), which matches
    # the oracle's answer only because full-tie peers share the price;
    # ROWS pins the construction the docstring claims
    wg = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .over(wg)
        .alias("cw"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .over(wall)
        .alias("tw"),
    )
    return (
        cum.filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 4).alias("weighted_median"),
            F.max(F.col("tw").cast("double")).alias("total_weight"),
        )
    )


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct — the scale path for distinct counts —
    made SELF-VERIFYING: the sketch estimate is compared against the
    exact count in-engine and the output carries the exact count plus a
    within-bound flag, so the DuckDB oracle (which cannot reproduce the
    sketch) still hash-checks the full row: exact values match AND the
    engine proved its estimate within the declared 5% bound (rsd=0.01
    → 5% is generous headroom). At 100 TB you drop the exact twin and
    keep the sketch; here the twin IS the verification."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.01).alias("approx"),
            F.countDistinct("l_orderkey").alias("n_exact"),
        )
        .select(
            "l_linestatus",
            "n_exact",
            (
                F.abs(F.col("approx") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("hll_ok"),
        )
    )


def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch approximate percentiles (p50/p90/p99) per event type —
    the 100 TB path for quantiles: ``percentile_approx`` merges bounded
    sketches map-side instead of sorting the column. Sketch values are
    implementation-defined, so the query is SELF-VERIFYING: it emits
    the exact interpolated percentiles (oracle-comparable against
    DuckDB quantile_cont) plus in-engine booleans proving the sketch
    landed within 2% of each — a full hash-checked row instead of the
    weaker rows-only driver fallback."""
    e = load_table(spark, sf_dir, "events")
    ps = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    approx = F.percentile_approx("value", ps, 10000)
    exact = F.percentile("value", ps)
    # GK guarantees RANK error, not value error (a sparse tail can put
    # the nearest data point far from the interpolated percentile), so
    # the in-engine proof brackets each estimate between the exact
    # percentiles ±1.5% of rank
    lo = F.percentile("value", F.array(F.lit(0.485), F.lit(0.885), F.lit(0.975)))
    hi = F.percentile("value", F.array(F.lit(0.515), F.lit(0.915), F.lit(1.0)))

    def ok(i: int) -> F.Column:
        return (
            (F.col("qa")[i] >= F.col("qlo")[i])
            & (F.col("qa")[i] <= F.col("qhi")[i])
        ).alias(f"p{(50, 90, 99)[i]}_ok")

    return (
        e.groupBy("event_type")
        .agg(
            approx.alias("qa"),
            exact.alias("qe"),
            lo.alias("qlo"),
            hi.alias("qhi"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("qe")[0], 4).alias("p50"),
            F.round(F.col("qe")[1], 4).alias("p90"),
            F.round(F.col("qe")[2], 4).alias("p99"),
            ok(0),
            ok(1),
            ok(2),
        )
    )


def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Apache DataSketches HLL): per-group
    sketches via ``hll_sketch_agg`` re-aggregated to a grand total with
    ``hll_union_agg`` — NO second scan of the data. This is the 100 TB
    distinct-count pattern: persist a sketch per partition/day, answer
    any coarser-grain distinct query by unioning sketches (exact
    countDistinct cannot re-aggregate: distinct counts don't add).
    Estimates are sketch-implementation-defined, so the query is
    SELF-VERIFYING (see approx_distinct): alongside each estimate it
    computes the exact distinct count and a within-5%-bound flag
    in-engine; the oracle hash-checks the exact counts and the proven
    flags. The sketch-union grand total is still produced from the
    per-group sketches (the mergeability being demonstrated), never
    from a second scan."""
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk"),
        F.countDistinct("l_orderkey").alias("n_exact"),
    )
    per = per_flag.select(
        "l_returnflag",
        F.hll_sketch_estimate("sk").alias("est"),
        "n_exact",
    )
    grand = (
        per_flag.agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est"))
        .join(
            li.agg(F.countDistinct("l_orderkey").alias("n_exact")),
            how="cross",
        )
        .select(F.lit("ALL").alias("l_returnflag"), "est", "n_exact")
    )
    return (
        per.unionByName(grand)
        .select(
            "l_returnflag",
            "n_exact",
            (
                F.abs(F.col("est") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("hll_ok"),
        )
    )


def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via Roaring-style bitmaps
    (``bitmap_construct_agg``): per (event_type, bucket) the user ids
    collapse into a 32k-bit bitmap, distinct-per-type is the sum of
    per-bucket bitmap popcounts, and the grand total re-aggregates the
    SAME bitmaps with ``bitmap_or_agg`` — no second scan, no error bar.
    This is the exact counterpart of ``hll_mergeable_rollup`` for key
    domains dense enough to bitmap (ints): at 100 TB you persist the
    (group, bucket, bitmap) table once and answer any coarser-grain
    distinct query by OR-ing bitmaps. Unlike countDistinct, results
    compose: distinct counts don't add, bitmaps do."""
    e = load_table(spark, sf_dir, "events")
    buckets = e.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bkt")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    per_type = buckets.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )
    grand = (
        buckets.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
        .select(F.lit("ALL").alias("event_type"), "n_users")
    )
    return per_type.unionByName(grand)


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: per-key row counts on the fact side,
    reported as the top-10 heaviest keys with their share of all rows
    and their multiple of the mean key load (``skew_x``). This is the
    measurement that decides salting / AQE-skew-join before a 100 TB
    shuffle: keys with skew_x >> 1 overload one reducer. Plan: one
    map-side-combined count per key (shuffle = key cardinality), a
    1-row global stats aggregate broadcast back over the top-k, and a
    TakeOrderedAndProject for the top-10 (no global sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count("*").alias("cnt"))
    stats = counts.agg(
        F.count("*").alias("n_keys"), F.sum("cnt").alias("n_rows")
    )
    top = counts.orderBy(F.col("cnt").desc(), "l_suppkey").limit(10)
    return top.crossJoin(F.broadcast(stats)).select(
        "l_suppkey",
        "cnt",
        F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
        F.round(
            F.col("cnt") / (F.col("n_rows") / F.col("n_keys")), 4
        ).alias("skew_x"),
    )


def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics: a two-arm A/B readout per event type
    with Welch's t statistic on the value metric. Arms come from the
    md5-portable user hash (deterministic, balanced, engine-portable —
    the same slice shard_assignment uses), so the same user always
    lands in the same arm on any engine.

    Determinism recipe: per-arm Σx and Σx² accumulate in EXACT decimal
    (functions/numeric.py rationale — order-independent across
    partial-agg orders and engines); means/variances/t are then scalar
    double arithmetic over those exact sums with the identical
    expression tree on both engines. One scan, one event-type-grain
    aggregate with conditional sums — no per-arm subqueries, no second
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value").cast(MONEY)
    is_a = _user_arm() == 0
    g = ev.groupBy("event_type").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(is_a, x)).cast("double").alias("sx_a"),
        F.sum(F.when(~is_a, x)).cast("double").alias("sx_b"),
        F.sum(F.when(is_a, x * x)).cast("double").alias("sxx_a"),
        F.sum(F.when(~is_a, x * x)).cast("double").alias("sxx_b"),
    )
    mean_a = F.col("sx_a") / F.col("n_a")
    mean_b = F.col("sx_b") / F.col("n_b")
    var_a = (F.col("sxx_a") - F.col("sx_a") * F.col("sx_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("sxx_b") - F.col("sx_b") * F.col("sx_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    t = (mean_a - mean_b) / F.sqrt(
        var_a / F.col("n_a") + var_b / F.col("n_b")
    )
    # an arm with ≤1 event makes the (n−1) variance divisor 0 — drop
    # such event types BEFORE dividing (ANSI throws, it doesn't NULL;
    # same guard as did_report, mirrored in the oracle)
    g = g.filter(F.least(F.col("n_a"), F.col("n_b")) > 1)
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(mean_a, 4).alias("mean_a"),
        F.round(mean_b, 4).alias("mean_b"),
        F.round(t, 4).alias("t_welch"),
        (F.abs(t) > 1.96).alias("significant_95"),
    )


def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profile: one row per column of ``orders``
    with row/null/exact-distinct counts and min/max rendered to a
    portable string. This is the stats pass a warehouse runs before
    join planning (NDVs feed broadcast/salting decisions) and the
    first artifact of any data-quality onboarding.

    Plan shape: ONE scan feeding a single aggregate with six
    count(DISTINCT col) branches — Catalyst compiles multi-distinct
    into an Expand (scan rows × n_cols+1) plus one partial-agg
    shuffle, which is the cheapest exact-NDV strategy Spark has; the
    1-row wide result is unpivoted to column grain with ``stack``
    (driver-cheap, 6 rows). At 100 TB the Expand multiplier is the
    documented cost of EXACT distincts — when approximate NDV
    suffices, the HLL twin (``approx_distinct``) profiles the same
    table with no Expand at all.

    min/max are computed on the NATIVE type (so numeric/date ordering
    is correct), then rendered: doubles through DECIMAL(18,2) so the
    engine and the oracle print identical text, timestamps/ints via a
    plain string cast.
    """
    orders = load_table(spark, sf_dir, "orders")

    def _render(e: Column, col: str) -> Column:
        if col == "o_totalprice":
            return e.cast("decimal(18,2)").cast("string")
        return e.cast("string")

    cols = [f.name for f in orders.schema.fields]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
        aggs.append(_render(F.min(F.col(c)), c).alias(f"{c}__mn"))
        aggs.append(_render(F.max(F.col(c)), c).alias(f"{c}__mx"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return wide.select(
        F.col("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nonnull, n_distinct, min_repr, max_repr)"
        ),
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_null"),
        "n_distinct",
        "min_repr",
        "max_repr",
    )


def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined AGGREGATE function on the Arrow grouped-agg pandas
    UDF path (Series → scalar per group): quantity-weighted average
    price per return flag. Partial aggregation doesn't apply to an
    opaque UDAF — Spark shuffles the group's rows to one task — so
    built-in expressions stay preferred on hot paths; this pins the
    extension point and its exact semantics vs a SQL oracle."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    # Series -> scalar type hints select the GROUPED_AGG eval type
    # (the PandasUDFType constant is deprecated and warned on every
    # run); `pd` must be a MODULE global — postponed annotations are
    # strings resolved against fn.__globals__, so a local import
    # raises UNSUPPORTED_SIGNATURE
    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        # exact integer-cent accumulation: a float64 partial sum is
        # order-dependent, which flips round() at value boundaries vs
        # the oracle (see functions/numeric.py) — prices carry 2
        # decimals and quantities are integral, so this is exact
        cents = (price * 100).round().astype("int64")
        num = int((cents * qty.astype("int64")).sum())
        return num / 100.0 / float(qty.sum())

    # a grouped-agg pandas UDF can't mix with built-in aggregates in
    # one agg() — the row count is a second pandas aggregate
    @pandas_udf("long")
    def nrows(qty: pd.Series) -> int:
        return len(qty)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias(
            "wavg_price"
        ),
        nrows("l_quantity").alias("n_rows"),
    )


HIST_LO, HIST_HI, HIST_NBUCKETS = 900.0, 105000.0, 20


def histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice: fixed [lo, hi) split into
    NBUCKETS equal bins, out-of-range values clamped into the edge bins.

    The bucket expression is pure arithmetic (portable to the oracle,
    unlike engine-specific width_bucket variants), so the whole thing is
    one codegen'd scan + a NBUCKETS-cardinality partial-agg shuffle —
    the cheapest possible distribution profile at 100 TB. Empty buckets
    are absent from the output (profile semantics, not chart semantics).
    """
    li = load_table(spark, sf_dir, "lineitem")
    width = (HIST_HI - HIST_LO) / HIST_NBUCKETS
    bucket = F.least(
        F.greatest(
            F.floor((F.col("l_extendedprice") - HIST_LO) / width), F.lit(0)
        ),
        F.lit(HIST_NBUCKETS - 1),
    ).cast("long")
    return (
        li.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            F.round(HIST_LO + F.col("bucket") * width, 4).alias("bucket_lo"),
            F.round(HIST_LO + (F.col("bucket") + 1) * width, 4).alias(
                "bucket_hi"
            ),
            "n",
        )
    )


def distribution_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher distribution moments per group — skewness and excess
    kurtosis — computed from explicitly centered powers (two-pass:
    broadcast-join the per-group mean back, then one aggregate of
    (x-μ)^k). Engine built-ins are deliberately avoided here: Spark's
    ``skewness`` is the population estimator while DuckDB's is the
    bias-corrected sample one, so portable pipelines (and the oracle)
    need the definition pinned in arithmetic, not in a function name.

    Scale: two aggregates over the same event_type partitioning; the
    mean table is group-cardinality rows (broadcast). Centered two-pass
    is also the numerically stable choice — raw-moment single-pass
    (E[x³]-3μE[x²]+2μ³) cancels catastrophically at large magnitudes.
    """
    ev = load_table(spark, sf_dir, "events")
    # mean from an exact-decimal sum: every centered power inherits mu,
    # so its double must be identical on both engines (numeric.py)
    means = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    centered = ev.join(F.broadcast(means), on="event_type").select(
        "event_type", (F.col("value") - F.col("mu")).alias("d")
    )
    m = centered.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg(F.col("d") * F.col("d")).alias("m2"),
        F.avg(F.col("d") * F.col("d") * F.col("d")).alias("m3"),
        F.avg(F.col("d") * F.col("d") * F.col("d") * F.col("d")).alias("m4"),
    )
    return m.select(
        "event_type",
        "n",
        F.round(F.sqrt("m2"), 4).alias("stddev_pop"),
        # nz: a zero-variance group (constant metric) has m2 = 0 and
        # undefined skew/kurtosis — NULL beats an ANSI crash
        F.round(F.col("m3") / nz(F.pow("m2", 1.5)), 4).alias(
            "skewness_pop"
        ),
        F.round(
            F.col("m4") / nz(F.col("m2") * F.col("m2")) - 3.0, 4
        ).alias("excess_kurtosis_pop"),
    )


MIN_PAIR_SUPPORT = 5  # minimum co-occurrence count reported


def brand_affinity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: pairs of part brands bought in
    the SAME order, with support and lift (observed co-rate over the
    rate independence predicts; lift > 1 = genuine affinity). The
    co-occurrence family — recommendations, complements, bundle design.

    Per-order brand sets come from one groupBy (part is broadcast into
    the fact scan); pairs expand IN-basket via combination expansion —
    basket size bounds fan-out, there is no brand×brand self-join; one
    count aggregate per pair and a broadcast join of single-brand
    totals finish it. All shuffles carry basket/brand cardinality.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .dropDuplicates()
    )
    n_orders = baskets.select("l_orderkey").distinct().count()
    singles = baskets.groupBy("p_brand").agg(F.count("*").alias("n_brand"))
    sets = baskets.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("p_brand")).alias("brands")
    )
    pairs = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(brands, (x, i) -> "
                    "transform(slice(brands, i + 2, size(brands)), "
                    "y -> struct(x AS brand_a, y AS brand_b))))"
                )
            ).alias("pr")
        )
        .groupBy("pr.brand_a", "pr.brand_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= MIN_PAIR_SUPPORT)
    )
    na = singles.select(
        F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("n_a")
    )
    nb = singles.select(
        F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(na), on="brand_a")
        .join(F.broadcast(nb), on="brand_b")
        .select(
            "brand_a",
            "brand_b",
            "support",
            F.round(
                (F.col("support") / F.lit(n_orders))
                / (
                    (F.col("n_a") / F.lit(n_orders))
                    * (F.col("n_b") / F.lit(n_orders))
                ),
                4,
            ).alias("lift"),
        )
    )


def orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue seasonality: per (year, month) revenue, its
    share of the year, and month-over-month percent change — the
    period-comparison report every warehouse serves daily. Month-grain
    aggregate first (tiny), then two windows over it; the lag ordering
    is (year, month) so January compares against December."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window  # noqa: PLC0415

    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        # decimal accumulation: order-independent sum (see
        # supplier_scorecard) — the month windows below run over ≤12
        # exact-rounded values, so they stay double
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("revenue")
    )
    w_yr = Window.partitionBy("yr")
    w_seq = Window.orderBy("yr", "mo")
    return monthly.select(
        "yr",
        "mo",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w_yr), 6).alias(
            "share_of_year"
        ),
        F.round(
            (F.col("revenue") - F.lag("revenue").over(w_seq))
            / F.lag("revenue").over(w_seq),
            6,
        ).alias("mom_change"),
    )


def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-metric supplier scorecard in ONE aggregate: revenue, item
    count, distinct parts carried, and return rate per supplier —
    conditional and distinct aggregates side by side, then the supplier
    dim broadcast back for names. The standard entity-360 rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    score = li.groupBy("l_suppkey").agg(
        # Money sums accumulate in exact decimal, not double: a double
        # sum's low bits depend on partition/merge order, so a value
        # ulps away from a half-cent boundary flips under round(). The
        # per-row product cast is deterministic; the decimal sum is
        # exact on both engines; cast back to double for a stable
        # output schema.
        F.round(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,4)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("return_rate"),
    )
    return score.join(
        F.broadcast(sup.select("s_suppkey", "s_name")),
        score.l_suppkey == F.col("s_suppkey"),
    ).select("s_suppkey", "s_name", "revenue", "n_items", "n_parts", "return_rate")


TREND_EPOCH = "1995-01-01"


def revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation ordinary-least-squares trend of order revenue over
    time: slope ($/day drift), intercept and R² of ``o_totalprice``
    regressed on the order date, fitted from sufficient statistics.
    This is the closed-form GROUP BY regression a warehouse uses for
    trend dashboards and anomaly baselines — no iterative solver, no
    driver loop.

    Determinism recipe (the regr_slope built-ins are NOT used on
    purpose): a double-precision Σxy is order-dependent in the low
    bits, so the five sufficient statistics accumulate EXACTLY —
    x = integer days since TREND_EPOCH (long sums), y = money in
    decimal (functions/numeric.py rationale), products x·y and y·y as
    exact decimals. The slope/intercept/R² formulas are then scalar
    double arithmetic over those exact sums with the identical
    expression tree on the DuckDB oracle.

    Plan shape: orders joined to the two broadcast dims (customer is
    fixture-small; at 100 TB swap to a shuffle join on custkey — the
    aggregate below is unchanged), then ONE map-side-combined
    aggregate at nation grain. Shuffle carries 25 rows × 6 sums."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    x = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit(TREND_EPOCH).cast("date")
    ).cast("long")
    y = F.col("o_totalprice").cast(MONEY)
    g = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(x).alias("sx"),
            F.sum(x * x).alias("sxx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(y * x).cast("double").alias("sxy"),
            F.sum(y * y).cast("double").alias("syy"),
        )
    )
    n = F.col("n_orders").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    cov_n = n * F.col("sxy") - sx * F.col("sy")
    var_x_n = n * sxx - sx * sx
    var_y_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    # nz: a nation whose orders all land on ONE day has var_x = 0 —
    # the OLS slope/r² are undefined there; NULL beats an ANSI crash
    slope = cov_n / nz(var_x_n)
    intercept = (F.col("sy") - slope * sx) / n
    r2 = (cov_n * cov_n) / nz(var_x_n * var_y_n)
    return g.select(
        "n_name",
        "n_orders",
        F.round(slope, 4).alias("slope_per_day"),
        F.round(intercept, 2).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


# Benford's-law expected share of each leading digit, log10(1 + 1/d),
# precomputed once in Python and embedded as IDENTICAL literals in the
# Spark plan and the oracle SQL (so no engine-libm log10 is in play).
BENFORD_EXPECTED = {d: repr(__import__("math").log10(1 + 1 / d)) for d in range(1, 10)}


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit on order amounts: observed share of each
    leading significant digit of ``o_totalprice`` vs the Benford
    expectation, with the per-digit χ² contribution. A standard
    forensic / data-quality screen — synthetic or fabricated amount
    columns diverge loudly.

    The leading digit is extracted from the DECIMAL(18,2)-rendered
    string (both engines print fixed-point identically) — NOT via
    floor(log10(x)), whose libm rounding can flip the digit at exact
    powers of ten. Expected shares are Python-precomputed literals
    shared verbatim with the oracle. Plan: one scan → 9-group
    map-side-combined count, a 1-row grand-total broadcast back over
    the 9 rows (lint-allowlisted), scalar math after."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.regexp_extract(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), "[1-9]", 0
    )
    counts = orders.groupBy(digit.alias("digit")).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("n_total"))
    expected = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        expected = F.when(
            F.col("digit") == str(d), F.lit(float(BENFORD_EXPECTED[d]))
        ).otherwise(expected)
    share = F.col("n") / F.col("n_total")
    chi = (
        (share - F.col("expected_share"))
        * (share - F.col("expected_share"))
        / F.col("expected_share")
        * F.col("n_total")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("expected_share", expected)
        .select(
            "digit",
            "n",
            F.round(share, 6).alias("share"),
            F.round("expected_share", 6).alias("expected_share"),
            F.round(chi, 4).alias("chi2_term"),
        )
    )


def gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of customer spend per nation —
    the one-number inequality report ("is revenue concentrated in a few
    whale accounts?") behind `revenue_pareto`'s full curve.

    Exact rank formula G = (2·Σ r·x − (n+1)·Σx) / (n·Σx) over spend
    ascending, ties broken by custkey so row_number is deterministic on
    any engine. r·x products and Σx accumulate in exact decimal
    ((10,0)×(18,6) → (28,6), order-independent); only the final ratio
    is float. Plan: one partial-aggregated groupBy(custkey), one
    shuffle join to customer on the same key grain, a broadcast to the
    25-row nation dim, and per-nation windows — nothing global, and the
    rank window rides the nation-key exchange the groupBy needs anyway."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("spend")
    )
    j = spend.join(
        cust.select("c_custkey", "c_nationkey"),
        spend.o_custkey == cust.c_custkey,
    ).join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    wr = Window.partitionBy("n_name").orderBy("spend", "o_custkey")
    wn = Window.partitionBy("n_name")
    ranked = j.select(
        "n_name",
        "spend",
        F.row_number().over(wr).cast("decimal(10,0)").alias("r"),
        F.count("*").over(wn).alias("n"),
    )
    return (
        ranked.groupBy("n_name", "n")
        .agg(
            F.sum(F.col("r") * F.col("spend")).alias("rx"),
            F.sum("spend").alias("sx"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_customers"),
            F.round(
                (
                    2.0 * F.col("rx").cast("double")
                    - (F.col("n") + 1).cast("double")
                    * F.col("sx").cast("double")
                )
                / (F.col("n").cast("double") * F.col("sx").cast("double")),
                6,
            ).alias("gini"),
        )
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "gini_by_nation": gini_by_nation,
    "histogram_equiwidth": histogram_equiwidth,
    "brand_affinity_pairs": brand_affinity_pairs,
    "orders_seasonality": orders_seasonality,
    "supplier_scorecard": supplier_scorecard,
    "distribution_moments": distribution_moments,
    "hll_mergeable_rollup": hll_mergeable_rollup,
    "bitmap_distinct_rollup": bitmap_distinct_rollup,
    "key_skew_profile": key_skew_profile,
    "profile_columns": profile_columns,
    "ab_test_report": ab_test_report,
    "did_report": did_report,
    "revenue_trend_ols": revenue_trend_ols,
    "benford_first_digit": benford_first_digit,
    "udaf_weighted_avg": udaf_weighted_avg,
    "approx_quantiles": approx_quantiles,
    "count_distinct_agg": count_distinct_agg,
    "agg_having": agg_having,
    "rollup_sales": rollup_sales,
    "cube_sales": cube_sales,
    "pivot_status": pivot_status,
    "grouping_sets_sales": grouping_sets_sales,
    "percentiles_by_group": percentiles_by_group,
    "winsorized_stats": winsorized_stats,
    "central_tendency": central_tendency,
    "correlation_stats": correlation_stats,
    "spearman_by_group": spearman_by_group,
    "weighted_median_by_group": weighted_median_by_group,
    "hill_tail_index": hill_tail_index,
    "approx_distinct": approx_distinct,
}

_HIST_W = (HIST_HI - HIST_LO) / HIST_NBUCKETS

ORACLES = {
    "hill_tail_index": f"""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                        AS DOUBLE) AS spend
            FROM orders GROUP BY o_custkey
        ), ranked AS (
            SELECT spend,
                   row_number() OVER (ORDER BY spend DESC, o_custkey)
                       AS rk
            FROM spend
        ), xk1 AS (
            SELECT spend AS x_k1 FROM ranked WHERE rk = {HILL_K + 1}
        )
        SELECT count(*)::BIGINT AS k,
               round(CASE WHEN avg(ln(spend / x_k1)) > 0
                          THEN 1.0 / avg(ln(spend / x_k1)) END,
                     4) AS hill_alpha
        FROM ranked, xk1
        WHERE rk <= {HILL_K}
    """,
    "weighted_median_by_group": """
        WITH cum AS (
            SELECT l_returnflag, l_extendedprice,
                   sum(CAST(l_quantity AS DECIMAL(18,6)))
                       OVER (PARTITION BY l_returnflag
                             ORDER BY l_extendedprice, l_orderkey,
                                      l_partkey
                             ROWS UNBOUNDED PRECEDING) AS cw,
                   sum(CAST(l_quantity AS DECIMAL(18,6)))
                       OVER (PARTITION BY l_returnflag) AS tw
            FROM lineitem
        )
        SELECT l_returnflag,
               round(min(l_extendedprice), 4) AS weighted_median,
               max(CAST(tw AS DOUBLE)) AS total_weight
        FROM cum
        WHERE cw >= tw / 2
        GROUP BY l_returnflag
    """,
    "spearman_by_group": """
        WITH ranked AS (
            SELECT l_returnflag,
                   CAST(2 * rank() OVER (PARTITION BY l_returnflag
                                         ORDER BY l_quantity)
                        + count(*) OVER (PARTITION BY l_returnflag,
                                         l_quantity)
                        - 1 AS DECIMAL(20,0)) AS rx,
                   CAST(2 * rank() OVER (PARTITION BY l_returnflag
                                         ORDER BY l_extendedprice)
                        + count(*) OVER (PARTITION BY l_returnflag,
                                         l_extendedprice)
                        - 1 AS DECIMAL(20,0)) AS ry
            FROM lineitem
        ), st AS (
            SELECT l_returnflag, count(*) AS n,
                   sum(rx) AS sx, sum(ry) AS sy, sum(rx * ry) AS sxy,
                   sum(rx * rx) AS sxx, sum(ry * ry) AS syy
            FROM ranked GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE)
                                 * CAST(sy AS DOUBLE))),
                     6) AS spearman
        FROM st
        WHERE (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
          AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
    """,
    "gini_by_nation": """
        WITH spend AS (
            SELECT o_custkey,
                   sum(CAST(o_totalprice AS DECIMAL(18,6))) AS spend
            FROM orders GROUP BY o_custkey
        ), ranked AS (
            SELECT n_name,
                   spend,
                   CAST(row_number() OVER (PARTITION BY n_name
                        ORDER BY spend, o_custkey) AS DECIMAL(10,0)) AS r,
                   count(*) OVER (PARTITION BY n_name) AS n
            FROM spend
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT n_name AS nation,
               n AS n_customers,
               round((2.0 * CAST(sum(r * spend) AS DOUBLE)
                      - CAST(n + 1 AS DOUBLE) * CAST(sum(spend) AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sum(spend) AS DOUBLE)),
                     6) AS gini
        FROM ranked
        GROUP BY n_name, n
    """,
    "orders_seasonality": """
        WITH monthly AS (
            SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                        AS DOUBLE) AS revenue
            FROM orders GROUP BY 1, 2
        )
        SELECT yr, mo, revenue,
               round(revenue / sum(revenue) OVER (PARTITION BY yr), 6)
                   AS share_of_year,
               round((revenue - lag(revenue) OVER (ORDER BY yr, mo))
                     / lag(revenue) OVER (ORDER BY yr, mo), 6)
                   AS mom_change
        FROM monthly
    """,
    "supplier_scorecard": """
        SELECT s_suppkey, s_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS revenue,
               count(*) AS n_items,
               count(DISTINCT l_partkey) AS n_parts,
               round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                     / count(*), 6) AS return_rate
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_suppkey, s_name
    """,
    "brand_affinity_pairs": f"""
        WITH baskets AS (
            SELECT DISTINCT l_orderkey, p_brand
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
        singles AS (
            SELECT p_brand, count(*) AS n_brand FROM baskets GROUP BY 1
        ),
        pairs AS (
            SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                   count(*) AS support
            FROM baskets a JOIN baskets b
              ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
            GROUP BY 1, 2
            HAVING count(*) >= {MIN_PAIR_SUPPORT}
        )
        SELECT brand_a, brand_b, support,
               round((support::DOUBLE / n.n_orders) /
                     ((sa.n_brand::DOUBLE / n.n_orders) *
                      (sb.n_brand::DOUBLE / n.n_orders)), 4) AS lift
        FROM pairs
        JOIN singles sa ON sa.p_brand = pairs.brand_a
        JOIN singles sb ON sb.p_brand = pairs.brand_b
        CROSS JOIN n
    """,
    "distribution_moments": """
        WITH means AS (
            SELECT event_type,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) AS mu
            FROM events GROUP BY event_type
        ),
        c AS (
            SELECT e.event_type, e.value - m.mu AS d
            FROM events e JOIN means m USING (event_type)
        ),
        mm AS (
            SELECT event_type, count(*) AS n,
                   avg(d * d) AS m2,
                   avg(d * d * d) AS m3,
                   avg(d * d * d * d) AS m4
            FROM c GROUP BY event_type
        )
        SELECT event_type, n,
               round(sqrt(m2), 4) AS stddev_pop,
               round(m3 / pow(m2, 1.5), 4) AS skewness_pop,
               round(m4 / (m2 * m2) - 3.0, 4) AS excess_kurtosis_pop
        FROM mm
    """,
    "histogram_equiwidth": f"""
        WITH b AS (
            SELECT least(greatest(
                       floor((l_extendedprice - {HIST_LO}) / {_HIST_W}),
                       0), {HIST_NBUCKETS - 1})::BIGINT AS bucket
            FROM lineitem
        )
        SELECT bucket,
               round({HIST_LO} + bucket * {_HIST_W}, 4) AS bucket_lo,
               round({HIST_LO} + (bucket + 1) * {_HIST_W}, 4) AS bucket_hi,
               count(*)::BIGINT AS n
        FROM b GROUP BY bucket
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               {money_sum_sql("l_extendedprice")} AS sum_base_price,
               {money_sum_sql("l_extendedprice * (1 - l_discount)")}
                   AS sum_disc_price,
               {money_sum_sql(
                   "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
               )} AS sum_charge,
               avg(l_quantity) AS avg_qty,
               {money_avg_sql("l_extendedprice")} AS avg_price,
               {money_avg_sql("l_discount")} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "udaf_weighted_avg": f"""
        SELECT l_returnflag,
               round({money_sum_sql("l_extendedprice * l_quantity")}
                     / sum(l_quantity), 4) AS wavg_price,
               count(*)::BIGINT AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "bitmap_distinct_rollup": """
        SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'ALL' AS event_type, count(DISTINCT user_id)::BIGINT
        FROM events
    """,
    "key_skew_profile": """
        WITH counts AS (
            SELECT l_suppkey, count(*) AS cnt
            FROM lineitem GROUP BY l_suppkey
        ), stats AS (
            SELECT count(*) AS n_keys, sum(cnt) AS n_rows FROM counts
        )
        SELECT l_suppkey, cnt,
               round(cnt / n_rows, 6) AS share,
               round(cnt / (n_rows / n_keys), 4) AS skew_x
        FROM counts, stats
        ORDER BY cnt DESC, l_suppkey LIMIT 10
    """,
    "count_distinct_agg": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_having": f"""
        SELECT o_custkey, count(*) AS n_orders,
               {money_sum_sql("o_totalprice")} AS spent
        FROM orders GROUP BY o_custkey HAVING count(*) >= 3
    """,
    "rollup_sales": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_sales": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "pivot_status": """
        SELECT l_returnflag,
               coalesce(sum(CASE WHEN l_linestatus = 'O'
                                 THEN l_quantity END), 0.0) AS qty_open,
               coalesce(sum(CASE WHEN l_linestatus = 'F'
                                 THEN l_quantity END), 0.0) AS qty_filled
        FROM lineitem GROUP BY l_returnflag
    """,
    "winsorized_stats": f"""
        WITH bounds AS (
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, {WINSOR_LO}) AS lo,
                   quantile_cont(l_extendedprice, {WINSOR_HI}) AS hi
            FROM lineitem GROUP BY l_returnflag
        ),
        c AS (
            SELECT l.l_returnflag,
                   least(greatest(l.l_extendedprice, b.lo), b.hi) AS v,
                   (l.l_extendedprice < b.lo OR l.l_extendedprice > b.hi)
                       AS clipped
            FROM lineitem l JOIN bounds b USING (l_returnflag)
        )
        SELECT l_returnflag,
               round(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                     / count(*), 4) AS winsor_mean,
               round(sqrt((CAST(sum(CAST(v * v AS DECIMAL(30,12)))
                               AS DOUBLE)
                           - (CAST(sum(CAST(v AS DECIMAL(18,6)))
                                   AS DOUBLE)
                              * CAST(sum(CAST(v AS DECIMAL(18,6)))
                                     AS DOUBLE)) / count(*))
                          / (count(*) - 1)), 4) AS winsor_std,
               sum(clipped::INT)::BIGINT AS n_clipped,
               count(*) AS n
        FROM c GROUP BY l_returnflag
    """,
    "percentiles_by_group": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
               round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        FROM lineitem GROUP BY l_returnflag
    """,
    "correlation_stats": """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
               round(covar_samp(l_quantity, l_extendedprice), 4)
                   AS covar_qp,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4)
                   AS intercept
        FROM lineitem GROUP BY l_returnflag
    """,
    "central_tendency": """
        WITH modes AS (
            SELECT l_returnflag, l_quantity AS mode_qty FROM (
                SELECT l_returnflag, l_quantity, count(*) AS n,
                       row_number() OVER (
                           PARTITION BY l_returnflag
                           ORDER BY count(*) DESC, l_quantity
                       ) AS rk
                FROM lineitem GROUP BY l_returnflag, l_quantity
            ) WHERE rk = 1
        )
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
               mode_qty
        FROM lineitem JOIN modes USING (l_returnflag)
        GROUP BY l_returnflag, mode_qty
    """,
    "grouping_sets_sales": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               sum(l_quantity) AS sum_qty,
               (grouping(l_returnflag) * 2 + grouping(l_linestatus))::BIGINT
                   AS grouping_id
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    # sketch queries are SELF-VERIFYING (exact values + in-engine bound
    # booleans), so their oracles check exact counts and literal TRUEs —
    # a hash-checked proof the sketch stayed within its declared bound.
    "approx_distinct": """
        SELECT l_linestatus, count(DISTINCT l_orderkey)::BIGINT AS n_exact,
               TRUE AS hll_ok
        FROM lineitem GROUP BY l_linestatus
    """,
    "hll_mergeable_rollup": """
        SELECT l_returnflag, count(DISTINCT l_orderkey)::BIGINT AS n_exact,
               TRUE AS hll_ok
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT 'ALL' AS l_returnflag,
               count(DISTINCT l_orderkey)::BIGINT AS n_exact, TRUE AS hll_ok
        FROM lineitem
    """,
    "revenue_trend_ols": f"""
        WITH pts AS (
            SELECT n_name,
                   datediff('day', DATE '{TREND_EPOCH}',
                            CAST(o_orderdate AS DATE))::BIGINT AS x,
                   CAST(o_totalprice AS DECIMAL(18,6)) AS y
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
        ), g AS (
            SELECT n_name,
                   count(*)::BIGINT AS n_orders,
                   sum(x)::BIGINT AS sx,
                   sum(x * x)::BIGINT AS sxx,
                   CAST(sum(y) AS DOUBLE) AS sy,
                   CAST(sum(CAST(y AS DECIMAL(28,6)) * x) AS DOUBLE)
                       AS sxy,
                   CAST(sum(CAST(y AS DECIMAL(28,6)) * y) AS DOUBLE)
                       AS syy
            FROM pts GROUP BY n_name
        )
        SELECT n_name, n_orders,
               round((n_orders * sxy - sx * sy)
                     / (n_orders * sxx - CAST(sx AS DOUBLE) * sx), 4)
                   AS slope_per_day,
               round((sy - (n_orders * sxy - sx * sy)
                           / (n_orders * sxx - CAST(sx AS DOUBLE) * sx)
                           * sx) / n_orders, 2) AS intercept,
               round((n_orders * sxy - sx * sy)
                     * (n_orders * sxy - sx * sy)
                     / ((n_orders * sxx - CAST(sx AS DOUBLE) * sx)
                        * (n_orders * syy - sy * sy)), 6) AS r2
        FROM g
    """,
    "benford_first_digit": f"""
        WITH counts AS (
            SELECT regexp_extract(
                       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                       '[1-9]', 0) AS digit,
                   count(*)::BIGINT AS n
            FROM orders GROUP BY 1
        ), tot AS (SELECT sum(n)::BIGINT AS n_total FROM counts),
        e AS (
            SELECT digit, n, n_total,
                   CASE digit
                       {" ".join(f"WHEN '{d}' THEN {BENFORD_EXPECTED[d]}" for d in range(1, 10))}
                   END AS expected_share
            FROM counts, tot
        )
        SELECT digit, n,
               round(CAST(n AS DOUBLE) / n_total, 6) AS share,
               round(expected_share, 6) AS expected_share,
               round((CAST(n AS DOUBLE) / n_total - expected_share)
                     * (CAST(n AS DOUBLE) / n_total - expected_share)
                     / expected_share * n_total, 4) AS chi2_term
        FROM e
    """,
    "did_report": f"""
        WITH armed AS (
            SELECT event_type,
                   ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
                       % 2 = 1 AS treated,
                   day(ts) > {DID_PRE_DAY} AS post,
                   CAST(value AS DECIMAL(18,6)) AS x
            FROM events
        ), g AS (
            SELECT event_type,
                   sum(CASE WHEN treated AND post THEN 1 ELSE 0 END)
                       ::BIGINT AS n_tp,
                   sum(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END)
                       ::BIGINT AS n_tr,
                   sum(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END)
                       ::BIGINT AS n_cp,
                   sum(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0
                       END)::BIGINT AS n_cr,
                   CAST(sum(CASE WHEN treated AND post THEN x END)
                        AS DOUBLE) AS sx_tp,
                   CAST(sum(CASE WHEN treated AND NOT post THEN x END)
                        AS DOUBLE) AS sx_tr,
                   CAST(sum(CASE WHEN NOT treated AND post THEN x END)
                        AS DOUBLE) AS sx_cp,
                   CAST(sum(CASE WHEN NOT treated AND NOT post THEN x
                        END) AS DOUBLE) AS sx_cr,
                   CAST(sum(CASE WHEN treated AND post THEN x * x END)
                        AS DOUBLE) AS sxx_tp,
                   CAST(sum(CASE WHEN treated AND NOT post THEN x * x
                        END) AS DOUBLE) AS sxx_tr,
                   CAST(sum(CASE WHEN NOT treated AND post THEN x * x
                        END) AS DOUBLE) AS sxx_cp,
                   CAST(sum(CASE WHEN NOT treated AND NOT post THEN
                        x * x END) AS DOUBLE) AS sxx_cr
            FROM armed GROUP BY event_type
        )
        SELECT event_type,
               n_tp + n_tr AS n_treated,
               n_cp + n_cr AS n_control,
               round(sx_tp / n_tp - sx_tr / n_tr, 4) AS treated_delta,
               round(sx_cp / n_cp - sx_cr / n_cr, 4) AS control_delta,
               round((sx_tp / n_tp - sx_tr / n_tr)
                     - (sx_cp / n_cp - sx_cr / n_cr), 4) AS did,
               round(((sx_tp / n_tp - sx_tr / n_tr)
                      - (sx_cp / n_cp - sx_cr / n_cr))
                     / sqrt(((sxx_tp - sx_tp * sx_tp / n_tp) / (n_tp - 1))
                                / n_tp
                          + ((sxx_tr - sx_tr * sx_tr / n_tr) / (n_tr - 1))
                                / n_tr
                          + ((sxx_cp - sx_cp * sx_cp / n_cp) / (n_cp - 1))
                                / n_cp
                          + ((sxx_cr - sx_cr * sx_cr / n_cr) / (n_cr - 1))
                                / n_cr),
                     4) AS z
        FROM g
        WHERE least(n_tp, n_tr, n_cp, n_cr) > 1
    """,
    "ab_test_report": """
        WITH armed AS (
            SELECT event_type,
                   ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
                       % 2 = 0 AS is_a,
                   CAST(value AS DECIMAL(18,6)) AS x
            FROM events
        ), g AS (
            SELECT event_type,
                   sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS n_a,
                   sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END)::BIGINT AS n_b,
                   CAST(sum(CASE WHEN is_a THEN x END) AS DOUBLE) AS sx_a,
                   CAST(sum(CASE WHEN NOT is_a THEN x END) AS DOUBLE) AS sx_b,
                   CAST(sum(CASE WHEN is_a THEN x * x END) AS DOUBLE)
                       AS sxx_a,
                   CAST(sum(CASE WHEN NOT is_a THEN x * x END) AS DOUBLE)
                       AS sxx_b
            FROM armed GROUP BY event_type
        )
        SELECT event_type, n_a, n_b,
               round(sx_a / n_a, 4) AS mean_a,
               round(sx_b / n_b, 4) AS mean_b,
               round((sx_a / n_a - sx_b / n_b)
                     / sqrt(((sxx_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
                          + ((sxx_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b),
                     4) AS t_welch,
               abs((sx_a / n_a - sx_b / n_b)
                   / sqrt(((sxx_a - sx_a * sx_a / n_a) / (n_a - 1)) / n_a
                        + ((sxx_b - sx_b * sx_b / n_b) / (n_b - 1)) / n_b))
                   > 1.96 AS significant_95
        FROM g
        WHERE least(n_a, n_b) > 1
    """,
    "profile_columns": " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, count(*)::BIGINT AS n_rows,
               (count(*) - count({c}))::BIGINT AS n_null,
               count(DISTINCT {c})::BIGINT AS n_distinct,
               CAST({r.format(f'min({c})')} AS VARCHAR) AS min_repr,
               CAST({r.format(f'max({c})')} AS VARCHAR) AS max_repr
        FROM orders
        """
        for c, r in [
            ("o_orderkey", "{}"),
            ("o_custkey", "{}"),
            ("o_orderstatus", "{}"),
            ("o_totalprice", "CAST({} AS DECIMAL(18,2))"),
            ("o_orderdate", "{}"),
            ("o_orderpriority", "{}"),
        ]
    ),
    "approx_quantiles": """
        SELECT event_type, count(*)::BIGINT AS n,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99,
               TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        FROM events GROUP BY event_type
    """,
}
