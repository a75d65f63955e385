"""TPC-H shapes q7-q21: the second tranche of classic plan shapes.

Completes the 22-query TPC-H surface (tpch.py holds q1-q6, q10, q13-q18,
q22 analogs). The driver fixtures omit ``partsupp`` and lineitem's
shipmode/commitdate/receiptdate columns (TESTDATA.md), so each query
documents its adaptation — the PLAN SHAPE (the thing Catalyst has to
optimize: multi-way joins with role-playing dims, disjunctive pushdown,
nested EXISTS/NOT EXISTS, scalar-threshold having) is preserved even
where a column is proxied.

Scale posture: every dim join broadcasts (nation/region/supplier/part are
KB-to-MB at any SF; lineitem is the only 100 TB table). q21's classic
double self-join of lineitem (EXISTS + NOT EXISTS) is rewritten as ONE
grouped aggregation over the fact — a single shuffle on l_orderkey
instead of two extra fact-sized shuffles; the DuckDB oracle keeps the
textbook correlated form, so the rewrite is verified, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import money_round_sum, money_round_sum_sql


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between two specific nations,
    by supplier nation × customer nation × year. The nation dim plays
    two roles (supplier side / customer side) — joined twice under
    aliases, both broadcast; the disjunctive nation-pair predicate is
    applied after both joins, exactly like the spec's n1/n2 pairing."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            money_round_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue inside
    one region, per year — the conditional-sum-over-sum ratio with a
    role-playing nation dim (customer's nation restricts the region;
    supplier's nation feeds the share numerator)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n_cust = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n_supp = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # decimal numerator/denominator -> the ratio divides two
            # exact values, so the rounded share is order-independent
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol)
                    .otherwise(0.0)
                    .cast("decimal(18,6)")
                ).cast("double")
                / F.sum(vol.cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × year over a
    name-pattern part subset. Fixtures have no partsupp, so
    ``ps_supplycost`` is proxied by a deterministic function of the part
    (0.6 × p_retailprice) — the plan shape (fact ⋈ part-filter ⋈
    supplier ⋈ nation, derived measure, two-level group) is unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        F.col("p_retailprice") * 0.6
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(money_round_sum(profit, 2).alias("sum_profit"))
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation's
    suppliers, kept only when above a fraction of the GLOBAL total — the
    group-agg vs broadcast-scalar-threshold (HAVING > scalar subquery)
    shape. partsupp's availqty×supplycost is proxied by shipped
    quantity × unit price from lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    nat_items = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("v"))
    )
    # decimal sums so the HAVING threshold comparison (which decides
    # ROW MEMBERSHIP, not just a printed digit) is exact on both
    # engines; the 0.1% fraction becomes an integer multiply
    # (value*1000 > total) to stay inside decimal arithmetic
    per_part = nat_items.groupBy("l_partkey").agg(
        F.sum(F.col("v").cast("decimal(18,6)")).alias("part_value_dec")
    )
    total = nat_items.agg(
        F.sum(F.col("v").cast("decimal(18,6)")).alias("total_dec")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("part_value_dec") * 1000 > F.col("total_dec")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("part_value_dec", 2)
            .cast("double")
            .alias("part_value"),
        )
    )


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two conditional counts split by order priority,
    grouped by a low-cardinality line attribute. Fixtures lack
    shipmode/commitdate/receiptdate: "late" is adapted to shipped >90
    days after order date, and l_returnflag stands in for l_shipmode as
    the grouping column."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAY")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per (brand, type, size)
    excluding a supplier blacklist (NOT IN subquery → broadcast
    left-anti join). The partsupp part-supplier relation is derived as
    the distinct (l_partkey, l_suppkey) pairs of lineitem; the
    "complaints" blacklist is proxied by negative account balance."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand, size-range,
    quantity-range) conjunctions — the disjunctive-predicate-pushdown
    test. p_container is absent; p_size ranges take its place in each
    branch. The part side still broadcasts, and each disjunct narrows
    both sides before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(branch).agg(
        money_round_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of name-pattern parts whose 1996
    shipments exceed a fraction of their all-time volume for that part
    — the nested IN-subquery chain (part pattern → per-(part,supplier)
    threshold → supplier semi-join). availqty is proxied by all-time
    shipped quantity; the two per-pair aggregates fuse into ONE grouped
    aggregation with a conditional sum (single shuffle, no self-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    in96 = (F.col("l_shipdate") >= F.lit("1996-01-01")) & (
        F.col("l_shipdate") < F.lit("1997-01-01")
    )
    pairs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in96, F.col("l_quantity")).otherwise(0.0)).alias("qty96"),
            F.sum("l_quantity").alias("qty_all"),
        )
        .filter(F.col("qty96") > 0.3 * F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(pairs, s.s_suppkey == pairs.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name")
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finished order. The classic form is lineitem EXISTS
    (another supplier on the order) AND NOT EXISTS (another LATE
    supplier) — two extra fact-sized self-joins. Spark-first rewrite:
    one groupBy(l_orderkey) computing n_suppliers / n_late_suppliers /
    the single late supplier, then filter — one shuffle of the fact.
    The oracle keeps the textbook EXISTS/NOT EXISTS formulation, so the
    rewrite is hash-verified against the correlated original.
    Adaptations: late = shipped >90 days after order date (no
    receipt/commit dates); numwait counts distinct orders."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAY")
    # Two-level agg instead of countDistinct×2: a distinct-aggregate
    # pair would plan an Expand (doubling the shuffled rows); grouping
    # to (order, supplier) grain first shuffles the fact exactly once,
    # and the second groupBy runs over the much smaller pair grain.
    per_pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("is_late"))
    )
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum("is_late").alias("n_late"),
            F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
                "late_supp"
            ),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        per_order.groupBy("late_supp")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "numwait")
    )


QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q12_late_shipments": q12_late_shipments,
    "q16_supplier_count": q16_supplier_count,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_supplier": q21_waiting_supplier,
}

ORACLES = {
    "q7_volume_shipping": """
        SELECT supp_nation, cust_nation, l_year,
               CAST(round(sum(CAST(volume AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": """
        SELECT o_year,
               round(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3'
                                        THEN volume ELSE 0.0 END
                                   AS DECIMAL(18,6))) AS DOUBLE)
                     / CAST(sum(CAST(volume AS DECIMAL(18,6)))
                            AS DOUBLE), 6) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   ns.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation nc ON c_nationkey = nc.n_nationkey
            JOIN region ON nc.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ns ON s_nationkey = ns.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
        )
        GROUP BY o_year
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation, year(l_shipdate) AS o_year,
               {money_round_sum_sql(
                   "l_extendedprice * (1 - l_discount)"
                   " - 0.6 * p_retailprice * l_quantity", 2)} AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, year(l_shipdate)
    """,
    "q11_important_stock": """
        WITH nat_items AS (
            SELECT l_partkey, l_extendedprice * l_quantity AS v
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_5'
        )
        SELECT l_partkey AS partkey,
               CAST(round(sum(CAST(v AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS part_value
        FROM nat_items
        GROUP BY l_partkey
        HAVING sum(CAST(v AS DECIMAL(18,6))) * 1000 >
               (SELECT sum(CAST(v AS DECIMAL(18,6))) FROM nat_items)
    """,
    "q12_late_shipments": """
        SELECT l_returnflag AS ship_class,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY l_returnflag
    """,
    "q16_supplier_count": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON ps.l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
          AND ps.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    "q19_disjunctive_revenue": f"""
        SELECT {money_round_sum_sql(
            "l_extendedprice * (1 - l_discount)", 2)} AS revenue,
               count(*)::BIGINT AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q20_excess_suppliers": """
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
          AND s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
            GROUP BY l_partkey, l_suppkey
            HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                             AND l_shipdate < TIMESTAMP '1997-01-01'
                            THEN l_quantity ELSE 0.0 END)
                   > 0.3 * sum(l_quantity))
    """,
    "q21_waiting_supplier": """
        SELECT s_name,
               count(DISTINCT l1.l_orderkey)::BIGINT AS numwait
        FROM lineitem l1
        JOIN orders o1 ON l1.l_orderkey = o1.o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o1.o_orderstatus = 'F'
          AND n_name = 'NATION_9'
          AND l1.l_shipdate > o1.o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_name
    """,
}
