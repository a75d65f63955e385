"""Join operators (SURVEY §2.4, J1-J15).

The reference's joins are all equi inner/left star joins
(medical_formula_process.py:116-119, payment_process.py:149-159,
retreat_process.py:159-163, service_process.py:142-153), including a
multi-column attribute-match join (J5, payment_process.py:136) and
role-playing dims joined twice under renames (J14,
service_process.py:148-151). Semi/anti come free with the same API.

Scale posture: dimension sides (region/nation/customer-derived attribute
dims) are broadcast — explicitly hinted where the dim is provably small,
otherwise left to Catalyst/AQE. Fact-fact joins (lineitem⋈orders)
sort-merge on the join key; at 100 TB both sides shuffle-partition on
o_orderkey/l_orderkey, which is the natural co-partitioning for bucketed
storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.numeric import money_sum, money_sum_sql


def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join fact→dims (J1-J4 pattern): revenue by region/nation.

    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region — the TPC-H analog of
    the 4-dim star join at reference medical_formula_process.py:116-119.
    nation/region are broadcast (tiny dims); lineitem⋈orders is the only
    real shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner")
        .groupBy("r_name", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def multi_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column named-key join (J5, reference payment_process.py:136):
    recover a surrogate id by matching ALL attribute columns.

    Builds an attribute dim from distinct (c_nationkey, c_mktsegment)
    pairs with a deterministic surrogate key, then joins it back to
    customer on both columns — the Spark-native version of the
    demografica_id recovery round-trip (SURVEY §1.1).
    """
    c = load_table(spark, sf_dir, "customer")
    dim = (
        c.select("c_nationkey", "c_mktsegment")
        .dropDuplicates()
        .withColumn(
            "demo_id",
            F.row_number()
            .over(Window.orderBy("c_nationkey", "c_mktsegment"))
            .cast("long"),
        )
    )
    return (
        c.join(F.broadcast(dim), on=["c_nationkey", "c_mktsegment"])
        .select("c_custkey", "demo_id")
    )


def left_join_miss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join preserving unmatched rows (J6-J8, reference
    payment_process.py:149-151): parts never shipped get NULL-ish counts.
    """
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    shipped = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("qty"))
    return (
        p.join(shipped, p.p_partkey == shipped.l_partkey, "left")
        .select(
            "p_partkey",
            "p_brand",
            F.coalesce("qty", F.lit(0.0)).alias("qty_shipped"),
        )
    )


def role_playing_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same dimension joined twice under different roles (J14, reference
    service_process.py:148-151 joins dim_hora and dim_fecha twice each).

    nation plays both customer-nation and supplier-nation: shipping
    volume between nation pairs (TPC-H Q7 shape).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cust_nation = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp_nation = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cust_nation), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(supp_nation), s.s_nationkey == F.col("sn_key"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume")
        )
    )


N_SALTS = 8


def salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join via explicit salting: the fact side gets a
    deterministic salt in [0, N_SALTS); the dim side is exploded to all
    salts; the join key becomes (key, salt), splitting any hot key's
    rows across N_SALTS reducers.

    Salting is semantically transparent — the result is byte-identical
    to the plain join (the oracle IS the plain join). Use when one key
    dominates (null keys, default ids, boilerplate docs) and AQE's
    skew-join splitting can't help (e.g. a skewed broadcast-miss or
    aggregation feeding the join). Salt is derived from row content
    (xxhash64), never rand() — reproducible across retries, which
    matters for speculative execution at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    salted_fact = li.withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)),
    )
    salted_dim = s.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    ).withColumn("salt", F.col("salt").cast("long"))
    return (
        salted_fact.join(
            F.broadcast(salted_dim),
            (salted_fact.l_suppkey == salted_dim.s_suppkey)
            & (salted_fact.salt == salted_dim.salt),
        )
        .groupBy("s_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


BLOOM_BITS = 1 << 13  # filter size: 8192 bits = 128 longs (scale knob)
BLOOM_HASHES = 3      # k independent xxhash64 seeds per key


HOT_KEY_MIN_ROWS = 1000  # fact rows above which a join key is "hot"


def skew_hybrid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/cold hybrid join — per-key skew isolation, the step beyond
    uniform salting (salted_join): keys whose fact-side row count
    exceeds HOT_KEY_MIN_ROWS are split off and joined BROADCAST (their
    dim rows ship to every task, so a hot key's rows never converge on
    one reducer at all), while the cold long tail takes the normal
    shuffle join; one unionByName reassembles before the aggregate.

    Uniform salting taxes every key to fix a few; the hybrid split
    taxes only the measured hot set — the shape AQE's skew-join
    mitigation approximates at runtime, made explicit for when the
    skew is known (null buckets, default ids, boilerplate docs).
    Semantically transparent: the oracle is the plain join+aggregate.
    The hot-key list is a count aggregate kept in-plan (broadcast
    semi/anti splits) — nothing collects to the driver.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    hot = (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > HOT_KEY_MIN_ROWS)
        .select("l_orderkey")
    )
    li_hot = li.join(F.broadcast(hot), on="l_orderkey", how="left_semi")
    li_cold = li.join(F.broadcast(hot), on="l_orderkey", how="left_anti")
    o_hot = o.join(
        F.broadcast(hot),
        o.o_orderkey == hot.l_orderkey,
        "left_semi",
    )
    joined_hot = li_hot.join(
        F.broadcast(o_hot), li_hot.l_orderkey == o_hot.o_orderkey
    )
    joined_cold = li_cold.join(o, li_cold.l_orderkey == o.o_orderkey)
    cols = ["o_orderpriority", "l_extendedprice", "l_discount"]
    return (
        joined_hot.select(*cols)
        .unionByName(joined_cold.select(*cols))
        .groupBy("o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter pre-filtered join: revenue per supplier of
    two nations. The filtered supplier dim (~10% of suppliers) is
    summarized into an m-bit Bloom filter; the fact scan probes the
    filter BEFORE the join, so rows that cannot match never reach the
    join's hash table (and, on a cluster, never leave the scan stage).

    Semantically transparent: a Bloom filter has no false negatives, so
    the result is byte-identical to the plain filtered join — the
    oracle IS that plain join. This is the dataflow of Spark's own
    InjectRuntimeFilter / dynamic partition pruning made explicit, for
    the cases the optimizer can't see (e.g. a dim filtered by a
    subquery it won't rewrite, or a non-partition key at 100 TB where
    shipping 128 longs to every scan task saves a full shuffle of
    non-matching fact rows).

    Build cost: one tiny aggregation (bit_or per 64-bit word over
    k·|dim| positions) materialized driver-side as BLOOM_BITS/64
    longs — O(filter bits) like the k-means centroid collect
    (llm/training.py), never data-sized. Probe cost: k hashes +
    shift/AND per row, pure whole-stage codegen, no join, no shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    dim = (
        s.join(
            F.broadcast(
                n.filter(F.col("n_name").isin("NATION_8", "NATION_9"))
            ),
            s.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )

    # Build: k bit positions per key -> 64-bit words via bit_or.
    # xxhash64 is type-sensitive; both sides hash an explicit BIGINT.
    pos = [
        F.pmod(
            F.xxhash64(F.col("s_suppkey").cast("long"), F.lit(i)),
            F.lit(BLOOM_BITS),
        )
        for i in range(BLOOM_HASHES)
    ]
    words = (
        dim.select(F.explode(F.array(*pos)).alias("pos"))
        .groupBy(F.expr("int(pos div 64)").alias("w"))
        .agg(F.expr("bit_or(shiftleft(1L, int(pos % 64)))").alias("bits"))
        .collect()
    )
    lookup = {r["w"]: r["bits"] for r in words}
    bloom = [lookup.get(i, 0) for i in range(BLOOM_BITS // 64)]
    arr_sql = "array(" + ",".join(f"{w}L" for w in bloom) + ")"
    probe = " AND ".join(
        f"(element_at({arr_sql}, "
        f"int(pmod(xxhash64(cast(l_suppkey as bigint), {i}), {BLOOM_BITS})"
        f" div 64) + 1) & shiftleft(1L, int(pmod(xxhash64("
        f"cast(l_suppkey as bigint), {i}), {BLOOM_BITS}) % 64))) != 0"
        for i in range(BLOOM_HASHES)
    )
    return (
        li.filter(F.expr(probe))
        .join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("s_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the semantics
    dimension lookups need when "unknown" is itself a valid bucket
    (plain ``=`` would discard every NULL-keyed fact row).

    The nullable key is derived (nullif on the urgent priority) so the
    fixture genuinely exercises the NULL-match path; the dim carries an
    explicit label for the NULL bucket. Same hash-join machinery and
    scale posture as any equi join — ``<=>`` is still a hashable key.
    """
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("k"),
    )
    dim = (
        keyed.select("k")
        .dropDuplicates()
        .select("k", F.coalesce("k", F.lit("URGENT(NULL)")).alias("label"))
    )
    return (
        keyed.join(F.broadcast(dim), keyed.k.eqNullSafe(dim.k))
        .select("o_orderkey", "label")
    )


def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi = EXISTS (free with the join API, SURVEY §2.4 note):
    customers that have at least one urgent order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti = NOT EXISTS: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


QUERIES = {
    "star_join_revenue": star_join_revenue,
    "multi_key_join": multi_key_join,
    "left_join_miss": left_join_miss,
    "role_playing_dim": role_playing_dim,
    "null_safe_join": null_safe_join,
    "semi_join": semi_join,
    "anti_join": anti_join,
    "salted_join": salted_join,
    "bloom_prefilter_join": bloom_prefilter_join,
    "skew_hybrid_join": skew_hybrid_join,
}

ORACLES = {
    "skew_hybrid_join": f"""
        SELECT o_orderpriority,
               {money_sum_sql("l_extendedprice * (1 - l_discount)")}
                   AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    "bloom_prefilter_join": f"""
        SELECT s_name,
               {money_sum_sql("l_extendedprice * (1 - l_discount)")}
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_8', 'NATION_9')
        GROUP BY s_name
    """,
    "salted_join": f"""
        SELECT s_name,
               {money_sum_sql("l_extendedprice * (1 - l_discount)")}
                   AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
    """,
    "star_join_revenue": f"""
        SELECT r_name, n_name,
               {money_sum_sql("l_extendedprice * (1 - l_discount)")}
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "multi_key_join": """
        WITH dim AS (
            SELECT c_nationkey, c_mktsegment,
                   row_number() OVER (ORDER BY c_nationkey, c_mktsegment)
                       AS demo_id
            FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
        )
        SELECT c.c_custkey, dim.demo_id
        FROM customer c
        JOIN dim ON c.c_nationkey = dim.c_nationkey
               AND c.c_mktsegment = dim.c_mktsegment
    """,
    "left_join_miss": """
        SELECT p_partkey, p_brand, coalesce(qty, 0.0) AS qty_shipped
        FROM part
        LEFT JOIN (
            SELECT l_partkey, sum(l_quantity) AS qty
            FROM lineitem GROUP BY l_partkey
        ) s ON p_partkey = s.l_partkey
    """,
    "role_playing_dim": f"""
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               {money_sum_sql("l_extendedprice * (1 - l_discount)")}
                   AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        GROUP BY 1, 2
    """,
    "null_safe_join": """
        WITH keyed AS (
            SELECT o_orderkey,
                   nullif(o_orderpriority, '1-URGENT') AS k
            FROM orders
        ),
        dim AS (
            SELECT k, coalesce(k, 'URGENT(NULL)') AS label
            FROM (SELECT DISTINCT k FROM keyed)
        )
        SELECT keyed.o_orderkey, dim.label
        FROM keyed JOIN dim ON keyed.k IS NOT DISTINCT FROM dim.k
    """,
    "semi_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    "anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
    """,
}
