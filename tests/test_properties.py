"""Property-based row-count invariants (SURVEY §5.4): explode counts,
union arithmetic, dedup idempotence, join containment — on
hypothesis-generated data, not just the fixtures."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

SETTINGS = settings(max_examples=15, deadline=None)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=3), max_size=4
        ),
    ),
    min_size=1,
    max_size=20,
)


@SETTINGS
@given(data=rows)
def test_explode_count_is_sum_of_sizes(spark, data):
    df = spark.createDataFrame(data, "k int, xs array<string>")
    exploded = df.select("k", F.explode("xs").alias("x"))
    assert exploded.count() == sum(len(xs) for _, xs in data)


@SETTINGS
@given(a=rows, b=rows)
def test_union_count_is_sum(spark, a, b):
    da = spark.createDataFrame(a, "k int, xs array<string>")
    db = spark.createDataFrame(b, "k int, xs array<string>")
    assert da.unionByName(db).count() == len(a) + len(b)


@SETTINGS
@given(data=rows)
def test_dedup_idempotent(spark, data):
    df = spark.createDataFrame(
        [(k,) for k, _ in data], "k int"
    )
    once = df.dropDuplicates()
    assert once.count() == once.dropDuplicates().count()
    assert once.count() == len({k for k, _ in data})


@SETTINGS
@given(a=rows, b=rows)
def test_inner_join_within_left_join(spark, a, b):
    da = spark.createDataFrame([(k,) for k, _ in a], "k int")
    db = spark.createDataFrame(
        [(k,) for k, _ in b], "k int"
    ).dropDuplicates()
    inner = da.join(db, on="k", how="inner").count()
    left = da.join(db, on="k", how="left").count()
    assert inner <= left
    # with a deduped right side, left join preserves left cardinality
    assert left == len(a)
