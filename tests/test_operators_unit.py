"""Operator edge-case units (SURVEY.md §5.2 tier 3): synthetic inputs the
fixtures can't produce — empty tables, orphan keys, all-duplicate keys."""

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_full_outer_preserves_both_orphan_sides(spark):
    """The sf fixtures are referentially complete, so the outer branches of
    q_join_full_outer never fire there; prove them on synthetic orphans."""
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "lv"])
    right = spark.createDataFrame([(2, "x"), (3, "y")], ["k", "rv"])
    out = left.join(right, "k", "full_outer").orderBy("k").collect()
    assert [(r["k"], r["lv"], r["rv"]) for r in out] == [
        (1, "a", None),
        (2, "b", "x"),
        (3, None, "y"),
    ]


def test_aggregate_on_empty_input(spark):
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    empty = spark.createDataFrame([], schema)
    assert empty.groupBy("k").agg(F.sum("v")).count() == 0
    # global aggregate over empty input: one row, NULL sum, zero count
    row = empty.agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()[0]
    assert row["s"] is None and row["n"] == 0


def test_all_duplicate_keys_aggregate(spark):
    df = spark.createDataFrame([("k", 1)] * 1000, ["k", "v"]).repartition(32)
    row = df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()[0]
    assert (row["k"], row["s"], row["n"]) == ("k", 1000, 1000)


def test_tokens_straddling_many_tiny_partitions(spark):
    """32 partitions over a tiny corpus ≈ the reference's 32-threads-on-
    small-file stress (SURVEY.md §5.1): counts must not depend on split."""
    df = spark.createDataFrame([("word word",), ("word",)], ["text"]).repartition(32)
    toks = df.select(F.explode(F.split("text", "[^A-Za-z0-9]+")).alias("t")).filter(
        F.length("t") > 0
    )
    assert toks.groupBy("t").count().collect()[0]["count"] == 3
