"""Skew mitigation utilities: salting for hot keys.

At 100 TB a single hot key (one viral document id, one null-ish default
value) can pin an entire shuffle partition to one task. First line of
defense is AQE's skew-join splitting (enabled in session.py), which
handles sort-merge joins transparently. These helpers cover what AQE does
not: shuffled aggregations with a dominant key, and joins where the
planner's skew handling is unavailable (e.g. stream-stream, or a
shuffled-hash join Spark won't split).

Both are deterministic: salts derive from xxhash64 of the row, never
rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str | None = None,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys in ``big``.

    ``big`` rows scatter uniformly over ``n_salts`` sub-keys (deterministic
    hash of the whole row); ``small`` is replicated once per salt. The hot
    key's rows therefore spread across ``n_salts`` tasks instead of one,
    at the cost of shuffling ``small`` ×``n_salts`` — use when ``small`` is
    modest but above the broadcast threshold, and AQE's skew split does
    not apply. Result is exactly the plain join (salt is internal).
    """
    small_key = small_key or key
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (big_s[key] == small_s[small_key]) & (big_s["_salt"] == small_s["_salt"])
    return big_s.join(small_s, cond, how).drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    sums: dict[str, str] | None = None,
    count_alias: str | None = "n",
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for a skewed group key: stage 1 aggregates per
    (key, salt) — the hot key's rows split across ``n_salts`` reducers —
    stage 2 merges the ≤``n_salts`` partials per key. Only decomposable
    aggregates (sum/count) qualify; avg = sum/count downstream.

    Spark's map-side partial aggregation already handles *moderate* skew;
    this is for the pathological case where even one partition's worth of
    partials for the hot key dominates (e.g. high-cardinality values under
    the hot key defeating hash-map partials).
    """
    sums = sums or {}
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(n_salts))
    stage1_aggs = [F.sum(c).alias(f"_s_{a}") for c, a in sums.items()]
    if count_alias:
        stage1_aggs.append(F.count("*").alias("_s_cnt"))
    stage1 = df.withColumn("_salt", salt.cast("int")).groupBy(key, "_salt").agg(*stage1_aggs)
    stage2_aggs = [F.sum(f"_s_{a}").alias(a) for a in sums.values()]
    if count_alias:
        stage2_aggs.append(F.sum("_s_cnt").cast("long").alias(count_alias))
    return stage1.groupBy(key).agg(*stage2_aggs)


# --------------------------------------------------------------------------
# Registered queries: the salting mechanisms above, driven end-to-end and
# differentially checked. Salting is RESULT-INVARIANT (the salt column is
# internal and dropped), so the plain un-salted SQL is an EXACT oracle —
# the check proves the mitigation changes only the plan, never the answer.
# --------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from mapreduce_framework_api_spark.registry import register  # noqa: E402
from mapreduce_framework_api_spark.sources.readers import table  # noqa: E402


@register(
    "q_join_skew_salted",
    group="C",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, o.o_orderpriority,
       ROUND(o.o_totalprice, 2) AS o_totalprice_r
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F'
ORDER BY l.l_orderkey, l.l_linenumber
""",
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ mid-size side through ``salted_join``: lineitem rows scatter
    over 16 deterministic sub-keys, the filtered orders side replicates once
    per salt, so a hot l_orderkey spreads across 16 tasks instead of
    pinning one. For sort-merge joins AQE's skew split is the first-line
    tool (session.py); this path covers the plans AQE won't split
    (shuffled-hash, stream-stream). Exact oracle = the plain join: the
    mitigation must not change a single row."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    )
    joined = salted_join(li, o, key="l_orderkey", small_key="o_orderkey", n_salts=16)
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "o_orderdate",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice_r"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_agg_skew_salted",
    group="D",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q_agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over the pathological grouping shape:
    events.event_type has cardinality ~5, so a plain groupBy funnels 100 TB
    into 5 reducers no matter how many executors exist. Stage 1 reduces per
    (type, salt) — 16× the parallelism — stage 2 merges ≤16 partials per
    key. Sums run over DECIMAL(18,4) so they are exact and
    order-independent; the final DOUBLE cast is then engine-identical,
    keeping the plain-SQL oracle exact despite the different plan."""
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", F.col("value").cast("decimal(18,4)").alias("value_d"))
    )
    out = salted_agg(ev, "event_type", sums={"value_d": "sum_value"}, count_alias="n")
    return out.select(
        "event_type",
        F.col("sum_value").cast("double").alias("sum_value"),
        "n",
    ).orderBy("event_type")
