"""Window-function operators (SURVEY.md §2.4 Group E).

Absent from the reference (SURVEY.md §2.3 "window functions: absent") but
within the generalized map/reduce capability surface. Each window spec
partitions by a key and sorts within the partition — one exchange per
distinct partitioning, reused across multiple window expressions over the
same spec. At 100 TB the partition key must be chosen high-cardinality
(here: nation, customer, brand), which these are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.functions.money import disc_price, round2_dbl
from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import table


@register(
    "q_win_rank",
    group="E",
    oracle="""
SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS acctbal_r,
       RANK()       OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
ORDER BY c_nationkey, rn
""",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number of customers by acctbal within nation.
    row_number carries a unique tie-break (c_custkey) for determinism; rank
    and dense_rank are tie-stable by definition."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    w_unique = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            F.round("c_acctbal", 2).alias("acctbal_r"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w_unique).alias("rn"),
        )
        .orderBy("c_nationkey", "rn")
    )


@register(
    "q_win_running",
    group="E",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
FROM orders
ORDER BY o_custkey, n_so_far
""",
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running SUM(o_totalprice) per customer in order-date order.

    The frame order includes o_orderkey so same-date orders accumulate in a
    deterministic sequence on both engines (a pure-date ordering would make
    the prefix sums engine-dependent)."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
            F.count("*").over(w).alias("n_so_far"),
        )
        .orderBy("o_custkey", "n_so_far")
    )


@register(
    "q_win_topk_group",
    group="E",
    oracle="""
WITH rev AS (
  SELECT p.p_brand, l.l_partkey,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_partkey
), ranked AS (
  SELECT p_brand, l_partkey, revenue,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, l_partkey ASC) AS rn
  FROM rev
)
SELECT p_brand, l_partkey, revenue, rn
FROM ranked WHERE rn <= 3
ORDER BY p_brand, rn
""",
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per brand: agg first (shrinks the data), then
    row_number ≤ 3 on the aggregated rows — the window runs over |parts|
    rows, not |lineitem| rows. Ties broken by part key."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(round2_dbl(F.sum(disc_price())).alias("revenue"))
    )
    w = W.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("p_brand", "rn")
    )


@register(
    "q_win_lag_lead",
    group="E",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(o_totalprice, 2) AS price_r,
       ROUND(COALESCE(o_totalprice - LAG(o_totalprice) OVER w, 0.0), 2) AS delta_prev,
       COALESCE(CAST(EXTRACT(epoch FROM o_orderdate - LAG(o_orderdate) OVER w) AS BIGINT), 0) AS gap_sec
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
ORDER BY o_custkey, o_orderkey
""",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag-based deltas: price change and inter-order gap (seconds) per
    customer in time order."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    prev_price = F.lag("o_totalprice").over(w)
    prev_date = F.lag("o_orderdate").over(w)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price_r"),
            F.round(F.coalesce(F.col("o_totalprice") - prev_price, F.lit(0.0)), 2).alias(
                "delta_prev"
            ),
            F.coalesce(
                (F.unix_timestamp("o_orderdate") - F.unix_timestamp(prev_date)), F.lit(0)
            )
            .cast("long")
            .alias("gap_sec"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q_win_ntile_dist",
    group="E",
    oracle="""
SELECT c_custkey, c_mktsegment,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 4) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
ORDER BY c_mktsegment, quartile, c_custkey
""",
)
def q_win_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucketing + percent_rank +
    cume_dist per market segment. The window order carries a unique
    tie-break (c_custkey) so ntile assignment is deterministic; the rank
    ratios are identical IEEE doubles on both engines, so round(4) is
    hash-stable."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 4).alias("cume"),
        )
        .orderBy("c_mktsegment", "quartile", "c_custkey")
    )


@register(
    "q_win_range_frame",
    group="E",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_no
  FROM orders
)
SELECT o_custkey, o_orderkey, day_no,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY day_no
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d,
       COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY day_no
         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_30d
FROM o
ORDER BY o_custkey, day_no, o_orderkey
""",
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): trailing-30-day spend per
    customer. Unlike a rows frame, all orders on the same day are peers and
    always aggregate together, so the result is deterministic without a
    unique order key. Ordering is an epoch-day integer — identical
    arithmetic on both engines (a raw timestamp RANGE would mix units)."""
    o = table(spark, sf_dir, "orders")
    day_no = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("day_no").cast("long"))
        .rangeBetween(-30, W.currentRow)
    )
    return (
        o.withColumn("day_no", day_no)
        .select(
            "o_custkey",
            "o_orderkey",
            "day_no",
            F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
            F.count("*").over(w).alias("n_30d"),
        )
        .orderBy("o_custkey", "day_no", "o_orderkey")
    )


@register(
    "q_win_first_last",
    group="E",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC, o_orderkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate ASC, o_orderkey ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
ORDER BY o_custkey, o_orderkey
""",
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value per customer order history.
    last/nth use an explicit unbounded-following frame: the default window
    frame ends at CURRENT ROW, which would silently make last_value mean
    "current row's value" — the classic window-frame trap, identical in
    both engines, made explicit here."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w_full).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )
