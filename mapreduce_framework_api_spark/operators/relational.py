"""Relational core: scan/filter/project, joins, aggregation, sort/set-ops.

The reference's map/reduce callback API (``mapreduce.h:48-56``) can *express*
all of these (tag-in-map, merge-in-reduce — SURVEY.md §2.3); here each is a
declarative DataFrame plan so Catalyst picks the physical strategy:

- filters/projections push into the parquet scan (PushedFilters/ReadSchema);
- join strategy (broadcast vs sort-merge vs shuffled-hash) is planner-chosen,
  with explicit ``broadcast()`` hints where a dimension side is known-small —
  at 100 TB the fact table never moves for those joins;
- aggregates run partial (map-side) + final, unlike the reference's
  single-reducer BST (``mapreduce.c:185``, ``find_or_insert``) which this
  engine deliberately does NOT replicate;
- global order appears only at the sink via range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.functions.money import (
    SQL_CHARGED,
    SQL_DISC_PRICE,
    charged_price,
    disc_price,
    round2_dbl,
)
from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import table

# ---------------------------------------------------------------- Group B --


@register(
    "q_scan_project",
    group="B",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(ROUND((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
       CAST(ROUND((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS charged
FROM lineitem
ORDER BY l_orderkey, l_linenumber
""",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + scalar arithmetic on lineitem. Column pruning means the
    parquet scan reads only 6 of 11 columns (check ReadSchema)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        round2_dbl(disc_price()).alias("revenue"),
        round2_dbl(charged_price()).alias("charged"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_filter_pred",
    group="B",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, ROUND(o_totalprice, 2) AS o_totalprice_r,
       o_orderpriority
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND (o_orderstatus IN ('O', 'F'))
  AND o_totalprice > 1000.0
  AND o_orderpriority LIKE '%URGENT%'
ORDER BY o_orderkey
""",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates: date range + IN + numeric + LIKE on orders.
    All four predicates are pushdown-eligible (PushedFilters in the scan)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("o_orderstatus").isin("O", "F")
            & (F.col("o_totalprice") > 1000.0)
            & F.col("o_orderpriority").like("%URGENT%")
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice_r"),
            "o_orderpriority",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------- Group C --


@register(
    "q_join_inner",
    group="C",
    oracle="""
SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment,
       ROUND(o.o_totalprice, 2) AS o_totalprice_r
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_orderkey
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer equi-join. Planner picks broadcast at test scale;
    at 100 TB, customer (the smaller side) broadcasts or AQE converts to a
    shuffled-hash join — orders never needs a sort."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.round("o_totalprice", 2).alias("o_totalprice_r"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q_join_broadcast",
    group="C",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, p.p_name, p.p_brand,
       CAST(ROUND((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 25
ORDER BY l.l_orderkey, l.l_linenumber
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ broadcast(part): the dimension ships to every executor, the
    fact table is scanned in place — zero shuffle of the big side. The
    p_size filter prunes the dimension before broadcast."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_name",
            "p_brand",
            round2_dbl(disc_price()).alias("revenue"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q_join_multi",
    group="C",
    oracle="""
SELECT n.n_name, r.r_name,
       CAST(ROUND(SUM((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
ORDER BY n.n_name, r.r_name
""",
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way chain with group-agg on top. nation/region are
    broadcast (25/5 rows at any scale); lineitem⋈orders is the one real
    shuffle pair and Catalyst/AQE orders the joins."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            round2_dbl(F.sum(disc_price())).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name", "r_name")
    )


@register(
    "q_join_left",
    group="C",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       ROUND(COALESCE(o.o_totalprice, 0.0), 2) AS o_totalprice_r
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
ORDER BY c.c_custkey, o.o_orderkey
""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with an extra join-side predicate (kept in the ON clause —
    semantically different from a WHERE, and the planner pushes it to the
    right side's scan)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F")
    return (
        c.join(o, cond, "left")
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(F.coalesce("o_totalprice", F.lit(0.0)), 2).alias("o_totalprice_r"),
        )
        .orderBy("c_custkey", "o_orderkey")
    )


@register(
    "q_join_semi",
    group="C",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000.0)
ORDER BY c.c_custkey
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: the probe side streams, the build side
    deduplicates inside the join — no post-join distinct needed."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000.0)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q_join_anti",
    group="C",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c.c_custkey
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (null-safe, unlike NOT IN)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q_join_theta_range",
    group="C",
    oracle="""
SELECT s.s_suppkey, s.s_name, p.p_partkey, p.p_size
FROM supplier s JOIN part p
  ON p.p_size BETWEEN (s.s_suppkey % 10) * 3 AND (s.s_suppkey % 10) * 3 + 5
ORDER BY s.s_suppkey, p.p_partkey
""",
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (band) join: p_size within a band derived from the supplier
    key. Physically BroadcastNestedLoop with the small side broadcast; at
    scale the standard trick is bucketizing the range key into an equi-join
    on bucket + residual filter (see operators/similarity.py for that
    pattern applied to LSH)."""
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part")
    lo = (s.s_suppkey % 10) * 3
    cond = (p.p_size >= lo) & (p.p_size <= lo + 5)
    return (
        s.join(p, cond)
        .select("s_suppkey", "s_name", "p_partkey", "p_size")
        .orderBy("s_suppkey", "p_partkey")
    )


# Bin width for the binned band join. Must be >= the band length (6) so an
# interval spans at most 2 bins; 8 keeps the explode multiplier at <= 2
# while the residual filter discards the few cross-bin false candidates.
_RANGE_BIN_W = 8


@register(
    "q_join_range_binned",
    group="C",
    # Same result set as q_join_theta_range: binning is plan-level only.
    oracle="""
SELECT s.s_suppkey, s.s_name, p.p_partkey, p.p_size
FROM supplier s JOIN part p
  ON p.p_size BETWEEN (s.s_suppkey % 10) * 3 AND (s.s_suppkey % 10) * 3 + 5
ORDER BY s.s_suppkey, p.p_partkey
""",
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same band join as q_join_theta_range, rewritten as the plan that
    survives when NEITHER side fits in a broadcast: quantize the range key
    into fixed-width bins, explode each interval over the <= 2 bins it
    touches, equi-join on the bin, and re-check the exact band as a
    residual predicate.

    Spark's own planner can only give a theta join BroadcastNestedLoop (one
    side must fit in memory) or a cartesian product (never at scale); the
    bin column turns it into an ordinary shuffled equi-join — both sides
    partition by bin, cost is O(colliding bin pairs), and AQE handles a
    skewed bin like any other hot key. The explode multiplies the interval
    side by at most ceil(band/width) + 1 = 2 rows. Same trick at the heart
    of the LSH banding pipelines (operators/similarity.py); the point-side
    bin is unique, so no dedup step is needed — each true pair meets in
    exactly one bin."""
    w = _RANGE_BIN_W
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", ((F.col("s_suppkey") % 10) * 3).alias("lo")
    )
    s_binned = s.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / w), F.floor((F.col("lo") + 5) / w)
            )
        ),
    )
    p = table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", F.floor(F.col("p_size") / w).alias("bin")
    )
    return (
        s_binned.join(p, "bin")
        .filter((F.col("p_size") >= F.col("lo")) & (F.col("p_size") <= F.col("lo") + 5))
        .select("s_suppkey", "s_name", "p_partkey", "p_size")
        .orderBy("s_suppkey", "p_partkey")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join as a reusable operator (Spark has no native
    one): for each left row, attach ``payload_cols`` from the latest right
    row with the same key whose time is at-or-before the left row's time.

    Union-then-window plan: tag both inputs, sort per key by (time,
    right-before-left at ties), and carry ``last(payload, ignorenulls)``
    down the merged timeline — each input row is touched exactly once and
    the single shuffle is over |left| + |right| rows. The naive equi-join +
    per-row top-1 materializes every (left, earlier-right) pair first,
    which is unboundedly worse for long key histories at 100 TB. Ties on
    equal times resolve to the LAST right row in (time, *payload_cols)
    order. Left rows with no prior right row are dropped (inner as-of).

    Null-time contract: a right row with NULL time has no position on the
    timeline and can never be "the latest at-or-before" — it is dropped,
    matching the SQL form's ``right_time <= left_time`` predicate (NULL
    compares to nothing). Without the filter, the merged window's
    NULLS-FIRST ordering silently treated NULL-dated rows as
    earliest-ever matches (edge-corpus finding). NULL-time left rows are
    likewise droppable: no position, no match."""
    right = right.filter(F.col(right_time).isNotNull())
    left = left.filter(F.col(left_time).isNotNull())
    pay_struct = F.struct(*[F.col(c) for c in payload_cols]).alias("__pay")
    pay_type = right.select(pay_struct).schema[0].dataType
    ltagged = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__pri"),
        F.lit(None).cast(pay_type).alias("__pay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    rtagged = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__pri"),
        pay_struct,
        F.lit(None).cast(ltagged.schema["__row"].dataType).alias("__row"),
    )
    w = (
        W.partitionBy("__k")
        .orderBy(F.asc("__t"), F.desc("__pri"), F.asc("__pay"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    timeline = ltagged.unionByName(rtagged).withColumn(
        "__asof", F.last("__pay", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"__row.{c}").alias(c) for c in left.columns] + [
        F.col(f"__asof.{c}").alias(f"{payload_prefix}{c}") for c in payload_cols
    ]
    return timeline.filter((F.col("__pri") == 0) & F.col("__asof").isNotNull()).select(
        *out_cols
    )


@register(
    "q_join_asof",
    group="C",
    oracle="""
WITH ranked AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, o_orderkey AS asof_orderkey
FROM ranked WHERE rn = 1
ORDER BY event_id
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order by the same key
    at-or-before the event time — via the reusable ``asof_join`` operator
    (see its docstring for the union-then-window scale argument). Tie
    semantics: an order dated exactly at the event time matches (<=), and
    equal-dated orders resolve to the highest o_orderkey."""
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders")
    joined = asof_join(
        e,
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey"],
    )
    return joined.select(
        "event_id", "user_id", F.col("asof_o_orderkey").alias("asof_orderkey")
    ).orderBy("event_id")


# ---------------------------------------------------------------- Group D --


@register(
    "q_agg_basic",
    group="D",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       CAST(ROUND(SUM((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2))))), 2) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(AVG(l_discount), 2) AS avg_disc,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-hash-agg with 9 aggregates over 2 group
    keys. Partial aggregation reduces each of the 32 input partitions to
    ≤|groups| rows before the exchange — the shuffle is O(groups), not
    O(rows), which is what makes this plan hold at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            round2_dbl(F.sum(disc_price())).alias("sum_disc_price"),
            round2_dbl(F.sum(charged_price())).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_agg_distinct",
    group="D",
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
       COUNT(DISTINCT o_custkey) AS n_cust,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_year, o_month
ORDER BY o_year, o_month
""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per month — Spark expands to a two-phase aggregate
    (distinct keys first, then count) automatically."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("o_year"), F.month("o_orderdate").alias("o_month")
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_year", "o_month")
    )


@register(
    "q_agg_rollup",
    group="D",
    oracle="""
SELECT COALESCE(n_name, '<ALL>') AS n_name_g,
       COALESCE(c_mktsegment, '<ALL>') AS mktsegment_g,
       ROUND(SUM(c_acctbal), 2) AS sum_bal,
       COUNT(*) AS n_cust
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP(n_name, c_mktsegment)
ORDER BY n_name_g, mktsegment_g
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(n_name, c_mktsegment): hierarchical subtotals + grand total.
    NULL group markers are coalesced to '<ALL>' on both engines so the
    value-hash is collation-independent."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.round(F.sum("c_acctbal"), 2).alias("sum_bal"), F.count("*").alias("n_cust"))
        .select(
            F.coalesce("n_name", F.lit("<ALL>")).alias("n_name_g"),
            F.coalesce("c_mktsegment", F.lit("<ALL>")).alias("mktsegment_g"),
            "sum_bal",
            "n_cust",
        )
        .orderBy("n_name_g", "mktsegment_g")
    )


@register(
    "q_agg_cube",
    group="D",
    oracle="""
SELECT COALESCE(l_returnflag, '<ALL>') AS returnflag_g,
       COALESCE(l_linestatus, '<ALL>') AS linestatus_g,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY returnflag_g, linestatus_g
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping-set combinations
    in one pass (Spark expands to a single Expand + hash-agg, not 4 scans)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n_items"))
        .select(
            F.coalesce("l_returnflag", F.lit("<ALL>")).alias("returnflag_g"),
            F.coalesce("l_linestatus", F.lit("<ALL>")).alias("linestatus_g"),
            "sum_qty",
            "n_items",
        )
        .orderBy("returnflag_g", "linestatus_g")
    )


# ---------------------------------------------------------------- Group F --


@register(
    "q_sort_multi",
    group="F",
    oracle="""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice_r, o_orderpriority
FROM orders
ORDER BY o_orderpriority ASC, o_totalprice_r DESC, o_orderkey ASC
LIMIT 100
""",
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY (asc/desc mix) + LIMIT 100. The trailing unique
    o_orderkey makes the cutoff deterministic. Spark plans this as
    TakeOrderedAndProject — a top-k per partition + driver merge, never a
    full global sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice_r"),
            "o_orderpriority",
        )
        .orderBy(F.asc("o_orderpriority"), F.desc("o_totalprice_r"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_set_ops",
    group="F",
    oracle="""
WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0),
     urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '1%'),
     fallback AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
SELECT o_custkey, 'big_or_urgent' AS src FROM (
  SELECT o_custkey FROM big UNION SELECT o_custkey FROM urgent
)
UNION ALL
SELECT o_custkey, 'big_and_urgent' AS src FROM (
  SELECT o_custkey FROM big INTERSECT SELECT o_custkey FROM urgent
)
UNION ALL
SELECT o_custkey, 'big_not_p' AS src FROM (
  SELECT o_custkey FROM big EXCEPT SELECT o_custkey FROM fallback
)
ORDER BY src, o_custkey
""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer-key sets from orders splits,
    tagged and unioned into one result. Set semantics (dedup) throughout."""
    o = table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 100000.0).select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority").like("1%")).select("o_custkey")
    fallback = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    u = big.union(urgent).distinct().withColumn("src", F.lit("big_or_urgent"))
    i = big.intersect(urgent).withColumn("src", F.lit("big_and_urgent"))
    e = big.subtract(fallback).withColumn("src", F.lit("big_not_p"))
    return u.unionByName(i).unionByName(e).orderBy("src", "o_custkey")


# ------------------------------------------------- Group D (extended) -------


@register(
    "q_agg_grouping_sets",
    group="D",
    oracle="""
SELECT COALESCE(n_name, '<ALL>') AS n_name_g,
       COALESCE(c_mktsegment, '<ALL>') AS mktsegment_g,
       CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
       CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg,
       ROUND(SUM(c_acctbal), 2) AS sum_bal,
       COUNT(*) AS n_cust
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
ORDER BY g_nation, g_seg, n_name_g, mktsegment_g
""",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE specialize.
    Spark plans one Expand + one hash aggregate (the input is replicated
    once per set map-side, then aggregated partial+final — no re-scan per
    set). GROUPING() markers disambiguate real NULLs from subtotal rows."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT COALESCE(n_name, '<ALL>') AS n_name_g,
               COALESCE(c_mktsegment, '<ALL>') AS mktsegment_g,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
               ROUND(SUM(c_acctbal), 2) AS sum_bal,
               COUNT(*) AS n_cust
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
        ORDER BY g_nation, g_seg, n_name_g, mktsegment_g
        """
    )


# Statistical moments, computed so the emitted bytes are engine- and
# plan-independent. Native stddev/corr fold doubles in partial-aggregate
# order, so the low bits of the result depend on parallelism; a ROUND(x,2)
# on top can then flip at a .xx5 tie between runs/engines (the round-1
# driver hash failure). Instead: (1) per-row values are recovered to exact
# DECIMAL(18,2) (the generator writes 2-decimal values), (2) sums of
# decimals are EXACT and commutative, so every engine/plan yields identical
# sums, (3) the closed-form moment algebra runs in DOUBLE with the same
# expression text on both engines (IEEE ops are correctly rounded, so
# identical inputs + identical expression = bit-identical output), and
# (4) results are emitted as *_x100 scaled BIGINTs — integer bytes hash
# identically under any serialization.
_AGG_STATS_SQL = """
WITH sums AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sdd,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sqd
  FROM lineitem
  -- measure-complete rows only: COUNT(*) must count exactly the rows the
  -- null-skipping SUMs saw, or every moment is computed over a wrong n
  -- (edge-corpus finding)
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL
  GROUP BY l_returnflag
)
-- Degenerate groups (n < 2, ~zero variance in any sqrt'd moment) have
-- undefined/NaN outputs and are excluded. The test MUST run on the same
-- representation both engines hash from: the DOUBLE-cast exact sums, with
-- the identical expression text (identical correctly-rounded IEEE inputs
-- + identical op order = bit-identical comparisons). A decimal-side
-- HAVING here previously diverged from the engine's double-side filter on
-- constant groups of non-binary-representable values (5 rows of 0.01:
-- exact equality in decimal, inequality in doubles → one engine kept a
-- NaN group the other dropped). Strict positivity (not <>) also kills
-- tiny-NEGATIVE double numerators, which would NaN the sqrt.
SELECT l_returnflag,
       CAST(FLOOR(SQRT((sqq - sq * sq / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) * 100.0 + 0.5) AS BIGINT) AS sd_qty_x100,
       CAST(FLOOR(((sqq - sq * sq / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) * 100.0 + 0.5) AS BIGINT) AS var_qty_x100,
       CAST(FLOOR(SQRT((sdd - sd * sd / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT) AS sdp_disc_x10000,
       CAST(FLOOR((sqp - sq * sp / CAST(n AS DOUBLE))
                  / SQRT((sqq - sq * sq / CAST(n AS DOUBLE)) * (spp - sp * sp / CAST(n AS DOUBLE)))
                  * 10000.0 + 0.5) AS BIGINT) AS corr_qty_price_x10000,
       CAST(FLOOR(((sqd - sq * sd / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT) AS cov_qty_disc_x10000
FROM sums
WHERE n >= 2
  AND (sqq - sq * sq / CAST(n AS DOUBLE)) > 0
  AND (spp - sp * sp / CAST(n AS DOUBLE)) > 0
  AND (sdd - sd * sd / CAST(n AS DOUBLE)) > 0
ORDER BY l_returnflag
"""


@register(
    "q_agg_stats",
    group="D",
    oracle=_AGG_STATS_SQL,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance) —
    single-pass distributed moments (partial+final over exact decimal sums),
    never a collect. Emits scaled integers so the hashed bytes are immune
    to cross-engine/cross-plan FP summation-order drift (see
    _AGG_STATS_SQL). The Spark side is an independent DataFrame plan with
    the same moment algebra (same operation order, so IEEE-correctly-rounded
    doubles stay bit-identical) — not spark.sql of the oracle text, keeping
    the oracle a genuine cross-check."""
    li = table(spark, sf_dir, "lineitem").filter(
        # see the oracle note: measure-complete rows; degenerate groups out
        F.col("l_quantity").isNotNull()
        & F.col("l_discount").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    )
    # decimal(8,2) inputs, NOT (18,2): products are then decimal(17,4) —
    # within Spark's 18-digit COMPACT Decimal (plain long multiply in
    # codegen), where (18,2) inputs made every per-row product a
    # decimal(37,4) BigDecimal (measured 2.7x slower on this aggregate,
    # same exact values). (8,2) holds the TPC-H monetary domain
    # (extendedprice < 1e6) with 10x headroom. The post-multiply cast to
    # decimal(28,4) is a free relabel per row (value unchanged, stays
    # compact) that widens the SUM result type to decimal(38,4), so the
    # accumulators keep full 100-TB headroom (sum(price^2) at 6e11 rows
    # is ~6e21 — past a (27,4) sum cap, well inside (38,4)).
    qty = F.col("l_quantity").cast("decimal(8,2)")
    dsc = F.col("l_discount").cast("decimal(8,2)")
    prc = F.col("l_extendedprice").cast("decimal(8,2)")

    def wide(x):
        return x.cast("decimal(28,4)")

    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(qty).cast("double").alias("sq"),
        F.sum(wide(qty * qty)).cast("double").alias("sqq"),
        F.sum(dsc).cast("double").alias("sd"),
        F.sum(wide(dsc * dsc)).cast("double").alias("sdd"),
        F.sum(prc).cast("double").alias("sp"),
        F.sum(wide(prc * prc)).cast("double").alias("spp"),
        F.sum(wide(qty * prc)).cast("double").alias("sqp"),
        F.sum(wide(qty * dsc)).cast("double").alias("sqd"),
    )
    n = F.col("n").cast("double")
    n1 = (F.col("n") - 1).cast("double")
    sq, sqq = F.col("sq"), F.col("sqq")
    sd, sdd = F.col("sd"), F.col("sdd")
    sp, spp = F.col("sp"), F.col("spp")
    sqp, sqd = F.col("sqp"), F.col("sqd")
    var_q = (sqq - sq * sq / n) / n1
    # Degenerate-group exclusion mirrors the oracle's outer WHERE exactly:
    # same double-cast exact sums, same expression text, strict positivity
    # of every sqrt'd numerator (see the _AGG_STATS_SQL comment — a
    # decimal-vs-double split here kept/dropped different groups on
    # constant 0.01-valued groups).
    sums = sums.filter(
        (F.col("n") >= 2)
        & (sqq - sq * sq / n > 0)
        & (spp - sp * sp / n > 0)
        & (sdd - sd * sd / n > 0)
    )
    return sums.select(
        "l_returnflag",
        F.floor(F.sqrt(var_q) * 100.0 + 0.5).cast("bigint").alias("sd_qty_x100"),
        F.floor(var_q * 100.0 + 0.5).cast("bigint").alias("var_qty_x100"),
        F.floor(F.sqrt((sdd - sd * sd / n) / n) * 10000.0 + 0.5)
        .cast("bigint")
        .alias("sdp_disc_x10000"),
        F.floor(
            (sqp - sq * sp / n) / F.sqrt((sqq - sq * sq / n) * (spp - sp * sp / n)) * 10000.0
            + 0.5
        )
        .cast("bigint")
        .alias("corr_qty_price_x10000"),
        F.floor((sqd - sq * sd / n) / n1 * 10000.0 + 0.5)
        .cast("bigint")
        .alias("cov_qty_disc_x10000"),
    ).orderBy("l_returnflag")


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q_agg_pivot",
    group="D",
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user event counts, one column per event
    type. The explicit value list keeps it one pass — omitting it would
    cost an extra distinct-values job before the real aggregation."""
    e = table(spark, sf_dir, "events")
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    renamed = pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in _PIVOT_TYPES],
    )
    return renamed.orderBy("user_id")


# ------------------------------------------------- Group C (extended) -------


@register(
    "q_join_full_outer",
    group="C",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, COALESCE(p.n_orders, 0) AS n_orders
FROM customer c FULL OUTER JOIN per_cust p ON c.c_custkey = p.o_custkey
ORDER BY c_custkey
""",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of the customer dimension against per-customer order
    counts: customers with zero orders survive with n_orders=0, and any
    orphaned order keys would survive with NULL customer columns."""
    c = table(spark, sf_dir, "customer")
    per_cust = (
        table(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "full_outer")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_subquery_scalar",
    group="C",
    oracle="""
SELECT p_partkey, p_name, ROUND(p_retailprice, 2) AS price_r
FROM part
WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
ORDER BY p_partkey
""",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: parts priced above the global average.
    Plans as a broadcast of the 1-row aggregate into the filter — the scan
    side streams; no driver round-trip."""
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, ROUND(p_retailprice, 2) AS price_r
        FROM part
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
        ORDER BY p_partkey
        """
    )


@register(
    "q_subquery_exists",
    group="C",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderpriority LIKE '1%'
    AND o.o_totalprice > 50000.0
)
ORDER BY c_custkey
""",
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with extra predicates — Catalyst rewrites it to a
    left-semi join on the correlation key, with the inner predicates pushed
    below the join (check: PushedFilters on the orders scan)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority LIKE '1%'
            AND o.o_totalprice > 50000.0
        )
        ORDER BY c_custkey
        """
    )


# ------------------------------------------------- Group F (extended) -------


@register(
    "q_limit_offset",
    group="F",
    oracle="""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price_r
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 50 OFFSET 100
""",
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: total order (price desc, unique key asc),
    skip 100, take 50. Spark plans a global limit of offset+limit pushed
    toward the sort, then drops the offset rows — only 150 rows ever reach
    the driver side of the plan."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price_r"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(100)
        .limit(50)
    )


@register(
    "q_join_star",
    group="C",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join (the TPC-H Q5 'local supplier volume' shape):
    region→nation prune the customer dimension BEFORE it meets the facts,
    all four dimensions broadcast, and the only shuffle pair is
    lineitem⋈orders — at 100 TB that is one fact⋈fact exchange, with the
    s_nationkey = c_nationkey co-location condition applied as a residual
    on the broadcast supplier join, never a second shuffle. Revenue sums
    run over exact decimals so the plain-SQL oracle is byte-exact."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == dims.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q_subquery_corr_agg",
    group="C",
    oracle="""
WITH pa AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
         COUNT(*) AS n_li
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
FROM lineitem l
JOIN pa ON l.l_partkey = pa.l_partkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE 5 * CAST(l.l_quantity AS BIGINT) * pa.n_li < pa.sum_qty
GROUP BY p.p_brand
ORDER BY p.p_brand
""",
)
def q_subquery_corr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery (the TPC-H Q17 'small-quantity order
    revenue' shape): lineitems with quantity below 20% of their part's
    average, revenue per brand.

    Decorrelated the way Catalyst rewrites Q17: one per-part aggregate,
    joined back to lineitem on the same l_partkey the aggregate shuffled
    on — AQE reuses the partitioning, so the 'correlated subquery' costs
    one extra map-side agg, not a per-row subquery execution. The 20%
    threshold is evaluated in pure integers (qty is integral; 5*qty*n <
    sum_qty avoids an FP avg whose last-ulp could flip boundary rows
    between engines), and revenue sums exact decimals (cast DOUBLE at the
    end), so the oracle is byte-exact."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("iq"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    pa = li.groupBy("l_partkey").agg(
        F.sum("iq").alias("sum_qty"), F.count("*").alias("n_li")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(pa, "l_partkey")
        .filter(F.lit(5) * F.col("iq") * F.col("n_li") < F.col("sum_qty"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            F.sum("price").cast("double").alias("small_revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "q_agg_mode",
    group="D",
    oracle="""
WITH c AS (
  -- NULL values carry no mode vote (standard SQL mode() semantics; a
  -- NULL qty group also tie-breaks oppositely across engines — Spark ASC
  -- is NULLS FIRST, DuckDB NULLS LAST; edge-corpus finding)
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS n
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY l_returnflag, qty
), r AS (
  SELECT l_returnflag, qty, n,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY n DESC, qty ASC) AS rk
  FROM c
)
SELECT l_returnflag, qty AS mode_qty, CAST(n AS BIGINT) AS mode_n
FROM r WHERE rk = 1
ORDER BY l_returnflag
""",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (most frequent quantity per return flag,
    ties to the smallest value — Spark's built-in ``mode()`` is
    tie-nondeterministic, so the deterministic two-stage form is the one
    an oracle-checked pipeline can actually use).

    Scale shape: count-then-top1 — the first aggregate collapses the
    corpus to one row per (group, value) with map-side partials, and the
    window's WindowGroupLimit prunes to the per-group max before any
    sort materializes. No value list is ever collected per group (the
    ``mode()``/collect-based forms hold per-group state proportional to
    distinct values; this holds one row)."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").isNotNull())  # see the oracle note
        .select("l_returnflag", F.col("l_quantity").cast("long").alias("qty"))
    )
    c = li.groupBy("l_returnflag", "qty").agg(F.count("*").alias("n"))
    w = W.partitionBy("l_returnflag").orderBy(F.desc("n"), F.asc("qty"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_qty"),
            F.col("n").cast("long").alias("mode_n"),
        )
        .orderBy("l_returnflag")
    )


_IVL_LEN_US = 600 * 1_000_000  # each event spans [ts, ts + 10 min)


@register(
    "q_join_interval_overlap",
    group="C",
    oracle=f"""
WITH e AS (
  SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS s FROM events
), a AS (
  SELECT event_id, event_type, s,
         unnest(list_distinct([s // {_IVL_LEN_US},
                               (s + {_IVL_LEN_US}) // {_IVL_LEN_US}])) AS bin
  FROM e
), b AS (
  SELECT event_id, event_type, s, s // {_IVL_LEN_US} AS bin FROM e
)
SELECT a.event_type,
       a.event_id AS a_id, b.event_id AS b_id,
       (a.s + {_IVL_LEN_US}) - b.s AS overlap_us
FROM a JOIN b ON a.event_type = b.event_type AND a.bin = b.bin
WHERE (a.s < b.s OR (a.s = b.s AND a.event_id < b.event_id))
  AND b.s < a.s + {_IVL_LEN_US}
ORDER BY a_id, b_id
""",
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap self-join: pairs of same-type events whose
    10-minute activity windows intersect — the temporal-overlap shape
    (meetings, sensor windows, genomics ranges) that q_join_range_binned's
    point-in-band bin trick does NOT cover, because BOTH sides are
    intervals.

    Meet-exactly-once allocation: each pair is produced by exactly one
    (bin, role) assignment — the EARLIER interval explodes over its ≤2
    covered bins, the LATER interval joins on its unique start bin (which
    the earlier one necessarily covers), with (start, event_id) ordering
    breaking the equal-start case. So the physical join is a plain
    hash/sort-merge equi-join on (type, bin) with the overlap predicate
    as a residual — no nested loop, no post-hoc dedup, and per-pair cost
    proportional to REAL overlaps, which is the only thing that scales on
    a 100 TB event stream."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("s")
    )
    a = e.select(
        F.col("event_id").alias("a_id"),
        "event_type",
        F.col("s").alias("sa"),
        F.explode(
            F.array_distinct(
                F.array(
                    (F.col("s") / _IVL_LEN_US).cast("long"),
                    ((F.col("s") + _IVL_LEN_US) / _IVL_LEN_US).cast("long"),
                )
            )
        ).alias("bin"),
    )
    b = e.select(
        F.col("event_id").alias("b_id"),
        F.col("event_type").alias("b_type"),
        F.col("s").alias("sb"),
        (F.col("s") / _IVL_LEN_US).cast("long").alias("bin"),
    )
    earlier = (F.col("sa") < F.col("sb")) | (
        (F.col("sa") == F.col("sb")) & (F.col("a_id") < F.col("b_id"))
    )
    return (
        a.join(b, (a.event_type == b.b_type) & (a.bin == b.bin))
        .filter(earlier & (F.col("sb") < F.col("sa") + _IVL_LEN_US))
        .select(
            "event_type",
            "a_id",
            "b_id",
            ((F.col("sa") + _IVL_LEN_US) - F.col("sb")).alias("overlap_us"),
        )
        .orderBy("a_id", "b_id")
    )


@register(
    "q_agg_string_agg",
    group="D",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): per language, the sorted
    distinct sources joined with commas. collect_set alone is
    NONDETERMINISTIC in element order — the sort_array before array_join
    is what makes the result an engine-portable value (DuckDB's
    ``string_agg(DISTINCT … ORDER BY …)`` states the same contract
    declaratively). One hash-agg shuffle on lang; the collected set is
    bounded by source cardinality, not corpus size."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources_csv"),
        )
        .orderBy("lang")
    )


@register(
    "q_agg_corr_exact",
    group="D",
    oracle="""
WITH t AS (
  SELECT lang,
         CAST(n_chars AS BIGINT) AS x,
         CAST(len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'),
                              e -> e <> '')) AS BIGINT) AS y
  FROM documents
  WHERE text IS NOT NULL AND n_chars IS NOT NULL
), s AS (
  SELECT lang, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM t GROUP BY lang
  -- measure-complete rows; degenerate groups (n < 2 or zero variance on
  -- either axis) have undefined correlation — excluded on both engines
  -- (edge-corpus finding)
  HAVING COUNT(*) >= 2
     AND COUNT(*) * SUM(x * x) <> SUM(x) * SUM(x)
     AND COUNT(*) * SUM(y * y) <> SUM(y) * SUM(y)
)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 4)
         AS corr_chars_tokens,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 4)
         AS slope_tokens_per_char
FROM s ORDER BY lang
""",
)
def q_agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation + regression slope (chars vs tokens per language) from
    EXACT integer sums: built-in corr()/regr_slope() use incremental
    co-moment recurrences whose low-order float bits differ between
    engines, so this computes the five exact BIGINT sums (n, Σx, Σy, Σxy,
    Σx², Σy² — overflow-free well past fixture scale; promote to DECIMAL
    for 100 TB corpora) and evaluates the IDENTICAL closed-form double
    expression on both engines — the same exact-sums-then-one-division
    trick q_agg_rollup_reuse and the multimodal stats use. One hash-agg
    shuffle, map-side combinable."""
    from mapreduce_framework_api_spark.functions.textfns import tokens_nonempty

    t = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            "lang",
            F.col("n_chars").cast("long").alias("x"),
            F.size(tokens_nonempty("text")).cast("long").alias("y"),
        )
    )
    s = t.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_num = n_d * F.col("sxy") - sx_d * F.col("sy")
    var_x = n_d * F.col("sxx") - sx_d * F.col("sx")
    var_y = n_d * F.col("syy") - sy_d * F.col("sy")
    return (
        # degenerate groups excluded — mirrors the oracle's HAVING (the
        # integer-sum forms of the same variance tests)
        s.filter(
            (F.col("n") >= 2)
            & (F.col("n") * F.col("sxx") != F.col("sx") * F.col("sx"))
            & (F.col("n") * F.col("syy") != F.col("sy") * F.col("sy"))
        )
        .select(
            "lang",
            F.col("n").cast("long").alias("n_docs"),
            F.round(cov_num / (F.sqrt(var_x) * F.sqrt(var_y)), 4).alias(
                "corr_chars_tokens"
            ),
            F.round(cov_num / var_x, 4).alias("slope_tokens_per_char"),
        )
        .orderBy("lang")
    )


@register(
    "q_set_ops_all",
    group="C",
    oracle="""
WITH big AS (
  SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
), urgent AS (
  SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '1%'
), fallback AS (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
), tagged AS (
  SELECT 'union_all' AS src, o_custkey
  FROM (SELECT o_custkey FROM big UNION ALL SELECT o_custkey FROM urgent)
  UNION ALL
  SELECT 'inter_all' AS src, o_custkey
  FROM (SELECT o_custkey FROM big INTERSECT ALL SELECT o_custkey FROM urgent)
  UNION ALL
  SELECT 'except_all' AS src, o_custkey
  FROM (SELECT o_custkey FROM big EXCEPT ALL SELECT o_custkey FROM fallback)
)
SELECT src, o_custkey FROM tagged ORDER BY src, o_custkey
""",
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set operations (the ALL variants q_set_ops omits):
    UNION ALL concatenates multiplicities, INTERSECT ALL keeps
    min(count_left, count_right) copies per key, EXCEPT ALL keeps
    max(0, count_left − count_right). Multiplicity is part of the result
    multiset, so the order-insensitive value hash verifies the bag
    arithmetic itself — a duplicate-count bug cannot hash-green.

    Plan: Spark rewrites intersectAll/exceptAll into a count-aggregate +
    generate (replicate min/diff copies) — one shuffle per operand pair,
    no join of raw rows; UNION ALL is a zero-shuffle concat."""
    o = table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 100000.0).select("o_custkey")
    urgent = o.filter(F.col("o_orderpriority").like("1%")).select("o_custkey")
    fallback = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    u = big.unionAll(urgent).withColumn("src", F.lit("union_all"))
    i = big.intersectAll(urgent).withColumn("src", F.lit("inter_all"))
    e = big.exceptAll(fallback).withColumn("src", F.lit("except_all"))
    return (
        u.unionByName(i)
        .unionByName(e)
        .select("src", "o_custkey")
        .orderBy("src", "o_custkey")
    )


@register(
    "q_agg_weighted_median",
    group="D",
    oracle="""
WITH g AS (
  -- rows must carry both a value and a weight: a NULL price cannot be a
  -- median candidate and a NULL weight is no vote, and the engines
  -- disagree on NULL ordering/НULL window sums otherwise (edge corpus)
  SELECT l_returnflag AS flag, l_extendedprice AS price,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wgt
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY flag, price
), c AS (
  SELECT flag, price, wgt,
         CAST(SUM(wgt) OVER (PARTITION BY flag ORDER BY price
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
         CAST(SUM(wgt) OVER (PARTITION BY flag) AS BIGINT) AS total
  FROM g
)
SELECT flag, CAST(MAX(total) AS BIGINT) AS total_weight,
       ROUND(MIN(price), 2) AS wmedian
FROM c WHERE 2 * cumw >= total
GROUP BY flag ORDER BY flag
""",
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (quantity-weighted l_extendedprice per returnflag):
    the smallest price at which the running weight reaches half the total
    — the order-statistic Spark has no builtin for (percentile_approx is
    unweighted and approximate).

    Engine-exactness: weights collapse to exact integers, every running
    and total sum is an integer sum, and the 2*cum >= total tests plus the
    MIN(price) pick involve no FP accumulation at all — the median is a
    row PICK, bit-identical across engines (price -> integer cents via the
    one fixed floor(p*100+0.5) expression, used only for BINNING; ordering
    by bin then price equals ordering by price because the map is
    monotone).

    Plan shape — a two-level bin-then-refine scan (the pack_chunks prefix
    -scan idea applied to an order statistic), because the textbook form
    concentrates the corpus onto |groups| window partitions:
    1. pass 1 aggregates weight per (flag, 1024-cent price BIN) — a frame
       of flags x ~bins rows; a tiny per-flag window over it locates the
       bin containing the half-weight point and its preceding cumulative
       weight;
    2. pass 2 re-scans the fact table, BROADCAST-joins the 3-row target-
       bin frame on (flag, bin) — pruning every row outside the median
       bin before any shuffle — pre-aggregates the survivors onto
       (flag, price), and runs the refinement window over ONE BIN's value
       domain per flag, bounded by bin width, not corpus or domain size.
    Two scans of the base table beat one scan + an unbounded per-group
    window at any real scale; both aggregations are map-side partial."""
    li = table(spark, sf_dir, "lineitem").filter(
        # see the oracle's g CTE note: value + weight both required
        F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull()
    )
    rows = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    cents = F.floor(F.col("price") * 100 + F.lit(0.5)).cast("long")
    binned = rows.withColumn("bin", F.floor(cents / F.lit(1024)).cast("long"))

    # pass 1: per-(flag, bin) weights -> locate the median bin + prev cum
    binagg = binned.groupBy("flag", "bin").agg(F.sum("w").alias("bw"))
    wrun = W.partitionBy("flag").orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy("flag")
    located = binagg.select(
        "flag",
        "bin",
        F.sum("bw").over(wrun).alias("cum_bw"),
        (F.sum("bw").over(wrun) - F.col("bw")).alias("prev_cum"),
        F.sum("bw").over(wall).alias("total"),
    )
    target = (
        located.filter(2 * F.col("cum_bw") >= F.col("total"))
        .groupBy("flag")
        .agg(
            F.min("bin").alias("bin"),
            F.min_by("prev_cum", "bin").alias("prev_cum"),
            F.max("total").alias("total"),
        )
    )

    # pass 2: only the median bin's rows survive the broadcast join
    refine = (
        binned.join(F.broadcast(target), ["flag", "bin"])
        .groupBy("flag", "price", "prev_cum", "total")
        .agg(F.sum("w").alias("wgt"))
    )
    wref = W.partitionBy("flag").orderBy("price").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        refine.withColumn("cum", F.col("prev_cum") + F.sum("wgt").over(wref))
        .filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("flag")
        .agg(
            F.max("total").cast("long").alias("total_weight"),
            F.round(F.min("price"), 2).alias("wmedian"),
        )
        .orderBy("flag")
    )


_ASOF_NEAREST_TOL_US = 30 * 60 * 1_000_000  # +/- 30 minutes


@register(
    "q_join_asof_nearest",
    group="C",
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pt
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ct
  FROM events WHERE event_type = 'click'
), cand AS (
  SELECT p.event_id, p.user_id, c.click_id,
         abs(p.pt - c.ct) AS dist_us,
         CASE WHEN c.ct <= p.pt THEN 0 ELSE 1 END AS fwd
  FROM p JOIN c ON p.user_id = c.user_id
  WHERE abs(p.pt - c.ct) <= {_ASOF_NEAREST_TOL_US}
), r AS (
  SELECT event_id, user_id, click_id, dist_us, fwd,
         ROW_NUMBER() OVER (PARTITION BY event_id
                            ORDER BY dist_us, fwd, click_id DESC) AS rk
  FROM cand
)
SELECT event_id, user_id, click_id AS nearest_click_id,
       CAST(dist_us AS BIGINT) AS dist_us
FROM r WHERE rk = 1
ORDER BY event_id
""",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of join with tolerance: each purchase matches the
    SAME-USER click closest in time within +/- 30 minutes, whichever
    direction — the bidirectional variant of q_join_asof (backward-only)
    and the matching step behind ad-attribution and feature-alignment
    pipelines. Ties: equal distance prefers the backward match (the click
    that had already happened), then the highest click event_id
    (q_join_asof's rule).

    Engine-exactness: distances are integer microseconds; the verdict is
    pure integer ordering.

    Plan shape: an EQUI-join on the user key (hash exchange both sides,
    AQE-balanced) with the tolerance band as a residual filter — the
    banded-candidate shape of q_join_range_binned rather than
    q_join_asof's union-then-window, showing both scale-safe asof
    techniques. Both sides are type-pruned BEFORE the join (pushed-down
    event_type filters), candidate fan-out is bounded by same-user clicks
    inside the +/-30 min band, and WindowGroupLimit keeps only rk=1 per
    purchase below the sort. No nested loop, no cartesian anywhere."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("pt")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.unix_micros("ts").alias("ct"),
    )
    cand = (
        p.join(c, p.user_id == c.c_user_id)
        .withColumn("dist_us", F.abs(F.col("pt") - F.col("ct")))
        .filter(F.col("dist_us") <= _ASOF_NEAREST_TOL_US)
        .withColumn("fwd", F.when(F.col("ct") <= F.col("pt"), 0).otherwise(1))
    )
    w = W.partitionBy("event_id").orderBy("dist_us", "fwd", F.desc("click_id"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("click_id").alias("nearest_click_id"),
            F.col("dist_us").cast("long").alias("dist_us"),
        )
        .orderBy("event_id")
    )


@register(
    "q_agg_mad",
    group="D",
    oracle="""
WITH c AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
         COUNT(*) AS n
  FROM lineitem GROUP BY flag, qty
), m AS (
  SELECT flag, qty, n,
         CAST(SUM(n) OVER (PARTITION BY flag ORDER BY qty
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY flag) AS BIGINT) AS total
  FROM c
), med AS (
  SELECT flag, MIN(qty) AS med, MAX(total) AS total
  FROM m WHERE 2 * cum >= total GROUP BY flag
), dev AS (
  SELECT c.flag, abs(c.qty - med.med) AS adev, CAST(SUM(c.n) AS BIGINT) AS n,
         MAX(med.med) AS med
  FROM c JOIN med ON c.flag = med.flag
  GROUP BY c.flag, abs(c.qty - med.med)
), d AS (
  SELECT flag, adev, med,
         CAST(SUM(n) OVER (PARTITION BY flag ORDER BY adev
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY flag) AS BIGINT) AS total
  FROM dev
)
SELECT flag, MAX(med) AS median_qty, MIN(adev) AS mad_qty,
       CAST(MAX(total) AS BIGINT) AS n_rows
FROM d WHERE 2 * cum >= total
GROUP BY flag ORDER BY flag
""",
)
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of l_quantity per returnflag — the
    robust dispersion statistic (outlier-insensitive, unlike stddev):
    MAD = median(|x - median(x)|), both medians under the lower-median
    convention (smallest value with 2*cum >= total).

    Engine-exactness: quantities are integers, every cumulative sum is an
    integer window sum, and both medians are row PICKS — zero FP anywhere
    in the query.

    Plan shape: the corpus collapses onto the (flag, qty) VALUE-DOMAIN
    rollup first (l_quantity has ≲50 distinct values, so the frame is
    flags x 50 regardless of corpus size); both median passes are windows
    over that bounded frame, and the deviation re-aggregation joins the
    3-row median table broadcast-style. One corpus-sized partial/final
    aggregate, everything else domain-sized — the same
    collapse-to-domain-first discipline as q_agg_weighted_median, without
    even needing its bin refinement because the domain is already tiny."""
    li = table(spark, sf_dir, "lineitem")
    c = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .groupBy("flag", "qty")
        .agg(F.count("*").alias("n"))
    )
    run = W.partitionBy("flag").orderBy("qty").rowsBetween(W.unboundedPreceding, W.currentRow)
    full = W.partitionBy("flag")
    m = c.select(
        "flag",
        "qty",
        F.sum("n").over(run).alias("cum"),
        F.sum("n").over(full).alias("total"),
    )
    med = (
        m.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("flag")
        .agg(F.min("qty").alias("med"), F.max("total").alias("total"))
    )
    dev = (
        c.join(F.broadcast(med), "flag")
        .groupBy("flag", F.abs(F.col("qty") - F.col("med")).alias("adev"))
        .agg(F.sum("n").alias("n"), F.max("med").alias("med"))
    )
    drun = W.partitionBy("flag").orderBy("adev").rowsBetween(W.unboundedPreceding, W.currentRow)
    d = dev.select(
        "flag",
        "adev",
        "med",
        F.sum("n").over(drun).alias("cum"),
        F.sum("n").over(W.partitionBy("flag")).alias("total"),
    )
    return (
        d.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("flag")
        .agg(
            F.max("med").alias("median_qty"),
            F.min("adev").alias("mad_qty"),
            F.max("total").cast("long").alias("n_rows"),
        )
        .orderBy("flag")
    )


@register(
    "q_join_lateral_topn",
    group="C",
    oracle="""
SELECT n.n_name, c.c_custkey, ROUND(c.c_acctbal, 2) AS acctbal
FROM nation n,
     LATERAL (SELECT c_custkey, c_acctbal FROM customer
              WHERE c_nationkey = n.n_nationkey
              ORDER BY c_acctbal DESC, c_custkey
              LIMIT 2) c
ORDER BY n.n_name, acctbal DESC, c_custkey
""",
)
def q_join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers by account balance per nation via a LATERAL
    correlated subquery — run through the raw SQL lane (`spark.sql`),
    proving the engine's surface is reachable from SQL text, not only
    the DataFrame builders (every other declared query): a user of the
    reference migrating ANSI SQL runs it verbatim.

    Engine-exactness: balance is a row pick; the tie-break on c_custkey
    makes the LIMIT deterministic.

    Plan shape: Catalyst DECORRELATES the lateral subquery — the
    physical plan is the same WindowGroupLimit-over-join shape as the
    DataFrame top-k-per-group (q_win_topk_group), NOT a per-nation
    re-execution: one customer shuffle on nationkey, per-group limit
    pushed below the sort, 25-row broadcast of nation. Declarative SQL
    and the DataFrame API meet in the same physical space — the reason
    the engine needs no separate SQL executor.

    HAZARD (edge-corpus discovery, pinned there with aligned types): if
    the correlation key types MISMATCH (e.g. customer.c_nationkey
    bigint vs nation.n_nationkey int, so the equality carries an
    implicit cast), Spark 4.1 does NOT decorrelate per group — it plans
    a GLOBAL LocalLimit/GlobalLimit over the subquery table before the
    join, silently returning the first-k rows of the whole table with
    both the ORDER BY and the correlation ignored. Keep lateral
    correlation keys byte-type-aligned (the fixture schemas are); never
    introduce a cast into the correlated predicate."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, ROUND(c.c_acctbal, 2) AS acctbal
        FROM nation n,
             LATERAL (SELECT c_custkey, c_acctbal FROM customer
                      WHERE c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_custkey
                      LIMIT 2) c
        ORDER BY n.n_name, acctbal DESC, c_custkey
        """
    )


@register(
    "q_agg_unpivot",
    group="D",
    oracle="""
WITH wide AS (
  SELECT l_returnflag AS flag,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
  FROM lineitem GROUP BY flag
)
SELECT flag, metric, value
FROM wide
UNPIVOT (value FOR metric IN (sum_qty, n_rows, n_parts))
ORDER BY flag, metric
""",
)
def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide per-flag metrics table flipped to long
    (flag, metric, value) rows — the inverse of q_agg_pivot and the shape
    metric stores and chart layers consume.

    Engine-exactness: all three metrics are exact integers, so the
    unpivoted value column is BIGINT on both engines — no union of mixed
    numeric types (the classic unpivot trap: one double metric silently
    promotes every row).

    Plan shape: unpivot is a row-local Expand of the ALREADY-AGGREGATED
    wide frame (|flags| rows), so the generated row count is rows x
    metrics on a group-sized input — the corpus is touched once by the
    aggregation. Spark's native `DataFrame.unpivot` compiles to the same
    Expand as the SQL UNPIVOT clause."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
        F.count("*").cast("long").alias("n_rows"),
        F.count_distinct("l_partkey").cast("long").alias("n_parts"),
    )
    return (
        wide.unpivot(
            ids=["flag"],
            values=["sum_qty", "n_rows", "n_parts"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("flag", "metric")
    )


@register(
    "q_agg_winsorized",
    group="D",
    oracle="""
WITH rollup_ AS (
  -- NULL values are out of the robust stat on both engines: a NULL cents
  -- group otherwise lands at opposite ends of the cumulative quantile
  -- walk on the two engines (edge-corpus finding)
  SELECT l_returnflag AS flag,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY flag, cents
), tot AS (
  SELECT flag, CAST(SUM(c) AS BIGINT) AS n FROM rollup_ GROUP BY flag
), cum AS (
  SELECT r.flag, r.cents, r.c, t.n,
         CAST(SUM(r.c) OVER (PARTITION BY r.flag ORDER BY r.cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
  FROM rollup_ r JOIN tot t ON r.flag = t.flag
), lo AS (
  SELECT flag, MIN(cents) AS p05_cents FROM cum
  WHERE cc >= (n * 5 + 99) // 100 GROUP BY flag
), hi AS (
  SELECT flag, MIN(cents) AS p95_cents FROM cum
  WHERE cc >= (n * 95 + 99) // 100 GROUP BY flag
), clipped AS (
  SELECT r.flag, t.n, l.p05_cents, h.p95_cents,
         CAST(SUM(CASE WHEN r.cents < l.p05_cents THEN r.c ELSE 0 END)
              AS BIGINT) AS n_low,
         CAST(SUM(CASE WHEN r.cents > h.p95_cents THEN r.c ELSE 0 END)
              AS BIGINT) AS n_high,
         CAST(SUM(r.c * LEAST(GREATEST(r.cents, l.p05_cents), h.p95_cents))
              AS BIGINT) AS clipped_sum_cents
  FROM rollup_ r
  JOIN tot t ON r.flag = t.flag
  JOIN lo l ON r.flag = l.flag
  JOIN hi h ON r.flag = h.flag
  GROUP BY r.flag, t.n, l.p05_cents, h.p95_cents
)
SELECT flag, n, p05_cents, p95_cents, n_low, n_high,
       -- exact integer floor-division mean in micro-units, then one
       -- deterministic double division (the interpolate discipline;
       -- quantities are non-negative, so // and the Spark side's
       -- pmod-subtraction agree)
       CAST((clipped_sum_cents * 10000 -
             (clipped_sum_cents * 10000) % n) // n AS DOUBLE) / 1000000
         AS clipped_mean
FROM clipped ORDER BY flag
""",
)
def q_agg_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics — the outlier-clipping cleaning step
    training pipelines run before fitting anything: per return flag,
    l_quantity is clipped to its exact [p05, p95] band (ceil-rank integer
    thresholds) and the clipped mean plus the clipped-tail counts are
    reported.

    Scale shape: the second-order VALUE-DOMAIN trick again (MAD /
    latency_bands / hist_quantile): one corpus scan builds the
    (flag, cents) rollup, and EVERYTHING after — cumulative counts,
    both percentile row-picks, tail counts, the clipped sum — runs on
    the domain-sized frame (≲50 distinct quantities per flag), so no
    per-group corpus window ever exists. Exactness: integer cents,
    ceil-rank thresholds in integer arithmetic, clipped mean as exact
    fixed-point floor division promoted to one double divide (inputs are
    non-negative quantities, where Spark's pmod-subtraction div equals
    DuckDB's flooring // exactly)."""
    r = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").isNotNull())  # see the oracle note
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            (F.col("l_quantity").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .agg(F.count("*").cast("long").alias("c"))
    )
    # One window stage carries BOTH the cumulative count and the per-flag
    # total (same partitioning, same exchange — the total is an unordered
    # partition sum riding the cumulative window's shuffle), and ONE
    # conditional aggregation picks both percentile thresholds. The
    # previous shape ran `tot` as a separate aggregate branch broadcast
    # back in, and `lo`/`hi` as two filtered aggregations over two copies
    # of the window subtree — 13 exchanges / 5 broadcast joins for a
    # 3-row result (PLANS.txt r15-before); this form states the sharing
    # structurally (guide §2.4: window functions partitioned like a
    # preceding aggregation need no second shuffle).
    cum_w = (
        W.partitionBy("flag").orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = r.select(
        "flag",
        "cents",
        "c",
        F.sum("c").over(cum_w).cast("long").alias("cc"),
        F.sum("c").over(W.partitionBy("flag")).cast("long").alias("n"),
    )
    lohi = cum.groupBy("flag").agg(
        F.max("n").cast("long").alias("n"),
        F.min(
            F.when(F.col("cc") >= F.expr("(n * 5 + 99) div 100"), F.col("cents"))
        ).alias("p05_cents"),
        F.min(
            F.when(F.col("cc") >= F.expr("(n * 95 + 99) div 100"), F.col("cents"))
        ).alias("p95_cents"),
    )
    clipped_val = F.least(F.greatest(F.col("cents"), F.col("p05_cents")), F.col("p95_cents"))
    out = (
        r.join(F.broadcast(lohi), "flag")
        .groupBy("flag", "n", "p05_cents", "p95_cents")
        .agg(
            F.sum(F.when(F.col("cents") < F.col("p05_cents"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(F.col("cents") > F.col("p95_cents"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_high"),
            F.sum(F.col("c") * clipped_val).cast("long").alias("clipped_sum_cents"),
        )
    )
    return out.select(
        "flag", "n", "p05_cents", "p95_cents", "n_low", "n_high",
        (
            F.expr(
                "(clipped_sum_cents * 10000 - pmod(clipped_sum_cents * 10000, n)) div n"
            ).cast("double")
            / 1000000
        ).alias("clipped_mean"),
    ).orderBy("flag")
