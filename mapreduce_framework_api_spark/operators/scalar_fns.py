"""Scalar-function coverage (SURVEY.md §2.4 Group G).

The reference's only scalar machinery is tokenization + strcmp (SURVEY.md
§2.3 "string functions"); everything else is new surface. Each query
exercises one function family end-to-end against the DuckDB oracle. All of
these are per-row JVM expressions inside whole-stage codegen — no shuffle
except the final presentation sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import table


@register(
    "q_fn_string",
    group="G",
    oracle="""
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       substr(p_name, 1, 8) AS name_prefix,
       length(p_name) AS name_len,
       trim(concat('  ', p_name, '  ')) AS name_trim,
       concat(p_brand, ':', p_type) AS brand_type,
       regexp_extract(p_type, '([a-z]+)$', 1) AS type_last_word,
       replace(p_type, ' ', '_') AS type_snake
FROM part
ORDER BY p_partkey
""",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: lower/upper/substr/length/trim/concat/regexp_extract
    /replace over part."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.regexp_extract("p_type", "([a-z]+)$", 1).alias("type_last_word"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
    ).orderBy("p_partkey")


@register(
    "q_fn_date",
    group="G",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
       CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS o_day,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS o_quarter,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d
FROM orders
ORDER BY o_orderkey
""",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions: year/month/day/quarter extraction, date_trunc,
    datediff, date arithmetic. Timestamp-typed fixtures are cast to date
    explicitly on both engines (FIXTURES.md gotcha #2); derived
    dates/timestamps are emitted as formatted strings so the value-hash is
    representation-independent."""
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("o_year"),
        F.month(od).alias("o_month"),
        F.dayofmonth(od).alias("o_day"),
        F.quarter(od).alias("o_quarter"),
        F.date_format(F.date_trunc("month", od), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), od.cast("date")).alias("days_to_98"),
        F.date_format(F.date_add(od.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
    ).orderBy("o_orderkey")


@register(
    "q_fn_math",
    group="G",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 2) AS price_r,
       ROUND(abs(l_extendedprice - 1000.0), 2) AS abs_diff,
       floor(l_quantity) AS qty_floor,
       ceil(l_discount * 100) AS disc_pct_ceil,
       ROUND(power(l_quantity, 2.0), 2) AS qty_sq,
       ROUND(sqrt(l_extendedprice), 2) AS price_sqrt,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
       ROUND(ln(l_extendedprice + 1.0), 2) AS price_ln,
       CAST(sign(l_extendedprice - 2000.0) AS DOUBLE) AS price_sign
FROM lineitem
ORDER BY l_orderkey, l_linenumber
""",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: round/abs/floor/ceil/pow/sqrt/mod/ln/sign."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r"),
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_diff"),
        F.floor("l_quantity").cast("double").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).cast("double").alias("disc_pct_ceil"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 2).alias("price_sqrt"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 2).alias("price_ln"),
        F.signum(F.col("l_extendedprice") - 2000.0).alias("price_sign"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q_fn_json",
    group="G",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
FROM events
ORDER BY event_id
""",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column.
    get_json_object returns STRING (SURVEY.md §7.1 phase-2 trap) — the
    oracle uses json_extract_string to match, plus an explicit INT cast on
    both sides."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
    ).orderBy("event_id")


@register(
    "q_fn_array",
    group="G",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       CASE WHEN list_contains(toks, 'data') THEN TRUE ELSE FALSE END AS has_data,
       list_sort(toks)[1] AS first_sorted,
       list_sort(toks)[len(toks)] AS last_sorted,
       len(list_distinct(toks)) AS n_distinct
FROM t
ORDER BY doc_id
""",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over tokenized text: size / array_contains /
    sort_array min+max / distinct cardinality. All array-side (per-row), no
    explode, no shuffle."""
    from mapreduce_framework_api_spark.functions.textfns import tokens_nonempty

    d = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_nonempty("text").alias("toks")
    )
    sorted_toks = F.sort_array("toks")
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.array_contains("toks", "data").alias("has_data"),
        F.element_at(sorted_toks, 1).alias("first_sorted"),
        F.element_at(sorted_toks, F.size("toks")).alias("last_sorted"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
    ).orderBy("doc_id")


@register(
    "q_fn_conditional",
    group="G",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            WHEN c_acctbal < 8000 THEN 'mid'
            ELSE 'high' END AS bal_band,
       COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
       CASE WHEN c_nationkey % 2 = 0 THEN c_custkey ELSE -c_custkey END AS signed_key,
       GREATEST(c_acctbal, 0.0) AS bal_clamped,
       LEAST(CAST(c_nationkey AS BIGINT), 10) AS nk_capped
FROM customer
ORDER BY c_custkey
""",
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / null-handling functions: CASE, COALESCE, NULLIF,
    GREATEST, LEAST."""
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt")
        .when(bal < 5000, "low")
        .when(bal < 8000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, F.col("c_custkey"))
        .otherwise(-F.col("c_custkey"))
        .alias("signed_key"),
        F.greatest(bal, F.lit(0.0)).alias("bal_clamped"),
        F.least(F.col("c_nationkey").cast("long"), F.lit(10).cast("long")).alias("nk_capped"),
    ).orderBy("c_custkey")


@register(
    "q_fn_map",
    group="G",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS map_size,
       CAST(COALESCE(MAX(CASE WHEN event_type = 'view' THEN c END), 0)
            AS BIGINT) AS n_view,
       CAST(COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN c END), 0)
            AS BIGINT) AS n_purchase
FROM counts GROUP BY user_id
ORDER BY user_id
""",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type function family (the §2.3 checklist's last scalar row):
    per user, the event-type histogram is materialized as a genuine Spark
    MapType column (map_from_entries over collected structs) and then
    consumed with map lookups (element_at), size(), and map_keys — the
    construction/lookup/cardinality trio.

    The OUTPUT is plain BIGINTs (lookups of two fixed keys + the map
    size), because a map column itself has engine-defined entry order —
    lookups are order-independent, so the oracle can verify the map
    semantics through conditional aggregation without comparing raw map
    values. One (user, type) rollup + one user-keyed map assembly; the
    map is bounded by the type vocabulary, never the event count."""
    counts = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").cast("long").alias("c"))
    )
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "c"))
        ).alias("type_counts")
    )
    return m.select(
        "user_id",
        F.size(F.map_keys("type_counts")).cast("long").alias("map_size"),
        F.coalesce(F.element_at("type_counts", F.lit("view")), F.lit(0))
        .cast("long")
        .alias("n_view"),
        F.coalesce(F.element_at("type_counts", F.lit("purchase")), F.lit(0))
        .cast("long")
        .alias("n_purchase"),
    ).orderBy("user_id")
