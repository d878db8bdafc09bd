"""Warehouse-maintenance operators: SCD2 dimension build, MERGE-style
upsert/delete apply, and column profiling (SURVEY.md §2.4-ter).

The reference (a 2-file educational MapReduce framework, `mapreduce.c:1`)
has no table-maintenance surface; these exist because a production corpus
pipeline spends much of its life maintaining dimensions and snapshots, and
all three are classic MapReduce-era jobs re-expressed as declarative plans:
SCD2 is "sessionize by value change", MERGE is "reduce by key, latest op
wins", profiling is "one combinable aggregate per column".

Scale notes (100 TB):
- SCD2 and MERGE each shuffle ONCE on their natural key (user_id /
  c_custkey); every window and the change-collapse ride that single
  exchange. No driver loops, no collects.
- MERGE broadcasts nothing by default — the change batch is usually a
  few percent of the snapshot but unbounded; Catalyst/AQE picks broadcast
  when the batch is genuinely small.
- Profiling runs one PRUNED single-column hash aggregate per column
  (the fused all-columns variant demotes to a sorted Expand — see the
  q_profile_columns docstring); at 100 TB swap the exact distincts for
  approx_count_distinct, which fuses back into one single-scan aggregate.
- Incremental view maintenance merges partial aggregate states (count/+,
  sum/+, max/max) so a refresh touches the delta and the view, never the
  full fact history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import table


def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned SCD2 dimension frame both q_dim_scd2 and
    q_join_temporal are built on: per user, consecutive equal event_type
    runs collapse into (state, version, valid_from_us, valid_to_us,
    n_events) rows. One user_id exchange serves the change-flag lag, the
    run-id prefix sum, the per-run aggregate, and the version/valid_to
    windows. Shared so the PIT join's row-for-row composition with the
    dimension build cannot silently diverge."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    # NULL-safe change detection (IS DISTINCT FROM, mirrored in both
    # oracles and the streaming maintainer): the previous `prev IS NULL OR
    # prev <> cur` form merged a NULL state into the preceding run's g
    # while still splitting it in the groupBy — two runs sharing one g, a
    # nondeterministic version order (streaming edge-battery finding). A
    # leading NULL-state run simply starts at g=0; row numbering by g is
    # unaffected.
    flagged = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = (
        flagged.withColumn("g", F.sum("chg").over(cum))
        .groupBy("user_id", F.col("event_type").alias("state"), "g")
        .agg(
            F.min(F.unix_micros("ts")).alias("valid_from_us"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    w2 = W.partitionBy("user_id").orderBy("g")
    return (
        runs.withColumn("version", F.row_number().over(w2).cast("long"))
        .withColumn("valid_to_us", F.lead("valid_from_us").over(w2))
        .select(
            "user_id", "state", "version", "valid_from_us", "valid_to_us", "n_events"
        )
    )


@register(
    "q_dim_scd2",
    group="I",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN prev_type IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM seq
), grp AS (
  SELECT user_id, event_type, ts,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM flagged
), runs AS (
  SELECT user_id, event_type AS state, g,
         MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS valid_from_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM grp GROUP BY user_id, event_type, g
)
SELECT user_id, state,
       CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
       valid_from_us,
       LEAD(valid_from_us) OVER w2 AS valid_to_us,
       CASE WHEN LEAD(valid_from_us) OVER w2 IS NULL THEN TRUE ELSE FALSE END
         AS is_current,
       n_events
FROM runs
WINDOW w2 AS (PARTITION BY user_id ORDER BY g)
ORDER BY user_id, version
""",
)
def q_dim_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: each user's event_type
    stream is treated as a mutating attribute; consecutive equal values
    collapse into one versioned row with [valid_from, valid_to) validity
    and an is_current flag — the standard warehouse dimension-history
    load, as one declarative plan.

    Plan: ONE user_id exchange serves everything — the change-flag lag,
    the run-id prefix sum, the per-run aggregate, and the version /
    valid_to windows all reuse that partitioning (same discipline as the
    funnel's chained windows, events.py:238; see scd2_dimension, the
    builder shared with the PIT join). Timestamps travel as epoch µs per
    the events-table convention. Ordering is total (ts, event_id
    tiebreak), so runs are engine-deterministic."""
    return (
        scd2_dimension(spark, sf_dir)
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .select(
            "user_id", "state", "version", "valid_from_us", "valid_to_us",
            "is_current", "n_events",
        )
        .orderBy("user_id", "version")
    )


@register(
    "q_merge_upsert",
    group="I",
    oracle="""
WITH latest AS (
  SELECT o_custkey AS k, o_totalprice, o_orderstatus,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
  FROM orders
), changes AS (
  SELECT k,
         CASE WHEN o_orderstatus = 'F'
                   AND substr(md5('merge#' || CAST(k AS VARCHAR)), 1, 1) = '0'
              THEN 'D' ELSE 'U' END AS op,
         ROUND(o_totalprice, 2) AS new_bal
  FROM latest WHERE rk = 1
), merged AS (
  SELECT b.c_custkey,
         b.c_name,
         b.c_mktsegment,
         CASE WHEN c.op = 'U' THEN c.new_bal
              ELSE ROUND(b.c_acctbal, 2) END AS c_acctbal,
         CASE WHEN c.k IS NULL THEN 'kept'
              WHEN c.op = 'U' THEN 'updated' END AS merge_action
  FROM customer b LEFT JOIN changes c ON b.c_custkey = c.k
  WHERE c.k IS NULL OR c.op <> 'D'
)
SELECT c_custkey, c_name, c_mktsegment, c_acctbal, merge_action
FROM merged ORDER BY c_custkey
""",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the Delta/Iceberg upsert-and-delete apply)
    as a pure DataFrame plan: the change batch is each customer's latest
    order (update the balance to its total price), except a deterministic
    1/16 hash-slice of finalized customers which become DELETEs; unmatched
    snapshot rows are kept.

    Plan: change derivation is one orders shuffle (WindowGroupLimit
    top-1 per customer — same shape as dedup's canonical election,
    dedup.py:1001); the apply is ONE left join on the snapshot key plus a
    row-local CASE — exactly what a lakehouse MERGE compiles to before
    file rewriting. No broadcast is forced: the change batch is
    snapshot-sized here, and AQE picks broadcast when a real batch is
    small."""
    w = W.partitionBy("k").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    latest = (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("k"), "o_totalprice", "o_orderstatus",
            "o_orderdate", "o_orderkey",
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    changes = latest.select(
        "k",
        F.when(
            (F.col("o_orderstatus") == "F")
            & (F.substring(F.md5(F.concat(F.lit("merge#"), F.col("k").cast("string"))), 1, 1) == "0"),
            F.lit("D"),
        )
        .otherwise(F.lit("U"))
        .alias("op"),
        F.round("o_totalprice", 2).alias("new_bal"),
    )
    base = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    return (
        base.join(changes, base.c_custkey == changes.k, "left")
        .filter(F.col("k").isNull() | (F.col("op") != "D"))
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.when(F.col("op") == "U", F.col("new_bal"))
            .otherwise(F.round("c_acctbal", 2))
            .alias("c_acctbal"),
            F.when(F.col("k").isNull(), F.lit("kept"))
            .when(F.col("op") == "U", F.lit("updated"))
            .alias("merge_action"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_profile_columns",
    group="I",
    oracle="""
SELECT * FROM (
  SELECT 'l_quantity' AS col_name,
         CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
         CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
         printf('%.2f', MIN(l_quantity)) AS vmin,
         printf('%.2f', MAX(l_quantity)) AS vmax
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice',
         CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
         CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
         printf('%.2f', MIN(l_extendedprice)),
         printf('%.2f', MAX(l_extendedprice))
  FROM lineitem
  UNION ALL
  SELECT 'l_discount',
         CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
         CAST(COUNT(DISTINCT l_discount) AS BIGINT),
         printf('%.2f', MIN(l_discount)),
         printf('%.2f', MAX(l_discount))
  FROM lineitem
  UNION ALL
  SELECT 'l_returnflag',
         CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
         CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
         MIN(l_returnflag),
         MAX(l_returnflag)
  FROM lineitem
  UNION ALL
  SELECT 'l_shipdate',
         CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT),
         CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
         strftime(MIN(CAST(l_shipdate AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S'),
         strftime(MAX(CAST(l_shipdate AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S')
  FROM lineitem
) ORDER BY col_name
""",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the schema-inference / data-quality pass every
    ingestion pipeline runs first): per-column null count, exact distinct
    count, and min/max rendered as strings so numeric, string, and
    timestamp columns share one long-format report.

    Plan: one independent single-column aggregate PER profiled column,
    unioned — each is a PRUNED parquet scan (ReadSchema shows exactly one
    column) feeding a hash aggregate with one distinct. The tempting
    all-columns-in-one-agg shape is a trap: five exact COUNT(DISTINCT)s
    in one aggregate force Catalyst into an Expand over SIX grouping keys
    (every distinct column becomes a normalized sort key), which demotes
    the whole pipeline to SortAggregate — measured 8× slower at sf0.1
    than these five pruned hash aggregates. At 100 TB swap exact
    distincts for approx_count_distinct(col, 0.01), which DOES fuse into
    one single-scan aggregate (no expand); exact is kept here because the
    oracle must match bit-for-bit. Min/max formatting is printf-pinned on
    both engines so the string render can't drift."""
    li = table(spark, sf_dir, "lineitem")

    def _profile(c, vmin_expr, vmax_expr):
        return li.select(c).agg(
            F.lit(c).alias("col_name"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_null"),
            F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
            vmin_expr.alias("vmin"),
            vmax_expr.alias("vmax"),
        )
    parts = [
        _profile(c, F.format_string("%.2f", F.min(c)), F.format_string("%.2f", F.max(c)))
        for c in ("l_quantity", "l_extendedprice", "l_discount")
    ]
    parts.append(_profile("l_returnflag", F.min("l_returnflag"), F.max("l_returnflag")))
    parts.append(
        _profile(
            "l_shipdate",
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss"),
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.orderBy("col_name")


@register(
    "q_mv_incremental",
    group="I",
    oracle=f"""
SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {3_600 * 1_000_000}) * {3_600 * 1_000_000}
         AS hour_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(MAX(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         AS max_cents
FROM events
GROUP BY hour_us, event_type
ORDER BY hour_us, event_type
""",
)
def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the hourly rollup is
    NOT recomputed from scratch — a deterministic 7/8 hash-slice of
    events stands in for the already-materialized base view (aggregated
    once), the remaining 1/8 is the late-arriving delta batch (aggregated
    alone), and the published view is the MERGE of the two partial-state
    tables. The oracle recomputes the rollup directly over all events, so
    the hash-green result PROVES the maintenance algebra: count merges by
    +, sum by +, max by max — the same mergeability contract map-side
    combine and the HLL/CMS sketch merges rely on
    (q_sketch_hll_merge, operators/sketches.py).

    Scale shape: the base aggregate is view-sized (hours × types), the
    delta aggregate is delta-sized, and the merge shuffles ONLY those two
    aggregated tables on the view key — at 100 TB the nightly refresh
    touches the delta partition and the view, never the full fact
    history. All integer cents, so the merge is bit-exact."""
    hour_us = 3_600 * 1_000_000
    ev = table(spark, sf_dir, "events").select(
        # floor-safe bucketing (matches the oracle's //, incl. pre-epoch ts)
        (F.floor(F.unix_micros("ts") / hour_us).cast("long") * hour_us).alias("hour_us"),
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
        (
            F.substring(
                F.md5(F.concat(F.lit("mv#"), F.col("event_id").cast("string"))), 1, 1
            )
            == "0"
        ).alias("is_delta"),
    )

    def rollup(df):
        return df.groupBy("hour_us", "event_type").agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").alias("sum_cents"),
            F.max("cents").alias("max_cents"),
        )

    base = rollup(ev.filter(~F.col("is_delta")))
    delta = rollup(ev.filter(F.col("is_delta")))
    return (
        base.unionByName(delta)
        .groupBy("hour_us", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
            F.max("max_cents").cast("long").alias("max_cents"),
        )
        .orderBy("hour_us", "event_type")
    )


@register(
    "q_join_temporal",
    group="I",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), grp AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(CASE WHEN prev_type IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM seq
), dim AS (
  SELECT user_id, state, g,
         valid_from_us,
         LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY g)
           AS valid_to_us,
         version
  FROM (
    SELECT user_id, event_type AS state, g,
           MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS valid_from_us,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY g) AS BIGINT)
             AS version
    FROM grp GROUP BY user_id, event_type, g
  )
), purchases AS (
  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts_us, p.cents,
       d.state AS dim_state, d.version AS dim_version
FROM purchases p JOIN dim d
  ON p.user_id = d.user_id
 AND p.ts_us >= d.valid_from_us
 AND (d.valid_to_us IS NULL OR p.ts_us < d.valid_to_us)
ORDER BY p.event_id
""",
)
def q_join_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: every purchase event is enriched
    with the SCD2 dimension version that was valid AT the event's
    timestamp — the canonical "join the fact to the dimension as of
    transaction time" warehouse operation, composed directly on the
    q_dim_scd2 build (versions derived from the same event stream, so
    every purchase matches exactly one version by construction).

    Plan: the dimension history and the fact side hash-join on user_id —
    an EQUI join; the validity-interval predicate is a residual filter on
    the joined rows, safe because a user's version count is bounded (runs
    of the attribute), so the per-key fan-out is the version count, not
    the fact count. This is the standard scale shape for PIT joins
    (equi-key + interval residual); a version-count-skewed corpus would
    move to the binned range-join shape q_join_range_binned pins down.
    Exact integer µs and cents end to end. The dimension side IS
    scd2_dimension — the same builder q_dim_scd2 publishes — so the
    row-for-row composition cannot drift."""
    dim = scd2_dimension(spark, sf_dir).select(
        "user_id", "state", "version", "valid_from_us", "valid_to_us"
    )
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    return (
        purchases.join(dim, "user_id")
        .filter(
            (F.col("ts_us") >= F.col("valid_from_us"))
            & (F.col("valid_to_us").isNull() | (F.col("ts_us") < F.col("valid_to_us")))
        )
        .select(
            "event_id", "user_id", "ts_us", "cents",
            F.col("state").alias("dim_state"),
            F.col("version").alias("dim_version"),
        )
        .orderBy("event_id")
    )


_FUZZY_MAX_DIST = 2


@register(
    "q_join_fuzzy",
    group="I",
    oracle=f"""
WITH vocab AS (
  SELECT DISTINCT p_name AS name FROM part
), keyed AS (
  SELECT DISTINCT name, t.token
  FROM vocab, unnest(regexp_split_to_array(name, ' ')) AS t(token)
), cand AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM keyed a JOIN keyed b ON a.token = b.token AND a.name < b.name
)
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
FROM cand
WHERE levenshtein(name_a, name_b) <= {_FUZZY_MAX_DIST}
ORDER BY name_a, name_b
""",
)
def q_join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-match of the part-name catalog: pairs of DISTINCT names
    within Levenshtein distance 2 (_FUZZY_MAX_DIST), found by token
    blocking — the entity-resolution primitive (catalog dedup, vendor
    name matching) in its scale-correct second-order form.

    Scale shape, two deliberate moves: (1) match the NAME VOCABULARY, not
    the rows — DISTINCT first, so a 100 TB catalog with billions of rows
    but a bounded name vocabulary does the quadratic-ish work on the
    vocabulary only (same second-order trick as the value-domain rollups
    in MAD/latency_bands); (2) candidates come from a shared-token
    blocking join, never an all-pairs cross — the standard
    recall-for-scale trade (an edit that rewrites EVERY token of a name
    escapes the blocking; documented contract, and the oracle mirrors the
    same blocking so the contract itself is hash-verified). Levenshtein
    is integer dynamic programming — identical on both engines."""
    vocab = table(spark, sf_dir, "part").select(F.col("p_name").alias("name")).distinct()
    keyed = vocab.select(
        "name", F.explode(F.split("name", " ")).alias("token")
    ).distinct()
    a = keyed.select(F.col("name").alias("name_a"), "token")
    b = keyed.select(F.col("name").alias("name_b"), "token")
    return (
        a.join(b, "token")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_dist") <= _FUZZY_MAX_DIST)
        .orderBy("name_a", "name_b")
    )


_KANON_K = 5


@register(
    "q_privacy_kanonymity",
    group="I",
    oracle=f"""
WITH qi AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(FLOOR(CAST(c_acctbal AS DECIMAL(12,2)) / 1000) AS BIGINT)
           AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS group_size
  FROM customer
  GROUP BY c_mktsegment, c_nationkey, bal_band
)
SELECT group_size,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN group_size < {_KANON_K} THEN group_size ELSE 0 END)
            AS BIGINT) AS n_risky_rows
FROM qi
GROUP BY group_size
ORDER BY group_size
""",
)
def q_privacy_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit — the release-hygiene counterpart of
    q_pipe_pii_scrub: bucket every customer by its quasi-identifier
    tuple (market segment, nation, $1000 balance band) and report the
    group-size histogram; any row in a group smaller than k=5 is a
    re-identification risk the release pipeline must suppress or
    generalize. The scrub removes direct identifiers; THIS finds the
    combinations of innocent attributes that still single people out.

    Exactness: the balance band is exact DECIMAL floor division (cents
    semantics, matching DuckDB's flooring of the same decimal — balances
    can be negative, and decimal floor agrees on both engines unlike
    bigint div). Scale shape: one scan → one QI hash aggregate (bounded
    by the QI-combination count) → one histogram aggregate over the
    group-size domain. No row-level data leaves the scan."""
    qi = (
        table(spark, sf_dir, "customer")
        .groupBy(
            "c_mktsegment",
            "c_nationkey",
            F.floor(F.col("c_acctbal").cast("decimal(12,2)") / 1000)
            .cast("long")
            .alias("bal_band"),
        )
        .agg(F.count("*").cast("long").alias("group_size"))
    )
    return (
        qi.groupBy("group_size")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum(
                F.when(F.col("group_size") < _KANON_K, F.col("group_size")).otherwise(0)
            )
            .cast("long")
            .alias("n_risky_rows"),
        )
        .orderBy("group_size")
    )


_LDIV_L = 3


@register(
    "q_privacy_ldiversity",
    group="I",
    oracle=f"""
WITH j AS (
  SELECT c.c_mktsegment, c.c_nationkey, o.o_orderpriority
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), g AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_sensitive
  FROM j GROUP BY c_mktsegment, c_nationkey
)
SELECT c_mktsegment, c_nationkey, n_rows, n_sensitive,
       CAST(n_sensitive >= {_LDIV_L} AS BOOLEAN) AS diverse
FROM g
ORDER BY c_mktsegment, c_nationkey
""",
)
def q_privacy_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007) — the
    attribute-disclosure counterpart of q_privacy_kanonymity: a
    quasi-identifier group can be large enough to pass k-anonymity and
    STILL leak, if (nearly) every row in it shares the same sensitive
    value — an attacker who maps a person to the group learns the
    attribute without re-identifying the row. Here the QI tuple is
    (market segment, nation) and the sensitive attribute is the order
    priority of the customer's orders; a group is l-diverse iff it
    contains >= l = 3 distinct sensitive values. Emits every QI group
    with its row count, distinct-sensitive count, and verdict — the
    release gate suppresses or generalizes the non-diverse groups.

    Scale shape: one fact-side scan, the dimension broadcast into the
    join (customer is QI-bearing and dimension-sized), then ONE hash
    aggregate keyed by the QI tuple (count + exact count-distinct over
    a 5-value domain — Spark plans the distinct as a two-level expand
    aggregate, still bounded by |QI| x |domain| partial rows). No
    row-level data leaves the scan; output is |QI groups| rows."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        j.groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("o_orderpriority").cast("long").alias("n_sensitive"),
        )
        .select(
            "c_mktsegment",
            "c_nationkey",
            "n_rows",
            "n_sensitive",
            (F.col("n_sensitive") >= _LDIV_L).alias("diverse"),
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )
