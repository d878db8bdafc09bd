"""Streaming-shaped operators over the events table (SURVEY.md §2.4 Group H).

Batch implementations whose window semantics are chosen to be
Structured-Streaming-compatible (the streaming/ package runs the same
tumbling aggregation as a readStream query). The reference has no streaming
semantics at all — its bounded buffer is pipelined execution, not event-time
processing (SURVEY.md §2.3) — so this group is pure new surface.

Cross-engine timestamp discipline (FIXTURES.md gotcha #1): events.ts has
shipped as both nanosecond and microsecond parquet (the reader normalizes
to µs TimestampType either way; DuckDB keeps whatever the file stores).
Every comparison/bucket here therefore goes through epoch *microseconds*
(``unix_micros`` / ``epoch_us``) on both engines, and window starts are
emitted as epoch-µs BIGINTs, never raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import table

_HOUR_US = 3_600 * 1_000_000
_HALF_HOUR_US = 1_800 * 1_000_000
_SESSION_GAP_US = 1_800 * 1_000_000  # 30 min
_DAY_US = 24 * _HOUR_US


@register(
    "q_stream_tumbling",
    group="H",
    oracle=f"""
SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US}) * {_HOUR_US} AS win_start_us,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY win_start_us, event_type
ORDER BY win_start_us, event_type
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour tumbling window counts + sum(value) by event_type, via the
    native ``F.window`` (epoch-aligned, identical bucketing to the streaming
    runtime). One hash-agg shuffle keyed on (window, type)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros("w.start").alias("win_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("win_start_us", "event_type")
    )


@register(
    "q_stream_sliding",
    group="H",
    oracle=f"""
WITH e AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, value FROM events
), x AS (
  SELECT (ts_us // {_HALF_HOUR_US}) * {_HALF_HOUR_US} - k * {_HALF_HOUR_US} AS win_start_us,
         event_type, value
  FROM e, unnest([0, 1]) AS u(k)
)
SELECT win_start_us, event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM x
GROUP BY win_start_us, event_type
ORDER BY win_start_us, event_type
""",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min: each event lands in exactly two
    epoch-aligned windows (Spark expands this with an internal explode — the
    shuffle carries 2× the rows, which is the honest cost of overlap)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros("w.start").alias("win_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("win_start_us", "event_type")
    )


@register(
    "q_stream_session",
    group="H",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
), marked AS (
  SELECT user_id, event_id, value, ts_us,
         CASE WHEN ts_us - LAG(ts_us) OVER w > {_SESSION_GAP_US}
              OR LAG(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
), sess AS (
  SELECT user_id, event_id, value, ts_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization per user (the batch analogue of
    ``session_window``): lag → new-session flag → prefix-sum session ids →
    per-session aggregate. The window and the aggregate share the user_id
    hash partitioning, so the whole thing is one exchange."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    w = W.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    prev = F.lag("ts_us").over(w)
    is_new = F.when(prev.isNull() | ((F.col("ts_us") - prev) > _SESSION_GAP_US), 1).otherwise(0)
    sess = (
        e.withColumn("is_new", is_new)
        .withColumn(
            "session_id",
            F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            "session_start_us",
            "session_end_us",
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q_stream_late",
    group="H",
    oracle=f"""
WITH e AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, value FROM events
), wm AS (
  SELECT MAX(ts_us) - 24 * {_HOUR_US} AS cutoff_us FROM e
)
SELECT (ts_us // {_HOUR_US}) * {_HOUR_US} AS win_start_us,
       event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM e, wm
WHERE e.ts_us >= wm.cutoff_us
GROUP BY win_start_us, event_type
ORDER BY win_start_us, event_type
""",
)
def q_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark analogue in batch: recompute the tumbling aggregate keeping
    only events within 24h of max(ts) — the rows a ``withWatermark('ts',
    '24 hours')`` streaming query would still accept at end-of-stream. The
    global max joins in as a broadcast 1-row aggregate (no driver action)."""
    e = table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("ts_us"), "event_type", "value"
    )
    wm = e.agg((F.max("ts_us") - 24 * _HOUR_US).alias("cutoff_us"))
    return (
        e.crossJoin(F.broadcast(wm))
        .filter(F.col("ts_us") >= F.col("cutoff_us"))
        .groupBy(
            (F.col("ts_us") - (F.col("ts_us") % _HOUR_US)).alias("win_start_us"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("win_start_us", "event_type")
    )


@register(
    "q_events_funnel",
    group="H",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
), s1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
              OVER (PARTITION BY user_id) AS t_view
  FROM e
), s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us > t_view THEN ts_us END)
              OVER (PARTITION BY user_id) AS t_click
  FROM s1
), s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > t_click THEN ts_us END)
              OVER (PARTITION BY user_id) AS t_purchase
  FROM s2
), per_user AS (
  SELECT DISTINCT user_id, t_view, t_click, t_purchase FROM s3
)
SELECT COUNT(t_view) AS n_view,
       COUNT(t_click) AS n_view_click,
       COUNT(t_purchase) AS n_view_click_purchase
FROM per_user
""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase per user: the
    earliest view, the earliest click strictly after it, the earliest
    purchase strictly after that; output = users completing each stage.

    Plan shape: three chained full-partition windows over ONE user_id hash
    partitioning (each stage's MIN(CASE...) references the previous
    stage's timestamp) — a single exchange, no self-joins, no per-stage
    scans. At 100 TB the alternative (3 filtered aggregates + 2 joins)
    shuffles the events table three times; this shuffles it once."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = W.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w)
    staged = e.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t_view")),
            F.col("ts_us"),
        )
    ).over(w)
    staged = staged.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("t_click")),
            F.col("ts_us"),
        )
    ).over(w)
    per_user = (
        staged.withColumn("t_purchase", t_purchase)
        .select("user_id", "t_view", "t_click", "t_purchase")
        .distinct()
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"),
    )


@register(
    "q_events_retention",
    group="H",
    oracle=f"""
WITH a AS (
  SELECT DISTINCT user_id,
         (epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US}) * {_DAY_US} AS day_us
  FROM events
), c AS (
  SELECT user_id, MIN(day_us) AS cohort_us FROM a GROUP BY user_id
)
SELECT c.cohort_us AS cohort_day_us,
       CAST((a.day_us - c.cohort_us) // {_DAY_US} AS BIGINT) AS day_offset,
       COUNT(*) AS n_users
FROM a JOIN c ON a.user_id = c.user_id
GROUP BY cohort_day_us, day_offset
ORDER BY cohort_day_us, day_offset
""",
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-active day, counted
    on each later active day as a day offset — the standard growth-
    analytics triangle.

    The cohort day is a MIN over a full-partition window on the SAME
    user_id partitioning the per-(user, day) dedup produces — no separate
    cohort aggregate and, crucially, no cohort join: a per-user cohort
    table is O(users) and NOT broadcastable at 100 TB, while the window
    formulation never materializes it. Output is O(days²) rows regardless
    of corpus size. Day buckets are epoch-µs integer floors
    (engine-portable; no date-type drift)."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        ((F.unix_micros("ts") / _DAY_US).cast("long") * _DAY_US).alias("day_us"),
    )
    # One explicit user_id shuffle serves BOTH the (user, day) distinct
    # (hash(user) satisfies the clustered-distribution requirement — a
    # subset of the grouping keys) and the cohort window: without it Spark
    # plans two exchanges, hash(user, day) then hash(user).
    active = e.repartition("user_id").distinct()
    cohort_us = F.min("day_us").over(W.partitionBy("user_id"))
    return (
        active.withColumn("cohort_us", cohort_us)
        .groupBy(
            F.col("cohort_us").alias("cohort_day_us"),
            ((F.col("day_us") - F.col("cohort_us")) / _DAY_US)
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day_us", "day_offset")
    )


@register(
    "q_agg_rollup_reuse",
    group="D",
    oracle=f"""
SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US}) * {_DAY_US} AS day_us,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY day_us, event_type
ORDER BY day_us, event_type
""",
)
def q_agg_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup reuse (the hypertable / materialized-rollup
    pattern): DAILY aggregates computed FROM the HOURLY aggregate table,
    never from raw events — counts and exact-decimal sums compose
    associatively, so the result is identical to aggregating the raw
    table (the oracle does exactly that, proving the reuse is lossless).

    At 100 TB this is the difference between scanning 24x fewer rows for
    every daily/weekly/monthly report and re-scanning raw events each
    time; the hourly table is what a production pipeline persists. Sums
    run over DECIMAL(18,2) (value is 2-decimal data) because double
    addition is NOT associative — the decimal sums make the two-level
    rollup byte-identical to the direct aggregate on both engines."""
    e = table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("dv"),
    )
    hourly = e.groupBy(
        ((F.col("ts_us") / _HOUR_US).cast("long") * _HOUR_US).alias("hour_us"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.sum("dv").alias("sv"))
    return (
        hourly.groupBy(
            ((F.col("hour_us") / _DAY_US).cast("long") * _DAY_US).alias("day_us"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
        )
        .orderBy("day_us", "event_type")
    )


@register(
    "q_events_gapfill",
    group="H",
    oracle=f"""
WITH e AS (
  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US}) * {_HOUR_US} AS hour_us,
         event_type,
         CAST(value AS DECIMAL(18,2)) AS dv
  FROM events
), hourly AS (
  SELECT hour_us, event_type, COUNT(*) AS n,
         CAST(SUM(dv) AS DOUBLE) AS sum_value
  FROM e GROUP BY hour_us, event_type
), bounds AS (
  SELECT MIN(hour_us) AS lo, MAX(hour_us) AS hi FROM e
), spine AS (
  SELECT unnest(generate_series(lo, hi, {_HOUR_US})) AS hour_us FROM bounds
), grid AS (
  SELECT s.hour_us, t.event_type
  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT g.hour_us, g.event_type,
       COALESCE(h.n, 0) AS n_events,
       last_value(h.sum_value IGNORE NULLS)
         OVER (PARTITION BY g.event_type ORDER BY g.hour_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
FROM grid g LEFT JOIN hourly h ON g.hour_us = h.hour_us AND g.event_type = h.event_type
ORDER BY g.hour_us, g.event_type
""",
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly spine per event_type with
    zero-counts for silent hours and the last observed hourly sum carried
    forward (``last_value`` IGNORE NULLS) — the densification step before
    any rolling-window model sees the series.

    Scale shape: the spine is GENERATED (``sequence`` over the global
    [min, max] hour bounds — a broadcast 1-row aggregate), never scanned;
    its size is O(hours × event types), independent of event count. The
    left join hashes on (hour, type) against the already-aggregated hourly
    table, and the forward fill is one window per event_type over the
    spine-sized frame. Sums are exact decimals cast to double, so the
    fill copies byte-identical values on both engines."""
    e = table(spark, sf_dir, "events").select(
        ((F.unix_micros("ts") / _HOUR_US).cast("long") * _HOUR_US).alias("hour_us"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("dv"),
    )
    hourly = e.groupBy("hour_us", "event_type").agg(
        F.count("*").alias("n"), F.sum("dv").cast("double").alias("sum_value")
    )
    bounds = e.agg(F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(_HOUR_US))).alias("hour_us")
    )
    types = e.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(hourly, ["hour_us", "event_type"], "left")
        .select(
            "hour_us",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("filled_sum"),
        )
        .orderBy("hour_us", "event_type")
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@register(
    "q_events_sessionize",
    group="H",
    oracle=f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
), g AS (
  SELECT event_id, user_id, ts_us,
         CASE WHEN LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                   IS NULL THEN 1
              WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                   > {_SESSION_GAP_US} THEN 1
              ELSE 0 END AS new_sess
  FROM e
)
SELECT event_id, user_id, ts_us,
       CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM g ORDER BY user_id, ts_us, event_id
""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level session-id assignment: a user's events belong to one
    session until a >30-minute inactivity gap starts the next (the
    event-table complement of q_stream_session, which aggregates whole
    sessions — this one tags every row, which is what downstream
    attribution and funnel features consume).

    Plan shape: LAG and the running SUM share one window family
    (PARTITION BY user_id ORDER BY ts, event_id), so the whole query is a
    single hash exchange on user_id followed by per-user windows — no
    second shuffle, no global sort except the presentation ORDER BY.
    Gap arithmetic is integer microseconds, bit-identical across engines."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    new_sess = F.when(
        F.lag("ts_us").over(w).isNull()
        | ((F.col("ts_us") - F.lag("ts_us").over(w)) > _SESSION_GAP_US),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        e.withColumn("new_sess", new_sess)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.sum("new_sess").over(cum).cast("long").alias("session_seq"),
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


_ANOM_TRAIL_HOURS = 24  # trailing window width
_ANOM_MIN_HOURS = 12  # warm-up: hours required before scoring


@register(
    "q_events_anomaly",
    group="H",
    oracle=f"""
WITH hourly AS (
  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US}) * {_HOUR_US} AS hour_us,
         event_type,
         -- cast back: DuckDB SUM(BIGINT) yields HUGEINT, Spark stays int64
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS m
  FROM events GROUP BY hour_us, event_type
), trail AS (
  -- 128-bit statistics (HUGEINT; the Spark twin uses decimal(38,0)):
  -- m is cents, so m*m overflows int64 at m = 3e9 cents (~$3e7/hour) —
  -- comfortably reachable at volume. The edge-corpus harness caught the
  -- int64 form erroring on a 1e12-valued event.
  SELECT hour_us, event_type, m,
         COUNT(*)                        OVER w AS cnt,
         SUM(CAST(m AS HUGEINT))         OVER w AS sm,
         SUM(CAST(m AS HUGEINT) * m)     OVER w AS sm2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_us
               RANGE BETWEEN {_ANOM_TRAIL_HOURS * _HOUR_US} PRECEDING
                         AND {_HOUR_US} PRECEDING)
)
SELECT hour_us, event_type, m AS m_cents, CAST(cnt AS BIGINT) AS n_trailing,
       ROUND(CAST(CAST(m AS HUGEINT) * cnt - sm AS DOUBLE)
             / sqrt(CAST(cnt * sm2 - sm * sm AS DOUBLE)), 2) AS z
FROM trail
WHERE cnt >= {_ANOM_MIN_HOURS}
  AND cnt * sm2 - sm * sm > 0
  AND (CAST(m AS HUGEINT) * cnt - sm) * (CAST(m AS HUGEINT) * cnt - sm)
      > 4 * (cnt * sm2 - sm * sm)
ORDER BY event_type, hour_us
""",
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection (the monitoring query of the
    event-analytics family): an hour is anomalous for a type when its
    total deviates from the trailing-24h mean by more than 2 population
    sigmas, after a 12-hour warm-up.

    Engine-exactness: values go to integer CENTS first (floor(v*100+0.5)
    of the same double on both engines), so every windowed statistic
    (count, Σm, Σm²) is integer-exact, the 2σ test is the PURE-INTEGER
    comparison (m·cnt − Σm)² > 4(cnt·Σm² − Σm²), and the reported z-score
    is one identical closed-form double expression — no accumulated-FP
    ordering anywhere (same discipline as q_agg_corr_exact). At extreme
    volumes promote the products to DECIMAL.

    Plan shape: one hash-agg shuffle onto the (hour, type) rollup, then
    RANGE-frame windows (gap-correct: the frame is wall-clock hours, not
    row counts) over the ROLLUP — hours × types rows, trivially small at
    any corpus size; the raw event table is touched exactly once."""
    e = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = (
        e.select(
            ((F.unix_micros("ts") / _HOUR_US).cast("long") * _HOUR_US).alias("hour_us"),
            "event_type",
            cents.alias("cents"),
        )
        .groupBy("hour_us", "event_type")
        .agg(F.sum("cents").alias("m"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_us")
        .rangeBetween(-_ANOM_TRAIL_HOURS * _HOUR_US, -_HOUR_US)
    )
    # 128-bit statistics (decimal(38,0); the oracle mirrors with HUGEINT):
    # m*m overflows int64 at m = 3e9 cents — see the oracle comment.
    md = F.col("m").cast("decimal(38,0)")
    trail = hourly.select(
        "hour_us",
        "event_type",
        "m",
        F.count("*").over(w).alias("cnt"),
        F.sum(md).over(w).alias("sm"),
        F.sum(md * F.col("m")).over(w).alias("sm2"),
    )
    dev = F.col("m").cast("decimal(38,0)") * F.col("cnt") - F.col("sm")
    var_n2 = F.col("cnt") * F.col("sm2") - F.col("sm") * F.col("sm")
    return (
        trail.filter(
            (F.col("cnt") >= _ANOM_MIN_HOURS) & (var_n2 > 0) & (dev * dev > 4 * var_n2)
        )
        .select(
            "hour_us",
            "event_type",
            F.col("m").alias("m_cents"),
            F.col("cnt").cast("long").alias("n_trailing"),
            F.round(dev / F.sqrt(var_n2.cast("double")), 2).alias("z"),
        )
        .orderBy("event_type", "hour_us")
    )


@register(
    "q_events_ohlc",
    group="H",
    oracle=f"""
WITH e AS (
  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US}) * {_HOUR_US} AS hour_us,
         event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         event_id, value
  FROM events
), f AS (
  SELECT hour_us, event_type, value,
         FIRST_VALUE(value) OVER (PARTITION BY hour_us, event_type
             ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open,
         LAST_VALUE(value) OVER (PARTITION BY hour_us, event_type
             ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close
  FROM e
)
SELECT hour_us, event_type,
       ROUND(MAX(open), 2) AS open,
       ROUND(MAX(value), 2) AS high,
       ROUND(MIN(value), 2) AS low,
       ROUND(MAX(close), 2) AS close,
       COUNT(*) AS n_events
FROM f
GROUP BY hour_us, event_type
ORDER BY hour_us, event_type
""",
)
def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour OHLC bars (open/high/low/close) per event_type — the
    candlestick rollup every metrics/feature store derives from a raw
    event stream (the reference's key->value aggregation generalized to
    ordered-pick aggregates; cf. SURVEY.md §2.3 "aggregation" row).

    Engine-exactness: all four outputs are row PICKS (first/last by the
    total order (ts_us, event_id), min/max) — no FP accumulation exists
    anywhere, so doubles cross engines bit-identically; ROUND(x,2) is
    presentation only.

    Plan shape: ONE hash exchange on the bar key. The window partitions
    by exactly the (hour_us, event_type) the aggregation groups on, so
    Catalyst reuses the window's hashpartitioning for the final agg —
    no second shuffle (asserted by the plan-hygiene suite's partial/final
    agg check). first/last over the full frame replaces a self-join
    against per-bar argmin/argmax — at 100 TB the bar count is
    hours x types, trivially small, and the heavy input passes through
    exactly once."""
    e = table(spark, sf_dir, "events").select(
        ((F.unix_micros("ts") / _HOUR_US).cast("long") * _HOUR_US).alias("hour_us"),
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
    )
    w = (
        W.partitionBy("hour_us", "event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        e.select(
            "hour_us",
            "event_type",
            "value",
            F.first("value").over(w).alias("open"),
            F.last("value").over(w).alias("close"),
        )
        .groupBy("hour_us", "event_type")
        .agg(
            F.round(F.max("open"), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max("close"), 2).alias("close"),
            F.count("*").alias("n_events"),
        )
        .orderBy("hour_us", "event_type")
    )


@register(
    "q_events_timeweighted",
    group="H",
    oracle=f"""
WITH e AS (
  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), d AS (
  SELECT event_type, cents,
         LEAD(ts_us) OVER (PARTITION BY event_type ORDER BY ts_us, event_id)
           - ts_us AS dt_us
  FROM e
)
SELECT event_type,
       COUNT(*) AS n_intervals,
       CAST(SUM(dt_us) AS BIGINT) AS span_us,
       ROUND(CAST(SUM(CAST(cents AS HUGEINT) * dt_us) AS DOUBLE)
             / CAST(SUM(dt_us) AS DOUBLE) / 100.0, 2) AS twa
FROM d
WHERE dt_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
)
def q_events_timeweighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per event_type over irregular
    samples (the TimescaleDB `time_weight('LOCF', ...)` analogue): each
    observation holds until the next one of the same type, so its weight
    is that interval's duration; the last observation is open-ended and
    excluded.

    Engine-exactness: values go to integer cents, durations stay integer
    microseconds, and the weighted sum Σ(cents·dt) runs in EXACT integer
    arithmetic on both engines — decimal(38,0) on Spark, HUGEINT on
    DuckDB — so no FP accumulation order can drift; the single final
    division happens once in double and rounds identically.

    Plan shape: one hash exchange on event_type serving both the LEAD
    window and the final aggregate (same key), then a 5-row result. At
    100 TB the per-type ordering is the real cost; for a production
    hypertable this window would ride the time-bucketed sort order the
    ingest already maintains, and the partial aggregation is map-side."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = W.partitionBy("event_type").orderBy("ts_us", "event_id")
    d = e.select(
        "event_type",
        "cents",
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    wsum = F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dt_us"))
    return (
        d.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dt_us").cast("long").alias("span_us"),
            F.round(
                wsum.cast("double") / F.sum("dt_us").cast("double") / F.lit(100.0), 2
            ).alias("twa"),
        )
        .orderBy("event_type")
    )


_TOPK_PER_WINDOW = 3


@register(
    "q_stream_topk_windowed",
    group="H",
    oracle=f"""
WITH hourly AS (
  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US}) * {_HOUR_US} AS win_start_us,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY win_start_us, event_type
), r AS (
  SELECT win_start_us, event_type, n_events,
         -- NULLS LAST made explicit: a NULL-typed group (dirty data)
         -- must tie-break identically on both engines (Spark ASC is
         -- NULLS FIRST by default, DuckDB ASC is NULLS LAST — the
         -- edge-corpus NULL-typed event flipped rank boundaries)
         ROW_NUMBER() OVER (PARTITION BY win_start_us
                            ORDER BY n_events DESC, event_type NULLS LAST) AS rk
  FROM hourly
)
SELECT win_start_us, event_type, n_events, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {_TOPK_PER_WINDOW}
ORDER BY win_start_us, rk
""",
)
def q_stream_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-N per window: the top-3 event types of every tumbling hour by
    event count (the trending-items query; in the streaming runtime the
    same rollup feeds a per-window rank on window close).

    Plan shape: the raw stream collapses onto the (hour, type) rollup
    first (partial/final hash-agg — the ONLY pass over the big table),
    then row_number runs over at most |types| rows per hour and Spark's
    WindowGroupLimit pushes rk <= 3 below the sort. Counts and ranks are
    all integers — nothing to drift."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.select(
            ((F.unix_micros("ts") / _HOUR_US).cast("long") * _HOUR_US).alias(
                "win_start_us"
            ),
            "event_type",
        )
        .groupBy("win_start_us", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    w = W.partitionBy("win_start_us").orderBy(
        F.desc("n_events"), F.asc_nulls_last("event_type")
    )
    return (
        hourly.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _TOPK_PER_WINDOW)
        .orderBy("win_start_us", "rk")
    )


@register(
    "q_events_cdc_compact",
    group="H",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
), tomb AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'error' THEN ts_us END) AS tomb_ts
  FROM e GROUP BY user_id
), live AS (
  SELECT e.event_id, e.user_id, e.event_type, e.value, e.ts_us,
         ROW_NUMBER() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts_us DESC, e.event_id DESC) AS rk,
         COUNT(*) OVER (PARTITION BY e.user_id) AS n_live
  FROM e JOIN tomb t ON e.user_id = t.user_id
  WHERE e.event_type <> 'error'
    AND (t.tomb_ts IS NULL OR e.ts_us > t.tomb_ts)
)
SELECT user_id, event_type AS final_type, ROUND(value, 2) AS final_value,
       ts_us AS final_ts_us, CAST(n_live AS BIGINT) AS n_live
FROM live WHERE rk = 1
ORDER BY user_id
""",
)
def q_events_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction with tombstones (the lakehouse MERGE/upsert
    read path): treating events as a per-user CDC stream where 'error'
    is a delete marker, emit each user's final state — the latest
    surviving event after their last tombstone — plus how many live
    changes that state compacted. Users whose stream ends in a tombstone
    vanish (the delete contract).

    Engine-exactness: everything is a row pick or an integer count under
    the total order (ts_us desc, event_id desc); ROUND on the carried
    value is presentation only.

    Plan shape: tombstone watermarks pre-aggregate per user (map-side
    combine over the delete markers only), then ONE hash exchange on
    user_id serves the join, the survivor filter, the top-1 window
    (WindowGroupLimit — no per-user sort materialized) and the live
    count. At 100 TB this is the standard log-compaction shape: the
    changelog is touched once, state is one row per surviving key."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.unix_micros("ts").alias("ts_us")
    )
    tomb = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "error", F.col("ts_us"))).alias("tomb_ts")
    )
    live = (
        e.filter(F.col("event_type") != "error")
        .join(tomb, "user_id")
        .filter(F.col("tomb_ts").isNull() | (F.col("ts_us") > F.col("tomb_ts")))
    )
    w = W.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    wn = W.partitionBy("user_id")
    return (
        live.select(
            "user_id",
            "event_type",
            "value",
            "ts_us",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(wn).cast("long").alias("n_live"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("final_type"),
            F.round("value", 2).alias("final_value"),
            F.col("ts_us").alias("final_ts_us"),
            "n_live",
        )
        .orderBy("user_id")
    )


@register(
    "q_events_transitions",
    group="H",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
  FROM events
), t AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS to_type
  FROM e
), c AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM t WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(FLOOR(CAST(n AS DOUBLE)
                  / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)
                  * 10000.0 + 0.5) AS BIGINT) AS p_x10000
FROM c
ORDER BY from_type, to_type
""",
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (the Markov-chain build
    behind next-action prediction and funnel diagnostics): for every
    consecutive same-user event pair, count from_type -> to_type and emit
    each row's share of its from_type's outgoing transitions as an
    x10000-scaled integer.

    Engine-exactness: counts are integers; the one probability division
    happens once in double on identical operands and floors to an
    integer — the engine-portable rate discipline of q_dedup_report.

    Plan shape: ONE hash exchange on user_id for the LEAD window (the
    only pass over the raw stream), then the transition rollup collapses
    to at most |types|² rows — the per-from_type normalizing window runs
    over that trivially bounded matrix, not the corpus. At 100 TB this
    is the standard sequence-featurization shape: per-entity ordering
    work rides one partition-by-key exchange, everything after is
    matrix-sized."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    c = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    wnorm = W.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        F.floor(
            F.col("n").cast("double") / F.sum("n").over(wnorm).cast("double") * 10000.0
            + 0.5
        )
        .cast("long")
        .alias("p_x10000"),
    ).orderBy("from_type", "to_type")


@register(
    "q_events_streaks",
    group="H",
    oracle=f"""
WITH d AS (
  SELECT DISTINCT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US} AS day
  FROM events
), r AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM d
), s AS (
  SELECT user_id, island, COUNT(*) AS len,
         MIN(day) AS start_day
  FROM r GROUP BY user_id, island
), best AS (
  SELECT user_id, len, start_day,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY len DESC, start_day) AS rk
  FROM s
)
SELECT user_id, CAST(len AS BIGINT) AS longest_streak_days,
       CAST(start_day AS BIGINT) AS streak_start_day
FROM best WHERE rk = 1
ORDER BY user_id
""",
)
def q_events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (gaps-and-islands):
    distinct active days collapse into runs via the day − row_number
    fingerprint (consecutive days share it, any gap breaks it); the
    longest run wins, earliest start on ties.

    Engine-exactness: days are integer epoch-day ordinals; islands,
    lengths and tie-breaks are all integer — nothing can drift.

    Plan shape: the raw stream collapses to DISTINCT (user, day) first —
    the only corpus-sized aggregate — then islands, run-lengths and the
    top-1 pick all ride windows/aggregates PARTITIONED BY user_id on the
    days-per-user frame (bounded by the calendar, not event volume).
    Catalyst chains rn-window → island-agg → best-window on one user_id
    exchange; WindowGroupLimit prunes the final pick."""
    e = table(spark, sf_dir, "events")
    d = e.select(
        "user_id", (F.unix_micros("ts") / _DAY_US).cast("long").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    s = (
        d.withColumn("island", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(F.count("*").alias("len"), F.min("day").alias("start_day"))
    )
    best = W.partitionBy("user_id").orderBy(F.desc("len"), "start_day")
    return (
        s.withColumn("rk", F.row_number().over(best))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("len").cast("long").alias("longest_streak_days"),
            F.col("start_day").cast("long").alias("streak_start_day"),
        )
        .orderBy("user_id")
    )


@register(
    "q_events_cooccurrence",
    group="H",
    oracle=f"""
WITH d AS (
  SELECT DISTINCT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US} AS day,
         event_type
  FROM events
), baskets AS (
  SELECT COUNT(*) AS n_baskets
  FROM (SELECT DISTINCT user_id, day FROM d)
), p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM d a JOIN d b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
)
SELECT type_a, type_b, COUNT(*) AS n_together,
       CAST(FLOOR(CAST(COUNT(*) AS DOUBLE)
                  / CAST((SELECT n_baskets FROM baskets) AS DOUBLE)
                  * 10000.0 + 0.5) AS BIGINT) AS support_x10000
FROM p
GROUP BY type_a, type_b
ORDER BY type_a, type_b
""",
)
def q_events_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence within daily per-user baskets (the
    market-basket support table, the input to association-rule mining):
    for every unordered type pair, how many (user, day) baskets contain
    both, and that count as an x10000 share of all baskets.

    Engine-exactness: counts are integers; the one support division is a
    single floored double expression (the q_dedup_report rate
    discipline).

    Plan shape: the stream collapses to DISTINCT (user, day, type) — the
    only corpus-sized exchange — then each basket's sorted type-set
    expands to pairs ARRAY-SIDE via the capped-bucket pair generator
    (types per basket is bounded by the type vocabulary, so a basket
    costs at most C(|types|,2) pairs and the self-equi-join shuffle a
    naive plan would run never exists). The basket total rides a
    row-local second aggregate of the same distinct frame, broadcast as
    one row. The pair rollup is |types|²-bounded."""
    e = table(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        (F.unix_micros("ts") / _DAY_US).cast("long").alias("day"),
        "event_type",
    ).distinct()
    from mapreduce_framework_api_spark.operators.dedup import _pairs_within

    baskets = d.groupBy("user_id", "day").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts")
    )
    n_baskets = baskets.agg(F.count("*").alias("n_baskets"))
    pairs = baskets.select(F.explode(_pairs_within(F.col("ts"))).alias("p")).select(
        F.col("p.a").alias("type_a"), F.col("p.b").alias("type_b")
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_together"))
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "type_a",
            "type_b",
            "n_together",
            F.floor(
                F.col("n_together").cast("double")
                / F.col("n_baskets").cast("double")
                * 10000.0
                + 0.5
            )
            .cast("long")
            .alias("support_x10000"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "q_events_latency_bands",
    group="H",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         COUNT(*) AS n
  FROM events GROUP BY event_type, cents
), m AS (
  SELECT event_type, cents, n,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM c
)
SELECT event_type,
       CAST(MAX(total) AS BIGINT) AS n_rows,
       MIN(CASE WHEN cum * 100 >= total * 50 THEN cents END) AS p50_cents,
       MIN(CASE WHEN cum * 100 >= total * 95 THEN cents END) AS p95_cents,
       MIN(CASE WHEN cum * 100 >= total * 99 THEN cents END) AS p99_cents
FROM m
GROUP BY event_type
ORDER BY event_type
""",
)
def q_events_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p95/p99 of `value` per event_type (the latency-band
    dashboard row), by the discrete-percentile rule: the smallest value
    whose cumulative count reaches ceil(q·n) — evaluated as the pure
    integer test cum·100 >= total·q, no FP anywhere (values go to cents
    once via the fixed floor(v·100+0.5) expression).

    Plan shape: the corpus collapses to the (type, cents) VALUE-DOMAIN
    rollup first (map-side combinable; domain-bounded, not row-bounded),
    one running-count window per type over that rollup serves ALL three
    percentiles simultaneously (conditional MIN aggregation — a naive
    plan sorts or re-windows once per quantile), and the result is one
    row per type. The same collapse-to-domain discipline as q_agg_mad;
    exact percentiles without percentile_approx's error bounds or its
    per-group sorted-buffer state."""
    e = table(spark, sf_dir, "events")
    c = (
        e.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(F.count("*").alias("n"))
    )
    run = (
        W.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    m = c.select(
        "event_type",
        "cents",
        F.sum("n").over(run).alias("cum"),
        F.sum("n").over(W.partitionBy("event_type")).alias("total"),
    )

    def pick(q: int):
        return F.min(
            F.when(F.col("cum") * 100 >= F.col("total") * q, F.col("cents"))
        ).alias(f"p{q}_cents")

    return (
        m.groupBy("event_type")
        .agg(
            F.max("total").cast("long").alias("n_rows"),
            pick(50),
            pick(95),
            pick(99),
        )
        .orderBy("event_type")
    )


@register(
    "q_events_rfm",
    group="H",
    oracle=f"""
WITH p AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), anchor AS (
  SELECT MAX(ts_us) AS max_ts FROM p
), per_user AS (
  SELECT user_id,
         CAST((a.max_ts - MAX(ts_us)) // {_DAY_US} AS BIGINT) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(cents) AS BIGINT) AS monetary_cents
  FROM p, anchor a
  GROUP BY user_id, a.max_ts
), scored AS (
  SELECT user_id, recency_days, frequency, monetary_cents,
         NTILE(5) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
         NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
         NTILE(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m_score
  FROM per_user
)
SELECT user_id, recency_days, frequency, monetary_cents,
       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_code
FROM scored
ORDER BY user_id
""",
)
def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) per purchasing
    user: days since last purchase against the corpus max-time anchor,
    purchase count, cents total, and the classic 3-digit RFM code from
    NTILE(5) quintiles (1 = best in each dimension: most recent, most
    frequent, highest spend).

    Engine-exactness: recency is integer day arithmetic off one MAX
    anchor, money is integer cents, and every NTILE runs over a TOTAL
    order (explicit user_id tie-break — without it NTILE boundaries are
    nondeterministic on ties, the classic RFM reproducibility bug).

    Plan shape: purchases collapse to one row per user (partial/final
    agg — the only corpus-sized pass; the scalar anchor is a 1-row
    broadcast riding the same pre-filtered scan), then three NTILE
    windows run over the per-user frame. The windows are global-order
    (single partition) by NTILE's nature — bounded by |users|, and at
    true 100 TB user counts the quintile boundaries would come from the
    percentile machinery (q_events_latency_bands' domain rollup) instead
    of a global sort; NTILE here is the faithful small-frame form."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    anchor = p.agg(F.max("ts_us").alias("max_ts"))
    per_user = (
        p.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "max_ts")
        .agg(
            F.max("ts_us").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.sum("cents").cast("long").alias("monetary_cents"),
        )
        .select(
            "user_id",
            ((F.col("max_ts") - F.col("last_ts")) / _DAY_US)
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    r = F.ntile(5).over(W.orderBy(F.asc("recency_days"), "user_id"))
    f = F.ntile(5).over(W.orderBy(F.desc("frequency"), "user_id"))
    m = F.ntile(5).over(W.orderBy(F.desc("monetary_cents"), "user_id"))
    return (
        per_user.select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary_cents",
            (r * 100 + f * 10 + m).cast("long").alias("rfm_code"),
        )
        .orderBy("user_id")
    )


def _hourly_grid(e: DataFrame) -> DataFrame:
    """Dense (hix, event_type) grid spanning the corpus's [min, max] hour
    — the GENERATED spine interpolate and autocorr both densify over
    (gapfill builds the same shape in epoch-µs units): bounds are a
    broadcast 1-row aggregate, the spine is sequence-exploded from them
    (O(hours × types), independent of event count), and the type set is a
    broadcast distinct. Shared so spine semantics can't drift between the
    fill and the statistic."""
    bounds = e.agg(F.min("hix").alias("lo"), F.max("hix").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("hix"))
    return spine.crossJoin(F.broadcast(e.select("event_type").distinct()))


@register(
    "q_events_interpolate",
    group="H",
    oracle=f"""
WITH e AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US} AS hix,
         event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
), hourly AS (
  SELECT hix, event_type, CAST(COUNT(*) AS BIGINT) AS n,
         -- fixed-point average in 1e-6 currency units: exact integer
         -- floor division (all inputs non-negative), engine-portable
         CAST(SUM(cents) AS BIGINT) * 10000 // COUNT(*) AS avg_micro
  FROM e GROUP BY hix, event_type
), bounds AS (
  SELECT MIN(hix) AS lo, MAX(hix) AS hi FROM e
), spine AS (
  SELECT unnest(range(lo, hi + 1)) AS hix FROM bounds
), grid AS (
  SELECT s.hix, t.event_type
  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM e) t
), joined AS (
  SELECT g.hix, g.event_type, h.n, h.avg_micro,
         CASE WHEN h.n IS NOT NULL THEN g.hix END AS hv
  FROM grid g LEFT JOIN hourly h
    ON g.hix = h.hix AND g.event_type = h.event_type
), ctx AS (
  SELECT hix, event_type, n, avg_micro,
         LAST_VALUE(hv IGNORE NULLS) OVER wb AS ph,
         LAST_VALUE(avg_micro IGNORE NULLS) OVER wb AS pv,
         FIRST_VALUE(hv IGNORE NULLS) OVER wf AS nh,
         FIRST_VALUE(avg_micro IGNORE NULLS) OVER wf AS nv
  FROM joined
  WINDOW wb AS (PARTITION BY event_type ORDER BY hix
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY event_type ORDER BY hix
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT hix * {_HOUR_US} AS hour_us, event_type,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
       CASE
         WHEN n IS NOT NULL THEN CAST(avg_micro AS DOUBLE) / 1000000
         WHEN ph IS NULL THEN CAST(nv AS DOUBLE) / 1000000
         WHEN nh IS NULL THEN CAST(pv AS DOUBLE) / 1000000
         ELSE (CAST(pv AS DOUBLE)
               + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                 * CAST(hix - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
              / 1000000
       END AS avg_filled,
       CASE WHEN n IS NOT NULL THEN 'obs'
            WHEN ph IS NULL THEN 'lead_edge'
            WHEN nh IS NULL THEN 'trail_edge'
            ELSE 'interp' END AS fill_kind
FROM ctx ORDER BY hour_us, event_type
""",
)
def q_events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a dense hourly spine — the densification
    mode q_events_gapfill's LOCF can't express: silent hours get the
    straight line between the neighboring observed hourly averages
    (edges clamp to the nearest observation), which is what feature
    pipelines feed to models that can't see missingness.

    Scale shape: identical to gapfill — the spine is GENERATED from a
    broadcast 1-row bound aggregate (O(hours × types), independent of
    event count), the left join hashes against the pre-aggregated hourly
    table, and BOTH direction-fills (previous/next observed hour + value)
    ride one event_type window each over the spine-sized frame.

    Exactness discipline: hourly averages are fixed-point integers
    (cents·1e4 floor-divided by count — exact and SIGN-safe: the pmod
    trick below makes Spark's truncating ``div`` equal DuckDB's flooring
    ``//`` even when refunds drive an hour's sum negative); the line
    formula promotes those exact integers to doubles and evaluates a
    token-identical IEEE expression on both engines, so the output needs
    NO round — the usual ROUND(double) half-even/half-up divergence never
    enters (the first cut of this query failed the oracle on exactly
    that: obs rows whose decimal average landed on a .xx5 boundary)."""
    e = table(spark, sf_dir, "events").select(
        # floor(), not divide-then-cast: cast truncates toward zero, so a
        # pre-epoch timestamp (negative epoch-µs) would land one hour high
        # vs the oracle's flooring // — same truncate-vs-floor class as the
        # cents fix above
        F.floor(F.unix_micros("ts") / _HOUR_US).cast("long").alias("hix"),
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    hourly = e.groupBy("hix", "event_type").agg(
        F.count("*").cast("long").alias("n"),
        # FLOOR division, sign-safe: Spark's `div` truncates toward zero
        # while DuckDB's `//` floors, so a negative cents sum (refunds)
        # would drift by 1 micro-unit; subtracting pmod (always >= 0)
        # makes the numerator exactly divisible, where truncation == floor
        F.expr(
            "(sum(cents) * 10000 - pmod(sum(cents) * 10000, count(*))) div count(*)"
        ).alias("avg_micro"),
    )
    joined = _hourly_grid(e).join(hourly, ["hix", "event_type"], "left").withColumn(
        "hv", F.when(F.col("n").isNotNull(), F.col("hix"))
    )
    wb = (
        W.partitionBy("event_type")
        .orderBy("hix")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("event_type")
        .orderBy("hix")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    ctx = joined.select(
        "hix",
        "event_type",
        "n",
        "avg_micro",
        F.last("hv", ignorenulls=True).over(wb).alias("ph"),
        F.last("avg_micro", ignorenulls=True).over(wb).alias("pv"),
        F.first("hv", ignorenulls=True).over(wf).alias("nh"),
        F.first("avg_micro", ignorenulls=True).over(wf).alias("nv"),
    )
    pv_d, nv_d = F.col("pv").cast("double"), F.col("nv").cast("double")
    interp = (
        pv_d
        + (nv_d - pv_d)
        * (F.col("hix") - F.col("ph")).cast("double")
        / (F.col("nh") - F.col("ph")).cast("double")
    ) / 1000000
    return ctx.select(
        (F.col("hix") * _HOUR_US).alias("hour_us"),
        "event_type",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("n").isNotNull(), F.col("avg_micro").cast("double") / 1000000)
        .when(F.col("ph").isNull(), nv_d / 1000000)
        .when(F.col("nh").isNull(), pv_d / 1000000)
        .otherwise(interp)
        .alias("avg_filled"),
        F.when(F.col("n").isNotNull(), F.lit("obs"))
        .when(F.col("ph").isNull(), F.lit("lead_edge"))
        .when(F.col("nh").isNull(), F.lit("trail_edge"))
        .otherwise(F.lit("interp"))
        .alias("fill_kind"),
    ).orderBy("hour_us", "event_type")


@register(
    "q_events_autocorr",
    group="H",
    oracle=f"""
WITH e AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US} AS hix, event_type
  FROM events
), hourly AS (
  SELECT hix, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM e GROUP BY hix, event_type
), bounds AS (
  SELECT MIN(hix) AS lo, MAX(hix) AS hi FROM e
), grid AS (
  SELECT s.hix, t.event_type
  FROM (SELECT unnest(range(lo, hi + 1)) AS hix FROM bounds) s
  CROSS JOIN (SELECT DISTINCT event_type FROM e) t
), series AS (
  SELECT g.hix, g.event_type, COALESCE(h.c, 0) AS x,
         LEAD(COALESCE(h.c, 0)) OVER (PARTITION BY g.event_type ORDER BY g.hix)
           AS y
  FROM grid g LEFT JOIN hourly h
    ON g.hix = h.hix AND g.event_type = h.event_type
), sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM series WHERE y IS NOT NULL GROUP BY event_type
)
SELECT event_type, n AS n_pairs,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 4)
         AS autocorr_lag1
FROM sums
-- a CONSTANT series (zero variance on either side of the lag) has
-- undefined autocorrelation: excluded on both engines. The edge-corpus
-- NULL-typed event produced exactly that (NULL never equi-joins the
-- grid, so its series is all zeros) and the unguarded division threw
-- under ANSI on Spark while DuckDB emitted NaN.
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY event_type
""",
)
def q_events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's hourly count series —
    the burstiness/periodicity diagnostic a monitoring pipeline computes
    per signal. Silent hours COUNT AS ZERO (the series rides the dense
    generated spine, like interpolate/gapfill), because autocorrelation
    of a sparse series without the zeros is a different and wrong
    statistic.

    Exactness: the five co-moment sums are exact BIGINTs over integer
    counts; the final Pearson ratio is ONE closed-form double expression
    evaluated token-identically on both engines (the q_agg_corr_exact
    discipline — built-in corr()'s incremental recurrences drift in
    low-order bits across engines). One events scan, one hourly rollup
    shuffle, a spine-sized window, a types-sized aggregate."""
    e = table(spark, sf_dir, "events").select(
        F.floor(F.unix_micros("ts") / _HOUR_US).cast("long").alias("hix"),
        "event_type",
    )
    hourly = e.groupBy("hix", "event_type").agg(F.count("*").cast("long").alias("c"))
    w = W.partitionBy("event_type").orderBy("hix")
    series = (
        _hourly_grid(e).join(hourly, ["hix", "event_type"], "left")
        .withColumn("x", F.coalesce("c", F.lit(0)))
        .withColumn("y", F.lead("x").over(w))
        .filter(F.col("y").isNotNull())
    )
    s = series.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n_d * F.col("sxy") - sx_d * F.col("sy")
    var_x = n_d * F.col("sxx") - sx_d * F.col("sx")
    var_y = n_d * F.col("syy") - sy_d * F.col("sy")
    den = F.sqrt(var_x) * F.sqrt(var_y)
    return (
        # constant series (zero variance) excluded — see the oracle note
        s.filter((var_x > 0) & (var_y > 0))
        .select(
            "event_type",
            F.col("n").alias("n_pairs"),
            F.round(num / den, 4).alias("autocorr_lag1"),
        )
        .orderBy("event_type")
    )


@register(
    "q_events_heatmap",
    group="H",
    oracle="""
WITH cells AS (
  SELECT isodow(CAST(ts AS TIMESTAMP)) - 1 AS dow,
         CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY dow, hod
)
SELECT CAST(dow AS INTEGER) AS dow, hod, n_events,
       CAST(ROW_NUMBER() OVER (PARTITION BY dow
                               ORDER BY n_events DESC, hod ASC) AS BIGINT)
         AS peak_rank
FROM cells ORDER BY dow, hod
""",
)
def q_events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar heatmap: the (ISO weekday × hour-of-day) activity grid
    every product-analytics dashboard draws, with each weekday's hours
    ranked by load (peak_rank 1 = that day's busiest hour). Exercises
    the weekday-extraction calendar family (Spark ``weekday`` 0=Monday
    == DuckDB ``isodow()-1``; both evaluated in the session's pinned UTC)
    that q_fn_date's year/month/quarter coverage doesn't touch.

    Scale shape: one events scan → one hash aggregate onto a ≤168-cell
    grid; the ranking window runs over the grid, never the events. The
    grid is bounded by the calendar, not the corpus — the 100 TB case is
    identical to the fixture case after the first aggregate."""
    cells = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.weekday("ts").alias("dow"), F.hour("ts").alias("hod")
        )
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w = W.partitionBy("dow").orderBy(F.desc("n_events"), F.asc("hod"))
    return (
        cells.withColumn("peak_rank", F.row_number().over(w).cast("long"))
        .select("dow", "hod", "n_events", "peak_rank")
        .orderBy("dow", "hod")
    )


@register(
    "q_events_burst",
    group="H",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US} AS hix,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hix
), stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(n) AS BIGINT) AS total
  FROM hourly GROUP BY event_type
), flagged AS (
  SELECT h.event_type, h.hix, h.n
  FROM hourly h JOIN stats s ON h.event_type = s.event_type
  WHERE h.n * s.n_hours * 2 > s.total * 3
), islands AS (
  SELECT event_type, hix, n,
         hix - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hix)
           AS island
  FROM flagged
)
SELECT event_type,
       MIN(hix) * {_HOUR_US} AS start_us,
       MAX(hix) * {_HOUR_US} AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(MAX(n) AS BIGINT) AS peak_n,
       CAST(SUM(n) AS BIGINT) AS burst_events
FROM islands
GROUP BY event_type, island
ORDER BY event_type, start_us
""",
)
def q_events_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst-episode detection: maximal runs of CONSECUTIVE hours whose
    event count exceeds 1.5× the type's mean hourly rate — the episode
    view monitoring teams page on (q_events_anomaly flags single hours;
    this stitches flagged hours into [start, end] episodes with peak and
    volume, the gaps-and-islands composition of the two).

    Exactness: the threshold n > 1.5·mean is the integer cross-multiply
    2·n·hours > 3·total (no division, no FP); islands use the classic
    hix − row_number fingerprint over only the FLAGGED rows. Scale: one
    events scan → hourly rollup; stats, flags, islands, and episode
    aggregation all run on the rollup-sized frame (hours × types)."""
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.floor(F.unix_micros("ts") / _HOUR_US).cast("long").alias("hix"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("n").cast("long").alias("total"),
    )
    flagged = hourly.join(F.broadcast(stats), "event_type").filter(
        F.col("n") * F.col("n_hours") * 2 > F.col("total") * 3
    )
    w = W.partitionBy("event_type").orderBy("hix")
    islands = flagged.withColumn("island", F.col("hix") - F.row_number().over(w))
    return (
        islands.groupBy("event_type", "island")
        .agg(
            (F.min("hix") * _HOUR_US).alias("start_us"),
            (F.max("hix") * _HOUR_US).alias("end_us"),
            F.count("*").cast("long").alias("n_hours"),
            F.max("n").cast("long").alias("peak_n"),
            F.sum("n").cast("long").alias("burst_events"),
        )
        .select(
            "event_type", "start_us", "end_us", "n_hours", "peak_n", "burst_events"
        )
        .orderBy("event_type", "start_us")
    )
