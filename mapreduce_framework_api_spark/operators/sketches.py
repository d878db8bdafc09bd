"""Probabilistic sketches as compositions of built-in DataFrame ops.

At 100 TB, exact distinct counts and per-key frequencies are often the
most expensive aggregations in a pipeline (full shuffle of every key).
Sketches replace them with fixed-size state: HyperLogLog registers
(distinct estimation) and a Count-Min matrix (frequency estimation) are
a few KB per group no matter how many rows stream through, reduce
map-side, and merge associatively — the same reason Spark ships
approx_count_distinct. These implementations are DETERMINISTIC (md5 base
hash, identical bytes in Spark and DuckDB) so, unlike the built-in HLL++,
every register value and estimate is differentially checkable: the
oracle recomputes the same sketch and the driver hash-compares.

All arithmetic that feeds an emitted value is either exact BIGINT
(register sums via power-of-two shifts, counter cells) or a fixed-order
double expression shared by both engines — no order-dependent FP sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import table

# --- HyperLogLog (p=6: m=64 registers/group) -------------------------------
_HLL_M = 64
_HLL_ALPHA_M2 = 2904.064  # alpha_64 (0.709) * m^2, premultiplied literal
_POW52 = float(1 << 52)


@register(
    "q_sketch_hll",
    group="I",
    oracle=f"""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM d),
r AS (SELECT event_type,
             CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % {_HLL_M} AS bucket,
             CAST(('0x' || substr(hx, 3, 13)) AS BIGINT) AS w
      FROM h),
b AS (SELECT event_type, bucket,
             MAX(LEAST(CASE WHEN w > 0 THEN 53 - length(bin(w)) ELSE 53 END, 52)) AS m_rho,
             COUNT(*) AS c
      FROM r GROUP BY event_type, bucket),
s AS (SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS n_exact,
             CAST(SUM(1::BIGINT << (52 - m_rho)) AS DOUBLE) AS reg_sum,
             COUNT(*) AS nb
      FROM b GROUP BY event_type)
SELECT event_type, n_exact,
       CAST(FLOOR(CAST({_HLL_ALPHA_M2} AS DOUBLE)
                  / (reg_sum / {_POW52!r} + CAST({_HLL_M} - nb AS DOUBLE))
                  * 100.0 + 0.5) AS BIGINT) AS hll_est_x100
FROM s
ORDER BY event_type
""",
)
def q_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-user estimate per event_type,
    beside the exact count (so the error is visible in the result).

    Register build is two map-side-combinable hash aggs: per (group,
    bucket) MAX(rho), then per group an exact BIGINT register sum via
    power-of-two shifts (order-independent, engine-identical). The raw
    HLL estimator (no log-based small-range correction — m=64 keeps the
    fixtures in the raw regime, and ln() is not bit-identical across
    engines) is one fixed-order double expression emitted as an x100
    BIGINT. State per group is 64 registers regardless of row count —
    the 100 TB path for COUNT(DISTINCT) without a full key shuffle."""
    d = table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    hx = F.md5(F.col("user_id").cast("string").cast("binary"))
    bucket = F.pmod(F.conv(F.substring(hx, 1, 2), 16, 10).cast("long"), F.lit(_HLL_M))
    w = F.conv(F.substring(hx, 3, 13), 16, 10).cast("long")
    rho = F.least(
        F.when(w > 0, F.lit(53) - F.length(F.bin(w))).otherwise(F.lit(53)), F.lit(52)
    )
    b = (
        d.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_rho"), F.count("*").alias("c"))
    )
    s = b.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_exact"),
        F.sum(F.expr("shiftleft(1L, 52 - m_rho)")).cast("double").alias("reg_sum"),
        F.count("*").alias("nb"),
    )
    est = F.lit(_HLL_ALPHA_M2).cast("double") / (
        F.col("reg_sum") / F.lit(_POW52) + (F.lit(_HLL_M) - F.col("nb")).cast("double")
    )
    return s.select(
        "event_type",
        "n_exact",
        F.floor(est * 100.0 + 0.5).cast("long").alias("hll_est_x100"),
    ).orderBy("event_type")


# --- Count-Min sketch (d=4 rows x w=256 buckets) ---------------------------
_CMS_D = 4
_CMS_W = 256  # one md5 hex byte


def _cms_bucket_sql(i_expr: str, key_expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({i_expr} AS VARCHAR) || ':' "
        f"|| CAST({key_expr} AS VARCHAR)), 1, 2)) AS BIGINT)"
    )


def _cms_bucket(i_col, key_col) -> "F.Column":
    hx = F.md5(
        F.concat(i_col.cast("string"), F.lit(":"), key_col.cast("string")).cast("binary")
    )
    return F.conv(F.substring(hx, 1, 2), 16, 10).cast("long")


@register(
    "q_sketch_cms",
    group="I",
    oracle=f"""
WITH rows_ AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(i)),
counters AS (
  SELECT i, {_cms_bucket_sql('i', 'user_id')} AS bucket, COUNT(*) AS c
  FROM events, rows_
  GROUP BY i, bucket
),
cnt AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
top AS (SELECT user_id, n FROM cnt ORDER BY n DESC, user_id LIMIT 10),
probe AS (
  SELECT t.user_id, t.n, r.i, {_cms_bucket_sql('r.i', 't.user_id')} AS bucket
  FROM top t, rows_ r
)
SELECT p.user_id,
       CAST(p.n AS BIGINT) AS n_exact,
       CAST(MIN(c.c) AS BIGINT) AS cms_est
FROM probe p JOIN counters c ON p.i = c.i AND p.bucket = c.bucket
GROUP BY p.user_id, p.n
ORDER BY n_exact DESC, p.user_id
""",
)
def q_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch: 4x256 counter matrix over event
    user_ids, probed for the top-10 users beside their exact counts
    (CMS guarantees est >= exact; the gap is the collision overestimate).

    The counter build explodes each row over the 4 hash rows and hash-
    aggregates to AT MOST 1024 cells — map-side partials do almost all
    the work, and the shuffled state is the fixed matrix, not the key
    space. Probing broadcasts the tiny counter table. At 100 TB this is
    the heavy-hitter path that never shuffles per-key counts."""
    ev = table(spark, sf_dir, "events").select("user_id")
    rows = F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("i")
    counters = (
        ev.select("user_id", rows)
        .select("i", _cms_bucket(F.col("i"), F.col("user_id")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("c"))
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
    )
    probe = top.select(
        "user_id", "n", F.explode(F.array(*[F.lit(i) for i in range(_CMS_D)])).alias("i")
    ).withColumn("bucket", _cms_bucket(F.col("i"), F.col("user_id")))
    return (
        probe.join(F.broadcast(counters), ["i", "bucket"], "inner")
        .groupBy("user_id", "n")
        .agg(F.min("c").cast("long").alias("cms_est"))
        .select("user_id", F.col("n").cast("long").alias("n_exact"), "cms_est")
        .orderBy(F.desc("n_exact"), "user_id")
    )


# --- Bloom filter (m=4096 bits via 3 md5-derived positions) ----------------
_BLOOM_K = 3
_BLOOM_PRICE_CUT = 490_000.0  # "high-value customer" member set


def _bloom_pos_sql(j_expr: str, key_expr: str) -> str:
    # 3 hex chars = exactly 12 bits = [0, 4096) — uniform, no modulo bias
    return (
        f"CAST(('0x' || substr(md5(CAST({j_expr} AS VARCHAR) || '#' "
        f"|| CAST({key_expr} AS VARCHAR)), 1, 3)) AS BIGINT)"
    )


def _bloom_pos(j_col, key_col) -> "F.Column":
    hx = F.md5(
        F.concat(j_col.cast("string"), F.lit("#"), key_col.cast("string")).cast("binary")
    )
    return F.conv(F.substring(hx, 1, 3), 16, 10).cast("long")


@register(
    "q_sketch_bloom",
    group="I",
    oracle=f"""
WITH ks AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(j)),
members AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice >= {_BLOOM_PRICE_CUT}
),
bits AS (
  SELECT DISTINCT {_bloom_pos_sql('ks.j', 'members.o_custkey')} AS pos
  FROM members, ks
),
probe AS (
  SELECT c.c_custkey, c.c_mktsegment, ks.j,
         {_bloom_pos_sql('ks.j', 'c.c_custkey')} AS pos
  FROM customer c, ks
),
hits AS (
  SELECT p.c_custkey, p.c_mktsegment,
         CASE WHEN COUNT(b.pos) = {_BLOOM_K} THEN 1 ELSE 0 END AS bloom_pass
  FROM probe p LEFT JOIN bits b ON p.pos = b.pos
  GROUP BY p.c_custkey, p.c_mktsegment
),
truth AS (
  SELECT h.c_custkey, h.c_mktsegment, h.bloom_pass,
         CASE WHEN m.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_member
  FROM hits h LEFT JOIN members m ON h.c_custkey = m.o_custkey
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(bloom_pass) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(is_member) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN bloom_pass = 1 AND is_member = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos
FROM truth
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom filter as a semi-join pre-filter, with its
    false-positive accounting in the result (bloom guarantees no false
    negatives: n_bloom_pass >= n_members always).

    The member set (customers with a >= {cut} order) folds to AT MOST
    m=4096 distinct set-bit positions — the filter state is a fixed-size
    bit set no matter how many members stream in, built with one
    map-side-combinable distinct and broadcast to the probe side. This is
    the runtime-filter pattern that prunes a 100 TB fact scan before the
    shuffle: probes failing any of the 3 positions never reach the join.
    md5-derived positions make every bit, pass flag, and count exactly
    reproducible in the SQL oracle (same discipline as the HLL/CMS
    sketches above)."""
    ks = F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)])).alias("j")
    members = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= _BLOOM_PRICE_CUT)
        .select("o_custkey")
        .distinct()
    )
    bits = (
        members.select(ks, "o_custkey")
        .select(_bloom_pos(F.col("j"), F.col("o_custkey")).alias("pos"))
        .distinct()
    )
    probe = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .select("c_custkey", "c_mktsegment", ks)
        .withColumn("pos", _bloom_pos(F.col("j"), F.col("c_custkey")))
    )
    hits = (
        probe.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.when(F.count("hit") == _BLOOM_K, 1).otherwise(0).alias("bloom_pass")
        )
    )
    truth = hits.join(
        F.broadcast(members.withColumn("is_member", F.lit(1))),
        hits.c_custkey == members.o_custkey,
        "left",
    ).select(
        "c_mktsegment", "bloom_pass", F.coalesce("is_member", F.lit(0)).alias("is_member")
    )
    return (
        truth.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("bloom_pass").cast("long").alias("n_bloom_pass"),
            F.sum("is_member").cast("long").alias("n_members"),
            F.sum(
                F.when((F.col("bloom_pass") == 1) & (F.col("is_member") == 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_false_pos"),
        )
        .orderBy("c_mktsegment")
    )


# --- Equi-width histogram quantile sketch (256 bins/group) -----------------
_HIST_BINS = 256


@register(
    "q_sketch_hist_quantile",
    group="I",
    oracle=f"""
WITH b AS (
  SELECT event_type, MIN(value) AS vmin, MAX(value) AS vmax,
         COUNT(*) AS n
  FROM events GROUP BY event_type
), binned AS (
  SELECT e.event_type,
         CASE WHEN b.vmax = b.vmin THEN 0
              ELSE LEAST(CAST(FLOOR((e.value - b.vmin)
                                    / ((b.vmax - b.vmin) / {_HIST_BINS})) AS BIGINT),
                         {_HIST_BINS - 1}) END AS bin
  FROM events e JOIN b ON e.event_type = b.event_type
), counters AS (
  SELECT event_type, bin, COUNT(*) AS c FROM binned GROUP BY event_type, bin
), cum AS (
  SELECT event_type, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM counters
), med AS (
  SELECT c2.event_type, MIN(c2.bin) AS med_bin
  FROM cum c2 JOIN b ON c2.event_type = b.event_type
  WHERE c2.cc >= (b.n + 1) // 2
  GROUP BY c2.event_type
)
SELECT b.event_type,
       CAST(b.n AS BIGINT) AS n,
       ROUND(b.vmin + med.med_bin * ((b.vmax - b.vmin) / {_HIST_BINS}), 2) AS est_p50,
       (SELECT ROUND(quantile_cont(value, 0.5), 2) FROM events e2
        WHERE e2.event_type = b.event_type) AS exact_p50
FROM b JOIN med ON b.event_type = med.event_type
ORDER BY b.event_type
""",
)
def q_sketch_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram quantile sketch: estimate the per-type median
    from a fixed 256-bin histogram, beside the exact percentile (so the
    bin-width error is visible in the result).

    This is the quantile member of the sketch family (HLL = distinct,
    CMS = frequency, Bloom = membership): state per group is 256 counters
    no matter how many rows stream through, built with one map-side-
    combinable aggregate — the 100 TB alternative to the full sort/
    shuffle an exact percentile needs. Bin assignment is a fixed-order
    IEEE expression (single subtract/divide/floor — no order-dependent
    accumulation), so bins, cumulative counts, and the estimate agree
    bit-for-bit across engines; the exact-percentile column reuses the
    `percentile` ≡ `quantile_cont` equivalence proven by
    q_agg_percentile."""
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    b = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 2).alias("exact_p50"),
    )
    width = (F.col("vmax") - F.col("vmin")) / _HIST_BINS
    bin_ = F.when(F.col("vmax") == F.col("vmin"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("vmin")) / width).cast("long"),
            F.lit(_HIST_BINS - 1),
        )
    )
    # b's columns RIDE ALONG the counters pipeline (they are functionally
    # dependent on event_type, so grouping by them changes nothing):
    # referencing b again for the threshold and the final projection would
    # give its subtree three parents, and Catalyst would plan the full
    # events scan + stats aggregate three times. This shape is ONE
    # broadcast join and two events scans total — the minimum, since the
    # bin width needs the finished min/max before the binning pass.
    counters = (
        ev.join(F.broadcast(b), "event_type")
        .select("event_type", bin_.alias("bin"), "vmin", "vmax", "n", "exact_p50")
        .groupBy("event_type", "bin", "vmin", "vmax", "n", "exact_p50")
        .agg(F.count("*").alias("c"))
    )
    cum_w = (
        W.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = counters.withColumn("cc", F.sum("c").over(cum_w))
    med = (
        cum
        # integer floor division to match the oracle's (n + 1) // 2 — the
        # double-division form (n + 1) / 2 picks rank n/2 + 1 on even counts,
        # which diverges whenever the two middle ranks straddle a bin edge
        .filter(F.col("cc") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type", "vmin", "vmax", "n", "exact_p50")
        .agg(F.min("bin").alias("med_bin"))
    )
    return med.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("vmin") + F.col("med_bin") * ((F.col("vmax") - F.col("vmin")) / _HIST_BINS),
            2,
        ).alias("est_p50"),
        "exact_p50",
    ).orderBy("event_type")


@register(
    "q_sketch_hll_merge",
    group="I",
    oracle=f"""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS hx FROM d),
r AS (SELECT event_type,
             CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % {_HLL_M} AS bucket,
             CAST(('0x' || substr(hx, 3, 13)) AS BIGINT) AS w
      FROM h),
b AS (SELECT event_type, bucket,
             MAX(LEAST(CASE WHEN w > 0 THEN 53 - length(bin(w)) ELSE 53 END, 52)) AS m_rho
      FROM r GROUP BY event_type, bucket),
merged AS (SELECT bucket, MAX(m_rho) AS m_rho, COUNT(*) AS n_sketches
           FROM b GROUP BY bucket),
s AS (SELECT CAST(SUM(1::BIGINT << (52 - m_rho)) AS DOUBLE) AS reg_sum,
             COUNT(*) AS nb
      FROM merged),
exact AS (SELECT COUNT(DISTINCT user_id) AS n_users,
                 COUNT(DISTINCT (event_type, user_id)) AS n_pairs,
                 COUNT(DISTINCT event_type) AS n_types
          FROM events)
SELECT e.n_users, e.n_pairs, CAST(e.n_types AS BIGINT) AS n_types,
       CAST(FLOOR(CAST({_HLL_ALPHA_M2} AS DOUBLE)
                  / (s.reg_sum / {_POW52!r} + CAST({_HLL_M} - s.nb AS DOUBLE))
                  * 100.0 + 0.5) AS BIGINT) AS hll_est_x100
FROM s, exact e
""",
)
def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch MERGE: the per-event_type register sets of q_sketch_hll
    are unioned into ONE sketch by per-bucket MAX — estimating the
    distinct-user count of the union without ever touching the raw keys
    again. Output: exact distinct users, exact (type,user) pairs (>
    n_users exactly when users overlap types — the overlap a naive
    sum-of-sketches would double-count), the type count, and the merged
    estimate.

    Mergeability is the property that makes sketches THE 100 TB
    distinct-count path: registers combine associatively, so partial
    sketches built map-side (or per partition / per day / per tenant)
    union by a 64-row MAX with no re-scan — exactly what this query's
    second aggregation performs. Estimator discipline is q_sketch_hll's:
    integer registers, one fixed-order double expression, x100 BIGINT."""
    d = table(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    hx = F.md5(F.col("user_id").cast("string").cast("binary"))
    bucket = F.pmod(F.conv(F.substring(hx, 1, 2), 16, 10).cast("long"), F.lit(_HLL_M))
    w = F.conv(F.substring(hx, 3, 13), 16, 10).cast("long")
    rho = F.least(
        F.when(w > 0, F.lit(53) - F.length(F.bin(w))).otherwise(F.lit(53)), F.lit(52)
    )
    per_type = (
        d.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_rho"))
    )
    merged = per_type.groupBy("bucket").agg(F.max("m_rho").alias("m_rho"))
    s = merged.agg(
        F.sum(F.expr("shiftleft(1L, 52 - m_rho)")).cast("double").alias("reg_sum"),
        F.count("*").alias("nb"),
    )
    exact = table(spark, sf_dir, "events").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct("event_type", "user_id").alias("n_pairs"),
        F.count_distinct("event_type").cast("long").alias("n_types"),
    )
    est = F.lit(_HLL_ALPHA_M2).cast("double") / (
        F.col("reg_sum") / F.lit(_POW52) + (F.lit(_HLL_M) - F.col("nb")).cast("double")
    )
    return exact.crossJoin(F.broadcast(s)).select(
        "n_users",
        "n_pairs",
        "n_types",
        F.floor(est * 100.0 + 0.5).cast("long").alias("hll_est_x100"),
    )


_SLIDE_HOURS = 24
_HOUR_US_SK = 3_600 * 1_000_000


@register(
    "q_sketch_hll_sliding",
    group="I",
    oracle=f"""
WITH d AS (
  SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // {_HOUR_US_SK} AS hour,
         user_id
  FROM events
), h AS (
  SELECT hour, user_id, md5(CAST(user_id AS VARCHAR)) AS hx FROM d
), r AS (
  SELECT hour,
         CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % {_HLL_M} AS bucket,
         CAST(('0x' || substr(hx, 3, 13)) AS BIGINT) AS w
  FROM h
), b AS (
  SELECT hour, bucket,
         MAX(LEAST(CASE WHEN w > 0 THEN 53 - length(bin(w)) ELSE 53 END, 52)) AS m_rho
  FROM r GROUP BY hour, bucket
), trail AS (
  SELECT hour, bucket,
         MAX(m_rho) OVER (PARTITION BY bucket ORDER BY hour
             RANGE BETWEEN {_SLIDE_HOURS - 1} PRECEDING AND CURRENT ROW) AS m_rho
  FROM b
), hours AS (SELECT DISTINCT hour FROM b),
grid AS (
  SELECT t.hour, t.bucket, t.m_rho
  FROM trail t
  -- a bucket contributes to hour H if its register row falls in H's window;
  -- regenerate per-hour rows by joining each hour to the latest register
  -- row per bucket within its trailing window
), s AS (
  SELECT hh.hour,
         CAST(SUM(CAST(1 AS BIGINT) << (52 - t.best)) AS DOUBLE) AS reg_sum,
         COUNT(*) AS nb
  FROM hours hh
  JOIN LATERAL (
    SELECT bucket, MAX(m_rho) AS best
    FROM b
    WHERE b.hour BETWEEN hh.hour - {_SLIDE_HOURS - 1} AND hh.hour
    GROUP BY bucket
  ) t ON TRUE
  GROUP BY hh.hour
)
SELECT hour AS hour_ord,
       CAST(FLOOR(CAST({_HLL_ALPHA_M2} AS DOUBLE)
                  / (reg_sum / {_POW52!r} + CAST({_HLL_M} - nb AS DOUBLE))
                  * 100.0 + 0.5) AS BIGINT) AS hll_est_x100
FROM s
ORDER BY hour_ord
""",
)
def q_sketch_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h distinct-user estimate PER HOUR via sliding HLL
    register merge — the sliding-window COUNT(DISTINCT) that is
    quadratic to compute exactly (every hour re-scans its whole trailing
    window of raw keys) but linear with mergeable sketches: per-hour
    registers build once from the raw stream, and each hour's window
    estimate is a per-bucket MAX over the trailing register rows — a
    RANGE-frame window over an hours x 64 frame, never the raw keys.

    This is q_sketch_hll_merge's associativity put to work on the time
    axis (the same trick serves per-day/tenant/shard rollups); estimator
    discipline unchanged (integer registers, one fixed-order double,
    x100 BIGINT).

    Plan shape: one corpus-sized distinct + register aggregate, then
    everything runs on the register grid: each register row explodes to
    the <= 24 hours it can serve (grid-sized fan-out, shuffled on
    (hour, bucket) — 64x the hour cardinality, no single-partition
    funnel), a per-(hour, bucket) MAX merges the trailing registers, and
    the per-hour estimator emits one row per active hour. A RANGE-frame
    window per bucket would merge but NOT densify — an hour with no new
    row for a bucket must still inherit that bucket's trailing register,
    which is exactly what the bounded explode provides."""
    e = table(spark, sf_dir, "events")
    d = e.select(
        (F.unix_micros("ts") / _HOUR_US_SK).cast("long").alias("hour"), "user_id"
    ).distinct()
    hx = F.md5(F.col("user_id").cast("string").cast("binary"))
    bucket = F.pmod(F.conv(F.substring(hx, 1, 2), 16, 10).cast("long"), F.lit(_HLL_M))
    w = F.conv(F.substring(hx, 3, 13), 16, 10).cast("long")
    rho = F.least(
        F.when(w > 0, F.lit(53) - F.length(F.bin(w))).otherwise(F.lit(53)), F.lit(52)
    )
    b = (
        d.select("hour", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("hour", "bucket")
        .agg(F.max("rho").alias("m_rho"))
    )
    # Trailing merge: per bucket, the best register over the last 24 hours
    # ... but an hour with NO new row for a bucket still needs that
    # bucket's trailing value. Densify: window-max per bucket gives the
    # merged register AT hours where the bucket has a row; hours where it
    # doesn't appear must inherit it. Solve by exploding each register row
    # to every hour it can serve (<= 24 rows each, grid-sized), then
    # per-(hour, bucket) MAX — the standard sliding-sketch densification.
    served = b.select(
        F.explode(
            F.sequence(F.col("hour"), F.col("hour") + F.lit(_SLIDE_HOURS - 1))
        ).alias("hour_ord"),
        "bucket",
        "m_rho",
        F.col("hour").alias("src_hour"),
    )
    hours = b.select(F.col("hour").alias("hour_ord")).distinct()
    merged = (
        served.join(F.broadcast(hours), "hour_ord")
        .groupBy("hour_ord", "bucket")
        .agg(F.max("m_rho").alias("best"))
    )
    s = merged.groupBy("hour_ord").agg(
        F.sum(F.expr("shiftleft(1L, 52 - best)")).cast("double").alias("reg_sum"),
        F.count("*").alias("nb"),
    )
    est = F.lit(_HLL_ALPHA_M2).cast("double") / (
        F.col("reg_sum") / F.lit(_POW52) + (F.lit(_HLL_M) - F.col("nb")).cast("double")
    )
    return s.select(
        "hour_ord",
        F.floor(est * 100.0 + 0.5).cast("long").alias("hll_est_x100"),
    ).orderBy("hour_ord")
