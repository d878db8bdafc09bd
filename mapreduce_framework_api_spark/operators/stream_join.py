"""Batch twin of the stream-stream interval (attribution) join.

The streaming runtime version is ``streaming.pipelines.attribution_join``
(watermarked stream-stream join with a bounded event-time condition);
this module registers the SAME semantics as a batch query with an exact
DuckDB oracle, so the join logic itself sits in the differential gate
while ``tests/test_streaming.py`` proves batch ≡ streaming.

Scale shape: an equi-join on user_id with the interval predicate applied
as a join residual — Spark shuffles both (pre-projected, 3–4 column)
sides on user_id once; no time-expansion explode, no cartesian. On a
stream the same condition bounds state to ~horizon per key.

Timestamp discipline follows operators/events.py: comparisons and
emitted times are epoch MICROSECONDS on both engines (events.ts is
nanosecond parquet; Spark truncates to µs, DuckDB keeps ns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import table

_HORIZON_US = 3_600 * 1_000_000  # keep in lockstep with pipelines.ATTRIB_HORIZON


@register(
    "q_stream_attrib",
    group="H",
    oracle=f"""
WITH e AS (
  SELECT event_id, user_id, event_type, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
)
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id,
       c.ts_us AS click_ts_us,
       p.ts_us AS purchase_ts_us,
       ROUND(p.value, 2) AS value_r
FROM e p JOIN e c
  ON p.user_id = c.user_id
 AND c.ts_us <= p.ts_us
 AND p.ts_us <= c.ts_us + {_HORIZON_US}
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
ORDER BY purchase_id, click_id
""",
)
def q_stream_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution join: every purchase paired with the same user's clicks
    in the preceding hour. Filters prune each side BEFORE the shuffle
    (scan-level pushdown of event_type), the equi-key is user_id, and the
    hour bound is the residual predicate — the exact plan shape whose
    streaming twin bounds state to the horizon."""
    e = table(spark, sf_dir, "events")
    c = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.unix_micros("ts").alias("click_ts_us"),
        )
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.unix_micros("ts").alias("purchase_ts_us"),
            "value",
        )
    )
    cond = (
        (c["c_user"] == p["p_user"])
        & (c["click_ts_us"] <= p["purchase_ts_us"])
        & (p["purchase_ts_us"] <= c["click_ts_us"] + F.lit(_HORIZON_US))
    )
    return (
        p.join(c, cond, "inner")
        .select(
            "purchase_id",
            "click_id",
            F.col("p_user").alias("user_id"),
            "click_ts_us",
            "purchase_ts_us",
            F.round("value", 2).alias("value_r"),
        )
        .orderBy("purchase_id", "click_id")
    )
