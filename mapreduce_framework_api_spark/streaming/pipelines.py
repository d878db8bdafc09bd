"""Structured Streaming pipelines over the events table.

The reference has no streaming semantics — its bounded-buffer exchange is
pipelined *execution*, not event-time processing (SURVEY.md §2.3, §4.2;
``/root/reference/mapreduce.c:249,292`` is backpressure, not a watermark).
This package is therefore pure new surface, mandated by the north star:
the same event-time semantics as the batch Group-H queries
(``operators/events.py``), run on the actual streaming runtime.

Design notes (100 TB / always-on):

- Source: ``spark.readStream`` over a parquet directory (file source). In
  production this is Kafka/Kinesis; the file source exercises identical
  planner/runtime paths (micro-batch, state store, watermark advance).
- Every aggregation carries a watermark so state is bounded: without it, a
  windowed agg on an unbounded stream grows state forever. Late rows
  beyond the watermark are dropped — the exact semantics the batch
  ``q_stream_late`` query mirrors.
- Sessionization uses native ``F.session_window`` (state-store-backed
  gap-merge), the streaming twin of the lag/prefix-sum batch plan in
  ``q_stream_session``.
- The custom stateful operators (running per-user counter with timeout;
  the view→click→purchase funnel state machine) use
  ``applyInPandasWithState`` — the escape hatch for semantics the
  built-in windows can't express.

Tests drive these with ``trigger(availableNow=True)`` against the sf0.001
fixtures and assert the streaming results equal the batch Group-H results
on the same data — one semantics, two runtimes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Keep in lockstep with operators/events.py so batch == streaming.
WATERMARK = "24 hours"
SESSION_GAP = "30 minutes"

def _events_ts_is_nanos(path: str) -> bool:
    """Inspect the parquet footer for the physical ts encoding.

    ``readStream`` requires an explicit schema up-front, so the dtype
    dispatch the batch reader does post-read (``sources/readers.py``) has
    to happen pre-read here: one footer read, no data scanned. Fixtures
    have shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS); hard-coding
    either breaks on the other.
    """
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        path = os.path.join(path, sorted(parts)[0])
    return "ns" in str(pq.read_schema(path).field("ts").type)


def _events_schema(ts_nanos: bool) -> T.StructType:
    ts_type = T.LongType() if ts_nanos else T.TimestampNTZType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _stage_single_file(src: str, prefix: str) -> str:
    """Stage a single parquet FILE into a stable per-fixture landing
    directory (file-source streams list directories; the fixture is one
    file). Stable (md5-tagged, not mkdtemp) because the file-source
    checkpoint records the source directory — a restarted query must list
    the SAME landing dir or Spark rejects the offset log. A dangling
    symlink (fixture moved/deleted since a prior run) is re-linked, not
    tripped over."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:12]
    staged = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
    os.makedirs(staged, exist_ok=True)
    link = os.path.join(staged, os.path.basename(src))
    if os.path.lexists(link) and not os.path.exists(link):
        os.unlink(link)  # dangling symlink from a deleted fixture
    if not os.path.lexists(link):
        os.symlink(src, link)
    return staged


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet directory.

    ``maxFilesPerTrigger=1`` keeps micro-batches bounded no matter how many
    files land; the ts normalization matches the batch reader so both lanes
    see identical timestamps. The file stream source lists a *directory*
    (new files appearing there are the stream); the fixture is a single
    parquet file, so it is staged into a temp dir via symlink — in
    production the landing directory already exists and files arrive in it.
    """
    src = f"{sf_dir}/events.parquet"
    ts_nanos = _events_ts_is_nanos(src)
    if os.path.isfile(src):
        src = _stage_single_file(src, "events_stream")
    if ts_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_events_schema(ts_nanos))
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    if ts_nanos:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # TIMESTAMP_NTZ → TimestampType is value-preserving under the pinned
    # UTC session timezone.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Per-hour tumbling counts + sum(value) by event_type, watermarked.

    State per key is one window aggregate; the watermark lets the store
    evict windows older than max(event time) − 24 h, so state size is
    O(active windows), independent of stream length.
    """
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros("w.start").alias("win_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_aggregates(events: DataFrame) -> DataFrame:
    """30-minute-gap sessions per user via native ``session_window``.

    The state store merges overlapping candidate sessions as events arrive
    (possibly out of order within the watermark); emission happens once the
    watermark passes session end + gap.
    """
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


_COUNTER_STATE_SCHEMA = "n_events long, sum_value double"
_COUNTER_OUT_SCHEMA = "user_id long, n_events long, sum_value double"


def _make_user_counter(idle_timeout_ms: int | None):
    """Build the applyInPandasWithState update fn: running per-user totals.

    State is one (count, sum) pair per user — the minimal custom stateful
    operator. With ``idle_timeout_ms`` set, a processing-time timeout
    expires idle users so state stays bounded on unbounded key spaces (the
    100 TB concern: users are unbounded; windows/timeouts keep state
    finite). Timeouts only fire on *subsequent* micro-batches, so finite
    ``availableNow`` drains (tests) run without one — combining
    ``idle_timeout_ms`` with ``availableNow`` makes the query wait for
    processing-time timeouts and never terminate (observed: hang, not
    error). Use timeouts only on continuous triggers.
    """

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
        )

    return update


def running_user_totals(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator: running per-user (count, sum) emitted every
    micro-batch — semantics no built-in window expresses (cumulative,
    never-closing aggregate, optional idle-key eviction)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_user_counter(idle_timeout_ms),
            outputStructType=_COUNTER_OUT_SCHEMA,
            stateStructType=_COUNTER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drain the whole (finite) stream into an in-memory table with
    ``availableNow`` and return the completed query; callers read
    ``spark.table(name)``. Test/demo sink — production uses kafka/parquet
    sinks with checkpointing."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def ohlc_bars(events: DataFrame) -> DataFrame:
    """Per-hour OHLC bars per event_type, watermarked — the streaming twin
    of the batch q_events_ohlc. Open/close are ``min_by``/``max_by`` with
    a (ts, event_id) struct ordering key, so the picks are incremental
    aggregates (no window-function pass, which streaming cannot do): state
    per (window, type) is a fixed-size tuple of four running picks and a
    count, evicted once the watermark closes the window."""
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.round(F.min_by("value", ordkey), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", ordkey), 2).alias("close"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.unix_micros("w.start").alias("hour_us"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Streaming exact deduplication within the watermark horizon:
    ``dropDuplicatesWithinWatermark`` keeps one row per key and evicts the
    key's dedup state once the watermark passes it — bounded state on an
    unbounded stream (a plain ``dropDuplicates`` on a stream would grow
    state forever). The batch twin is q_dedup_exact."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        keys or ["user_id", "event_type"]
    )


ATTRIB_HORIZON = "1 hour"


def attribution_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream interval join: each purchase matches the same user's
    clicks in the preceding ``ATTRIB_HORIZON`` — the attribution pattern.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store holds only ~horizon+watermark of each
    stream per key and evicts behind the watermark — the required shape
    for an unbounded stream-stream join (an unbounded-condition join
    would buffer both streams forever). The batch twin is
    ``q_stream_attrib`` (operators/stream_join.py); tests assert the
    drained stream equals it row-for-row.
    """
    c = (
        clicks.select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        ).withWatermark("click_ts", WATERMARK)
    )
    p = (
        purchases.select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            "value",
        ).withWatermark("purchase_ts", WATERMARK)
    )
    cond = (
        (c["c_user"] == p["p_user"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (p["purchase_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {ATTRIB_HORIZON}"))
    )
    return c.join(p, cond, "inner").select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("click_ts").alias("click_ts_us"),
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        F.round("value", 2).alias("value_r"),
    )


_FUNNEL_STATE_SCHEMA = "t_view long, t_click long, t_purchase long"
_FUNNEL_OUT_SCHEMA = "user_id long, t_view long, t_click long, t_purchase long"
_NO_TS = -1  # sentinel: stage not reached (ts_us is always >= 0)


def _funnel_update(key, pdf_iter, state: GroupState):
    """Per-user funnel state machine (view -> click -> purchase).

    State is THREE timestamps per user — constant, never the event log —
    advanced in event-time order within each micro-batch. The machine is
    monotone: once a stage timestamp is fixed it never retracts, which is
    exact under per-user in-order delivery (and for any single-batch
    drain, which sorts the batch); cross-batch late data older than an
    already-fixed stage cannot rewrite it — the standard streaming-funnel
    contract, and the reason the batch twin (q_events_funnel) is the
    arbiter for out-of-order corpora."""
    import pandas as pd

    tv, tc, tp = state.get if state.exists else (_NO_TS, _NO_TS, _NO_TS)
    rows = pd.concat(list(pdf_iter))
    rows = rows.sort_values("ts_us")
    for typ, ts in zip(rows["event_type"], rows["ts_us"]):
        ts = int(ts)
        if typ == "view" and tv == _NO_TS:
            tv = ts
        elif typ == "click" and tc == _NO_TS and tv != _NO_TS and ts > tv:
            tc = ts
        elif typ == "purchase" and tp == _NO_TS and tc != _NO_TS and ts > tc:
            tp = ts
    state.update((tv, tc, tp))
    yield pd.DataFrame(
        {"user_id": [key[0]], "t_view": [tv], "t_click": [tc], "t_purchase": [tp]}
    )


def funnel_state(events: DataFrame) -> DataFrame:
    """Custom stateful operator: streaming view->click->purchase funnel via
    ``applyInPandasWithState`` — ordered-sequence detection is semantics no
    built-in streaming window expresses (the batch twin chains window MINs,
    which needs the whole partition). Emits each user's current stage
    timestamps every micro-batch (update mode); state per user is three
    longs regardless of stream length."""
    return (
        events.select(
            "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_update,
            outputStructType=_FUNNEL_OUT_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_SESSIONIZE_OUT_SCHEMA = "event_id long, user_id long, ts_us long, session_seq long"
_SESSIONIZE_STATE_SCHEMA = "last_ts_us long, session_seq long"


def _sessionize_update(key, pdf_iter, state: GroupState):
    """Per-user sessionizer: state is TWO longs (last event time, current
    session ordinal) no matter how long the stream runs. Events are
    processed in event-time order within each micro-batch; a gap larger
    than the 30-minute threshold starts the next session. Exact under
    per-user in-order delivery (and for any single-batch drain, which
    sorts the batch); the batch twin q_events_sessionize is the arbiter
    for out-of-order corpora — same contract as the funnel machine."""
    import pandas as pd

    from mapreduce_framework_api_spark.operators.events import _SESSION_GAP_US

    last, seq = state.get if state.exists else (_NO_TS, 0)
    rows = pd.concat(list(pdf_iter)).sort_values(["ts_us", "event_id"])
    out_seq = []
    for ts in rows["ts_us"]:
        ts = int(ts)
        if last == _NO_TS or ts - last > _SESSION_GAP_US:
            seq += 1
        last = ts
        out_seq.append(seq)
    state.update((last, seq))
    yield pd.DataFrame(
        {
            "event_id": rows["event_id"].astype("int64"),
            "user_id": key[0],
            "ts_us": rows["ts_us"].astype("int64"),
            "session_seq": out_seq,
        }
    )


def sessionize_state(events: DataFrame) -> DataFrame:
    """Custom stateful operator: streaming row-level session-id assignment
    via ``applyInPandasWithState`` (append mode — every event is emitted
    exactly once, tagged with its session ordinal). The built-in
    ``session_window`` aggregates whole sessions; tagging each ROW with
    its session id while holding only O(1) state per user is semantics
    only the custom-state API expresses. Batch twin: q_events_sessionize
    (operators/events.py) — one window family over a single user_id
    exchange."""
    return (
        events.select(
            "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_update,
            outputStructType=_SESSIONIZE_OUT_SCHEMA,
            stateStructType=_SESSIONIZE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "append"
):
    """Drain the (finite) stream into a PARQUET directory sink with a real
    checkpoint location — the production file-sink path (exactly-once via
    the sink's commit log + the checkpoint's offset log; a restarted query
    resumes from the last committed batch instead of reprocessing).
    ``availableNow`` bounds the drain for tests; a live deployment drops
    the trigger and keeps the same sink/checkpoint contract."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_topk_foreachbatch(events: DataFrame, out_dir: str, k: int = 3) -> None:
    """Streaming hot-N per tumbling hour via ``foreachBatch`` — the
    micro-batch post-processing pattern for logic Structured Streaming
    cannot express incrementally (window-function RANK over an
    aggregate). The streaming side maintains only the (window, type)
    counts (bounded state, watermark-evicted in a live run); each
    micro-batch's snapshot is then ranked with a plain BATCH window
    function inside the callback and published as a FULL REFRESH
    (overwrite) — idempotent under micro-batch retries, which is the
    foreachBatch exactly-once contract. Batch twin:
    q_stream_topk_windowed (operators/events.py)."""
    from pyspark.sql import Window as W

    counts = (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros("w.start").alias("win_start_us"), "event_type", "n_events"
        )
    )

    def _rank_and_publish(batch_df: DataFrame, batch_id: int) -> None:
        w = W.partitionBy("win_start_us").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
        (
            batch_df.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k)
            .write.mode("overwrite")
            .parquet(out_dir)
        )

    q = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(_rank_and_publish)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enriched_segment_counts(
    spark: SparkSession, events: DataFrame, sf_dir: str
) -> DataFrame:
    """Stream-STATIC enrichment join + windowed rollup: the streaming
    events join the static customer dimension (user_id -> c_custkey) and
    aggregate per (hour, market segment). The static side is planned as
    a broadcast into every micro-batch — no stream-stream state, no
    watermark bookkeeping for the dimension (the standard way reference
    data meets a stream; state exists only for the windowed counts).
    Batch twin asserted in tests: the same join + rollup built on the
    batch reader."""
    from mapreduce_framework_api_spark.sources import table

    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.withWatermark("ts", WATERMARK)
        .join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros("w.start").alias("win_start_us"),
            "c_mktsegment",
            "n_events",
        )
    )


_SCD2_OUT_SCHEMA = (
    "user_id long, state string, version long, valid_from_us long, "
    "valid_to_us long, n_events long"
)
_SCD2_STATE_SCHEMA = (
    "cur_state string, valid_from_us long, version long, n_events long, "
    "last_ts_us long"
)


def _scd2_update(key, pdf_iter, state: GroupState):
    """Per-user SCD2 maintainer: state is ONE open dimension row (current
    attribute value, its valid_from, version counter, event count) no
    matter how long the stream runs. An attribute change CLOSES the open
    version — emitted exactly once with its [valid_from, valid_to)
    interval — and opens the next. Exact under per-user in-order delivery
    (and for any single-batch drain, which sorts the batch); the batch
    twin q_dim_scd2 is the arbiter for out-of-order corpora — same
    contract as the funnel/sessionize machines.

    The delivery contract is ENFORCED, not assumed: state carries the
    last applied ts_us, and a later batch delivering an older event
    raises immediately (a version closed in an earlier batch can never be
    reopened, so silently applying the event would fabricate intervals —
    out-of-contract input must be observable; route such streams through
    the batch twin instead). Migration note: the state tuple widened from
    4 to 5 fields in round 6 — checkpoints written by the older maintainer
    must be drained or discarded before upgrading (Spark validates the
    state schema at restore; there is no in-place migration for
    applyInPandasWithState state)."""
    import pandas as pd

    if state.exists:
        cur, vfrom, ver, nev, last_ts = state.get
    else:
        cur, vfrom, ver, nev, last_ts = None, _NO_TS, 0, 0, _NO_TS
    rows = pd.concat(list(pdf_iter)).sort_values(["ts_us", "event_id"])
    # STRICT monotonicity across batches (<=, not <): an equal-ts event in
    # a later batch is just as out-of-contract as an older one — the batch
    # arbiter orders ties by (ts, event_id), which cannot be honored once
    # the tied event already applied in an earlier batch, and an exact
    # redelivery would silently inflate n_events.
    if len(rows) and int(rows["ts_us"].iloc[0]) <= last_ts:
        raise ValueError(
            f"scd2_state: out-of-order cross-batch event for user {key[0]}: "
            f"ts_us={int(rows['ts_us'].iloc[0])} <= last applied {last_ts}; "
            "the streaming maintainer requires strictly-increasing per-user "
            "delivery across batches "
            "(use the batch twin q_dim_scd2 for out-of-order corpora)"
        )
    closed = []
    for typ, ts in zip(rows["event_type"], rows["ts_us"]):
        # NULL event_type is a real attribute VALUE (a version of its
        # own, IS-DISTINCT-FROM semantics like the batch twin), so the
        # no-open-version sentinel is ver == 0, NOT cur is None — the
        # old sentinel silently swallowed NULL-state events (streaming
        # edge-battery finding).
        typ = None if pd.isna(typ) else typ
        ts = int(ts)
        if ver == 0:
            cur, vfrom, ver, nev = typ, ts, 1, 1
        elif typ == cur or (typ is None and cur is None):
            nev += 1
        else:
            closed.append((key[0], cur, ver, vfrom, ts, nev))
            cur, vfrom, ver, nev = typ, ts, ver + 1, 1
        last_ts = ts
    state.update((cur, vfrom, ver, nev, last_ts))
    yield pd.DataFrame(
        closed,
        columns=[
            "user_id", "state", "version", "valid_from_us", "valid_to_us",
            "n_events",
        ],
    )


def scd2_state(events: DataFrame) -> DataFrame:
    """Custom stateful operator: streaming type-2 SCD maintenance via
    ``applyInPandasWithState`` (append mode — each FINALIZED dimension
    version is emitted exactly once when the attribute changes; the open
    current version lives only in the state store until its closing
    change arrives, which is the streaming-CDC contract: you can't emit
    an interval before its end exists). Batch twin: q_dim_scd2
    (operators/warehouse.py) — the closed (non-current) versions must
    match row-for-row."""
    return (
        events.select(
            "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _scd2_update,
            outputStructType=_SCD2_OUT_SCHEMA,
            stateStructType=_SCD2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ----------------------------------------------- incremental dedup ingest --


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet — the arriving-batch
    side of the incremental dedup ingest. Same staging discipline as
    read_events_stream (stable symlink dir so checkpoints survive
    restarts); documents carry no event-time column, so no ts
    normalization is needed."""
    src = f"{sf_dir}/documents.parquet"
    if os.path.isfile(src):
        src = _stage_single_file(src, "documents_stream")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )


def incremental_dedup_stream(
    spark: SparkSession, docs_stream: DataFrame, sf_dir: str
) -> DataFrame:
    """Streaming twin of q_dedup_incremental: arriving documents (the
    deterministic 1/8 ingest split) are near-dup-flagged against the
    PERSISTED corpus index — the banded bucket table + signature table
    built ONCE in batch (incremental_corpus_index's localCheckpoints
    stand in for the written index tables) and probed by every
    micro-batch through the SAME incremental_check transformation the
    batch query uses: one semantics, two runtimes.

    Statelessness is the design point: sig kernel, band explode, and the
    two stream-static equi-joins are all per-row operations, so the
    stream needs NO watermark and NO state store — ingest dedup scales
    with arrival rate, not corpus size or stream lifetime. A pair
    colliding in several bands emits one row per band (append mode
    cannot host a global dropDuplicates without unbounded state); the
    production sink upserts by (new_id, corpus_id) — exactly what the
    batch twin's dropDuplicates does, asserted in the equality test."""
    from mapreduce_framework_api_spark.operators.dedup import (
        inc_is_new,
        incremental_check,
        incremental_corpus_index,
    )

    bk, sigs, sizes = incremental_corpus_index(spark, sf_dir)
    return incremental_check(docs_stream.filter(inc_is_new()), bk, sigs, sizes)


def prefix_dedup_stream(
    spark: SparkSession, docs_stream: DataFrame, sf_dir: str
) -> DataFrame:
    """Streaming twin of q_dedup_prefix_incremental: arriving documents
    (the deterministic 1/8 ingest split) are classified against the
    frozen corpus's persisted head-block index through the SAME
    prefix_check transformation the batch query uses — truncated
    re-crawls flagged for drop, extensions flagged for keep-longest
    upgrade, exact copies flagged as dups.

    Like incremental_dedup_stream, statelessness is the design point:
    the head hash, the two stream-static equi-joins (8-byte index probe,
    then the corpus-text fetch for verified candidates only), and the
    substring verification are all per-row, so the stream needs NO
    watermark and NO state store — per-micro-batch cost follows arrival
    rate and head-collision occupancy, never corpus size or stream
    lifetime. The (new_id, corpus_id) pair key is unique by
    construction (one index row per corpus doc), so append mode needs
    no downstream dedup at all."""
    from mapreduce_framework_api_spark.operators.dedup import (
        inc_is_new,
        prefix_check,
        prefix_corpus_index,
    )

    bk, lookup = prefix_corpus_index(spark, sf_dir)
    return prefix_check(docs_stream.filter(inc_is_new()), bk, lookup)


def bk_containment_stream(
    spark: SparkSession, docs_stream: DataFrame, sf_dir: str
) -> DataFrame:
    """Streaming twin of the bottom-k containment ingest (round 9 —
    the 4th lane modality next to minhash/prefix/SemDeDup): arriving
    documents (the deterministic 1/8 ingest split) are probed against
    the frozen corpus's persisted sketch-value index through the SAME
    bk_containment_check transformation batch callers use, flagging
    partial-inclusion arrivals (a fragment of a corpus doc, or an
    arrival that CONTAINS a corpus fragment — the new_is_contained
    signal drives keep-longest resolution) that the minhash lane's
    resemblance banding structurally under-surfaces.

    Stateless by the same design as its siblings: the trigram kernel,
    array-side sketching, and the two stream-static equi-joins (value
    probe, corpus-sketch fetch) are per-row, so NO watermark and NO
    state store — cost follows arrival rate and sketch-collision
    occupancy, never corpus size or stream lifetime. A pair colliding
    on several calm sketch values emits one row per value (the
    incremental_check multiplicity contract); the production sink
    upserts by (new_id, corpus_id)."""
    from mapreduce_framework_api_spark.operators.dedup import (
        bk_containment_check,
        bk_corpus_index,
        inc_is_new,
    )

    value_idx, corpus_sk = bk_corpus_index(spark, sf_dir)
    return bk_containment_check(
        docs_stream.filter(inc_is_new()), value_idx, corpus_sk
    )


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the embeddings parquet — the arriving-vector
    side of the SemDeDup ingest. Same staging discipline as
    read_documents_stream; embeddings carry no event-time column, so no
    ts normalization is needed."""
    src = f"{sf_dir}/embeddings.parquet"
    if os.path.isfile(src):
        src = _stage_single_file(src, "embeddings_stream")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )


def semdedup_ingest_stream(
    spark: SparkSession, vec_stream: DataFrame, sf_dir: str
) -> DataFrame:
    """Streaming twin of q_dedup_semdedup_incremental: arriving vectors
    (the deterministic 1/8 ingest split) are semantically
    near-dup-flagged against the PERSISTED cluster index — the assigned
    + normed corpus table and its frozen-corpus quantizer, built ONCE in
    batch (semdedup_corpus_index's localCheckpoint stands in for the
    written index) and probed by every micro-batch through the SAME
    semdedup_check transformation the batch query uses: one semantics,
    two runtimes — the embedding modality of the ingest family next to
    the MinHash and prefix lanes.

    Statelessness is the design point: cluster assignment is a MAP
    against the closure-captured quantizer (_sem_assign — a streaming
    groupBy-argmax would need a state store; a map never does), the
    probe is a stream-static equi-join on cluster id, and the cosine is
    a per-row fold — so the stream needs NO watermark and NO state
    store, and per-micro-batch cost follows arrival rate × cluster
    occupancy, never corpus size or stream lifetime. The
    (new_id, corpus_id) pair key is unique by construction (one index
    row per corpus vector), so append mode needs no sink-side dedup."""
    from mapreduce_framework_api_spark.operators.similarity import (
        sem_is_new,
        semdedup_check,
        semdedup_corpus_index,
    )

    index, cent = semdedup_corpus_index(spark, sf_dir)
    return semdedup_check(vec_stream.filter(sem_is_new()), index, cent)


def ivfpq_probe_stream(
    spark: SparkSession, vec_stream: DataFrame, sf_dir: str
) -> DataFrame:
    """Streaming twin of q_sim_ivfpq_probe: arriving query vectors (the
    deterministic 1/8 'pqsplit' slice) scored against the PERSISTED
    IVF + HQ-PQ serving indexes through the SAME ivfpq_probe_check
    transformation the batch query uses — the similarity side's
    serving lane next to the four dedup ingest modalities. Stateless
    by the same construction as semdedup_ingest_stream: probe
    assignment is a map against the closure-captured coarse quantizer,
    the probe is a stream-static equi-join on cluster id, and ADC is a
    per-row LUT gather — no watermark, no state store; per-micro-batch
    cost follows arrival rate × probed-list occupancy, never corpus
    size or stream lifetime. A store-loaded session
    (operators/artifacts.py::load_ann_indexes) serves both halves of
    the static side from disk."""
    from mapreduce_framework_api_spark.operators.similarity import (
        _hash_split,
        ivfpq_probe_check,
        ivfpq_probe_index,
    )

    pi = ivfpq_probe_index(spark, sf_dir)
    if pi is None:
        return vec_stream.select(
            F.col("vec_id").alias("new_id"),
            F.lit(0).cast("long").alias("corpus_id"),
            F.lit(0).cast("long").alias("cluster"),
            F.lit(0).cast("long").alias("adc_score"),
        ).filter(F.lit(False))
    frame, cq, cbook = pi
    return ivfpq_probe_check(
        vec_stream.filter(_hash_split("pqsplit")), frame, cq, cbook
    )


def ivfpq_append_stream(
    spark: SparkSession, vec_stream: DataFrame, sf_dir: str
) -> DataFrame:
    """Streaming twin of the index-APPEND lane (q_sim_index_append_audit
    is its batch audit): arriving vectors (the 1/8 'pqsplit' slice)
    assigned + encoded under the FROZEN base-split quantizer/codebooks
    through the SAME ivfpq_append_check kernel — emitting exactly the
    stored index row (vec_id, cluster, probes, codes), i.e. the rows
    artifacts.append_ann_indexes writes, as they arrive. Stateless per
    row (one Arrow map against closure-captured matrices — no join, no
    watermark, no state store), so per-micro-batch cost is arrival rate
    × (K routing dots + M codeword argmins), corpus-independent."""
    from mapreduce_framework_api_spark.operators.similarity import (
        _hash_split,
        ivfpq_append_check,
        ivfpq_frozen_base_index,
    )

    bi = ivfpq_frozen_base_index(spark, sf_dir)
    if bi is None:
        return vec_stream.select(
            "vec_id",
            F.lit(0).cast("int").alias("cluster"),
            F.array().cast("array<int>").alias("probes"),
            F.array().cast("array<int>").alias("codes"),
        ).filter(F.lit(False))
    _base, cq, cbook = bi
    return ivfpq_append_check(
        vec_stream.filter(_hash_split("pqsplit")), cq, cbook
    ).select("vec_id", "cluster", "probes", "codes")


def ivfpq_drift_stream(
    spark: SparkSession, vec_stream: DataFrame, sf_dir: str
) -> DataFrame:
    """Streaming twin of the routing-drift monitor (q_sim_index_drift is
    its batch aggregate): arriving vectors (the 1/8 'pqsplit' slice)
    emit (vec_id, cluster, margin) — winner list + best-vs-runner-up
    dot margin under the FROZEN base quantizer — through the SAME
    ivfpq_drift_check transformation the batch query folds. The lane is
    the live half of the retrain signal: a monitoring sink windows the
    margins and alarms when they shrink. Stateless AND pure JVM (the
    only similarity lane with no Arrow stage: centroids are plan
    literals, the top-2 scan is a codegen'd sort_array per row), so
    per-micro-batch cost is arrival rate × K dots — corpus-independent,
    cheaper than the probe lane it watches. Dirty arrivals (NULL /
    wrong-dim) drop in the shared check; routes through
    frozen_base_state (seed derivation only), never the membership
    table."""
    from mapreduce_framework_api_spark.operators.similarity import (
        _hash_split,
        frozen_base_state,
        ivfpq_drift_check,
    )

    state = frozen_base_state(spark, sf_dir)
    if state is None or state[0].shape[0] < 2:
        return vec_stream.select(
            "vec_id",
            F.lit(0).cast("long").alias("cluster"),
            F.lit(0).cast("long").alias("margin"),
        ).filter(F.lit(False))
    return ivfpq_drift_check(
        vec_stream.filter(_hash_split("pqsplit")), state[0]
    )
