"""Structured Streaming pipelines vs their batch twins (SURVEY.md §2.4 H).

Each streaming pipeline is drained with ``availableNow`` over the sf0.001
events fixture and compared against the batch Group-H implementation of the
same semantics — one semantics, two runtimes. Nothing is late relative to
the 24 h watermark when the whole fixture arrives in order, so streaming
output must equal batch output exactly.
"""

from pyspark.sql import functions as F

from conftest import SF_DIR

from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.streaming.pipelines import (
    read_events_stream,
    run_to_memory,
    running_user_totals,
    session_aggregates,
    tumbling_counts,
)


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_streaming_tumbling_equals_batch(spark):
    stream = tumbling_counts(read_events_stream(spark, SF_DIR))
    # complete mode: emit every window, including those the watermark has
    # not closed when the finite fixture stream ends (append would hold the
    # trailing 24 h of windows in state forever-pending).
    run_to_memory(stream, "t_tumbling", output_mode="complete")
    got = _rows(spark.table("t_tumbling"), "win_start_us", "event_type")
    batch = load_all_queries()["q_stream_tumbling"].fn(spark, SF_DIR)
    assert got == _rows(batch, "win_start_us", "event_type")
    assert len(got) > 0


def test_streaming_sessions_equal_batch(spark):
    stream = session_aggregates(read_events_stream(spark, SF_DIR))
    run_to_memory(stream, "t_sessions", output_mode="complete")
    got = _rows(spark.table("t_sessions"), "user_id", "session_start_us")
    batch = (
        load_all_queries()["q_stream_session"]
        .fn(spark, SF_DIR)
        .select("user_id", "session_start_us", "n_events", "sum_value")
    )
    assert got == _rows(batch, "user_id", "session_start_us")
    assert len(got) > 0


def test_stateful_running_totals(spark):
    stream = running_user_totals(read_events_stream(spark, SF_DIR))
    run_to_memory(stream, "t_totals", output_mode="update")
    # One file → one micro-batch → the final update per user is the total.
    got = spark.table("t_totals")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    totals = {
        r["user_id"]: (r["n"], round(r["s"], 2))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    latest = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in got.collect()}
    assert latest == totals


def test_streaming_dedup_matches_batch_distinct(spark):
    from mapreduce_framework_api_spark.streaming.pipelines import dedup_stream

    stream = dedup_stream(read_events_stream(spark, SF_DIR)).select(
        "user_id", "event_type"
    )
    run_to_memory(stream, "t_dedup")
    got = sorted(map(tuple, spark.table("t_dedup").collect()))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select("user_id", "event_type")
            .distinct()
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_streaming_attribution_join_equals_batch(spark):
    """Stream-stream interval join (purchase ← same-user clicks within 1 h)
    drained with availableNow must equal the batch twin q_stream_attrib.
    Inner interval joins emit in append mode once both sides are present;
    nothing in the in-order fixture falls behind the 24 h watermark."""
    from mapreduce_framework_api_spark.streaming.pipelines import attribution_join

    ev = read_events_stream(spark, SF_DIR)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    run_to_memory(attribution_join(clicks, purchases), "t_attrib", output_mode="append")
    got = _rows(spark.table("t_attrib"), "purchase_id", "click_id")
    batch = load_all_queries()["q_stream_attrib"].fn(spark, SF_DIR)
    assert got == _rows(batch, "purchase_id", "click_id")
    assert len(got) > 0


def test_streaming_funnel_equals_batch(spark):
    """The stateful streaming funnel's final per-user stage timestamps,
    aggregated, equal the batch q_events_funnel counts on the same data."""
    from pyspark.sql import functions as F

    from mapreduce_framework_api_spark.streaming.pipelines import (
        _NO_TS,
        funnel_state,
        read_events_stream,
        run_to_memory,
    )

    run_to_memory(
        funnel_state(read_events_stream(spark, SF_DIR)), "t_funnel", output_mode="update"
    )
    # update mode re-emits per batch; keep each user's LAST emission
    final = (
        spark.table("t_funnel")
        .groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.max("t_click").alias("t_click"),
            F.max("t_purchase").alias("t_purchase"),
        )
    )
    got = final.agg(
        F.sum((F.col("t_view") != _NO_TS).cast("long")).alias("n_view"),
        F.sum((F.col("t_click") != _NO_TS).cast("long")).alias("n_view_click"),
        F.sum((F.col("t_purchase") != _NO_TS).cast("long")).alias("n_view_click_purchase"),
    ).collect()[0]
    (want,) = load_all_queries()["q_events_funnel"].fn(spark, SF_DIR).collect()
    assert (got["n_view"], got["n_view_click"], got["n_view_click_purchase"]) == (
        want["n_view"], want["n_view_click"], want["n_view_click_purchase"],
    )


def test_streaming_sessionize_equals_batch(spark):
    """The O(1)-state streaming sessionizer tags every event with exactly
    the session ordinal the batch window query assigns."""
    from mapreduce_framework_api_spark.streaming.pipelines import sessionize_state

    run_to_memory(
        sessionize_state(read_events_stream(spark, SF_DIR)),
        "t_sessionize",
        output_mode="append",
    )
    got = _rows(spark.table("t_sessionize"), "user_id", "ts_us", "event_id")
    batch = load_all_queries()["q_events_sessionize"].fn(spark, SF_DIR)
    want = _rows(
        batch.select("event_id", "user_id", "ts_us", "session_seq"),
        "user_id",
        "ts_us",
        "event_id",
    )
    assert len(got) == len(want) > 0
    assert got == want


def test_streaming_parquet_sink_checkpointed(spark, tmp_path):
    """The production file-sink path: drain the sessionizer to a parquet
    sink with a checkpoint, read the files back, equal the batch twin; a
    SECOND start on the same checkpoint is a no-op (exactly-once — the
    offset log says everything is committed, so no duplicate rows)."""
    from mapreduce_framework_api_spark.streaming.pipelines import (
        run_to_parquet,
        sessionize_state,
    )

    out, ckpt = f"{tmp_path}/out", f"{tmp_path}/ckpt"
    run_to_parquet(
        sessionize_state(read_events_stream(spark, SF_DIR)), out, ckpt
    )
    got = _rows(spark.read.parquet(out), "user_id", "ts_us", "event_id")
    batch = load_all_queries()["q_events_sessionize"].fn(spark, SF_DIR)
    want = _rows(
        batch.select("event_id", "user_id", "ts_us", "session_seq"),
        "user_id",
        "ts_us",
        "event_id",
    )
    # parquet sink column order follows the stream schema
    got = [tuple(r) for r in got]
    assert len(got) == len(want) > 0
    assert sorted(got) == sorted(tuple(r) for r in want)
    # restart on the same checkpoint: nothing new to process, no duplicates
    run_to_parquet(
        sessionize_state(read_events_stream(spark, SF_DIR)), out, ckpt
    )
    assert spark.read.parquet(out).count() == len(want)


def test_streaming_ohlc_equals_batch(spark):
    from mapreduce_framework_api_spark.streaming.pipelines import ohlc_bars

    stream = ohlc_bars(read_events_stream(spark, SF_DIR))
    run_to_memory(stream, "t_ohlc", output_mode="complete")
    got = _rows(spark.table("t_ohlc"), "hour_us", "event_type")
    batch = load_all_queries()["q_events_ohlc"].fn(spark, SF_DIR)
    assert got == _rows(batch, "hour_us", "event_type")
    assert len(got) > 0


def test_streaming_topk_foreachbatch_equals_batch(spark, tmp_path):
    from mapreduce_framework_api_spark.streaming.pipelines import (
        run_topk_foreachbatch,
    )

    out = f"{tmp_path}/topk_fb"
    run_topk_foreachbatch(read_events_stream(spark, SF_DIR), out)
    got = _rows(spark.read.parquet(out), "win_start_us", "rk")
    batch = load_all_queries()["q_stream_topk_windowed"].fn(spark, SF_DIR)
    assert got == _rows(batch, "win_start_us", "rk")
    assert len(got) > 0


def test_stream_static_enrichment_equals_batch(spark):
    from mapreduce_framework_api_spark.sources import table
    from mapreduce_framework_api_spark.streaming.pipelines import (
        enriched_segment_counts,
    )

    stream = enriched_segment_counts(spark, read_events_stream(spark, SF_DIR), SF_DIR)
    run_to_memory(stream, "t_enriched", output_mode="complete")
    got = _rows(spark.table("t_enriched"), "win_start_us", "c_mktsegment")

    e = table(spark, SF_DIR, "events")
    dim = table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = (
        e.join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros("w.start").alias("win_start_us"), "c_mktsegment", "n_events"
        )
    )
    assert got == _rows(batch, "win_start_us", "c_mktsegment")
    assert len(got) > 0


def test_streaming_scd2_equals_batch(spark):
    """The O(1)-state streaming SCD2 maintainer emits exactly the CLOSED
    dimension versions the batch build produces (open versions stay in
    the state store — they have no valid_to yet)."""
    from mapreduce_framework_api_spark.streaming.pipelines import scd2_state

    run_to_memory(
        scd2_state(read_events_stream(spark, SF_DIR)),
        "t_scd2",
        output_mode="append",
    )
    got = _rows(spark.table("t_scd2"), "user_id", "version")
    batch = load_all_queries()["q_dim_scd2"].fn(spark, SF_DIR)
    want = _rows(
        batch.filter(~F.col("is_current")).select(
            "user_id", "state", "version", "valid_from_us", "valid_to_us",
            "n_events",
        ),
        "user_id",
        "version",
    )
    assert len(got) == len(want) > 0
    assert got == want


_SCD2_IN_SCHEMA = "event_id long, user_id long, event_type string, ts timestamp"


def _scd2_file_run(spark, src, ckpt, out, name):
    """One availableNow drain of scd2_state over the files in ``src``,
    parquet sink + shared checkpoint (so consecutive runs are genuinely
    separate micro-batches against persisted state)."""
    from mapreduce_framework_api_spark.streaming.pipelines import scd2_state

    stream = spark.readStream.schema(_SCD2_IN_SCHEMA).parquet(src)
    q = (
        scd2_state(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_scd2_cross_batch_in_order(spark, tmp_path):
    """Cross-batch SCD2: a version opened in batch 1 is closed by batch 2
    (exercises the persisted 5-field state tuple, incl. last_ts_us)."""
    from datetime import datetime

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    b1 = [(1, 7, "view", datetime(2024, 1, 1, 10)),
          (2, 7, "view", datetime(2024, 1, 1, 11))]
    spark.createDataFrame(b1, _SCD2_IN_SCHEMA).write.mode("append").parquet(src)
    _scd2_file_run(spark, src, ckpt, out, "t_scd2_io1")
    b2 = [(3, 7, "purchase", datetime(2024, 1, 1, 12))]
    spark.createDataFrame(b2, _SCD2_IN_SCHEMA).write.mode("append").parquet(src)
    _scd2_file_run(spark, src, ckpt, out, "t_scd2_io2")
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.user_id, r.state, r.version, r.n_events) == (7, "view", 1, 2)
    assert (r.valid_from_us, r.valid_to_us) == (
        int(datetime(2024, 1, 1, 10).timestamp() * 1_000_000),
        int(datetime(2024, 1, 1, 12).timestamp() * 1_000_000),
    )


def test_streaming_scd2_rejects_cross_batch_late_event(spark, tmp_path):
    """Out-of-contract input is OBSERVABLE, not silently wrong: an event
    older than the last applied ts arriving in a LATER batch (which could
    need to reopen an already-emitted version) fails the query with a
    named error instead of fabricating intervals."""
    from datetime import datetime

    import pytest

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    b1 = [(1, 7, "view", datetime(2024, 1, 1, 10)),
          (2, 7, "purchase", datetime(2024, 1, 1, 11))]
    spark.createDataFrame(b1, _SCD2_IN_SCHEMA).write.mode("append").parquet(src)
    _scd2_file_run(spark, src, ckpt, out, "t_scd2_late1")
    late = [(3, 7, "view", datetime(2024, 1, 1, 9))]
    spark.createDataFrame(late, _SCD2_IN_SCHEMA).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="out-of-order cross-batch"):
        _scd2_file_run(spark, src, ckpt, out, "t_scd2_late2")


def test_streaming_scd2_rejects_cross_batch_tie(spark, tmp_path):
    """Equal-timestamp events in a LATER batch are also out-of-contract:
    the batch arbiter orders ties by (ts, event_id), which cannot be
    honored once the tied event already applied — and an exact redelivery
    must not inflate n_events. Strict monotonicity is enforced."""
    from datetime import datetime

    import pytest

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    b1 = [(2, 7, "view", datetime(2024, 1, 1, 10))]
    spark.createDataFrame(b1, _SCD2_IN_SCHEMA).write.mode("append").parquet(src)
    _scd2_file_run(spark, src, ckpt, out, "t_scd2_tie1")
    tie = [(1, 7, "purchase", datetime(2024, 1, 1, 10))]
    spark.createDataFrame(tie, _SCD2_IN_SCHEMA).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="out-of-order cross-batch"):
        _scd2_file_run(spark, src, ckpt, out, "t_scd2_tie2")


def test_streaming_incremental_dedup_equals_batch(spark):
    """The incremental-ingest dedup runs the SAME incremental_check
    transformation in both runtimes: draining the documents stream
    through the persisted corpus index must flag exactly the batch
    query's (new_id, corpus_id, est_jaccard) set. The stream may emit a
    pair once per colliding band (stateless append mode); the batch twin
    dedupes by pair key — so the comparison is on distinct rows, which
    is also the contract a production upsert sink provides."""
    from mapreduce_framework_api_spark.streaming.pipelines import (
        incremental_dedup_stream,
        read_documents_stream,
    )

    stream = incremental_dedup_stream(
        spark, read_documents_stream(spark, SF_DIR), SF_DIR
    )
    run_to_memory(stream, "t_inc_dedup", output_mode="append")
    got = {
        (r["new_id"], r["corpus_id"], r["est_jaccard"])
        for r in spark.table("t_inc_dedup").collect()
    }
    batch = {
        (r["new_id"], r["corpus_id"], r["est_jaccard"])
        for r in load_all_queries()["q_dedup_incremental"].fn(spark, SF_DIR).collect()
    }
    assert got == batch
    assert len(got) > 0


def test_prefix_dedup_stream_equals_batch_twin(spark):
    """Stateless streaming prefix/truncation ingest == the batch
    q_dedup_prefix_incremental on drain. The (new_id, corpus_id) pair key
    is unique by construction (one head-index row per corpus doc), so the
    comparison is on raw appended rows — no sink-side dedup needed."""
    from mapreduce_framework_api_spark.streaming.pipelines import (
        prefix_dedup_stream,
        read_documents_stream,
    )

    stream = prefix_dedup_stream(spark, read_documents_stream(spark, SF_DIR), SF_DIR)
    run_to_memory(stream, "t_prefix_dedup", output_mode="append")
    got = [
        (r["new_id"], r["corpus_id"], r["relation"], r["new_len"], r["corpus_len"])
        for r in spark.table("t_prefix_dedup").collect()
    ]
    batch = [
        (r["new_id"], r["corpus_id"], r["relation"], r["new_len"], r["corpus_len"])
        for r in load_all_queries()["q_dedup_prefix_incremental"].fn(spark, SF_DIR).collect()
    ]
    assert sorted(got) == sorted(batch)
    assert len(got) == len(set(got))  # pair key unique, no dedup required


def test_semdedup_ingest_stream_equals_batch_twin(spark):
    """Stateless streaming SemDeDup ingest == the batch
    q_dedup_semdedup_incremental on drain. The (new_id, corpus_id) pair
    key is unique by construction (one cluster-index row per corpus
    vector), so the comparison is on raw appended rows — no sink-side
    dedup needed."""
    from mapreduce_framework_api_spark.streaming.pipelines import (
        read_embeddings_stream,
        semdedup_ingest_stream,
    )

    stream = semdedup_ingest_stream(
        spark, read_embeddings_stream(spark, SF_DIR), SF_DIR
    )
    run_to_memory(stream, "t_semdedup_ingest", output_mode="append")
    got = [
        (r["new_id"], r["corpus_id"], r["cluster"], r["cosine"])
        for r in spark.table("t_semdedup_ingest").collect()
    ]
    batch = [
        (r["new_id"], r["corpus_id"], r["cluster"], r["cosine"])
        for r in load_all_queries()["q_dedup_semdedup_incremental"]
        .fn(spark, SF_DIR)
        .collect()
    ]
    assert sorted(got) == sorted(batch)
    assert len(got) == len(set(got))  # pair key unique, no dedup required
    assert len(got) > 0


def test_ivfpq_probe_stream_equals_batch_twin(spark):
    """Stateless streaming ANN probe == the batch q_sim_ivfpq_probe on
    drain (the similarity side's serving lane, r13): arriving vectors
    probe the persisted IVF + HQ-PQ indexes through the shared
    ivfpq_probe_check. The (new_id, corpus_id) pair key is unique by
    construction (distinct probed clusters; one cluster per corpus
    vector), so the comparison is on raw appended rows."""
    from mapreduce_framework_api_spark.streaming.pipelines import (
        ivfpq_probe_stream,
        read_embeddings_stream,
    )

    stream = ivfpq_probe_stream(
        spark, read_embeddings_stream(spark, SF_DIR), SF_DIR
    )
    run_to_memory(stream, "t_ivfpq_probe", output_mode="append")
    got = [
        (r["new_id"], r["corpus_id"], r["cluster"], r["adc_score"])
        for r in spark.table("t_ivfpq_probe").collect()
    ]
    batch = [
        (r["new_id"], r["corpus_id"], r["cluster"], r["adc_score"])
        for r in load_all_queries()["q_sim_ivfpq_probe"].fn(spark, SF_DIR).collect()
    ]
    assert sorted(got) == sorted(batch)
    assert len(got) == len(set(got))  # pair key unique, no dedup required
    assert len(got) > 0


def test_ivfpq_append_stream_equals_batch_twin(spark):
    """Stateless streaming index-APPEND == the batch kernel on drain
    (the r14 maintenance lane): arriving vectors are assigned + encoded
    under the frozen base quantizer/codebooks through the shared
    ivfpq_append_check, emitting exactly the stored index row shape.
    vec_id is unique per arrival, so raw appended rows compare 1:1."""
    from mapreduce_framework_api_spark.operators.similarity import (
        _hash_split,
        ivfpq_append_check,
        ivfpq_frozen_base_index,
    )
    from mapreduce_framework_api_spark.sources import table
    from mapreduce_framework_api_spark.streaming.pipelines import (
        ivfpq_append_stream,
        read_embeddings_stream,
    )

    stream = ivfpq_append_stream(
        spark, read_embeddings_stream(spark, SF_DIR), SF_DIR
    )
    run_to_memory(stream, "t_ivfpq_append", output_mode="append")
    got = sorted(
        (r["vec_id"], r["cluster"], tuple(r["probes"]), tuple(r["codes"]))
        for r in spark.table("t_ivfpq_append").collect()
    )
    bi = ivfpq_frozen_base_index(spark, SF_DIR)
    assert bi is not None
    _base, cq, cbook = bi
    arrivals = (
        table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(_hash_split("pqsplit"))
    )
    batch = sorted(
        (r["vec_id"], r["cluster"], tuple(r["probes"]), tuple(r["codes"]))
        for r in ivfpq_append_check(arrivals, cq, cbook).collect()
    )
    assert got == batch
    assert len(got) > 0
    assert len({g[0] for g in got}) == len(got)  # one row per arrival


def test_streaming_checkpoint_recovers_state_mid_stream(spark, tmp_path):
    """Crash/restart recovery of the CUSTOM STATE STORE mid-data — the
    durability property the round-10 artifact store covers for static
    indexes, here for live applyInPandasWithState state: the sessionizer
    processes the first half of a time-range-split corpus, the query
    STOPS (availableNow drain), and a brand-new query instance on the
    same checkpoint processes the second half — per-user (last_ts,
    session_seq) state must recover from the state store, so sessions
    STRADDLING the restart keep their gap logic and ordinals, and the
    final sink equals both an uninterrupted one-shot run and the batch
    twin row-for-row."""
    import glob
    import os
    import shutil

    from mapreduce_framework_api_spark.sources import table
    from mapreduce_framework_api_spark.streaming.pipelines import (
        run_to_parquet,
        sessionize_state,
    )

    events = table(spark, SF_DIR, "events")
    halves = str(tmp_path / "halves")
    # Two files split by TIME RANGE: per-user event-time order holds
    # across micro-batches, so session ordinals are deterministic.
    events.repartitionByRange(2, "ts").write.parquet(halves)
    files = sorted(glob.glob(f"{halves}/part-*"))
    assert len(files) == 2
    schema = spark.read.parquet(halves).schema

    def stream_from(landing):
        raw = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(landing)
        return sessionize_state(raw.withColumn("ts", F.col("ts").cast("timestamp")))

    def sink_rows(out):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(out)
            .select("event_id", "user_id", "ts_us", "session_seq")
            .collect()
        )

    # Interrupted run: file A alone -> drain -> stop; add file B ->
    # NEW query instance, same checkpoint -> drain.
    land = str(tmp_path / "landing")
    os.makedirs(land)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    shutil.copy(files[0], os.path.join(land, "a.parquet"))
    run_to_parquet(stream_from(land), out, ckpt)
    n_phase1 = spark.read.parquet(out).count()
    shutil.copy(files[1], os.path.join(land, "b.parquet"))
    run_to_parquet(stream_from(land), out, ckpt)  # restart: state recovered
    two_phase = sink_rows(out)
    assert 0 < n_phase1 < len(two_phase)  # the restart really split the work

    # Uninterrupted control on the same two files, fresh checkpoint.
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    run_to_parquet(stream_from(land), out2, ckpt2)
    assert two_phase == sink_rows(out2)

    # And both equal the batch twin.
    batch = load_all_queries()["q_events_sessionize"].fn(spark, SF_DIR)
    want = sorted(
        tuple(r)
        for r in batch.select("event_id", "user_id", "ts_us", "session_seq").collect()
    )
    assert two_phase == want


def test_ivfpq_drift_stream_equals_batch_twin(spark):
    """Stateless streaming drift monitor == the batch per-row check on
    drain (the retrain-signal lane): arriving vectors emit (vec_id,
    cluster, margin) through the shared ivfpq_drift_check — the only
    similarity lane with no Arrow stage. Aggregating the drained rows
    must reproduce q_sim_index_drift's per-list report exactly."""
    from mapreduce_framework_api_spark.operators.similarity import (
        _hash_split,
        frozen_base_state,
        ivfpq_drift_check,
    )
    from mapreduce_framework_api_spark.sources import table
    from mapreduce_framework_api_spark.streaming.pipelines import (
        ivfpq_drift_stream,
        read_embeddings_stream,
    )

    stream = ivfpq_drift_stream(
        spark, read_embeddings_stream(spark, SF_DIR), SF_DIR
    )
    run_to_memory(stream, "t_ivfpq_drift", output_mode="append")
    got = sorted(
        (r["vec_id"], r["cluster"], r["margin"])
        for r in spark.table("t_ivfpq_drift").collect()
    )
    state = frozen_base_state(spark, SF_DIR)
    assert state is not None
    arrivals = (
        table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(_hash_split("pqsplit"))
    )
    batch = sorted(
        (r["vec_id"], r["cluster"], r["margin"])
        for r in ivfpq_drift_check(arrivals, state[0]).collect()
    )
    assert got == batch
    assert len(got) > 0
    assert all(m >= 0 for _, _, m in got)
    # folding the drained rows reproduces the registered batch report
    import collections

    agg = collections.defaultdict(list)
    for _vid, c, m in got:
        agg[c].append(m)
    want = sorted(
        (c, len(ms), sum(ms), min(ms)) for c, ms in agg.items()
    )
    report = sorted(
        (r["cluster"], r["n_new"], r["margin_sum"], r["min_margin"])
        for r in load_all_queries()["q_sim_index_drift"].fn(spark, SF_DIR).collect()
    )
    assert want == report


def test_append_kernel_new_modes_stream_equals_batch(spark):
    """The r15 kernel modes (L2 routing for the trained router,
    residual encode for the residual code table) are stateless per row
    like the base mode, so they must hold the same stream == batch
    contract: the SAME ivfpq_append_check call over a rate-limited
    stream and over the batch arrivals frame yields identical rows.
    This is what keeps the maintenance lanes append==rebuild when a
    store carries the trained/residual tables — the streaming ingest
    path encodes arrivals through the identical code path the bulk
    build and retrain use."""
    import numpy as np

    from mapreduce_framework_api_spark.operators.similarity import (
        _hash_split,
        _md5_topk_seed,
        _IVF_SCALE,
        _PQ_SCALE,
        frozen_base_state,
        ivfpq_append_check,
    )
    from mapreduce_framework_api_spark.sources import table
    from mapreduce_framework_api_spark.streaming.pipelines import (
        read_embeddings_stream,
    )

    state = frozen_base_state(spark, SF_DIR)
    assert state is not None
    cq, cbook = state
    # a PQ-scale centroid matrix for the residual mode: the base seeds
    # at _PQ_SCALE (any frozen matrix works — the pin is path equality)
    base = (
        table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(~_hash_split("pqsplit"))
    )
    seed = _md5_topk_seed(base, cq.shape[0], "ivfb#")
    cpq = np.floor(
        np.stack(seed["embedding"].to_numpy()).astype(np.float64) * _PQ_SCALE
    ).astype(np.int64)

    arrivals = (
        table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .filter(_hash_split("pqsplit"))
    )
    stream_src = read_embeddings_stream(spark, SF_DIR).filter(
        _hash_split("pqsplit")
    )

    def canon(df, with_codes=True):
        return sorted(
            (
                r["vec_id"],
                r["cluster"],
                tuple(r["probes"]),
                tuple(r["codes"]) if with_codes else None,
                r["margin"],
            )
            for r in df.collect()
        )

    # L2 (trained-router) routing, codes off
    l2_stream = ivfpq_append_check(
        stream_src, cq, None, with_codes=False, l2_routing=True
    )
    run_to_memory(l2_stream, "t_l2_append", output_mode="append")
    assert canon(spark.table("t_l2_append"), with_codes=False) == canon(
        ivfpq_append_check(arrivals, cq, None, with_codes=False, l2_routing=True),
        with_codes=False,
    )
    # residual encode
    res_stream = ivfpq_append_check(stream_src, cq, cbook, res_cpq=cpq)
    run_to_memory(res_stream, "t_res_append", output_mode="append")
    got = canon(spark.table("t_res_append"))
    want = canon(ivfpq_append_check(arrivals, cq, cbook, res_cpq=cpq))
    assert got == want
    assert len(got) > 0
