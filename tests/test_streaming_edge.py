"""Streaming edge battery: the stateful twins vs batch on ADVERSARIAL data.

The batch edge-corpus program (tools/edge_corpus.py) hardened the four
batch table families; this file drives the SAME worst-case rows through
the Structured Streaming twins — duplicate (user, ts) keys, full-duplicate
event rows, NULL event_type/value/props, window/hour-boundary and
microsecond-precision timestamps, single-event users, zero/negative/
extreme values, out-of-order event_ids, and (for the dedup ingest)
NULL-text documents — and asserts stream == batch exactly, the same
one-semantics-two-runtimes contract the well-behaved-fixture tests pin.

This battery is what exposed the round-6 ADVICE finding that the
streaming dedup ingest crashed on NULL-text docs the batch twin filtered
(incremental_check now owns the null contract).
"""

import pytest

from pyspark.sql import functions as F

from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.streaming.pipelines import (
    attribution_join,
    dedup_stream,
    funnel_state,
    ohlc_bars,
    read_documents_stream,
    read_events_stream,
    run_to_memory,
    running_user_totals,
    scd2_state,
    session_aggregates,
    sessionize_state,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def edge_dir():
    import tools.edge_corpus as ec

    return ec.build()


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_edge_tumbling_equals_batch(spark, edge_dir):
    """Hour-boundary timestamps, NULL event_type, duplicate rows: the
    watermarked tumbling counts still equal the batch twin window-for-
    window (complete mode emits watermark-open windows too)."""
    run_to_memory(
        tumbling_counts(read_events_stream(spark, edge_dir)),
        "te_tumbling",
        output_mode="complete",
    )
    got = _rows(spark.table("te_tumbling"), "win_start_us", "event_type")
    batch = load_all_queries()["q_stream_tumbling"].fn(spark, edge_dir)
    assert got == _rows(batch, "win_start_us", "event_type")
    assert len(got) > 0


def test_edge_sessions_equal_batch(spark, edge_dir):
    """session_window gap logic under duplicate (user, ts) events and a
    single-event user."""
    run_to_memory(
        session_aggregates(read_events_stream(spark, edge_dir)),
        "te_sessions",
        output_mode="complete",
    )
    got = _rows(spark.table("te_sessions"), "user_id", "session_start_us")
    batch = (
        load_all_queries()["q_stream_session"]
        .fn(spark, edge_dir)
        .select("user_id", "session_start_us", "n_events", "sum_value")
    )
    assert got == _rows(batch, "user_id", "session_start_us")
    assert len(got) > 0


def test_edge_running_totals(spark, edge_dir):
    """applyInPandasWithState running totals under NULL values (the SUM
    must skip them like batch) and duplicate rows (each counts)."""
    run_to_memory(
        running_user_totals(read_events_stream(spark, edge_dir)),
        "te_totals",
        output_mode="update",
    )
    from mapreduce_framework_api_spark.sources import table

    events = table(spark, edge_dir, "events")
    totals = {
        r["user_id"]: (r["n"], round(r["s"], 2) if r["s"] is not None else None)
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    latest = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.table("te_totals").collect()
    }
    assert latest == totals


def test_edge_dedup_stream(spark, edge_dir):
    """Watermarked streaming dropDuplicates under exact-duplicate rows and
    NULL key columns equals batch distinct."""
    from mapreduce_framework_api_spark.sources import table

    run_to_memory(
        dedup_stream(read_events_stream(spark, edge_dir)).select(
            "user_id", "event_type"
        ),
        "te_dedup",
    )
    nk = lambda t: tuple((x is None, x) for x in t)  # None-tolerant sort key
    got = sorted(map(tuple, spark.table("te_dedup").collect()), key=nk)
    want = sorted(
        map(
            tuple,
            table(spark, edge_dir, "events")
            .select("user_id", "event_type")
            .distinct()
            .collect(),
        ),
        key=nk,
    )
    assert got == want


def test_edge_attribution_join_equals_batch(spark, edge_dir):
    """Stream-stream interval join with same-timestamp click/purchase
    pairs and duplicate clicks."""
    ev = read_events_stream(spark, edge_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    run_to_memory(
        attribution_join(clicks, purchases), "te_attrib", output_mode="append"
    )
    got = _rows(spark.table("te_attrib"), "purchase_id", "click_id")
    batch = load_all_queries()["q_stream_attrib"].fn(spark, edge_dir)
    assert got == _rows(batch, "purchase_id", "click_id")


def test_edge_funnel_equals_batch(spark, edge_dir):
    """Stateful funnel under duplicate (user, ts) stage events and NULL
    event_type rows (no stage — must not corrupt state)."""
    from mapreduce_framework_api_spark.streaming.pipelines import _NO_TS

    run_to_memory(
        funnel_state(read_events_stream(spark, edge_dir)),
        "te_funnel",
        output_mode="update",
    )
    final = (
        spark.table("te_funnel")
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
        F.sum((F.col("t_purchase") != _NO_TS).cast("long")).alias(
            "n_view_click_purchase"
        ),
    ).collect()[0]
    (want,) = load_all_queries()["q_events_funnel"].fn(spark, edge_dir).collect()
    assert (got["n_view"], got["n_view_click"], got["n_view_click_purchase"]) == (
        want["n_view"],
        want["n_view_click"],
        want["n_view_click_purchase"],
    )


def test_edge_sessionize_equals_batch(spark, edge_dir):
    """O(1)-state sessionizer: duplicate (user, ts) events and
    microsecond-boundary gaps must get the exact batch session ordinals
    (the tie-break contract is (ts, event_id) on both sides)."""
    run_to_memory(
        sessionize_state(read_events_stream(spark, edge_dir)),
        "te_sessionize",
        output_mode="append",
    )
    got = _rows(spark.table("te_sessionize"), "user_id", "ts_us", "event_id")
    batch = load_all_queries()["q_events_sessionize"].fn(spark, edge_dir)
    want = _rows(
        batch.select("event_id", "user_id", "ts_us", "session_seq"),
        "user_id",
        "ts_us",
        "event_id",
    )
    assert len(got) == len(want) > 0
    assert got == want


def test_edge_ohlc_equals_batch(spark, edge_dir):
    """Incremental OHLC picks under NULL values, duplicate timestamps and
    negative/extreme values."""
    run_to_memory(
        ohlc_bars(read_events_stream(spark, edge_dir)),
        "te_ohlc",
        output_mode="complete",
    )
    got = _rows(spark.table("te_ohlc"), "hour_us", "event_type")
    batch = load_all_queries()["q_events_ohlc"].fn(spark, edge_dir)
    assert got == _rows(batch, "hour_us", "event_type")
    assert len(got) > 0


def test_edge_scd2_equals_batch(spark, edge_dir):
    """SCD2 maintainer: duplicate (user, ts) across different states and
    NULL event_type rows must close exactly the batch versions."""
    run_to_memory(
        scd2_state(read_events_stream(spark, edge_dir)),
        "te_scd2",
        output_mode="append",
    )
    got = _rows(spark.table("te_scd2"), "user_id", "version")
    batch = load_all_queries()["q_dim_scd2"].fn(spark, edge_dir)
    want = _rows(
        batch.filter(~F.col("is_current")).select(
            "user_id", "state", "version", "valid_from_us", "valid_to_us", "n_events"
        ),
        "user_id",
        "version",
    )
    assert got == want


def test_edge_incremental_dedup_equals_batch(spark, edge_dir):
    """The dedup ingest on the edge DOCUMENTS — NULL-text, empty,
    whitespace-only and sub-3-token docs in the arriving split. This is
    the test that pins the round-6 ADVICE fix: incremental_check owns the
    null-text filter, so the stream drops dirty rows instead of crashing
    _minhash_sig_udf, and matches the batch twin's pair set exactly."""
    from mapreduce_framework_api_spark.streaming.pipelines import (
        incremental_dedup_stream,
    )

    stream = incremental_dedup_stream(
        spark, read_documents_stream(spark, edge_dir), edge_dir
    )
    run_to_memory(stream, "te_inc_dedup", output_mode="append")
    got = {
        (r["new_id"], r["corpus_id"], r["est_jaccard"])
        for r in spark.table("te_inc_dedup").collect()
    }
    batch = {
        (r["new_id"], r["corpus_id"], r["est_jaccard"])
        for r in load_all_queries()["q_dedup_incremental"].fn(spark, edge_dir).collect()
    }
    assert got == batch
