"""sf1 streaming soak receipt: drive the stateful streaming lane at 10x
bench scale through a REAL multi-micro-batch sequence and record the
state-store trajectory per batch.

Eight lanes, three distinct bounded-state contracts (lanes 4-8 repeat
lane 3's stateless contract for the prefix, SemDeDup, bottom-k
containment, ANN index-append, and routing-drift modalities):

1. ``sessionize_state`` (applyInPandasWithState, O(1)-state-per-user
   sessionizer) over 1M events / 10x the bench timeline with the SAME
   1,500 users throughout: state rows must PLATEAU at the user count
   after the first batches and stay flat for the remaining ~quarter
   million events — state scales with key cardinality, never with
   events processed or stream lifetime.
2. ``session_aggregates`` (watermarked ``session_window``) over the same
   stream: state holds only sessions the watermark has not yet closed,
   so as event time advances across the 10-month soak timeline the store
   must EVICT (numRowsRemoved > 0) and its peak must stay far below the
   total number of sessions emitted.
3. ``incremental_dedup_stream`` (stateless stream-static probe of the
   persisted banded MinHash index) over the 50k-doc sf1 corpus split
   into 10 arrival chunks: zero state-store rows by construction, and
   per-batch wall time must stay flat as the cumulative ingested volume
   grows — ingest dedup cost follows arrival rate, not corpus size.

Inputs are built deterministically from the driver fixtures: events are
the sf0.1 events replicated 10x with replica r time-shifted by r*31 days
(same user_ids — key cardinality fixed while volume and timeline grow
10x), written as 20 chronological parquet files so maxFilesPerTrigger=1
yields 20 in-event-time-order micro-batches (watermarks advance, state
can retire). Documents and embeddings are the scale_receipt sf1 corpus
(replica 0 exact, 1-9 perturbed), each split by replica into 10 arrival
files.

Usage: python tools/streaming_soak.py
Writes .scratch/soak_receipt.json and prints a gate summary; the receipt
is transcribed into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
SCRATCH = os.path.join(ROOT, ".scratch")
SF1 = os.path.join(SCRATCH, "sf1")
EVENTS_DIR = os.path.join(SCRATCH, "soak_events")
DOCS_DIR = os.path.join(SCRATCH, "soak_docs")
VECS_DIR = os.path.join(SCRATCH, "soak_vecs")
RECEIPT = os.path.join(SCRATCH, "soak_receipt.json")
REPLICAS = 10
EVENT_FILES = 20
SHIFT_DAYS = 31  # > the 30-day fixture span, so replicas never overlap


def build_events() -> None:
    """10x time-extended event stream as 20 chronological parquet files."""
    import duckdb

    if os.path.isdir(EVENTS_DIR):
        shutil.rmtree(EVENTS_DIR)
    os.makedirs(EVENTS_DIR)
    con = duckdb.connect()
    reps = " UNION ALL ".join(
        f"SELECT event_id + {r} * 1000000 AS event_id, "
        f"ts + INTERVAL {r * SHIFT_DAYS} DAYS AS ts, "
        f"user_id, event_type, value, props "
        f"FROM read_parquet('{SRC}/events.parquet')"
        for r in range(REPLICAS)
    )
    con.execute(f"CREATE TEMP TABLE ev AS SELECT * FROM ({reps})")
    (total,) = con.execute("SELECT COUNT(*) FROM ev").fetchone()
    per = (total + EVENT_FILES - 1) // EVENT_FILES
    # ntile by ts => file k holds a contiguous event-time slice; writing
    # k in order means the file source replays the stream in event-time
    # order, which is what lets watermarks advance batch over batch.
    con.execute(
        "CREATE TEMP TABLE sliced AS SELECT *, "
        f"CAST((ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1) / {per} AS INT) AS fk "
        "FROM ev"
    )
    for k in range(EVENT_FILES):
        con.execute(
            f"COPY (SELECT event_id, ts, user_id, event_type, value, props "
            f"FROM sliced WHERE fk = {k} ORDER BY ts, event_id) "
            f"TO '{EVENTS_DIR}/part-{k:04d}.parquet' (FORMAT PARQUET)"
        )


def build_docs() -> None:
    """sf1 documents split by replica into 10 arrival chunks."""
    import duckdb

    from tools.scale_receipt import build_sf1

    if not os.path.isdir(SF1):
        build_sf1()
    if os.path.isdir(DOCS_DIR):
        shutil.rmtree(DOCS_DIR)
    os.makedirs(DOCS_DIR)
    con = duckdb.connect()
    for r in range(REPLICAS):
        lo, hi = r * 1_000_000, (r + 1) * 1_000_000
        con.execute(
            f"COPY (SELECT doc_id, text, lang, source, n_chars "
            f"FROM read_parquet('{SF1}/documents.parquet') "
            f"WHERE doc_id >= {lo} AND doc_id < {hi} ORDER BY doc_id) "
            f"TO '{DOCS_DIR}/part-{r:04d}.parquet' (FORMAT PARQUET)"
        )


def build_vecs() -> None:
    """sf1 embeddings split by replica into 10 arrival chunks (the
    SemDeDup ingest lane's arrival stream)."""
    import duckdb

    from tools.scale_receipt import build_sf1

    if not os.path.isdir(SF1):
        build_sf1()
    if os.path.isdir(VECS_DIR):
        shutil.rmtree(VECS_DIR)
    os.makedirs(VECS_DIR)
    con = duckdb.connect()
    for r in range(REPLICAS):
        lo, hi = r * 1_000_000, (r + 1) * 1_000_000
        con.execute(
            f"COPY (SELECT vec_id, embedding, label "
            f"FROM read_parquet('{SF1}/embeddings.parquet') "
            f"WHERE vec_id >= {lo} AND vec_id < {hi} ORDER BY vec_id) "
            f"TO '{VECS_DIR}/part-{r:04d}.parquet' (FORMAT PARQUET)"
        )


def _progress_rows(q) -> list[dict]:
    """Per-batch receipt rows from the query's progress log."""
    rows = []
    for p in q.recentProgress:
        so = p.get("stateOperators") or []
        rows.append(
            {
                "batch": p["batchId"],
                "input_rows": p.get("numInputRows", 0),
                "batch_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "state_rows": so[0]["numRowsTotal"] if so else None,
                "state_bytes": so[0]["memoryUsedBytes"] if so else None,
                "rows_removed": so[0].get("numRowsRemoved") if so else None,
            }
        )
    return [r for r in rows if r["input_rows"] or r["state_rows"]]


def _drain(stream_df, name: str, output_mode: str):
    """availableNow drain to a throwaway parquet sink with checkpointing —
    the production sink shape; returns the finished query handle."""
    sink = os.path.join(SCRATCH, f"soak_sink_{name}")
    ckpt = os.path.join(SCRATCH, f"soak_ckpt_{name}")
    for d in (sink, ckpt):
        if os.path.isdir(d):
            shutil.rmtree(d)
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def main() -> None:
    from pyspark.sql import functions as F

    from mapreduce_framework_api_spark.session import get_spark
    from mapreduce_framework_api_spark.streaming.pipelines import (
        incremental_dedup_stream,
        read_documents_stream,
        session_aggregates,
        sessionize_state,
    )

    build_events()
    build_docs()
    build_vecs()
    spark = get_spark("streaming_soak")
    receipt: dict = {
        "built": {
            "event_files": EVENT_FILES,
            "doc_files": REPLICAS,
            "vec_files": REPLICAS,
        }
    }

    from pyspark.sql import types as T

    ev_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def events_stream():
        return (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(EVENTS_DIR)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    # Lane 1: O(1)-per-user sessionizer. Gate: state plateaus at the user
    # count and stays there while the remaining ~3/4 of the volume drains.
    t0 = time.time()
    q = _drain(sessionize_state(events_stream()), "sessionize", "append")
    rows = _progress_rows(q)
    users = 1500
    peak = max((r["state_rows"] for r in rows if r["state_rows"] is not None), default=0)
    tail = [r for r in rows if r["state_rows"] is not None][len(rows) // 2 :]
    receipt["sessionize"] = {
        "wall_s": round(time.time() - t0, 1),
        "batches": rows,
        "distinct_users": users,
        "peak_state_rows": peak,
        "tail_state_rows": sorted({r["state_rows"] for r in tail}),
        "gate_plateau": 0 < peak <= users
        and bool(tail)
        and all(r["state_rows"] == peak for r in tail),
    }

    # Lane 2: watermarked session_window aggregate. Gate: the store evicts
    # (rows removed along the way) and peak state is far below the total
    # sessions emitted over the 10-month timeline.
    t0 = time.time()
    q = _drain(session_aggregates(events_stream()), "sessionagg", "append")
    rows = _progress_rows(q)

    emitted = spark.read.parquet(os.path.join(SCRATCH, "soak_sink_sessionagg")).count()
    peak = max((r["state_rows"] for r in rows if r["state_rows"] is not None), default=0)
    removed = sum(r["rows_removed"] or 0 for r in rows)
    receipt["session_window"] = {
        "wall_s": round(time.time() - t0, 1),
        "batches": rows,
        "sessions_emitted": emitted,
        "peak_state_rows": peak,
        "rows_removed_total": removed,
        "gate_evicts": removed > 0 and peak < emitted,
    }

    # Lane 3: stateless incremental-dedup ingest. Gate: zero state rows and
    # flat per-batch cost (max <= 2.5x median, first JIT batch excluded).
    t0 = time.time()
    docs = (
        spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("lang", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("n_chars", T.LongType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(DOCS_DIR)
    )
    q = _drain(incremental_dedup_stream(spark, docs, SF1), "incdedup", "append")
    rows = _progress_rows(q)
    times = [r["batch_ms"] for r in rows[1:] if r["batch_ms"]]
    times_sorted = sorted(times)
    median = times_sorted[len(times_sorted) // 2] if times_sorted else 0
    receipt["incremental_dedup"] = {
        "wall_s": round(time.time() - t0, 1),
        "batches": rows,
        "state_rows_any": any(r["state_rows"] for r in rows),
        "batch_ms_median": median,
        "batch_ms_max": max(times) if times else 0,
        "gate_flat": bool(times) and max(times) <= 2.5 * median,
    }

    # Lane 4: stateless prefix-ingest classification (round-7 lane). Same
    # gates as lane 3: zero state rows, flat per-batch cost while the
    # cumulative ingested volume grows 10x.
    from mapreduce_framework_api_spark.streaming.pipelines import (
        prefix_dedup_stream,
    )

    t0 = time.time()
    docs2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(DOCS_DIR)
    )
    q = _drain(prefix_dedup_stream(spark, docs2, SF1), "prefixdedup", "append")
    rows = _progress_rows(q)
    times = [r["batch_ms"] for r in rows[1:] if r["batch_ms"]]
    times_sorted = sorted(times)
    median = times_sorted[len(times_sorted) // 2] if times_sorted else 0
    receipt["prefix_dedup"] = {
        "wall_s": round(time.time() - t0, 1),
        "batches": rows,
        "state_rows_any": any(r["state_rows"] for r in rows),
        "batch_ms_median": median,
        "batch_ms_max": max(times) if times else 0,
        "gate_flat": bool(times) and max(times) <= 2.5 * median,
    }

    # Lane 5: stateless SemDeDup ingest (the embedding modality of the
    # ingest family). Same gates as lanes 3-4: zero state rows, flat
    # per-batch cost while the cumulative ingested vector volume grows
    # 10x — assignment is a map against the closure-captured quantizer
    # and the probe a stream-static equi-join, so nothing accumulates.
    from mapreduce_framework_api_spark.streaming.pipelines import (
        semdedup_ingest_stream,
    )

    t0 = time.time()
    vec_schema = spark.read.parquet(VECS_DIR).schema
    vecs = (
        spark.readStream.schema(vec_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(VECS_DIR)
    )
    q = _drain(semdedup_ingest_stream(spark, vecs, SF1), "semdedup", "append")
    rows = _progress_rows(q)
    times = [r["batch_ms"] for r in rows[1:] if r["batch_ms"]]
    times_sorted = sorted(times)
    median = times_sorted[len(times_sorted) // 2] if times_sorted else 0
    receipt["semdedup_ingest"] = {
        "wall_s": round(time.time() - t0, 1),
        "batches": rows,
        "state_rows_any": any(r["state_rows"] for r in rows),
        "batch_ms_median": median,
        "batch_ms_max": max(times) if times else 0,
        "gate_flat": bool(times) and max(times) <= 2.5 * median,
    }

    # Lane 6: stateless bottom-k containment ingest (round 9 — the
    # containment-native modality the minhash lane's resemblance banding
    # structurally under-surfaces). Same gates as lanes 3-5: zero state
    # rows, flat per-batch cost — the sketch kernel, value-index probe
    # and corpus-sketch fetch are all per-row / stream-static.
    from mapreduce_framework_api_spark.streaming.pipelines import (
        bk_containment_stream,
    )

    t0 = time.time()
    docs3 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(DOCS_DIR)
    )
    q = _drain(bk_containment_stream(spark, docs3, SF1), "bkcontain", "append")
    rows = _progress_rows(q)
    times = [r["batch_ms"] for r in rows[1:] if r["batch_ms"]]
    times_sorted = sorted(times)
    median = times_sorted[len(times_sorted) // 2] if times_sorted else 0
    receipt["bk_containment"] = {
        "wall_s": round(time.time() - t0, 1),
        "batches": rows,
        "state_rows_any": any(r["state_rows"] for r in rows),
        "batch_ms_median": median,
        "batch_ms_max": max(times) if times else 0,
        "gate_flat": bool(times) and max(times) <= 2.5 * median,
    }

    # Lane 7: stateless ANN index-APPEND ingest (round 14 — the
    # maintenance half of the similarity serving store, next to lane 5's
    # probe-side twin family). Same gates as lanes 3-6: zero state rows,
    # flat per-batch cost — assignment + encode are one Arrow map per
    # batch against closure-captured frozen matrices; nothing
    # accumulates with stream lifetime or ingested volume.
    from mapreduce_framework_api_spark.streaming.pipelines import (
        ivfpq_append_stream,
    )

    t0 = time.time()
    vecs2 = (
        spark.readStream.schema(vec_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(VECS_DIR)
    )
    q = _drain(ivfpq_append_stream(spark, vecs2, SF1), "ivfappend", "append")
    rows = _progress_rows(q)
    times = [r["batch_ms"] for r in rows[1:] if r["batch_ms"]]
    times_sorted = sorted(times)
    median = times_sorted[len(times_sorted) // 2] if times_sorted else 0
    receipt["ivfpq_append"] = {
        "wall_s": round(time.time() - t0, 1),
        "batches": rows,
        "state_rows_any": any(r["state_rows"] for r in rows),
        "batch_ms_median": median,
        "batch_ms_max": max(times) if times else 0,
        "gate_flat": bool(times) and max(times) <= 2.5 * median,
    }

    # Lane 8: stateless routing-DRIFT monitor (round 14 cont. — the
    # retrain-signal lane watching the quantizer lanes 5 and 7 serve).
    # Same gates as lanes 3-7: zero state rows, flat per-batch cost.
    # Distinct contract detail: this is the one similarity lane with NO
    # Arrow stage — the K centroids are plan literals and the top-2
    # margin scan is codegen'd JVM per row, so its per-batch floor is
    # the cheapest of the family.
    from mapreduce_framework_api_spark.streaming.pipelines import (
        ivfpq_drift_stream,
    )

    t0 = time.time()
    vecs3 = (
        spark.readStream.schema(vec_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(VECS_DIR)
    )
    q = _drain(ivfpq_drift_stream(spark, vecs3, SF1), "ivfdrift", "append")
    rows = _progress_rows(q)
    times = [r["batch_ms"] for r in rows[1:] if r["batch_ms"]]
    times_sorted = sorted(times)
    median = times_sorted[len(times_sorted) // 2] if times_sorted else 0
    receipt["ivfpq_drift"] = {
        "wall_s": round(time.time() - t0, 1),
        "batches": rows,
        "state_rows_any": any(r["state_rows"] for r in rows),
        "batch_ms_median": median,
        "batch_ms_max": max(times) if times else 0,
        "gate_flat": bool(times) and max(times) <= 2.5 * median,
    }

    with open(RECEIPT, "w") as f:
        json.dump(receipt, f, indent=1)
    gates = {
        "sessionize_plateau": receipt["sessionize"]["gate_plateau"],
        "session_window_evicts": receipt["session_window"]["gate_evicts"],
        "incremental_dedup_flat": receipt["incremental_dedup"]["gate_flat"],
        "prefix_dedup_flat": receipt["prefix_dedup"]["gate_flat"],
        "semdedup_ingest_flat": receipt["semdedup_ingest"]["gate_flat"],
        "bk_containment_flat": receipt["bk_containment"]["gate_flat"],
        "ivfpq_append_flat": receipt["ivfpq_append"]["gate_flat"],
        "ivfpq_drift_flat": receipt["ivfpq_drift"]["gate_flat"],
    }
    print(json.dumps({"receipt": RECEIPT, "gates": gates}))
    spark.stop()
    if not all(gates.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
