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


def test_edge_prefix_dedup_equals_batch(spark, edge_dir):
    """The prefix/truncation ingest on the edge DOCUMENTS — NULL text,
    empty/whitespace/sub-40-char docs, and the planted 11/12/13 prefix
    stress (shared 40-char head, one true truncation pair, one head-
    collision that must die in the full-prefix verification): the
    stateless stream equals the batch twin pair-for-pair."""
    from mapreduce_framework_api_spark.streaming.pipelines import (
        prefix_dedup_stream,
    )

    stream = prefix_dedup_stream(
        spark, read_documents_stream(spark, edge_dir), edge_dir
    )
    run_to_memory(stream, "te_prefix_dedup", output_mode="append")
    got = sorted(tuple(r) for r in spark.table("te_prefix_dedup").collect())
    batch = sorted(
        tuple(r)
        for r in load_all_queries()["q_dedup_prefix_incremental"]
        .fn(spark, edge_dir)
        .collect()
    )
    assert got == batch


def test_edge_semdedup_ingest_equals_batch(spark, edge_dir):
    """The SemDeDup ingest on the edge EMBEDDINGS — exact-duplicate
    vectors under distinct ids (cosine exactly 1.0), nudged near-dups,
    and the 1e9 norm-ratio pair: the stateless stream equals the batch
    twin pair-for-pair."""
    from mapreduce_framework_api_spark.streaming.pipelines import (
        read_embeddings_stream,
        semdedup_ingest_stream,
    )

    stream = semdedup_ingest_stream(
        spark, read_embeddings_stream(spark, edge_dir), edge_dir
    )
    run_to_memory(stream, "te_sem_ingest", output_mode="append")
    got = sorted(tuple(r) for r in spark.table("te_sem_ingest").collect())
    batch = sorted(
        tuple(r)
        for r in load_all_queries()["q_dedup_semdedup_incremental"]
        .fn(spark, edge_dir)
        .collect()
    )
    assert got == batch


def test_edge_ivfpq_probe_equals_batch(spark, edge_dir):
    """The ANN serving probe on the edge EMBEDDINGS (exact-duplicate
    vectors under distinct ids, nudged near-dups, extreme norms): the
    stateless stream equals the batch twin row-for-row."""
    from mapreduce_framework_api_spark.streaming.pipelines import (
        ivfpq_probe_stream,
        read_embeddings_stream,
    )

    stream = ivfpq_probe_stream(
        spark, read_embeddings_stream(spark, edge_dir), edge_dir
    )
    run_to_memory(stream, "te_ivfpq_probe", output_mode="append")
    got = sorted(tuple(r) for r in spark.table("te_ivfpq_probe").collect())
    batch = sorted(
        tuple(r)
        for r in load_all_queries()["q_sim_ivfpq_probe"].fn(spark, edge_dir).collect()
    )
    assert got == batch


def test_edge_ivfpq_probe_dirty_arrivals(spark, edge_dir, tmp_path):
    """ivfpq_probe_check owns the dirty-row contract for the serving
    probe: NULL / empty / wrong-dimension arrivals DROP before the
    assignment kernel (np.stack would crash on ragged input); a
    zero-norm arrival passes harmlessly (ADC is a dot product — scores
    0, below any positive threshold, emits nothing); the clean
    exact-dup arrival must collide with its corpus twin above the ADC
    threshold; duplicate arriving ids emit one row PER input row
    (append semantics) — and stream == batch on all of it."""
    from mapreduce_framework_api_spark.operators.similarity import (
        _HQ_PROBE_T,
        ivfpq_probe_check,
        ivfpq_probe_index,
    )

    batch_df, schema = _dirty_vec_frame(spark)
    stage = str(tmp_path / "dirty_probe_vecs")
    batch_df.write.parquet(stage)
    pi = ivfpq_probe_index(spark, edge_dir)
    assert pi is not None
    frame, cq, cbook = pi

    batch = sorted(
        tuple(r)
        for r in ivfpq_probe_check(batch_df, frame, cq, cbook).collect()
    )
    stream_in = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    run_to_memory(
        ivfpq_probe_check(stream_in, frame, cq, cbook),
        "te_probe_dirty",
        output_mode="append",
    )
    got = sorted(tuple(r) for r in spark.table("te_probe_dirty").collect())
    assert got == batch
    emitted_ids = {r[0] for r in got}
    assert emitted_ids == {9004}, emitted_ids
    # duplicate arriving id -> one collision row PER input row, both
    # above the threshold against corpus vector 0
    per_pair = [r for r in got if r[0] == 9004 and r[1] == 0]
    assert len(per_pair) == 2 and all(r[3] >= _HQ_PROBE_T for r in per_pair), got


def test_edge_ivfpq_probe_dup_id_divergent_embeddings(spark, edge_dir, tmp_path):
    """Same arriving id, DIFFERENT embeddings (ADVICE r13): each row must
    be scored against its OWN vector. Row A carries corpus vector 0's
    embedding (support {0,3,9}) and must collide with corpus 0 and its
    exact twin 100; row B carries corpus vector 20's embedding (support
    {20,15,13} — orthogonal to vec 0, dot = 0) and must collide with
    corpus 20. A new_id-keyed LUT would score B's candidates with A's
    vector (ADC ~0, below threshold) and silently drop the corpus-20
    collision — and which row wins would depend on pandas/micro-batch
    order, breaking stream == batch. Both rows ride ONE partition so the
    grouped kernel actually sees them together."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.operators.similarity import (
        _HQ_PROBE_T,
        ivfpq_probe_check,
        ivfpq_probe_index,
    )

    vec_a = [0.0] * 64
    vec_a[0], vec_a[3], vec_a[9] = 1.0, 0.5, -0.25       # == corpus vec 0
    vec_b = [0.0] * 64
    vec_b[20], vec_b[15], vec_b[13] = 1.0, 0.5, -0.25    # == corpus vec 20
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    batch_df = spark.createDataFrame(
        [(9005, vec_a), (9005, vec_b)], schema
    ).coalesce(1)
    pi = ivfpq_probe_index(spark, edge_dir)
    assert pi is not None
    frame, cq, cbook = pi

    batch = sorted(
        tuple(r) for r in ivfpq_probe_check(batch_df, frame, cq, cbook).collect()
    )
    pairs = {(r[0], r[1]) for r in batch}
    assert (9005, 0) in pairs and (9005, 100) in pairs, batch   # row A's twins
    assert (9005, 20) in pairs, batch                           # row B's twin
    assert all(r[3] >= _HQ_PROBE_T for r in batch), batch

    # stream twin: one file => one micro-batch => same pandas grouping
    stage = str(tmp_path / "divergent_probe_vecs")
    batch_df.write.parquet(stage)
    stream_in = spark.readStream.schema(schema).parquet(stage)
    run_to_memory(
        ivfpq_probe_check(stream_in, frame, cq, cbook),
        "te_probe_divergent",
        output_mode="append",
    )
    got = sorted(tuple(r) for r in spark.table("te_probe_divergent").collect())
    assert got == batch


def _dirty_vec_frame(spark):
    """Adversarial arriving vectors for the SemDeDup dirty-row contract:
    NULL embedding, empty list, wrong dimension, all-zero vector
    (cos = 0/0 — the Spark NaN >= T trap), duplicate ids, and one clean
    exact duplicate of corpus vector 0 that MUST still emit."""
    from pyspark.sql import types as T

    clean_dup = [0.0] * 64
    clean_dup[0] = 1.0
    clean_dup[3] = 0.5
    clean_dup[9] = -0.25
    rows = [
        (9000, None, 0),                       # NULL embedding
        (9001, [], 0),                         # empty vector
        (9002, [1.0, 2.0], 0),                 # wrong dimension
        (9003, [0.0] * 64, 0),                 # zero norm
        (9004, clean_dup, 0),                  # exact dup of corpus vec 0
        (9004, clean_dup, 0),                  # duplicate id (full dup row)
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema), schema


def test_edge_semdedup_dirty_arrivals(spark, edge_dir, tmp_path):
    """semdedup_check owns the dirty-row contract: NULL / empty /
    wrong-dim / zero-norm arrivals DROP (identically in both runtimes —
    an unguarded zero norm would emit under Spark's NaN ordering and
    crash np.stack on NULL), duplicate ids pass through per-row, and the
    clean exact-dup arrival still matches its corpus twin at cosine 1.0."""
    from mapreduce_framework_api_spark.operators.similarity import (
        semdedup_check,
        semdedup_corpus_index,
    )

    batch_df, schema = _dirty_vec_frame(spark)
    stage = str(tmp_path / "dirty_vecs")
    batch_df.write.parquet(stage)
    index, cent = semdedup_corpus_index(spark, edge_dir)
    assert cent is not None

    batch = sorted(
        tuple(r) for r in semdedup_check(batch_df, index, cent).collect()
    )
    stream_in = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    run_to_memory(
        semdedup_check(stream_in, index, cent), "te_sem_dirty", output_mode="append"
    )
    got = sorted(tuple(r) for r in spark.table("te_sem_dirty").collect())
    assert got == batch
    emitted_ids = {r[0] for r in got}
    assert emitted_ids == {9004}, emitted_ids
    # duplicate arriving id -> one row PER input row (append semantics)
    per_pair = [r for r in got if r[0] == 9004 and r[1] == 0]
    assert len(per_pair) == 2 and all(r[3] == 1.0 for r in per_pair), got


def test_edge_prefix_dirty_arrivals(spark, edge_dir, tmp_path):
    """prefix_check owns the dirty-row contract for the prefix lane:
    NULL-text and sub-40-char arrivals drop, a true truncation arrival
    classifies against the frozen corpus, and a same-head divergent
    arrival dies in the substring verification — stream == batch."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.operators.dedup import (
        prefix_check,
        prefix_corpus_index,
    )

    head = "prefix stress shared head 0123456789 abcd"
    rows = [
        (9100, None, "en", "edge", None),            # NULL text
        (9101, "short doc", "en", "edge", 9),        # sub-40 chars
        (9102, head, "en", "dup", len(head)),        # truncation of corpus 11/12
        (9103, head + "Z divergence", "en", "dup", len(head) + 12),  # head collision, fails verify
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    batch_df = spark.createDataFrame(rows, schema)
    stage = str(tmp_path / "dirty_docs")
    batch_df.write.parquet(stage)
    bk, lookup = prefix_corpus_index(spark, edge_dir)

    batch = sorted(tuple(r) for r in prefix_check(batch_df, bk, lookup).collect())
    stream_in = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    run_to_memory(
        prefix_check(stream_in, bk, lookup), "te_prefix_dirty", output_mode="append"
    )
    got = sorted(tuple(r) for r in spark.table("te_prefix_dirty").collect())
    assert got == batch
    emitted = {r[0] for r in got}
    assert 9100 not in emitted and 9101 not in emitted
    assert 9103 not in emitted, "head collision must die in verification"
    # 9102 is a strict prefix of whichever of docs 11/12 sit in the FROZEN
    # corpus split (at least one does only if the md5 split put it there;
    # assert classification correctness for every emitted row instead of
    # presence, then pin presence if the corpus side exists)
    frozen_ids = {r["corpus_id"] for r in bk.select("corpus_id").collect()}
    if {11, 12} & frozen_ids:
        assert 9102 in emitted
        for r in got:
            if r[0] == 9102:
                assert r[2] == "truncation", r


def test_edge_minhash_dirty_arrivals(spark, edge_dir, tmp_path):
    """Round-9 pin for the ingest containment signal (VERDICT r8 #6):
    incremental_check owns the est_containment NULL contract in BOTH
    runtimes. A sub-shingle arrival (zero jaccard-trigram tokens — the
    punctuation-only class) whose raw-text minhash fallback matches a
    frozen-corpus twin MUST emit with est_jaccard 1.0 and
    est_containment NULL (the estimate is undefined on an empty shingle
    set; an unguarded divide would yield NaN on Spark and diverge/crash
    elsewhere), a NULL-text arrival must drop, and the micro-batched
    stream must equal the batch lane row-for-row."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.operators.dedup import (
        incremental_check,
        incremental_corpus_index,
    )
    from mapreduce_framework_api_spark.streaming.pipelines import run_to_memory

    rows = [
        (9200, None, "en", "edge", None),            # NULL text: drops
        # Byte-identical to frozen-corpus doc 2 ("!!! ??? ... ---"):
        # zero tokens -> empty trigram set (new_n = 0), but the minhash
        # signature's raw-text fallback matches doc 2's exactly, so the
        # pair banding-collides with est_jaccard 1.0.
        (9201, "!!! ??? ... ---", "en", "edge", 15),
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    batch_df = spark.createDataFrame(rows, schema)
    stage = str(tmp_path / "dirty_minhash_docs")
    batch_df.write.parquet(stage)
    bk, sigs, sizes = incremental_corpus_index(spark, edge_dir)

    batch = sorted(
        tuple(r) for r in incremental_check(batch_df, bk, sigs, sizes).collect()
    )
    stream_in = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    run_to_memory(
        incremental_check(stream_in, bk, sigs, sizes),
        "te_minhash_dirty",
        output_mode="append",
    )
    got = sorted(tuple(r) for r in spark.table("te_minhash_dirty").collect())
    assert got == batch
    emitted = {r[0] for r in got}
    assert 9200 not in emitted, "NULL text must drop"
    pair = [r for r in got if r[0] == 9201 and r[1] == 2]
    assert pair, f"sub-shingle twin of corpus doc 2 must emit: {got}"
    for r in pair:
        assert r[2] == 1.0, r            # est_jaccard: identical signatures
        assert r[3] is None, r           # est_containment: NULL, never NaN


def test_edge_bk_containment_ingest_equals_batch(spark, edge_dir, tmp_path):
    """Round-9 4th ingest lane: bottom-k containment probing against the
    frozen corpus index. Arrivals: NULL text (drops — jaccard-tier dirty
    contract), zero-token punctuation (no sketch — drops), and a copy of
    the planted mid-fragment (corpus doc 15's text, which is a contained
    fragment of corpus doc 14 at jaccard ~0.08): the lane must flag it
    against BOTH its identical corpus twin (15, est 1.0) and its
    CONTAINER (14, est 1.0, new_is_contained=True) — exactly the
    arrivals the minhash ingest lane structurally misses (its banding
    receipt on this pair is the r8 5000/10000 instrument). Micro-batched
    stream equals the batch lane row-for-row."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.operators.dedup import (
        bk_containment_check,
        bk_corpus_index,
    )
    from mapreduce_framework_api_spark.streaming.pipelines import run_to_memory

    fragment = "dulcimer foxglove ampersand topaz brocade nimbus"  # == doc 15
    rows = [
        (9300, None, "en", "edge", None),          # NULL text: drops
        (9301, "!!! ??? ... ---", "en", "edge", 15),  # zero tokens: no sketch
        (9302, fragment, "en", "dup", len(fragment)),
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    batch_df = spark.createDataFrame(rows, schema)
    stage = str(tmp_path / "dirty_bk_docs")
    batch_df.write.parquet(stage)
    value_idx, corpus_sk = bk_corpus_index(spark, edge_dir)

    batch = sorted(
        tuple(r)
        for r in bk_containment_check(batch_df, value_idx, corpus_sk).collect()
    )
    stream_in = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    run_to_memory(
        bk_containment_check(stream_in, value_idx, corpus_sk),
        "te_bk_dirty",
        output_mode="append",
    )
    got = sorted(tuple(r) for r in spark.table("te_bk_dirty").collect())
    assert got == batch
    emitted = {r[0] for r in got}
    assert 9300 not in emitted and 9301 not in emitted
    pairs = {(r[0], r[1]): r for r in got}
    assert (9302, 14) in pairs, got  # the container the minhash lane misses
    assert pairs[(9302, 14)][2] == 1.0 and pairs[(9302, 14)][3] is True
    assert (9302, 15) in pairs, got  # the identical corpus twin
    assert pairs[(9302, 15)][2] == 1.0


def test_bk_ingest_prefilter_counts_calm_values_only(spark, tmp_path, monkeypatch):
    """Round-10 advice fix: the ingest lane's min-shared prefilter must
    count CALM shared sketch values (the batch tier's calm-bucket
    co-occurrence semantics), not full-sketch intersections — a
    large-set pair sharing 1 calm + many VIRAL values used to pass the
    ingest prefilter while the batch tier filtered it.

    Constructed divergence case (df cap monkeypatched to 2): three
    frozen corpus docs share a 36-token body B, so B's 34 internal
    trigrams have df 3 → viral; each doc's 4 suffix/boundary trigrams
    are df-1 calm. Docs have 38 shingles (> k=32: no small-set
    exemption). Arrival 9000 = B + 'p1 x2 y2 z2' shares with corpus
    doc 2 (B + 'x2 y2 z2 w2') exactly ONE calm trigram ('x2 y2 z2')
    plus the viral body — measured on the built artifacts: 29
    full-sketch shared values (the old prefilter passed), 1 calm
    shared, est 0.93 >= threshold — so ONLY the calm-counting
    prefilter drops it. Control arrival 9001 (doc 2's exact text, 4
    calm shared) must still emit at est 1.0."""
    import os

    from pyspark.sql import types as T

    import mapreduce_framework_api_spark.operators.dedup as dedup

    monkeypatch.setattr(dedup, "_SHINGLE_DF_CAP", 2)
    B = " ".join(f"b{i:02d}" for i in range(1, 37))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    d = str(tmp_path / "calm_corpus")
    # doc_ids 1-3 are all frozen under inc_is_new's md5 split.
    spark.createDataFrame(
        [
            (1, B + " c1a c1b c1c c1d", "en", "edge", 10),
            (2, B + " x2 y2 z2 w2", "en", "edge", 10),
            (3, B + " c3a c3b c3c c3d", "en", "edge", 10),
        ],
        schema,
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    value_idx, corpus_sk = dedup.bk_corpus_index(spark, d)

    new_df = spark.createDataFrame(
        [
            (9000, B + " p1 x2 y2 z2", "en", "dup", 10),
            (9001, B + " x2 y2 z2 w2", "en", "dup", 10),
        ],
        schema,
    )
    got = sorted(
        set(
            (r["new_id"], r["corpus_id"], r["est_containment"])
            for r in dedup.bk_containment_check(
                new_df, value_idx, corpus_sk
            ).collect()
        )
    )
    assert got == [(9001, 2, 1.0)], got

    # The discriminator receipt: pair (9000, 2) fails ONLY the calm
    # count — its full-sketch intersection and estimate both clear the
    # old bars, so this corpus genuinely exercises the advice's case.
    sk_new = (
        new_df.filter(F.col("doc_id") == 9000)
        .select(dedup._shingle_hash_udf()("text").alias("harr"))
        .select(
            F.size("harr").alias("new_n"),
            F.slice(F.array_sort("harr"), 1, dedup._BK_K).alias("new_sk"),
        )
    )
    r = (
        sk_new.crossJoin(corpus_sk.filter(F.col("corpus_id") == 2))
        .select(
            F.size(F.array_intersect("new_sk", "corpus_sk")).alias("full"),
            F.size(F.array_intersect("new_sk", "corpus_calm_sk")).alias("calm"),
            "new_n",
            "corpus_n",
        )
        .collect()[0]
    )
    assert r["full"] >= dedup._BK_MIN_SHARED, r  # old prefilter passed
    assert r["calm"] < dedup._BK_MIN_SHARED, r  # calm counting drops it
    assert min(r["new_n"], r["corpus_n"]) > dedup._BK_K, r  # no exemption


def test_edge_ivfpq_drift_dirty_arrivals(spark, edge_dir, tmp_path):
    """ivfpq_drift_check owns the dirty-row contract for the drift
    monitor: NULL / empty / wrong-dimension arrivals DROP before the
    pure-JVM top-2 scan; the zero-norm arrival routes fine (every dot
    is 0 — ties break to centroid 0, margin 0); duplicate ids emit one
    margin row PER input row (append semantics) — and stream == batch
    on all of it."""
    from mapreduce_framework_api_spark.operators.similarity import (
        frozen_base_state,
        ivfpq_drift_check,
    )

    batch_df, schema = _dirty_vec_frame(spark)
    stage = str(tmp_path / "dirty_drift_vecs")
    batch_df.write.parquet(stage)
    state = frozen_base_state(spark, edge_dir)
    assert state is not None
    cq = state[0]

    batch = sorted(
        tuple(r) for r in ivfpq_drift_check(batch_df, cq).collect()
    )
    stream_in = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    run_to_memory(
        ivfpq_drift_check(stream_in, cq),
        "te_drift_dirty",
        output_mode="append",
    )
    got = sorted(tuple(r) for r in spark.table("te_drift_dirty").collect())
    assert got == batch
    # dirty rows dropped; survivors: zero-norm 9003 + the dup pair 9004
    assert [r[0] for r in got] == [9003, 9004, 9004], got
    zero = [r for r in got if r[0] == 9003][0]
    assert zero[1] == 0 and zero[2] == 0, zero  # tie -> lowest centroid, margin 0
    dup = [r for r in got if r[0] == 9004]
    assert dup[0] == dup[1], dup  # identical rows emit identically
    assert all(r[2] >= 0 for r in got)
