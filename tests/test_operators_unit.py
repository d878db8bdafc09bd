"""Operator edge-case units (SURVEY.md §5.2 tier 3): synthetic inputs the
fixtures can't produce — empty tables, orphan keys, all-duplicate keys."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_full_outer_preserves_both_orphan_sides(spark):
    """The sf fixtures are referentially complete, so the outer branches of
    q_join_full_outer never fire there; prove them on synthetic orphans."""
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "lv"])
    right = spark.createDataFrame([(2, "x"), (3, "y")], ["k", "rv"])
    out = left.join(right, "k", "full_outer").orderBy("k").collect()
    assert [(r["k"], r["lv"], r["rv"]) for r in out] == [
        (1, "a", None),
        (2, "b", "x"),
        (3, None, "y"),
    ]


def test_aggregate_on_empty_input(spark):
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    empty = spark.createDataFrame([], schema)
    assert empty.groupBy("k").agg(F.sum("v")).count() == 0
    # global aggregate over empty input: one row, NULL sum, zero count
    row = empty.agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()[0]
    assert row["s"] is None and row["n"] == 0


def test_all_duplicate_keys_aggregate(spark):
    df = spark.createDataFrame([("k", 1)] * 1000, ["k", "v"]).repartition(32)
    row = df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()[0]
    assert (row["k"], row["s"], row["n"]) == ("k", 1000, 1000)


def test_tokens_straddling_many_tiny_partitions(spark):
    """32 partitions over a tiny corpus ≈ the reference's 32-threads-on-
    small-file stress (SURVEY.md §5.1): counts must not depend on split."""
    df = spark.createDataFrame([("word word",), ("word",)], ["text"]).repartition(32)
    toks = df.select(F.explode(F.split("text", "[^A-Za-z0-9]+")).alias("t")).filter(
        F.length("t") > 0
    )
    assert toks.groupBy("t").count().collect()[0]["count"] == 3


def test_multimodal_decode_plumbing(spark):
    """The Arrow-batched decode path: schema, batching, deterministic fake
    codec; the REAL (fake=False) path is dirty-row-tolerant — text payloads
    are not PNGs, so every row decodes to null features, no task failure."""
    from mapreduce_framework_api_spark.operators.multimodal import as_media, decode_media
    from mapreduce_framework_api_spark.sources import table

    media = as_media(table(spark, "/root/testdata/sf0.001", "documents").limit(50))
    real = decode_media(media).collect()
    assert len(real) == 50
    assert all(r["width"] is None and r["feature"] is None for r in real)
    feats = decode_media(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r["width"] >= 16 and r["height"] >= 16
    assert len(r["feature"]) == 16 and all(isinstance(x, float) for x in r["feature"])
    # deterministic: same input -> same features
    again = decode_media(media, fake=True).collect()
    assert [tuple(x) for x in rows] == [tuple(x) for x in again]


def _make_png(doc_id: int, w: int, h: int) -> bytes:
    """Deterministic RGB gradient test image."""
    from mapreduce_framework_api_spark.functions.pngcodec import encode_png

    rgb = bytes(
        c
        for y in range(h)
        for x in range(w)
        for c in ((x * 7 + doc_id) % 256, (y * 11) % 256, (x + y) % 256)
    )
    return encode_png(w, h, rgb)


def test_png_codec_roundtrip_and_filters():
    """Pure-codec units: encode→decode is the identity on pixels, and the
    decoder undoes all five standard scanline filters (synthesized by
    re-filtering a known image by hand)."""
    import struct
    import zlib

    from mapreduce_framework_api_spark.functions.pngcodec import (
        _chunk,
        _SIG,
        decode_png,
        encode_png,
        resize_rgb_nearest,
    )

    w, h = 9, 5
    rgb = bytes((i * 37) % 256 for i in range(w * h * 3))
    assert decode_png(encode_png(w, h, rgb)) == (w, h, rgb)
    # resample determinism + exact corner preservation
    small = resize_rgb_nearest(w, h, rgb, 3, 2)
    assert len(small) == 3 * 2 * 3 and small[:3] == rgb[:3]
    # hand-filter each row with filter type (y % 5) and re-frame the PNG:
    # the decoder must reconstruct the original pixels
    stride = w * 3
    prev = bytearray(stride)
    raw = bytearray()
    for y in range(h):
        row = bytearray(rgb[y * stride : (y + 1) * stride])
        filt = y % 5
        enc = bytearray(row)
        if filt == 1:
            for x in range(stride - 1, 2, -1):
                enc[x] = (row[x] - row[x - 3]) & 0xFF
        elif filt == 2:
            for x in range(stride):
                enc[x] = (row[x] - prev[x]) & 0xFF
        elif filt == 3:
            for x in range(stride):
                left = row[x - 3] if x >= 3 else 0
                enc[x] = (row[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif filt == 4:
            for x in range(stride):
                a = row[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[x] = (row[x] - pred) & 0xFF
        raw += bytes([filt]) + enc
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    assert decode_png(png) == (w, h, rgb)
    # unsupported variants refuse cleanly
    import pytest

    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    gray_ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    with pytest.raises(ValueError):
        decode_png(_SIG + _chunk(b"IHDR", gray_ihdr) + _chunk(b"IEND", b""))


def test_multimodal_real_codec_end_to_end(spark):
    """fake=False through Spark: PNG payloads decode to true dimensions and
    a deterministic luminance histogram; resize re-encodes valid PNGs at
    the target size; one corrupt payload degrades to nulls, not a crash."""
    from mapreduce_framework_api_spark.functions.pngcodec import decode_png
    from mapreduce_framework_api_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        resize_media,
    )

    rows = [
        (i, "image", _make_png(i, 16 + i, 12 + i), (None, None, "unit"))
        for i in range(4)
    ] + [(99, "image", b"corrupt bytes", (None, None, "unit"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["doc_id"]: r for r in decode_media(media).collect()}
    assert len(feats) == 5
    for i in range(4):
        r = feats[i]
        assert (r["width"], r["height"]) == (16 + i, 12 + i)
        assert len(r["feature"]) == 16
        assert sum(r["feature"]) == (16 + i) * (12 + i)  # histogram covers all px
    assert feats[99]["width"] is None and feats[99]["feature"] is None
    resized = {r["doc_id"]: r for r in resize_media(media, 8, 6).collect()}
    for i in range(4):
        w, h, rgb = decode_png(bytes(resized[i]["payload"]))
        assert (w, h) == (8, 6) and len(rgb) == 8 * 6 * 3
    assert resized[99]["payload"] is None
    # determinism end-to-end
    again = {r["doc_id"]: r for r in decode_media(media).collect()}
    assert all(tuple(feats[k]) == tuple(again[k]) for k in feats)


def test_ivf_contract_and_recall_floor(spark):
    """q_sim_ivf_topk on the fixture: well-formed top-k per query (rk 1..k,
    descending cosine, no self-pairs), deterministic across runs, and
    recall@3 vs exact brute force comfortably above the nprobe/K chance
    floor (2/16 = 0.125)."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    qs = load_all_queries()
    sf = "/root/testdata/sf0.001"
    ivf = qs["q_sim_ivf_topk"].fn(spark, sf).collect()
    assert ivf, "IVF returned no rows"
    per_q = {}
    for r in ivf:
        assert r["vec_id"] != r["neighbor_id"]
        per_q.setdefault(r["vec_id"], []).append((r["rk"], r["cosine"]))
    for ranks in per_q.values():
        ks = [k for k, _ in sorted(ranks)]
        assert ks == list(range(1, len(ks) + 1))
        cosines = [c for _, c in sorted(ranks)]
        assert cosines == sorted(cosines, reverse=True)
    # determinism (fixed centroid init + iteration count, no RNG)
    again = qs["q_sim_ivf_topk"].fn(spark, sf).collect()
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, again))
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in qs["q_sim_cosine_topk"].fn(spark, sf).filter("rk <= 3").collect()
    }
    approx = {(r["vec_id"], r["neighbor_id"]) for r in ivf}
    recall = len(approx & exact) / len(exact)
    assert recall > 0.2, recall


def test_cogroup_block_grid_invariant_to_block_size(spark, monkeypatch):
    """The block-pair cogroup result must not depend on the grid: a 5-block
    grid (500 vectors / 128-row blocks) yields exactly the single-block
    result for both the top-k and the thresholded-pair kernels."""
    from mapreduce_framework_api_spark.operators import similarity
    from mapreduce_framework_api_spark.registry import load_all_queries

    sf = "/root/testdata/sf0.001"
    qs = load_all_queries()
    base_topk = sorted(map(tuple, qs["q_sim_cosine_topk"].fn(spark, sf).collect()))
    base_pairs = sorted(map(tuple, qs["q_dedup_embedding"].fn(spark, sf).collect()))
    monkeypatch.setattr(similarity, "_INDEX_BLOCK_ROWS", 128)
    assert sorted(map(tuple, qs["q_sim_cosine_topk"].fn(spark, sf).collect())) == base_topk
    assert (
        sorted(map(tuple, qs["q_dedup_embedding"].fn(spark, sf).collect())) == base_pairs
    )


def test_cogroup_block_grid_empty_embeddings(spark, tmp_path):
    """Zero-row embeddings: the cogroup grid has zero groups; both consumers
    return empty frames with their declared schemas (no job failure)."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    spark.createDataFrame([], schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    qs = load_all_queries()
    topk = qs["q_sim_cosine_topk"].fn(spark, str(tmp_path))
    assert topk.count() == 0
    assert topk.columns == ["vec_id", "neighbor_id", "cosine", "rk"]
    pairs = qs["q_dedup_embedding"].fn(spark, str(tmp_path))
    assert pairs.count() == 0
    assert pairs.columns == ["vec_a", "vec_b", "cosine"]


def test_salted_join_equals_plain_join(spark):
    """Salting is invisible in the result: hot-key join matches the plain
    join exactly (90% of big rows share one key)."""
    from mapreduce_framework_api_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1 if i % 10 else i % 7 + 2, i) for i in range(5000)], ["k", "payload"]
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 9)], ["k2", "name"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = salted_join(big, small, "k", "k2", n_salts=8).select("k", "payload", "name")
        want = big.join(small, big.k == small.k2).select("k", "payload", "name")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_salted_agg_equals_plain_agg(spark):
    from mapreduce_framework_api_spark.operators.skew import salted_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("hot" if i % 10 else f"k{i % 5}", i, float(i) / 10) for i in range(5000)],
        ["k", "a", "b"],
    )
    got = salted_agg(df, "k", sums={"a": "sum_a", "b": "sum_b"}, n_salts=8)
    want = df.groupBy("k").agg(
        F.sum("a").alias("sum_a"), F.sum("b").alias("sum_b"), F.count("*").alias("n")
    )
    g = {r["k"]: (r["sum_a"], round(r["sum_b"], 6), r["n"]) for r in got.collect()}
    w = {r["k"]: (r["sum_a"], round(r["sum_b"], 6), r["n"]) for r in want.collect()}
    assert g == w


def test_multimodal_resize_plumbing(spark):
    """Fake resize: 1 row in → 1 row out, payload shrunk deterministically,
    dims stamped; the REAL (fake=False) path nulls non-PNG payloads
    instead of raising (dirty-row tolerance)."""
    from mapreduce_framework_api_spark.operators.multimodal import as_media, resize_media
    from mapreduce_framework_api_spark.sources import table

    media = as_media(table(spark, "/root/testdata/sf0.001", "documents").limit(20))
    real = resize_media(media, 32, 32).collect()
    assert len(real) == 20 and all(r["payload"] is None for r in real)
    out = resize_media(media, 32, 32, fake=True)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)
    assert all(r["payload"] is not None and len(r["payload"]) <= 32 * 32 // 64 for r in rows)
    # determinism: same input → same bytes
    assert rows == resize_media(media, 32, 32, fake=True).collect()


def test_multimodal_frame_sample_plumbing(spark):
    """Fake frame sampling: 1 row in → ceil(n_frames / every_n) rows out,
    frame indices are the sampled arithmetic sequence."""
    from mapreduce_framework_api_spark.operators.multimodal import as_media, frame_sample
    from mapreduce_framework_api_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(5)
    media = as_media(docs)
    out = frame_sample(media, frame_bytes=64, every_n=4, fake=True).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    sizes = {r["doc_id"]: r["meta"]["n_bytes"] for r in media.collect()}
    for doc_id, idxs in by_doc.items():
        n_frames = max(1, sizes[doc_id] // 64)
        assert sorted(idxs) == list(range(0, n_frames, 4))


def test_asof_join_generic_semantics(spark):
    """The reusable asof_join: backward match, <= tie inclusion, highest
    payload on equal times, inner semantics (no prior right row -> drop),
    multiple payload columns carried."""
    from mapreduce_framework_api_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (2, 5, "e3")], ["k", "t", "eid"]
    )
    right = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 10, 101, "b"), (1, 15, 102, "c"), (3, 1, 103, "d")],
        ["k", "t", "okey", "tag"],
    )
    out = asof_join(
        left, right, "k", "k", "t", "t", payload_cols=["okey", "tag"]
    ).orderBy("eid").collect()
    got = [(r["eid"], r["asof_okey"], r["asof_tag"]) for r in out]
    # e1: ties at t=10 -> highest okey wins; e2: latest at-or-before 20 is t=15;
    # e3: key 2 has no right rows -> dropped (inner as-of)
    assert got == [("e1", 101, "b"), ("e2", 102, "c")]


def test_capped_bucket_bounds_viral_bucket_pairs(spark):
    """Adversarial hot bucket: one band value shared by 300 docs. With a
    cap of 16, pair expansion must emit exactly cap*(cap-1)/2 pairs — never
    width² — and the kept members must be the deterministic sorted prefix."""
    from mapreduce_framework_api_spark.operators.dedup import _pairs_within, capped_bucket

    width, cap = 300, 16
    df = spark.createDataFrame([(list(range(width)),)], ["recs"])
    pairs = df.select(
        F.explode(_pairs_within(capped_bucket(F.sort_array("recs"), cap=cap))).alias("p")
    ).select("p.a", "p.b")
    rows = pairs.collect()
    assert len(rows) == cap * (cap - 1) // 2
    assert max(max(r["a"], r["b"]) for r in rows) == cap - 1  # sorted prefix kept


def test_bucket_overflow_report_counts_dropped_pairs(spark):
    """The cap diagnostic: one viral bucket (width 300) + one calm bucket
    (width 3) at cap 16 → 1 hot bucket, max width 300, and the dropped-pair
    count is (300·299 − 16·15)/2."""
    from mapreduce_framework_api_spark.operators.dedup import bucket_overflow_report

    width, cap = 300, 16
    df = spark.createDataFrame(
        [(list(range(width)),), ([1, 2, 3],)], ["recs"]
    )
    row = bucket_overflow_report(df, cap=cap).collect()[0]
    assert row["n_buckets"] == 2
    assert row["max_width"] == width
    assert row["hot_buckets"] == 1
    assert row["pairs_dropped"] == (width * (width - 1) - cap * (cap - 1)) // 2


def test_stop_shingle_cap_bounds_viral_shingle(spark, tmp_path):
    """Adversarial stop shingle: 200 docs share one boilerplate trigram but
    are otherwise disjoint. With the df cap (default 128) below the doc
    count, the hot shingle is dropped as a unit on BOTH engines (semantic
    cap, mirrored in the oracle CTE), so the pair pipeline emits zero pairs
    instead of ~n²/2 — and a DuckDB run of the registered oracle agrees."""
    import duckdb

    import mapreduce_framework_api_spark.operators.dedup as dd
    from mapreduce_framework_api_spark.registry import load_all_queries

    n = 200
    assert n > dd._SHINGLE_DF_CAP
    # every doc: shared boilerplate trigram + a unique tail
    docs = [(i, f"common header trigram unique{i} tail{i} end{i}") for i in range(n)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    doc_pq = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(doc_pq)

    dd._JACCARD_PAIR_CACHE.clear()
    try:
        out = dd.jaccard_dup_pairs(spark, str(tmp_path)).collect()
        assert out == []  # hot shingle dropped; no other overlap exists

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_pq}/*.parquet')"
        )
        oracle_sql = load_all_queries()["q_dedup_ngram_jaccard"].oracle
        assert con.execute(oracle_sql).fetchall() == []
    finally:
        dd._JACCARD_PAIR_CACHE.clear()


def test_pii_scrub_redacts_and_matches_oracle(spark, tmp_path):
    """The sf fixtures carry no PII-shaped spans, so the fixture-level
    differential check only proves the no-op path. Here synthetic docs with
    real emails/phones prove (a) counts, (b) that Spark's Java regex and
    DuckDB's RE2 make byte-identical replacements (scrubbed_md5 equality
    through the registered oracle)."""
    import duckdb

    from mapreduce_framework_api_spark.registry import load_all_queries

    docs = [
        (0, "contact alice.smith+spam@example.co.uk or call +1 (415) 555-0100 now"),
        (1, "no pii here, just words"),
        (2, "two mails: a@b.io c.d@e-f.org and digits 123"),
        (3, "phone only 0049 30 1234567 end"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    doc_pq = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(doc_pq)

    q = load_all_queries()["q_pipe_pii_scrub"]
    srows = {r["doc_id"]: r for r in q.fn(spark, str(tmp_path)).collect()}
    assert srows[0]["n_emails"] == 1 and srows[0]["n_phones"] == 1
    assert srows[1]["n_emails"] == 0 and srows[1]["n_phones"] == 0
    assert srows[2]["n_emails"] == 2
    assert srows[3]["n_phones"] == 1

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_pq}/*.parquet')"
    )
    for did, n_em, n_ph, md in con.execute(q.oracle).fetchall():
        s = srows[did]
        assert (s["n_emails"], s["n_phones"], s["scrubbed_md5"]) == (n_em, n_ph, md)


def test_canonical_election_longest_then_lowest_id(spark, tmp_path):
    """Canonical election on a synthetic dup cluster: three near-identical
    docs (pairwise Jaccard ≥ 0.5) where the longest text wins; ties by
    lowest doc_id. Singleton (non-dup) docs must not appear at all."""
    import mapreduce_framework_api_spark.operators.dedup as dd
    from mapreduce_framework_api_spark.registry import load_all_queries

    body = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (10, body + " extra tail words here", len(body) + 22),
        (11, body, len(body)),
        (12, body + " extra tail words here", len(body) + 22),  # tie with 10
        (99, "completely different text with no shared shingles at all", 57),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "n_chars"])
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    dd._JACCARD_PAIR_CACHE.clear()
    dd._CLUSTER_LABEL_CACHE.clear()
    try:
        q = load_all_queries()["q_dedup_canonical"]
        rows = {r["doc_id"]: r for r in q.fn(spark, str(tmp_path)).collect()}
        assert set(rows) == {10, 11, 12}  # 99 is not dup-involved
        assert all(r["cluster_id"] == 10 for r in rows.values())
        # 10 and 12 tie on n_chars; lower doc_id wins
        assert rows[10]["is_canonical"] == 1
        assert rows[11]["is_canonical"] == 0
        assert rows[12]["is_canonical"] == 0
    finally:
        dd._JACCARD_PAIR_CACHE.clear()
        dd._CLUSTER_LABEL_CACHE.clear()


def test_salted_join_equals_plain_join_under_extreme_skew(spark):
    """One key holds 90% of the big side; the salted join must return
    exactly the plain join's rows (salt is internal) while scattering the
    hot key across >1 salt value (the whole point of the mitigation)."""
    from mapreduce_framework_api_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(7, i) for i in range(900)] + [(k, 0) for k in range(100)], ["k", "payload"]
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(0, 200, 2)] + [(7, "hot")], ["k2", "dv"])
    got = salted_join(big, small, key="k", small_key="k2", n_salts=8)
    plain = big.join(small, big["k"] == small["k2"], "inner")
    assert sorted(got.columns) == sorted(plain.columns)
    key = lambda r: (r["k"], r["payload"], r["k2"], r["dv"])
    assert sorted(map(key, got.collect())) == sorted(map(key, plain.collect()))


def test_salted_agg_spreads_hot_key_and_matches_plain(spark):
    """Stage 1 of the salted agg must see the hot key under >1 salt (the
    parallelism claim), and the merged result must equal the plain groupBy."""
    from pyspark.sql import functions as F

    from mapreduce_framework_api_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 1), ("cold", 2)], ["k", "v"]
    )
    out = {r["k"]: (r["s"], r["n"]) for r in salted_agg(df, "k", sums={"v": "s"}).collect()}
    assert out == {"hot": (sum(range(500)), 500), "cold": (3, 2)}
    # the internal stage-1 shape: hot key occupies multiple (key, salt) groups
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(16))
    n_groups = (
        df.withColumn("_salt", salt).filter(F.col("k") == "hot")
        .select("_salt").distinct().count()
    )
    assert n_groups > 1


def _write_synthetic_events(spark, tmp_path, rows):
    """rows: list of (event_id, user_id, event_type). Writes the events
    schema with ts as raw nanos (the fixture's TIMESTAMP(NANOS) shape is
    read back as long via nanosAsLong, so a long column round-trips)."""
    df = spark.createDataFrame(
        [(eid, 1_700_000_000_000_000_000 + eid * 1_000_000, uid, et, 1.0, "{}")
         for eid, uid, et in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_hll_sketch_error_bound_on_wide_keyspace(spark, tmp_path):
    """5000 distinct users (m=64 registers): the deterministic HLL estimate
    must land within the ~1.04/sqrt(64)=13% expected band; assert a loose
    25% so the test pins sanity, not one lucky hash draw."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    rows = [(i, i, "a") for i in range(5000)]
    sf = _write_synthetic_events(spark, tmp_path, rows)
    r = load_all_queries()["q_sketch_hll"].fn(spark, sf).collect()
    assert len(r) == 1 and r[0]["n_exact"] == 5000
    est = r[0]["hll_est_x100"] / 100.0
    assert abs(est - 5000) / 5000 < 0.25


def test_cms_sketch_never_underestimates(spark, tmp_path):
    """With 3000 distinct users over 4x256 counters, collisions are
    guaranteed — Count-Min must overestimate or equal, never under, and
    must rank the dominant heavy hitter first."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    rows = [(i, i % 3000, "a") for i in range(6000)]
    rows += [(10_000 + j, 77, "a") for j in range(500)]  # heavy hitter
    sf = _write_synthetic_events(spark, tmp_path, rows)
    got = load_all_queries()["q_sketch_cms"].fn(spark, sf).collect()
    assert got[0]["user_id"] == 77 and got[0]["n_exact"] == 502
    assert all(r["cms_est"] >= r["n_exact"] for r in got)


def test_repetition_signals_flag_degenerate_doc(spark, tmp_path):
    """A degenerate 'spam spam …' doc must score max trigram repetition and
    minimal distinct ratio; a all-unique doc scores the opposite ends."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    df = spark.createDataFrame(
        [(1, "spam spam spam spam", "en", "s", 19),
         (2, "alpha beta gamma delta", "en", "s", 22)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r for r in
           load_all_queries()["q_text_repetition"].fn(spark, str(tmp_path)).collect()}
    assert got[1]["distinct_ratio_x10000"] == 2500   # 1 distinct / 4 tokens
    assert got[1]["top_trigram_frac_x10000"] == 10000
    assert got[2]["distinct_ratio_x10000"] == 10000
    assert got[2]["top_trigram_frac_x10000"] == 5000  # 1 of 2 distinct trigrams


def test_lsh_contract_and_recall_floor(spark):
    """q_sim_ann_lsh on the fixture: well-formed per-query top-k
    (ascending rk, descending cosine, no self-pairs), deterministic, and
    recall@3 vs exact brute force well above chance — the quality
    evidence behind the declared rows-only check."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    qs = load_all_queries()
    sf = "/root/testdata/sf0.001"
    lsh = qs["q_sim_ann_lsh"].fn(spark, sf).collect()
    assert lsh, "LSH returned no rows"
    per_q = {}
    for r in lsh:
        assert r["vec_id"] != r["neighbor_id"]
        per_q.setdefault(r["vec_id"], []).append((r["rk"], r["cosine"]))
    for ranks in per_q.values():
        ks = [k for k, _ in sorted(ranks)]
        assert ks == list(range(1, len(ks) + 1))
        cosines = [c for _, c in sorted(ranks)]
        assert cosines == sorted(cosines, reverse=True)
    again = qs["q_sim_ann_lsh"].fn(spark, sf).collect()
    assert sorted(map(tuple, lsh)) == sorted(map(tuple, again))
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in qs["q_sim_cosine_topk"].fn(spark, sf).filter("rk <= 3").collect()
    }
    approx = {(r["vec_id"], r["neighbor_id"]) for r in lsh}
    recall = len(approx & exact) / len(exact)
    assert recall > 0.2, recall


def test_signature_kernels_match_expression_builders(spark):
    """The Arrow-batched md5 kernels are drop-in replacements for the
    expression builders (the executable spec the DuckDB oracles mirror):
    bit-identical minhash signatures, simhash longs, and Jaccard-invariant
    shingle-set SIZES on the full fixture corpus, including the short-doc
    whole-text-shingle fallback and an empty-token doc."""
    from mapreduce_framework_api_spark.operators import dedup as D
    from mapreduce_framework_api_spark.sources import table
    from pyspark.sql import functions as F

    docs = table(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [(9001, "a b"), (9002, ""), (9003, "!!! ...")], "doc_id long, text string"
    )
    docs = docs.unionByName(edge)

    mh = docs.select(
        "doc_id",
        D.minhash_signature("text").alias("expr"),
        D._minhash_sig_udf()("text").alias("kern"),
    )
    assert mh.filter("expr <> kern").count() == 0

    sh = docs.select(
        "doc_id",
        D.simhash_signature("text").alias("expr"),
        D._simhash_sig_udf()("text").alias("kern"),
    )
    assert sh.filter("expr <> kern").count() == 0

    # Shingle hashes differ by design (md5-derived vs the old xxhash64);
    # Jaccard only sees set sizes and intersections, so assert the kernel's
    # DISTINCT size matches the expression shingle set exactly — for docs
    # WITH tokens. Zero-token docs diverge by design: _shingles (the
    # minhash spec) falls back to the raw text (size 1), while the jaccard
    # kernel emits NO shingles (size 0) so token-empty docs are excluded
    # from the jaccard tiers on both engines (DuckDB's
    # array_to_string([], ' ') is NULL — see the edge-corpus test).
    has_tokens = F.size(D.tokens_nonempty("text")) > 0
    jc = docs.select(
        "doc_id",
        has_tokens.alias("has_tokens"),
        F.size(F.array_distinct(D._shingles("text"))).alias("n_expr"),
        F.size(D._shingle_hash_udf()("text")).alias("n_kern"),
    )
    assert jc.filter("has_tokens AND n_expr <> n_kern").count() == 0
    assert jc.filter("NOT has_tokens AND n_kern <> 0").count() == 0
    assert jc.filter("NOT has_tokens").count() == 2  # the two edge docs


def test_decontaminate_flags_exact_overlap(spark, tmp_path):
    """A training doc sharing an 8-gram with an eval doc is flagged with
    the exact overlap count; a disjoint training doc is absent. Eval
    membership is the md5(doc_id) prefix rule, so the test derives
    eval/train ids the same way the operator does."""
    import hashlib

    from mapreduce_framework_api_spark.registry import load_all_queries

    def is_eval(i):
        return hashlib.md5(str(i).encode()).hexdigest()[:2] < "10"

    eval_id = next(i for i in range(1000) if is_eval(i))
    train_a, train_b = [i for i in range(1000) if not is_eval(i)][:2]
    leak = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    rows = [
        (eval_id, leak + " iota kappa", "en", "w", 1),
        # 9 tokens -> two 8-grams, one shared with the eval doc
        (train_a, "zero " + leak, "en", "w", 1),
        (train_b, "one two three four five six seven eight nine", "en", "w", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in load_all_queries()["q_dedup_decontaminate"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert set(got) == {train_a}
    assert got[train_a]["n_ngrams"] == 2
    assert got[train_a]["n_contaminated"] == 1
    assert got[train_a]["frac_x10000"] == 5000


def test_surprisal_buckets_and_mean(spark, tmp_path):
    """Hand-computed corpus: token counts 4 ('a') and 1 ('b'/'c'/'d') give
    buckets 2 and 0; per-doc means follow exactly."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    rows = [
        (1, "a a a b", "en", "w", 1),   # buckets 2,2,2,0 -> mean 1.5 -> 150
        (2, "a c d", "en", "w", 1),     # buckets 2,0,0 -> mean 2/3 -> 67
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in load_all_queries()["q_text_surprisal"].fn(spark, str(tmp_path)).collect()
    }
    assert got[1]["n_tokens"] == 4 and got[1]["mean_bucket_x100"] == 150
    assert got[2]["n_tokens"] == 3 and got[2]["mean_bucket_x100"] == 67


def test_funnel_strict_ordering(spark, tmp_path):
    """Hand-built event log: a click BEFORE the first view must not count;
    stage counts are monotone non-increasing."""
    import datetime as dt

    from mapreduce_framework_api_spark.registry import load_all_queries

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, uid, typ, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), uid, typ, 1.0, "{}")

    rows = [
        # user 1: full ordered funnel
        ev(1, 1, "view", 0), ev(2, 1, "click", 10), ev(3, 1, "purchase", 20),
        # user 2: click precedes the only view -> stops at view
        ev(4, 2, "click", 0), ev(5, 2, "view", 10), ev(6, 2, "purchase", 20),
        # wait: purchase after view but no click after view -> still view-only
        # user 3: never views
        ev(7, 3, "click", 0), ev(8, 3, "purchase", 5),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    (row,) = load_all_queries()["q_events_funnel"].fn(spark, str(tmp_path)).collect()
    assert (row["n_view"], row["n_view_click"], row["n_view_click_purchase"]) == (2, 1, 1)


def test_retention_offsets(spark, tmp_path):
    """Two users, known active days: cohort day 0 counts both; only user 1
    returns on day 2."""
    import datetime as dt

    from mapreduce_framework_api_spark.registry import load_all_queries

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i, (uid, day) in enumerate([(1, 0), (1, 0), (1, 2), (2, 0)]):
        rows.append((i, t0 + dt.timedelta(days=day, minutes=i), uid, "view", 1.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        (r["cohort_day_us"], r["day_offset"]): r["n_users"]
        for r in load_all_queries()["q_events_retention"].fn(spark, str(tmp_path)).collect()
    }
    day0_us = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert got == {(day0_us, 0): 2, (day0_us, 2): 1}


def test_rollup_reuse_equals_direct(spark):
    """The two-level (hourly -> daily) rollup must equal a direct daily
    aggregate of the raw table — decimal sums make composition lossless."""
    from pyspark.sql import functions as F

    from mapreduce_framework_api_spark.registry import load_all_queries
    from mapreduce_framework_api_spark.sources import table as t

    sf = "/root/testdata/sf0.001"
    day_us = 24 * 3600 * 1_000_000
    direct = (
        t(spark, sf, "events")
        .groupBy(
            ((F.unix_micros("ts") / day_us).cast("long") * day_us).alias("day_us"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
    )
    got = load_all_queries()["q_agg_rollup_reuse"].fn(spark, sf).collect()
    want = direct.collect()

    def as_map(rows):
        return {(r["day_us"], r["event_type"]): (r["n_events"], r["sum_value"]) for r in rows}

    assert as_map(got) == as_map(want)


def test_bloom_no_false_negatives(spark):
    """Bloom invariant on the fixture: every member passes the filter
    (n_bloom_pass >= n_members per segment) and totals reconcile."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    rows = load_all_queries()["q_sketch_bloom"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_bloom_pass"] >= r["n_members"], r
        assert r["n_false_pos"] == r["n_bloom_pass"] - r["n_members"], r
        assert r["n_customers"] >= r["n_bloom_pass"], r


def test_multimodal_features_feed_similarity(spark):
    """End-to-end media pipeline composition: documents -> media payloads ->
    (fake-)decoded 16-dim features -> brute-force cosine top-k over those
    features. Proves the multimodal plumbing emits exactly the
    array<double> shape the similarity tier consumes, with deterministic
    results — the decode->embed->ANN path of a production multimodal
    corpus, minus only the stubbed codec."""
    import numpy as np

    from pyspark.sql import functions as F

    from mapreduce_framework_api_spark.operators.multimodal import as_media, decode_media
    from mapreduce_framework_api_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    feats = decode_media(as_media(docs), fake=True).select("doc_id", "feature")
    rows = feats.collect()
    assert len(rows) == 40 and all(len(r["feature"]) == 16 for r in rows)

    # brute-force cosine top-3 per feature vector, computed distributedly
    # with the same zip_with/aggregate expression the dedup tier uses
    a = feats.select(F.col("doc_id").alias("ida"), F.col("feature").alias("va"))
    b = feats.select(F.col("doc_id").alias("idb"), F.col("feature").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(F.zip_with("va", "va", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x))
    nb = F.sqrt(F.aggregate(F.zip_with("vb", "vb", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x))
    from pyspark.sql import Window as W

    scored = (
        a.join(b, F.col("ida") != F.col("idb"))
        .select("ida", "idb", (dot / (na * nb)).alias("cos"))
        .withColumn(
            "rk",
            F.row_number().over(W.partitionBy("ida").orderBy(F.desc("cos"), F.asc("idb"))),
        )
        .filter(F.col("rk") <= 3)
    )
    got = scored.groupBy("ida").count().collect()
    assert len(got) == 40 and all(r["count"] == 3 for r in got)

    # deterministic: same fake decode -> same neighbors
    again = scored.collect()
    once = scored.collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, again))

    # cross-check one vector's top-1 against numpy
    fmap = {r["doc_id"]: np.array(r["feature"]) for r in rows}
    q_id = rows[0]["doc_id"]
    qv = fmap[q_id]
    best = max(
        ((i, float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))) for i, v in fmap.items() if i != q_id),
        key=lambda t: (t[1], -t[0]),
    )
    spark_best = {r["ida"]: r["idb"] for r in once if r["rk"] == 1}[q_id]
    assert spark_best == best[0]


def test_gapfill_dense_spine_and_ffill(spark, tmp_path):
    """Hand-built series with a 2-hour hole: the spine is dense, gap hours
    carry n_events=0 with the last observed sum forward-filled, and hours
    before a type's first observation stay NULL."""
    import datetime as dt

    from mapreduce_framework_api_spark.registry import load_all_queries

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "click", 10.0, "{}"),
        # hours +1, +2 silent for click
        (1, t0 + dt.timedelta(hours=3), 1, "click", 20.0, "{}"),
        (2, t0 + dt.timedelta(hours=2), 2, "view", 5.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        (r["hour_us"], r["event_type"]): (r["n_events"], r["filled_sum"])
        for r in load_all_queries()["q_events_gapfill"].fn(spark, str(tmp_path)).collect()
    }
    hour_us = 3_600 * 1_000_000
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    # dense: 4 hours x 2 types
    assert len(got) == 8
    assert got[(base, "click")] == (1, 10.0)
    assert got[(base + 1 * hour_us, "click")] == (0, 10.0)  # gap, ffilled
    assert got[(base + 2 * hour_us, "click")] == (0, 10.0)
    assert got[(base + 3 * hour_us, "click")] == (1, 20.0)
    assert got[(base, "view")] == (0, None)  # before first observation
    assert got[(base + 2 * hour_us, "view")] == (1, 5.0)
    assert got[(base + 3 * hour_us, "view")] == (0, 5.0)


def test_hist_quantile_even_count_straddles_bin_edge(spark, tmp_path):
    """Median-rank arithmetic on an EVEN-count group whose two middle ranks
    fall in different bins: the rank must be (n+1)//2 (integer floor), not
    (n+1)/2 (double). With values [0, 1, 9, 10] the floor rank (2) lands in
    bin 25 while the double threshold 2.5 would skip to bin 230 — the two
    estimates differ by ~8, so this pins the Spark side to the oracle's
    integer semantics (the sf fixtures never hit this by construction)."""
    import duckdb

    from mapreduce_framework_api_spark.registry import load_all_queries

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0, 1, "a", v, "{}") for i, v in enumerate([0.0, 1.0, 9.0, 10.0])
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    q = load_all_queries()["q_sketch_hist_quantile"]
    (got,) = q.fn(spark, str(tmp_path)).collect()
    # rank (4+1)//2 = 2 -> value 1.0 -> bin floor(1.0/(10/256)) = 25
    # -> estimate 25 * 10/256 = 0.9765625 -> 0.98
    assert (got["event_type"], got["n"], got["est_p50"], got["exact_p50"]) == (
        "a",
        4,
        0.98,
        5.0,
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    (oracle,) = con.execute(q.oracle).fetchall()
    assert (oracle[0], oracle[1], oracle[2], oracle[3]) == ("a", 4, 0.98, 5.0)


def test_hist_quantile_within_one_bin(spark):
    """The 256-bin histogram median estimate lands within one bin width of
    the DISCRETE median per event_type (the sketch's error bound).

    percentile_disc(0.5) is exactly the rank-(n+1)//2 value the sketch
    targets; the interpolated median can sit arbitrarily far into a data
    gap between the two middle values, so it is NOT the bound's anchor."""
    from pyspark.sql import functions as F

    from mapreduce_framework_api_spark.operators.sketches import _HIST_BINS
    from mapreduce_framework_api_spark.registry import load_all_queries
    from mapreduce_framework_api_spark.sources import table

    sf = "/root/testdata/sf0.001"
    anchors = {
        r["event_type"]: ((r["vmax"] - r["vmin"]) / _HIST_BINS, r["p50_disc"])
        for r in table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
                "p50_disc"
            ),
        )
        .collect()
    }
    rows = load_all_queries()["q_sketch_hist_quantile"].fn(spark, sf).collect()
    assert rows
    for r in rows:
        w, p50_disc = anchors[r["event_type"]]
        assert abs(r["est_p50"] - p50_disc) <= w + 0.01, (r, w, p50_disc)


def test_new_event_queries_on_empty_events(spark, tmp_path):
    """Funnel / retention / rollup / gapfill / hist-quantile on an EMPTY
    events table: no AnalysisException, well-defined empty-ish results
    (funnel emits one all-zero row; the rest emit no rows)."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.registry import load_all_queries

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame([], schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    qs = load_all_queries()
    (funnel,) = qs["q_events_funnel"].fn(spark, str(tmp_path)).collect()
    assert tuple(funnel) == (0, 0, 0)
    for name in (
        "q_events_retention",
        "q_agg_rollup_reuse",
        "q_events_gapfill",
        "q_sketch_hist_quantile",
        "q_stream_tumbling",
        "q_events_sessionize",
        "q_events_ohlc",
        "q_events_timeweighted",
        "q_stream_topk_windowed",
        "q_events_cdc_compact",
    ):
        assert qs[name].fn(spark, str(tmp_path)).count() == 0, name


def _write_events(spark, tmp_path, rows):
    from datetime import datetime

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    data = [
        (i, datetime(2024, 1, 1, 0, 0, s), 1, t, v, "{}")
        for i, (s, t, v) in enumerate(rows)
    ]
    spark.createDataFrame(data, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )


def test_ohlc_picks_by_time_then_event_id(spark, tmp_path):
    """OHLC on a hand-built hour: open is the earliest event's value,
    close the latest (event_id breaks the ts tie), high/low the extremes."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    # seconds-offset, type, value; two events share second 40 — the later
    # event_id (4) must win the close.
    _write_events(
        spark,
        tmp_path,
        [(10, "click", 5.0), (20, "click", 9.0), (40, "click", 1.0), (40, "click", 7.0)],
    )
    (bar,) = load_all_queries()["q_events_ohlc"].fn(spark, str(tmp_path)).collect()
    assert (bar["open"], bar["high"], bar["low"], bar["close"], bar["n_events"]) == (
        5.0,
        9.0,
        1.0,
        7.0,
        4,
    )


def test_cdc_compact_tombstone_semantics(spark, tmp_path):
    """Hand-built changelog: user keeps only events after their last
    'error' tombstone; a stream ENDING in a tombstone erases the user."""
    from pyspark.sql import types as T
    from datetime import datetime

    from mapreduce_framework_api_spark.registry import load_all_queries

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    ts = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # user 1: view, ERROR, click, purchase -> final purchase, n_live=2
        (1, ts(1), 1, "view", 1.0, "{}"),
        (2, ts(2), 1, "error", 0.0, "{}"),
        (3, ts(3), 1, "click", 2.0, "{}"),
        (4, ts(4), 1, "purchase", 3.5, "{}"),
        # user 2: click then trailing ERROR -> erased
        (5, ts(1), 2, "click", 9.0, "{}"),
        (6, ts(2), 2, "error", 0.0, "{}"),
        # user 3: no tombstone -> latest wins, n_live=2
        (7, ts(1), 3, "signup", 4.0, "{}"),
        (8, ts(2), 3, "view", 5.0, "{}"),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        r["user_id"]: (r["final_type"], r["final_value"], r["n_live"])
        for r in load_all_queries()["q_events_cdc_compact"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {1: ("purchase", 3.5, 2), 3: ("view", 5.0, 2)}


def test_timeweighted_average_hand_computed(spark, tmp_path):
    """TWA on a hand-built series: 10.0 held 10 s then 20.0 held 30 s
    (last event open-ended, excluded) -> (10*10 + 20*30) / 40 = 17.5."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    _write_events(
        spark,
        tmp_path,
        [(0, "click", 10.0), (10, "click", 20.0), (40, "click", 99.0)],
    )
    (r,) = load_all_queries()["q_events_timeweighted"].fn(spark, str(tmp_path)).collect()
    assert r["n_intervals"] == 2
    assert r["span_us"] == 40_000_000
    assert r["twa"] == 17.5


def test_new_pipe_queries_on_empty_documents(spark, tmp_path):
    """Chunking / upsampling / shuffle-order on an EMPTY documents table:
    no AnalysisException, zero rows (explodes over empty sequences and
    windows over empty shards are all well-defined)."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.registry import load_all_queries

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    spark.createDataFrame([], schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    qs = load_all_queries()
    for name in (
        "q_pipe_chunk_overlap",
        "q_pipe_upsample_epochs",
        "q_pipe_shuffle_order",
        "q_agg_string_agg",
        "q_agg_corr_exact",
        "q_text_vocab_coverage",
        "q_pipe_filter_cascade",
    ):
        assert qs[name].fn(spark, str(tmp_path)).count() == 0, name


def _write_documents(spark, tmp_path, texts):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    data = [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(data, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )


def test_vocab_coverage_hand_computed(spark, tmp_path):
    """Top-K vocabulary coverage on a hand-built corpus: 'a a a b b c' ->
    a covers 50%, a+b 83.33%, a+b+c 100%; count-desc-then-token order."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    _write_documents(spark, tmp_path, ["a a a b b", "c"])
    rows = (
        load_all_queries()["q_text_vocab_coverage"].fn(spark, str(tmp_path)).collect()
    )
    got = [(r["rank"], r["token"], r["cnt"], r["cum_cnt"], r["cov_pct"]) for r in rows]
    assert got == [(1, "a", 3, 3, 50.0), (2, "b", 2, 5, 83.33), (3, "c", 1, 6, 100.0)]


def test_filter_cascade_first_fail_attribution(spark, tmp_path):
    """A doc that is BOTH too short and repetitive is charged to the
    earlier stage (too_short); stage counts sum to the corpus size."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    # 30 distinct 5-letter words: alpha ratio 150/179 ~ 0.838 > 0.815,
    # unique ratio 1.0 — passes every stage.
    long_clean = " ".join(
        "w" + a + b + c + "z"
        for a in "abc"
        for b in "de"
        for c in "fghij"
    )
    short_and_repetitive = "x x x x x"  # stage 1 wins over stage 3
    # 10-letter word repeated: alpha ratio 250/274 ~ 0.912 passes stage 2,
    # unique ratio 1/25 < 0.35 -> stage 3.
    repetitive = " ".join(["duplicated"] * 25)
    _write_documents(
        spark, tmp_path, [long_clean, short_and_repetitive, repetitive]
    )
    rows = (
        load_all_queries()["q_pipe_filter_cascade"].fn(spark, str(tmp_path)).collect()
    )
    by_stage = {r["stage"]: r["n_docs"] for r in rows}
    assert by_stage.get("too_short") == 1
    assert by_stage.get("repetitive") == 1
    assert by_stage.get("pass") == 1
    assert sum(by_stage.values()) == 3


def test_hll_merge_equals_direct_sketch(spark):
    """Mergeability proof: per-type sketches unioned by per-bucket MAX
    must give EXACTLY the estimate of one sketch built directly over all
    distinct users (max-of-partition-maxes == global max)."""
    import hashlib

    from conftest import SF_DIR

    from mapreduce_framework_api_spark.registry import load_all_queries
    from mapreduce_framework_api_spark.sources import table

    users = [
        r["user_id"]
        for r in table(spark, SF_DIR, "events").select("user_id").distinct().collect()
    ]
    m, regs = 64, {}
    for u in users:
        hx = hashlib.md5(str(u).encode()).hexdigest()
        bucket = int(hx[:2], 16) % m
        w = int(hx[2:15], 16)
        rho = min(53 - w.bit_length() if w > 0 else 53, 52)
        regs[bucket] = max(regs.get(bucket, 0), rho)
    reg_sum = float(sum(1 << (52 - r) for r in regs.values()))
    est = 2904.064 / (reg_sum / float(1 << 52) + (m - len(regs)))
    import math

    expect = math.floor(est * 100.0 + 0.5)
    (row,) = load_all_queries()["q_sketch_hll_merge"].fn(spark, SF_DIR).collect()
    assert row["hll_est_x100"] == expect
    assert row["n_users"] == len(users)
    assert row["n_pairs"] >= row["n_users"]


def test_repeated_chunks_detects_cross_doc_boilerplate(spark, tmp_path):
    """Two docs share one exact 10-token span (different offsets are NOT
    detected — chunking is fixed-grid, documented); a 9-token doc
    exercises the empty-sequence guard; within-doc repeats alone do not
    qualify (n_docs >= 2)."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    span = " ".join(f"boiler{i}" for i in range(10))
    _write_documents(
        spark,
        tmp_path,
        [
            span + " " + " ".join(f"ua{i}" for i in range(10)),
            span + " " + " ".join(f"ub{i}" for i in range(10)),
            "short doc under ten tokens here now ok",  # 7 toks -> 0 chunks
            " ".join(f"uc{i}" for i in range(10)) * 1,  # unique chunk
        ],
    )
    rows = (
        load_all_queries()["q_dedup_repeated_chunks"].fn(spark, str(tmp_path)).collect()
    )
    assert len(rows) == 1
    (r,) = rows
    assert (r["n_occurrences"], r["n_docs"], r["first_doc_id"]) == (2, 2, 0)


def test_weighted_median_hand_computed_and_cross_bin(spark, tmp_path):
    """Two-level bin-then-refine weighted median on hand-built lineitem:
    half-weight point in a different 1024-cent bin than the cheap rows;
    even-total lower-median convention (first price with 2*cum >= total)."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.registry import load_all_queries

    schema = T.StructType(
        [
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_quantity", T.DoubleType()),
        ]
    )
    rows = [
        # flag A: prices span bins (100c -> bin 0; 10000c -> bin 9;
        # 20000c -> bin 19); weights 1 each -> median = 100.00
        ("A", 1.00, 1.0),
        ("A", 100.00, 1.0),
        ("A", 200.00, 1.0),
        # flag B: even total weight, lower-median -> 5.00
        ("B", 5.00, 1.0),
        ("B", 6.00, 1.0),
        # flag C: weight skew -> heavy row wins despite higher price
        ("C", 2.00, 1.0),
        ("C", 9.00, 5.0),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    got = {
        r["flag"]: (r["total_weight"], r["wmedian"])
        for r in load_all_queries()["q_agg_weighted_median"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {"A": (3, 100.0), "B": (2, 5.0), "C": (6, 9.0)}


def test_transitions_hand_computed(spark, tmp_path):
    """Markov transition counts on a hand-built changelog: per-user
    consecutive pairs only, probabilities normalized per from_type."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    _write_events(
        spark,
        tmp_path,
        # user 1 (all same user in helper): view->click->view->purchase
        [(1, "view", 0.0), (2, "click", 0.0), (3, "view", 0.0), (4, "purchase", 0.0)],
    )
    rows = load_all_queries()["q_events_transitions"].fn(spark, str(tmp_path)).collect()
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p_x10000"]) for r in rows}
    assert got == {
        ("view", "click"): (1, 5000),
        ("view", "purchase"): (1, 5000),
        ("click", "view"): (1, 10000),
    }


def test_latest_queries_on_empty_tables(spark, tmp_path):
    """Transitions / keywords / end-to-end / repeated-chunks / vocab on
    EMPTY inputs: no AnalysisException, zero rows."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.registry import load_all_queries

    _write_documents(spark, tmp_path, [])
    eschema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame([], eschema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    qs = load_all_queries()
    for name in (
        "q_events_transitions",
        "q_text_keywords",
        "q_pipe_end_to_end",
        "q_dedup_repeated_chunks",
    ):
        assert qs[name].fn(spark, str(tmp_path)).count() == 0, name


def test_mad_hand_computed(spark, tmp_path):
    """MAD on hand-built quantities: [1,2,3,8] -> median 2 (lower), devs
    [1,0,1,6] -> MAD 1; outlier 8 moves stddev but not MAD."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.registry import load_all_queries

    schema = T.StructType(
        [
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_quantity", T.DoubleType()),
        ]
    )
    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 8.0)]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    (r,) = load_all_queries()["q_agg_mad"].fn(spark, str(tmp_path)).collect()
    assert (r["median_qty"], r["mad_qty"], r["n_rows"]) == (2, 1, 4)


def test_streaks_gaps_and_islands(spark, tmp_path):
    """Days {0,1,2, 6,7} -> longest streak 3 starting day 0; multiple
    events on one day collapse; tie prefers the earliest start."""
    from datetime import datetime

    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.registry import load_all_queries

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    rows = [
        (i, datetime(2024, 1, 1 + d, h, 0, 0), 1, "view", 0.0, "{}")
        for i, (d, h) in enumerate([(0, 1), (0, 9), (1, 2), (2, 3), (6, 4), (7, 5)])
    ]
    # user 2: two equal-length streaks {0,1} and {3,4} -> earliest wins
    rows += [
        (100 + i, datetime(2024, 1, 1 + d, 0, 0, 0), 2, "view", 0.0, "{}")
        for i, d in enumerate([0, 1, 3, 4])
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        r["user_id"]: (r["longest_streak_days"], r["streak_start_day"])
        for r in load_all_queries()["q_events_streaks"].fn(spark, str(tmp_path)).collect()
    }
    base_day = got[1][1]  # epoch-day of 2024-01-01
    assert got[1] == (3, base_day)
    assert got[2] == (2, base_day)


def test_pagerank_integer_rounds_hand_computed(spark, tmp_path):
    """3-round integer PageRank on a hand-built 3-node path graph
    (orders {1,2} and {2,3} -> edges 1-2, 2-3): the center node must
    outrank the leaves, and scores must equal the sequential integer
    recurrence exactly."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.registry import load_all_queries

    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
        ]
    )
    rows = [(100, 1), (100, 2), (200, 2), (200, 3)]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    got = {
        r["part_key"]: (r["rk"], r["s_ppm"])
        for r in load_all_queries()["q_graph_pagerank"].fn(spark, str(tmp_path)).collect()
    }
    # sequential reference: edges 1<->2, 2<->3; deg = {1:1, 2:2, 3:1}
    deg = {1: 1, 2: 2, 3: 1}
    nbrs = {1: [2], 2: [1, 3], 3: [2]}
    s = {n: 1_000_000 for n in deg}
    for _ in range(3):
        give = {n: s[n] // deg[n] for n in deg}
        s = {
            n: 150_000 + (850_000 * sum(give[u] for u in nbrs[n])) // 1_000_000
            for n in deg
        }
    assert got[2][1] == s[2] and got[1][1] == s[1] and got[3][1] == s[3]
    assert got[2][0] == 1  # center node ranks first


def test_triangles_hand_computed(spark, tmp_path):
    """K4 minus one edge on parts {1,2,3,4}: edges {12,13,14,23,24} ->
    wedges over middles, exactly 2 triangles (123, 124)."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.registry import load_all_queries

    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
        ]
    )
    # orders realize exactly the edge set {12,13,14,23,24} (no 34)
    rows = (
        [(1, 1), (1, 2)]  # 12
        + [(2, 1), (2, 3)]  # 13
        + [(3, 1), (3, 4)]  # 14
        + [(4, 2), (4, 3)]  # 23
        + [(5, 2), (5, 4)]  # 24
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    (r,) = load_all_queries()["q_graph_triangles"].fn(spark, str(tmp_path)).collect()
    assert (r["n_edges"], r["n_triangles"]) == (5, 2)


def test_wav_codec_roundtrip():
    """encode_wav -> decode_wav is the identity on rate/channels/samples;
    malformed inputs raise ValueError; stats are exact integers."""
    import pytest

    from mapreduce_framework_api_spark.functions.wavcodec import (
        decode_wav,
        encode_wav,
        pcm_stats,
    )

    samples = [0, 100, -100, 32767, -32768, 5, -5, 12]
    wav = encode_wav(8000, 2, samples)
    rate, nch, got = decode_wav(wav)
    assert (rate, nch, got) == (8000, 2, samples)
    nf, dur, peak, energy = pcm_stats(got, nch, rate)
    assert nf == 4 and dur == 0 and peak == 32768
    assert energy == sum(s * s for s in samples)
    with pytest.raises(ValueError):
        decode_wav(b"not riff at all")
    with pytest.raises(ValueError):
        decode_wav(wav[:20])  # truncated chunk
    with pytest.raises(ValueError):
        encode_wav(8000, 3, samples)  # not frame-aligned


def test_multimodal_audio_real_codec_end_to_end(spark):
    """fake=False audio lane through Spark: WAV payloads decode to exact
    integer PCM stats; a corrupt payload degrades to nulls, not a crash."""
    from mapreduce_framework_api_spark.functions.wavcodec import encode_wav
    from mapreduce_framework_api_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    def mk(i):
        samples = [((j * 37 + i * 11) % 2001) - 1000 for j in range(80 * (i + 1))]
        return encode_wav(8000, 1, samples), samples

    payloads = {i: mk(i) for i in range(3)}
    rows = [
        (i, "audio", payloads[i][0], (None, None, "unit")) for i in range(3)
    ] + [(99, "audio", b"corrupt bytes", (None, None, "unit"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["doc_id"]: r for r in extract_audio_features(media).collect()}
    assert len(feats) == 4
    for i in range(3):
        r, samples = feats[i], payloads[i][1]
        assert r["sample_rate"] == 8000 and r["n_channels"] == 1
        assert r["n_frames"] == len(samples)
        assert r["duration_ms"] == len(samples) * 1000 // 8000
        assert r["peak_abs"] == max(abs(s) for s in samples)
        assert r["energy"] == sum(s * s for s in samples)
    assert feats[99]["sample_rate"] is None and feats[99]["energy"] is None
    # the fake lane preserves schema and nullability without any codec
    fake = extract_audio_features(media, fake=True)
    assert fake.schema == extract_audio_features(media).schema
    assert fake.count() == 4


def test_avi_codec_roundtrip():
    """encode_avi -> decode_avi is the identity on geometry/fps/frames —
    which pins the real DIB framing work (bottom-up row flip, BGR swap,
    4-byte row stride) since any of those dropped would corrupt the
    round-trip on a non-aligned width; malformed and non-canonical
    inputs raise ValueError."""
    import pytest

    from mapreduce_framework_api_spark.functions.avicodec import (
        decode_avi,
        encode_avi,
    )

    # width 3 -> 9-byte rows padded to 12: stride handling is live
    frames = [bytes((f * 91 + i * 57) % 256 for i in range(3 * 2 * 3)) for f in range(4)]
    avi = encode_avi(3, 2, 25, frames)
    w, h, fps, got = decode_avi(avi)
    assert (w, h, fps) == (3, 2, 25)
    assert got == frames
    # empty video: headers only, zero frames
    assert decode_avi(encode_avi(2, 2, 10, []))[3] == []
    with pytest.raises(ValueError):
        decode_avi(b"not riff at all")
    with pytest.raises(ValueError):
        # cut mid-frame-chunk (a clean cut at a chunk boundary is a
        # legal zero-frame video; mid-chunk must refuse)
        decode_avi(avi[: avi.index(b"00db") + 10])
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")  # RIFF but not AVI
    with pytest.raises(ValueError):
        encode_avi(3, 2, 25, [b"\x00" * 5])  # frame/geometry mismatch
    # geometry-mismatched frame chunk inside a well-formed container:
    # splice a frame from a 2x2 stream into a 3x2 header's movi list
    other = encode_avi(2, 2, 25, [bytes(12)])
    assert other != avi
    with pytest.raises(ValueError):
        frame_pos = other.index(b"00db")
        bad = avi[: avi.index(b"00db")] + other[frame_pos:]
        # re-fix the RIFF size so only the frame size is wrong
        import struct

        bad = bad[:4] + struct.pack("<I", len(bad) - 8) + bad[8:]
        decode_avi(bad)


def test_multimodal_video_real_codec_end_to_end(spark):
    """fake=False video lane through Spark: AVI payloads demux to the
    exact RGB24 frames at the every_n cadence; a corrupt payload
    contributes zero frame rows, not a crash; frame_luma_stats matches
    a pure-Python recomputation."""
    from mapreduce_framework_api_spark.functions.avicodec import encode_avi
    from mapreduce_framework_api_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        frame_luma_stats,
        frame_sample,
    )

    def mk(i, nf):
        frames = [
            bytes((i * 7 + f * 23 + j * 13) % 256 for j in range(4 * 3 * 3))
            for f in range(nf)
        ]
        return encode_avi(4, 3, 10, frames), frames

    payloads = {i: mk(i, nf) for i, nf in [(0, 1), (1, 5), (2, 6)]}
    rows = [
        (i, "video", payloads[i][0], (None, None, "unit")) for i in payloads
    ] + [(99, "video", b"corrupt bytes", (None, None, "unit"))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames_df = frame_sample(media, every_n=2, fake=False)
    got = {
        (r["doc_id"], r["frame_idx"]): bytes(r["frame"])
        for r in frames_df.collect()
    }
    expect = {
        (i, f): payloads[i][1][f]
        for i in payloads
        for f in range(0, len(payloads[i][1]), 2)
    }
    assert got == expect  # exact content, exact sampling cadence
    assert not any(k[0] == 99 for k in got)  # dirty payload dropped
    # luma stats agree with a pure-Python mirror on one known frame
    stats = {
        (r["doc_id"], r["frame_idx"]): r for r in frame_luma_stats(frames_df).collect()
    }
    pxs = [expect[(1, 2)][k : k + 3] for k in range(0, len(expect[(1, 2)]), 3)]
    lumas = [(299 * p[0] + 587 * p[1] + 114 * p[2]) // 1000 for p in pxs]
    r = stats[(1, 2)]
    assert r["n_px"] == len(lumas)
    assert r["luma_sum"] == sum(lumas)
    assert r["dark"] == sum(1 for v in lumas if v // 16 == 0)
    assert r["bright"] == sum(1 for v in lumas if v // 16 == 15)


def test_round5_queries_on_empty_tables(spark, tmp_path):
    """Round-5 queries on EMPTY inputs: no crash, zero rows — except the
    profiler, which still emits its 5-row report (null min/max), and the
    ANN tiers, whose empty-seed guard returns an empty typed frame
    (np.stack on an empty codebook/quantizer seed used to raise)."""
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.registry import load_all_queries

    schemas = {
        "events": (
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        ),
        "documents": "doc_id long, text string, lang string, source string, n_chars long",
        "lineitem": (
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp"
        ),
        "orders": (
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
        ),
        "customer": (
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
            "c_mktsegment string"
        ),
        "part": (
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double"
        ),
        "embeddings": "vec_id long, embedding array<float>, label int",
    }
    for name, schema in schemas.items():
        spark.createDataFrame([], schema).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/{name}.parquet"
        )
    qs = load_all_queries()
    zero_rows = (
        "q_dim_scd2", "q_merge_upsert", "q_events_interpolate",
        "q_text_inverted_index", "q_graph_bfs", "q_sim_pq_topk",
        "q_sim_ivf_topk", "q_mv_incremental", "q_join_temporal",
        "q_events_autocorr", "q_join_fuzzy", "q_text_bpe_merges",
        "q_fn_map", "q_sim_ann_lsh", "q_sim_cosine_topk",
        "q_sim_search_split", "q_sim_maxsim_topk", "q_dedup_embedding",
    )
    for name in zero_rows:
        assert qs[name].fn(spark, str(tmp_path)).count() == 0, name
    assert qs["q_profile_columns"].fn(spark, str(tmp_path)).count() == 5


def test_pit_join_matches_exactly_one_version(spark):
    """q_join_temporal's contract: every purchase event matches EXACTLY
    one SCD2 dimension version (validity intervals partition each user's
    timeline from their first event on, and a purchase implies the user
    has events)."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR

    from mapreduce_framework_api_spark.registry import load_all_queries

    got = load_all_queries()["q_join_temporal"].fn(spark, SF_DIR)
    n_purchases = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert got.count() == n_purchases > 0
    assert got.select("event_id").distinct().count() == n_purchases


def test_pq_ann_recall_beats_chance(spark):
    """ANN quality floor: the PQ tier's top-3 must overlap the EXACT
    integer-dot top-3 far above random chance (the hash-seeded codebook
    is deliberately weak vs k-means — similarity.py documents the swap —
    but a broken encoder/ADC path would collapse recall to the random
    baseline, which this pins). Deterministic data + deterministic
    algorithm => recall is a fixed number, no flake margin needed beyond
    the 5x factor."""
    from pyspark.sql import Window as W, functions as F

    from conftest import SF_DIR

    from mapreduce_framework_api_spark.registry import load_all_queries

    pq = (
        load_all_queries()["q_sim_pq_topk"]
        .fn(spark, SF_DIR)
        .select("query_id", "neighbor_id")
    )
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    from mapreduce_framework_api_spark.operators.similarity import _hash_split

    split = _hash_split("pqsplit")  # the tier's own split — never a copy
    q = e.filter(split).selectExpr("vec_id AS q_id", "embedding AS q_emb")
    x = e.filter(~split)
    dot = F.aggregate(
        F.zip_with(
            F.col("q_emb"),
            F.col("embedding"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = W.partitionBy("q_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    gt = (
        q.crossJoin(x)
        .select("q_id", "vec_id", dot.alias("dot"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("q_id", "vec_id")
    )
    hits = pq.join(
        gt, (pq.query_id == gt.q_id) & (pq.neighbor_id == gt.vec_id)
    ).count()
    total = gt.count()
    n_index = x.count()
    recall = hits / total
    random_baseline = 3 / n_index
    assert recall >= 5 * random_baseline, (recall, random_baseline)


def test_minhash_verified_contains_banded_truth_pairs(spark):
    """Tier-composition contract on the real sf0.001 fixture: the verified
    tier (q_dedup_minhash_verified = banded candidates + exact per-pair
    Jaccard, no df cap) must report every pair that BOTH (a) the exact
    corpus-wide tier reports (q_dedup_ngram_jaccard, whose df-capped
    Jaccard lower-bounds true Jaccard) and (b) MinHash banding surfaces as
    a candidate — and with jaccard >= the capped tier's value. This is the
    algebra that makes candidates-first the safe 100 TB path: verification
    can only ever score a surfaced pair HIGHER than the capped tier."""
    from conftest import SF_DIR

    import mapreduce_framework_api_spark.operators.dedup as dd
    from mapreduce_framework_api_spark.registry import load_all_queries

    qs = load_all_queries()
    truth = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in qs["q_dedup_ngram_jaccard"].fn(spark, SF_DIR).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dd.minhash_candidate_pairs(spark, SF_DIR)
        .select("doc_a", "doc_b")
        .dropDuplicates()
        .collect()
    }
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in qs["q_dedup_minhash_verified"].fn(spark, SF_DIR).collect()
    }
    surfaced_truth = {p: j for p, j in truth.items() if p in cand}
    assert surfaced_truth, "fixture must exercise the overlap"
    for p, capped_j in surfaced_truth.items():
        assert p in verified, p
        assert verified[p] >= capped_j - 0.011, (p, verified[p], capped_j)
    # and the verified tier never invents pairs outside the candidate set
    assert set(verified) <= cand


def test_knn_classify_recovers_clustered_labels(spark, tmp_path):
    """The sf fixtures carry geometry-independent labels (measured accuracy
    ~= chance), so they exercise q_sim_knn_classify's arithmetic but not
    its semantics. Synthetic two-cluster corpus: labels follow geometry, so
    every hash-split query must be predicted into its own cluster with a
    unanimous 5-0 vote."""
    import numpy as np
    from pyspark.sql import types as T

    from mapreduce_framework_api_spark.registry import load_all_queries

    rows = []  # deterministic: id-indexed offsets, no RNG
    for i in range(40):
        cluster = 0 if i < 20 else 1
        base = np.zeros(64, dtype=np.float32)
        # clusters live on orthogonal axes; small deterministic jitter
        base[cluster] = 1.0
        base[2 + (i % 7)] = 0.01 * (1 + i % 5)
        rows.append((i, [float(x) for x in base], cluster))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = load_all_queries()["q_sim_knn_classify"].fn(spark, str(tmp_path)).collect()
    assert out, "hash split must surface at least one query"
    for r in out:
        assert r["pred_label"] == r["true_label"], dict(r.asDict())
        assert r["votes"] == 5, dict(r.asDict())


def test_rowwise_topk_matches_lexsort_reference():
    """_rowwise_topk (the vectorized in-kernel top-k) must reproduce the
    per-row np.lexsort((ids, -s)) loop exactly — including duplicate
    scores (tie -> ascending id), int64 score matrices, k > n_cols, and
    self-exclusion — since every similarity kernel's tie-break contract
    is pinned to that reference order."""
    import numpy as np

    from mapreduce_framework_api_spark.operators.similarity import _rowwise_topk

    def reference(s, ids, k, q_ids=None):
        out = []
        for row in range(s.shape[0]):
            if q_ids is not None:
                mask = ids != q_ids[row]
                cand_ids, cand_s = ids[mask], s[row][mask]
            else:
                cand_ids, cand_s = ids, s[row]
            order = np.lexsort((cand_ids, -cand_s))[:k]
            out.extend((row, cand_ids[j], cand_s[j]) for j in order)
        return out

    # deterministic pseudo-random matrix with MANY exact ties (values
    # quantized to 5 levels) and shuffled, duplicate-free ids
    nq, ni = 13, 29
    s = np.array(
        [[((7 * i + 11 * j) % 5) * 0.25 for j in range(ni)] for i in range(nq)],
        dtype=np.float64,
    )
    ids = np.array([(17 * j + 3) % 97 for j in range(ni)], dtype=np.int64)
    assert len(set(ids.tolist())) == ni
    for k in (1, 3, ni, ni + 5):
        got = list(zip(*_rowwise_topk(s, ids, k)))
        assert [tuple(map(float, g)) for g in got] == [
            tuple(map(float, r)) for r in reference(s, ids, k)
        ], k
    # int64 scores
    si = (s * 4).astype(np.int64)
    got = list(zip(*_rowwise_topk(si, ids, 4)))
    assert [tuple(map(int, g)) for g in got] == [
        tuple(map(int, r)) for r in reference(si, ids, 4)
    ]
    # self-exclusion: row r's own id is ids[r]
    q_ids = ids[:nq].copy()
    got = list(zip(*_rowwise_topk(s, ids, 3, q_ids=q_ids)))
    ref = reference(s, ids, 3, q_ids=q_ids)
    assert [tuple(map(float, g)) for g in got] == [tuple(map(float, r)) for r in ref]
    assert all(g[1] != q_ids[int(g[0])] for g in got)


def test_incremental_dedup_flags_exact_copy_of_corpus_doc(spark, tmp_path):
    """q_dedup_incremental semantics on a constructed corpus: a new-batch
    document that exactly copies a corpus document must be flagged against
    it with est_jaccard 1.0 (identical shingle sets => identical minhash
    signatures => every band collides), and unrelated new docs must flag
    nothing. doc_ids are chosen on both sides of the md5 'incsplit' hash
    split, so the test constructs its own split membership instead of
    hoping the fixture provides one."""
    import hashlib

    from mapreduce_framework_api_spark.registry import load_all_queries

    def is_new(doc_id: int) -> bool:
        return hashlib.md5(f"incsplit#{doc_id}".encode()).hexdigest()[0] < "2"

    new_ids = [i for i in range(200) if is_new(i)]
    corpus_ids = [i for i in range(200) if not is_new(i)]
    assert len(new_ids) >= 2 and len(corpus_ids) >= 2
    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(corpus_ids[0], dup_text)]
    rows += [
        (cid, f"corpus filler document number {cid} with distinct tail {cid}")
        for cid in corpus_ids[1:3]
    ]
    rows.append((new_ids[0], dup_text))  # exact copy -> must be flagged
    rows.append((new_ids[1], "entirely unrelated new content with no overlap"))
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn("n_chars", F.length("text"))
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    out = load_all_queries()["q_dedup_incremental"].fn(spark, str(tmp_path)).collect()
    flagged = {(r["new_id"], r["corpus_id"]): r["est_jaccard"] for r in out}
    assert flagged == {(new_ids[0], corpus_ids[0]): 1.0}, flagged


def test_shingle_fallback_matches_oracle_on_short_docs(spark, tmp_path):
    """The <k-token shingle fallback: the jaccard-family kernel must use
    the NORMALIZED token join (matching its oracles' array_to_string(toks,
    ' ')), not the raw text — for 'alpha, beta' vs 'alpha beta' the raw
    fallback would hash different shingles on the two engines and the
    differential check would miss a jaccard-1.0 pair. The fixtures carry
    no sub-3-token doc, so this path is pinned here with a constructed
    corpus, run through BOTH engines via the registered oracle."""
    import duckdb

    import mapreduce_framework_api_spark.operators.dedup as dd
    from mapreduce_framework_api_spark.registry import load_all_queries

    docs = [
        (0, "alpha, beta"),   # punctuation differs from token join
        (1, "alpha beta"),    # same tokens -> identical fallback shingle
        (2, "gamma delta!!"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    doc_pq = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(doc_pq)

    dd._JACCARD_PAIR_CACHE.clear()
    try:
        got = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dd.jaccard_dup_pairs(spark, str(tmp_path)).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_pq}/*.parquet')"
        )
        oracle_sql = load_all_queries()["q_dedup_ngram_jaccard"].oracle
        want = {tuple(r) for r in con.execute(oracle_sql).fetchall()}
        assert got == want
        assert (0, 1, 1.0) in got  # the pair the raw-text fallback would drop
    finally:
        dd._JACCARD_PAIR_CACHE.clear()


def test_edge_corpus_zero_token_docs_agree_across_engines():
    """Regression for the round-6 zero-token divergences: on a corpus with
    empty / whitespace-only / punctuation-only documents, the jaccard
    family must EXCLUDE token-empty docs on both engines (DuckDB's
    array_to_string([], ' ') is NULL and never joins; the kernel now
    mirrors that with an empty shingle set) and the simhash tier must
    INCLUDE them with the defined zero signature on both engines (the
    oracle's bare GROUP BY used to drop them). Runs the previously
    divergent queries through the full differential checker on the
    adversarial corpus built by tools/edge_corpus.py."""
    import subprocess
    import sys as _sys

    import tools.edge_corpus as ec

    dst = ec.build()
    out = subprocess.run(
        [
            _sys.executable,
            "tools/check_oracle.py",
            dst,
            "q_dedup_ngram_jaccard",
            "q_dedup_simhash",
            "q_dedup_clusters",
            "q_dedup_minhash_verified",
            # events-side regressions: the 1e12-valued edge event
            # overflowed int64 z-score products (q_events_anomaly) and
            # Decimal(12,2) value casts (gapfill/interpolate) before the
            # round-6 widenings.
            "q_events_anomaly",
            "q_events_gapfill",
            "q_events_interpolate",
            # null-row regressions: NULL text / NULL event_type / NULL
            # value rows exposed the constant-series autocorr division,
            # engine-divergent NULL ordering in rank windows, and NULL
            # window arithmetic in the budget fill.
            "q_events_autocorr",
            "q_pipe_quantile_norm",
            "q_pipe_token_budget",
            "q_stream_topk_windowed",
            "q_dedup_minhash",
            "q_dedup_incremental",
            # exact-duplicate-vector tie stress + the contract-maximal
            # norm ratio (1e9) across the integer-exact tiers
            "q_sim_cosine_topk",
            "q_sim_ivf_topk",
            "q_sim_knn_classify",
            # relational null/degenerate regressions: measure-complete
            # moment contracts (stats/corr/mode/weighted_median/
            # winsorized), null-time asof exclusion, wedge-free graph
            # COALESCE, and the type-aligned lateral decorrelation pin
            "q_agg_stats",
            "q_agg_mode",
            "q_join_asof",
            "q_join_lateral_topn",
            "q_graph_triangles",
            # round-7 additions: truncation-dup blocking/verification on
            # the engineered head-collision trio, and the power-law fit
            # over the tiny adversarial vocabulary
            "q_dedup_prefix",
            "q_dedup_prefix_incremental",
            "q_text_zipf",
            # round-8 addition: asymmetric containment over the same
            # engineered corpus (the 11-in-12 truncation is a containment
            # pair; zero-token and NULL-text docs stay out of contract)
            "q_dedup_containment",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=400,
    )
    assert "0 FAIL" in out.stdout and "25 ok" in out.stdout, out.stdout[-2000:]


def test_prefix_dup_detects_truncation_and_rejects_head_collision(spark):
    """q_dedup_prefix on the adversarial corpus: doc 11 is a strict prefix
    of doc 12 (must pair); doc 13 shares the exact 40-char blocking head
    with both but diverges after it (must survive blocking and die in the
    full-prefix verification); NULL-text and sub-40-char docs are out of
    contract and must not appear."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    import tools.edge_corpus as ec

    dst = ec.build()
    rows = load_all_queries()["q_dedup_prefix"].fn(spark, dst).collect()
    pairs = {(r["doc_trunc"], r["doc_full"]) for r in rows}
    assert (11, 12) in pairs
    assert (11, 13) not in pairs and (12, 13) not in pairs and (13, 12) not in pairs
    by_pair = {(r["doc_trunc"], r["doc_full"]): r for r in rows}
    r = by_pair[(11, 12)]
    assert r["len_trunc"] < r["len_full"]
    assert all(t != 10 and f != 10 for t, f in pairs)  # NULL-text doc


def test_zipf_fit_is_sane_on_fixture(spark):
    """q_text_zipf at sf0.001: a natural-ish corpus must fit a negative
    slope with r2 in [0, 1], and the top-1000 head can't carry more than
    the whole corpus."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    row = (
        load_all_queries()["q_text_zipf"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()[0]
    )
    assert row["n_types"] > 0 and row["n_tokens"] >= row["n_types"]
    assert row["zipf_slope"] < 0
    assert 0.0 <= row["zipf_r2"] <= 1.0
    assert 0.0 < row["head_share"] <= 1.0


def test_session_cache_key_tracks_fixture_regeneration(spark, tmp_path):
    """The staleness guard behind every session cache (round-6 advice on
    the BPE trainer cache, generalized): regenerating a fixture IN PLACE
    within one Spark application must change the cache key, so cached
    artifacts (wordcount table, dedup pair tables, graph adjacency, sim
    tier outputs) rebuild instead of serving stale results."""
    import shutil

    from conftest import SF_DIR

    from mapreduce_framework_api_spark.operators.text import (
        _WORDCOUNT_CACHE,
        corpus_wordcount,
    )
    from mapreduce_framework_api_spark.sources import session_cache_key

    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    src = f"{SF_DIR}/documents.parquet"
    dst = f"{sf}/documents.parquet"
    shutil.copy(src, dst)
    k1 = session_cache_key(spark, sf, "documents")
    n1 = corpus_wordcount(spark, sf).count()
    assert k1 in _WORDCOUNT_CACHE
    # regenerate in place: same path, new bytes/mtime
    import os as _os
    import time as _time

    _time.sleep(0.01)
    _os.utime(dst)  # any rewrite bumps mtime_ns; utime models it exactly
    k2 = session_cache_key(spark, sf, "documents")
    assert k2 != k1, "fingerprint must change when the fixture is rewritten"
    n2 = corpus_wordcount(spark, sf).count()
    assert n2 == n1  # same content -> same counts, via a REBUILT artifact
    assert k2 in _WORDCOUNT_CACHE


def test_containment_catches_inclusion_jaccard_misses(spark):
    """q_dedup_containment on the adversarial corpus: doc 11 is a literal
    prefix of doc 12, so every trigram of 11 appears in 12 — containment
    is exactly 1.0 with 11 as the contained (smaller) side; the
    head-collision doc 13 diverges after the shared 40 chars and must not
    pair at the 0.8 bar; NULL-text and zero-token docs never appear. The
    carried jaccard column is <= containment by construction (|∪| >=
    min), which is the tier's whole reason to exist."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    import tools.edge_corpus as ec

    dst = ec.build()
    rows = load_all_queries()["q_dedup_containment"].fn(spark, dst).collect()
    by_pair = {(r["doc_contained"], r["doc_container"]): r for r in rows}
    assert (11, 12) in by_pair
    assert by_pair[(11, 12)]["containment"] == 1.0
    assert all(13 not in p for p in by_pair)
    assert all(10 not in p for p in by_pair)
    for r in rows:
        assert r["jaccard"] <= r["containment"] + 1e-9, r
    # The planted mid-fragment inclusion: containment 1.0 at jaccard ~0.08
    # — invisible to the symmetric tier (0.08 << 0.5) and to the prefix
    # tier (not a head truncation); THE row this tier exists for.
    assert (15, 14) in by_pair
    r = by_pair[(15, 14)]
    assert r["containment"] == 1.0 and r["jaccard"] < 0.5, r
    jac = load_all_queries()["q_dedup_ngram_jaccard"].fn(spark, dst).collect()
    assert all({r["doc_a"], r["doc_b"]} != {14, 15} for r in jac)


def test_containment_est_recall_flags_banding_blind_spot(spark):
    """The honesty receipt for the banded containment estimate: the
    planted low-Jaccard inclusion (15-in-14, est-jaccard ~0.07) almost
    surely shares no band, so the estimate tier MISSES it and the recall
    instrument reads strictly below 10000 on the adversarial corpus —
    exactly the signal that tells a deployment to switch the hash family
    (bottom-k / LSH-Ensemble) before trusting the cheap tier at scale."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    import tools.edge_corpus as ec

    dst = ec.build()
    est = load_all_queries()["q_dedup_containment_est"].fn(spark, dst).collect()
    assert all({r["doc_contained"], r["doc_container"]} != {14, 15} for r in est)
    (row,) = load_all_queries()["q_dedup_containment_est_recall"].fn(spark, dst).collect()
    assert row["recall_x10000"] < 10000, row
    assert row["n_truth"] >= 2 and row["n_hit"] >= 1, row


def test_containment_bk_closes_banding_blind_spot(spark):
    """The round-9 counterpart to the est-tier honesty receipt: the
    bottom-k sketch tier is containment-NATIVE (any of the container's
    bottom-k hashes landing in the fragment is shared by both sketches),
    so the planted mid-fragment inclusion (15-in-14, jaccard ~0.08) that
    resemblance banding almost surely misses MUST surface here, with the
    exact-inclusion estimate 1.0 (every sampled element of the fragment
    is in the container). The recall instrument must read full recall on
    the adversarial corpus — strictly above the est tier's 5000 — which
    is the measured case for switching hash families at scale."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    import tools.edge_corpus as ec

    dst = ec.build()
    rows = load_all_queries()["q_dedup_containment_bk"].fn(spark, dst).collect()
    by_pair = {(r["doc_contained"], r["doc_container"]): r for r in rows}
    assert (15, 14) in by_pair, by_pair
    assert by_pair[(15, 14)]["est_containment"] == 1.0
    (row,) = (
        load_all_queries()["q_dedup_containment_bk_recall"].fn(spark, dst).collect()
    )
    assert row["recall_x10000"] == 10000, row
    (est_row,) = (
        load_all_queries()["q_dedup_containment_est_recall"].fn(spark, dst).collect()
    )
    assert row["recall_x10000"] > est_row["recall_x10000"], (row, est_row)


def test_containment_bk_precision_receipt(spark):
    """The round-10 precision twin (VERDICT r9 task 1): verified count is
    a subset count of the candidate count, precision_x10000 is their
    exact floor ratio, and — on the adversarial corpus, where the bk
    recall twin reads full recall and every planted candidate is a true
    inclusion over uncapped shingle sets — the verified tier must KEEP
    the planted (15, 14) fragment pair at containment 1.0."""
    from mapreduce_framework_api_spark.operators.dedup import (
        bk_verified_containment,
    )
    from mapreduce_framework_api_spark.registry import load_all_queries

    import tools.edge_corpus as ec

    dst = ec.build()
    q = load_all_queries()
    cand = q["q_dedup_containment_bk"].fn(spark, dst).collect()
    ver = bk_verified_containment(spark, dst).collect()
    (row,) = q["q_dedup_containment_bk_precision"].fn(spark, dst).collect()
    assert row["n_candidates"] == len(cand)
    assert row["n_verified"] == len(ver) <= len(cand)
    assert row["precision_x10000"] == (
        len(ver) * 10000 // max(len(cand), 1)
    ), row
    by_pair = {(r["doc_contained"], r["doc_container"]): r for r in ver}
    assert (15, 14) in by_pair and by_pair[(15, 14)]["containment"] == 1.0


def test_incremental_ingest_carries_containment_estimate(spark):
    """The ingest lane's round-8 containment column: for every emitted
    pair the estimate is >= est_jaccard (algebraically: (na+nb)/min >= 2
    and 1/(1+j) >= 1/2), capped at 1.0, and NULL exactly when a side's
    shingle set is empty — never NaN, never a Spark/DuckDB divide
    divergence."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    rows = (
        load_all_queries()["q_dedup_incremental"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    for r in rows:
        if r["est_containment"] is not None:
            assert r["est_jaccard"] - 0.01 <= r["est_containment"] <= 1.0, r


def test_sampled_truth_equals_filtered_full_tier(spark):
    """The two sources of the sampled recall truth must be bit-identical:
    the standalone |sample| x corpus grid build (the production path the
    sf1 receipts measure) and the filter over the session-cached full
    exact tier (the free path when q_sim_cosine_topk already ran). Rank
    independence is the claimed invariant; this pins it on the fixtures."""
    from conftest import SF_DIR

    from mapreduce_framework_api_spark.operators.similarity import (
        exact_topk_sampled,
        q_sim_cosine_topk,
    )
    from mapreduce_framework_api_spark.session import clear_session_caches

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    clear_session_caches()
    try:
        standalone = canon(exact_topk_sampled(spark, SF_DIR))
        clear_session_caches()
        q_sim_cosine_topk(spark, SF_DIR).count()  # materialize the full tier
        via_filter = canon(exact_topk_sampled(spark, SF_DIR))
        assert standalone == via_filter
        assert standalone, "sample must be non-empty on the fixture"
    finally:
        clear_session_caches()


def test_bk_verified_containment_recovers_exact_tier(spark):
    """The precision lever over the bottom-k candidates: exact rescoring
    must reproduce the exact containment tier's pair set EXACTLY wherever
    bk recall is 1.0 (pinned on both the adversarial corpus, where the
    recall twin reads 10000/10000, and the sf0.001 fixture) — candidates
    in, exact support out, at cost ∝ |candidates|."""
    from mapreduce_framework_api_spark.operators.dedup import (
        bk_verified_containment,
        q_dedup_containment,
    )

    import tools.edge_corpus as ec

    for sf_dir in (ec.build(), "/root/testdata/sf0.001"):
        exact = sorted(
            tuple(r) for r in q_dedup_containment(spark, sf_dir)
            .select("doc_contained", "doc_container", "containment").collect()
        )
        verified = sorted(
            tuple(r) for r in bk_verified_containment(spark, sf_dir).collect()
        )
        assert verified == exact, sf_dir


def test_ivf_nprobe_env_knob_is_validated(monkeypatch):
    """SPARK_GRAFT_IVF_NPROBE=0 used to make the probe slice EMPTY —
    q_sim_ivf_topk silently returned zero rows — and a non-integer raised
    an opaque plan-build error; both must now fail fast with named
    errors, and valid values pass through."""
    from mapreduce_framework_api_spark.operators import similarity

    monkeypatch.delenv("SPARK_GRAFT_IVF_NPROBE", raising=False)
    assert similarity._ivf_nprobe() == similarity._IVF_NPROBE
    monkeypatch.setenv("SPARK_GRAFT_IVF_NPROBE", "4")
    assert similarity._ivf_nprobe() == 4
    for bad in ("0", "-1", str(similarity._IVF_K + 1)):
        monkeypatch.setenv("SPARK_GRAFT_IVF_NPROBE", bad)
        with pytest.raises(ValueError, match="SPARK_GRAFT_IVF_NPROBE"):
            similarity._ivf_nprobe()
    monkeypatch.setenv("SPARK_GRAFT_IVF_NPROBE", "two")
    with pytest.raises(ValueError, match="must be an integer"):
        similarity._ivf_nprobe()


def test_hq_nprobe_env_knob_is_validated(monkeypatch):
    """The HQ operating point's sweep knob (SPARK_GRAFT_IVFPQ_HQ_NPROBE)
    carries the same fail-fast contract as the IVF knob: out-of-range
    and non-integer values raise named errors, unset returns the
    shipped default the registered oracle is pinned to."""
    from mapreduce_framework_api_spark.operators import similarity

    monkeypatch.delenv("SPARK_GRAFT_IVFPQ_HQ_NPROBE", raising=False)
    assert similarity._hq_nprobe() == similarity._HQ_NPROBE
    monkeypatch.setenv("SPARK_GRAFT_IVFPQ_HQ_NPROBE", "8")
    assert similarity._hq_nprobe() == 8
    for bad in ("0", "-1", str(similarity._IVF_K + 1)):
        monkeypatch.setenv("SPARK_GRAFT_IVFPQ_HQ_NPROBE", bad)
        with pytest.raises(ValueError, match="SPARK_GRAFT_IVFPQ_HQ_NPROBE"):
            similarity._hq_nprobe()
    monkeypatch.setenv("SPARK_GRAFT_IVFPQ_HQ_NPROBE", "four")
    with pytest.raises(ValueError, match="must be an integer"):
        similarity._hq_nprobe()


# Per-tier recall/precision FLOOR PINS (VERDICT r10 task 8 / r11 stretch):
# every registered quality instrument, pinned at a conservative sf0.01
# floor ~60-70% of its observed value — loose enough to survive a fixture
# regeneration (the metrics are hash-deterministic but fixture-dependent),
# tight enough that a refactor silently HALVING a tier's recall goes red.
# Observed sf0.01 values (round 12): bk_precision 9259, bk_recall 10000,
# est_recall 10000, minhash 10000, semdedup 3142 (isotropic operating
# point — documented), planted 10000, simhash 4800, ivf 3043, lsh 5915,
# pq 1145.
_RECALL_FLOORS = [
    ("q_dedup_containment_bk_precision", "precision_x10000", 8500),
    ("q_dedup_containment_bk_recall", "recall_x10000", 9500),
    ("q_dedup_containment_est_recall", "recall_x10000", 9500),
    ("q_dedup_minhash_recall", "recall_x10000", 9500),
    ("q_dedup_semdedup_recall", "recall_x10000", 2000),
    ("q_dedup_semdedup_recall_planted", "recall_x10000", 9500),
    ("q_dedup_simhash_recall", "recall_x10000", 3000),
    ("q_sim_ivf_recall", "recall_x10000", 2000),
    ("q_sim_lsh_recall", "recall_x10000", 4000),
    ("q_sim_pq_recall", "recall_x10000", 700),
    # composed tier: routing loss x quantization loss at the fixture-scale
    # operating point (K=16 seed quantizer, nprobe=2, 16-entry codebook);
    # observed 737
    ("q_sim_ivfpq_recall", "recall_x10000", 400),
    # the high-quality operating point (32 subspaces x 256-entry
    # codebooks, nprobe=4 — the deployable point, r13); observed 4479 at
    # sf0.01 (4611 sf0.001, 4693 sf0.1)
    ("q_sim_ivfpq_hq_recall", "recall_x10000", 3000),
    # two-stage retrieval (HQ ADC shortlist -> exact refine, r13);
    # observed 4690 at sf0.01 (4927 sf0.001, 5160 sf0.1 = the nprobe=4
    # routing ceiling)
    ("q_sim_ivfpq_hq_rerank_recall", "recall_x10000", 3500),
    # corpus-scaled quantizer point (K ~ sqrt(N), nprobe ~ N^(1/4), r14):
    # observed 4743 at sf0.01 (4729 sf0.001, 4199 sf0.1 — recall drifts
    # DOWN as the probed fraction shrinks N^(-1/4); that drift is the
    # instrument's point, the floor only guards against halving)
    ("q_sim_ivfpq_scaled_recall", "recall_x10000", 3000),
    # hybrid (pre-filtered) search vs the FILTERED exact truth (r14):
    # observed 4347 at sf0.01 (4479 sf0.001, 4355 sf0.1)
    ("q_sim_filtered_recall", "recall_x10000", 3000),
    # two-stage retrieval at the CORPUS-SCALED routing point (r15, the
    # 100 TB production shape): observed 4980 at sf0.01 (4914 sf0.001,
    # 4556 sf0.1 — the scaled routing ceiling, quantization loss fully
    # bought back by the exact refine)
    ("q_sim_ivfpq_scaled_rerank_recall", "recall_x10000", 3200),
    # TRAINED quantizer at the scaled operating point (r15 top task —
    # 2 integer Lloyd iterations over the same md5 seeds): observed
    # 5652 at sf0.01 (5955 sf0.001, 4939 sf0.1) vs the untrained
    # scaled point's 4743/4729/4199 — training lifts the routing
    # quality at every scale; the relative >= pin below guards the
    # claim itself, this floor guards against halving
    ("q_sim_ivfpq_trained_recall", "recall_x10000", 4000),
    # trained routing + exact refine — the top of the operating curve
    # (the TRAINED routing ceiling): observed 5968 at sf0.01 (6271
    # sf0.001, 5433 sf0.1 — ABOVE the fixed-K nprobe-4 ceiling 5160)
    ("q_sim_ivfpq_trained_rerank_recall", "recall_x10000", 4200),
    # residual encoding + Lloyd-trained codebook at the HQ cost
    # envelope (r15): observed 4584 at sf0.01 (4795 sf0.001, 4803
    # sf0.1 — above the raw HQ point's 4693, the r14 bar); the
    # relative >= pin below guards the lever's claim
    ("q_sim_ivfpq_residual_recall", "recall_x10000", 3200),
]


@pytest.mark.parametrize("name,col,floor", _RECALL_FLOORS)
def test_quality_instrument_floor(spark, name, col, floor):
    from mapreduce_framework_api_spark.registry import load_all_queries

    row = (
        load_all_queries()[name]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    assert row[col] >= floor, (name, row)


def test_ivf_scaled_knob_formulas(monkeypatch):
    """The corpus-scaled quantizer's operating point is a pair of pure
    functions of N — pin the formulas (K = max(16, ceil(sqrt(N))),
    nprobe = clamp(ceil(sqrt(K)), 4, 16)) and the scale claim itself:
    per-query candidate work nprobe * N/K must grow SUBLINEARLY (a 100x
    corpus costs < 40x per query; the fixed-K tiers cost exactly 100x).
    Also the env-knob fail-fast contract (the _ivf_nprobe recipe)."""
    from mapreduce_framework_api_spark.operators import similarity as s

    monkeypatch.delenv("SPARK_GRAFT_IVF_SCALED_NPROBE", raising=False)
    assert s._ivf_scaled_k(0) == 16
    assert s._ivf_scaled_k(100) == 16       # clamped floor
    assert s._ivf_scaled_k(500) == 23
    assert s._ivf_scaled_k(2000) == 45
    assert s._ivf_scaled_k(1_000_000) == 1000
    assert s._ivf_scaled_nprobe(16) == 4
    assert s._ivf_scaled_nprobe(45) == 7
    assert s._ivf_scaled_nprobe(1000) == 16  # depth-capped
    for n in (2_000, 50_000):
        work = lambda m: s._ivf_scaled_nprobe(s._ivf_scaled_k(m)) * m / s._ivf_scaled_k(m)
        assert work(100 * n) / work(n) < 40, n
    monkeypatch.setenv("SPARK_GRAFT_IVF_SCALED_NPROBE", "9")
    assert s._ivf_scaled_nprobe(45) == 9
    for bad in ("0", str(s._IVF_SCALED_PROBE_DEPTH + 1)):
        monkeypatch.setenv("SPARK_GRAFT_IVF_SCALED_NPROBE", bad)
        with pytest.raises(ValueError, match="SPARK_GRAFT_IVF_SCALED_NPROBE"):
            s._ivf_scaled_nprobe(45)
    monkeypatch.setenv("SPARK_GRAFT_IVF_SCALED_NPROBE", "seven")
    with pytest.raises(ValueError, match="must be an integer"):
        s._ivf_scaled_nprobe(45)


def test_ivfpq_hq_recall_at_least_matches_ivf_tier(spark):
    """The r12 verdict's deployability bar for the composed tier,
    verbatim: the high-quality operating point's recall@3 must be >= the
    plain IVF tier's on the same corpus (q_sim_ivf_recall evaluates IVF
    with exact scoring at its shipped nprobe=2; the HQ composed point
    buys its quantization loss back with nprobe=4). Floors alone can't
    pin a RELATIVE claim, so this compares the two live numbers."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    queries = load_all_queries()
    hq = (
        queries["q_sim_ivfpq_hq_recall"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    ivf = (
        queries["q_sim_ivf_recall"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    assert hq["recall_x10000"] >= ivf["recall_x10000"], (hq, ivf)


def test_scaled_rerank_buys_back_quantization_loss(spark):
    """The refine stage's contract at the scaled operating point (r15):
    recall of routing+ADC+exact-refine must be >= recall of routing+ADC
    alone on the same corpus — the shortlist only has to CONTAIN the
    true neighbors for the refine to surface them, so adding the refine
    can only recover rank inversions, never introduce them (with equal
    shortlist membership; R=16 > k=3 strictly widens it). A relative
    claim, so it compares the two live numbers (the floor pins alone
    cannot express it)."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    queries = load_all_queries()
    rr = (
        queries["q_sim_ivfpq_scaled_rerank_recall"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    adc = (
        queries["q_sim_ivfpq_scaled_recall"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    assert rr["recall_x10000"] >= adc["recall_x10000"], (rr, adc)


def test_trained_quantizer_beats_random_seeds_at_equal_knobs(spark):
    """The r14 verdict's 'done' condition for the trained quantizer,
    verbatim: trained recall >= the scaled point's at equal K and
    nprobe. The two operating points share seeds (same salt), K,
    nprobe, codebooks, and ADC — the ONLY delta is the two integer
    Lloyd iterations, so this comparison isolates the value of
    training itself (observed: +9.1 recall points at sf0.01, +7.4 at
    sf0.1). A relative claim, compared on live numbers."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    queries = load_all_queries()
    tr = (
        queries["q_sim_ivfpq_trained_recall"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    sc = (
        queries["q_sim_ivfpq_scaled_recall"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    assert tr["recall_x10000"] >= sc["recall_x10000"], (tr, sc)


def test_residual_encoding_beats_raw_at_equal_envelope(spark):
    """The r14 verdict's bar for residual PQ, verbatim: the residual
    operating point's recall must be >= the raw HQ point's at the SAME
    cost envelope — same router, same nprobe, same 32x256x2 codebook
    budget, same 32 B/vector; the only deltas are residual encoding
    plus the _RES_CB_ITERS codebook-Lloyd passes (observed: 4584 vs
    4479 at sf0.01, 4803 vs 4693 at sf0.1). Live relative
    comparison."""
    from mapreduce_framework_api_spark.registry import load_all_queries

    queries = load_all_queries()
    res = (
        queries["q_sim_ivfpq_residual_recall"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    raw = (
        queries["q_sim_ivfpq_hq_recall"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
        .asDict()
    )
    assert res["recall_x10000"] >= raw["recall_x10000"], (res, raw)


def test_lloyd_refinement_is_partitioning_invariant(spark):
    """The trainer's exactness claim, asserted directly: the refined
    centroid matrix must be BIT-identical whether the corpus arrives
    in 1 partition or 13 — integer partial sums commute, floor
    division is deterministic, and no FP accumulation order exists
    anywhere in the loop. A trainer that silently accumulated in
    float64 would drift here (and the full oracle would eventually
    catch it at some fixture; this test catches it in one second)."""
    import numpy as np

    from mapreduce_framework_api_spark.operators import similarity as s
    from mapreduce_framework_api_spark.sources import table

    e = table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    seed = s._md5_topk_seed(e, 16, s._IVF_TRAINED_SALT)
    cq0 = np.floor(
        np.stack(seed["embedding"].to_numpy()).astype(np.float64) * s._IVF_SCALE
    ).astype(np.int64)
    one = s._lloyd_refine(spark, e.coalesce(1), cq0, 2)
    many = s._lloyd_refine(spark, e.repartition(13), cq0, 2)
    assert (one == many).all()
    assert not (one == cq0).all()  # training actually moved centroids


def test_index_delete_audit_consistent_with_append_audit(spark):
    """The delete audit's membership columns must agree with the append
    audit's view of the SAME frozen base index: per-cluster n_before ==
    the append audit's n_base (one membership table, two maintenance
    reports), n_after == n_before - n_deleted row-wise, and the
    tombstone slice totals match the delsplit predicate exactly."""
    from mapreduce_framework_api_spark.operators import similarity as s
    from mapreduce_framework_api_spark.registry import load_all_queries
    from mapreduce_framework_api_spark.sources import table

    sf = "/root/testdata/sf0.01"
    qs = load_all_queries()
    dele = {
        r["cluster"]: r.asDict()
        for r in qs["q_sim_index_delete_audit"].fn(spark, sf).collect()
    }
    app = {
        r["cluster"]: r.asDict()
        for r in qs["q_sim_index_append_audit"].fn(spark, sf).collect()
    }
    assert set(dele) <= set(app)
    for c, row in dele.items():
        assert row["n_after"] == row["n_before"] - row["n_deleted"], row
        assert row["n_before"] == app[c]["n_base"], (row, app[c])
    want_deleted = (
        table(spark, sf, "embeddings")
        .filter(~s._hash_split("pqsplit") & s._hash_split("delsplit"))
        .count()
    )
    assert sum(r["n_deleted"] for r in dele.values()) == want_deleted
    # a deleted row carries a code checksum; an untouched list reads 0
    assert all(
        (r["n_deleted"] > 0) or (r["deleted_code_sum"] == 0)
        for r in dele.values()
    )


def test_index_drift_routes_like_the_append_kernel(spark):
    """The drift monitor's pure-JVM top-2 scan must route every arrival
    to the SAME winning list as the Arrow append kernel (one tie rule:
    dot DESC, centroid ASC) — per-cluster n_new equal across the two
    reports — and margins are non-negative by construction with the
    total matching the arrival slice."""
    from mapreduce_framework_api_spark.operators import similarity as s
    from mapreduce_framework_api_spark.registry import load_all_queries
    from mapreduce_framework_api_spark.sources import table

    sf = "/root/testdata/sf0.01"
    qs = load_all_queries()
    drift = {
        r["cluster"]: r.asDict()
        for r in qs["q_sim_index_drift"].fn(spark, sf).collect()
    }
    app = {
        r["cluster"]: r.asDict()
        for r in qs["q_sim_index_append_audit"].fn(spark, sf).collect()
    }
    assert {c: r["n_new"] for c, r in drift.items()} == {
        c: r["n_new"] for c, r in app.items() if r["n_new"] > 0
    }
    n_arrivals = (
        table(spark, sf, "embeddings").filter(s._hash_split("pqsplit")).count()
    )
    assert sum(r["n_new"] for r in drift.values()) == n_arrivals
    for r in drift.values():
        assert r["min_margin"] >= 0, r
        assert r["margin_sum"] >= r["min_margin"] * r["n_new"] >= 0, r


def test_drift_margin_kernel_equals_jvm_path(spark):
    """The two margin implementations — the pure-JVM sort_array top-2
    scan (ivfpq_drift_check, the fixed-K monitor) and the Arrow append
    kernel's margin byproduct (ivfpq_append_check, the scaled monitor's
    source) — must agree ROW-FOR-ROW on a shared quantizer: same
    winner, same exact int64 margin. This is the pin that lets the
    scaled monitor trust the kernel column."""
    from mapreduce_framework_api_spark.operators import similarity as s
    from mapreduce_framework_api_spark.sources import table

    sf = "/root/testdata/sf0.01"
    state = s.frozen_base_state(spark, sf)
    assert state is not None
    cq, cbook = state
    arrivals = (
        table(spark, sf, "embeddings")
        .select("vec_id", "embedding")
        .filter(s._hash_split("pqsplit"))
    )
    jvm = sorted(
        (r["vec_id"], r["cluster"], r["margin"])
        for r in s.ivfpq_drift_check(arrivals, cq).collect()
    )
    kernel = sorted(
        (r["vec_id"], r["cluster"], r["margin"])
        for r in s.ivfpq_append_check(arrivals, cq, cbook).collect()
    )
    assert jvm == kernel
    assert len(jvm) > 0


def test_index_drift_scaled_consistent_with_scaled_router(spark):
    """The scaled drift monitor's report must cover exactly the arrival
    slice under a K ~ sqrt(n_base) quantizer: total n_new == arrivals,
    margins non-negative, and the frozen-base scaled quantizer really
    is bigger than the fixed-K one (the point of the instrument)."""
    from mapreduce_framework_api_spark.operators import similarity as s
    from mapreduce_framework_api_spark.registry import load_all_queries
    from mapreduce_framework_api_spark.sources import table

    sf = "/root/testdata/sf0.01"
    qs = load_all_queries()
    rows = qs["q_sim_index_drift_scaled"].fn(spark, sf).collect()
    n_arrivals = (
        table(spark, sf, "embeddings").filter(s._hash_split("pqsplit")).count()
    )
    assert sum(r["n_new"] for r in rows) == n_arrivals
    assert all(r["min_margin"] >= 0 for r in rows)
    cq = s.scaled_frozen_base_state(spark, sf)
    n_base = (
        table(spark, sf, "embeddings")
        .filter(~s._hash_split("pqsplit"))
        .count()
    )
    assert cq.shape[0] == s._ivf_scaled_k(n_base) > s._IVF_K
    # more lists than the fixed-K monitor => the scaled report spreads
    # over at least as many distinct clusters with the same arrivals
    fixed = qs["q_sim_index_drift"].fn(spark, sf).collect()
    assert len({r["cluster"] for r in rows}) >= 1
    assert sum(r["n_new"] for r in fixed) == n_arrivals
