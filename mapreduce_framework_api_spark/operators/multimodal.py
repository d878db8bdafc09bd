"""Multimodal columns: opaque binary payloads + typed metadata.

Design (north-star): image/audio/video content travels as an opaque
``binary`` column with a typed metadata struct next to it — exactly the
reference's opaque-bytes philosophy (``struct kvpair``, ``mapreduce.h:99``)
lifted into a typed schema. Decode / feature-extract run as Arrow-batched
``mapInPandas`` so each task processes whole record batches; partitioning is
inherited from the scan, so a 100 TB media corpus parallelizes by file
split with zero driver involvement.

Codec status: all three modalities have REAL ``fake=False`` paths via
stdlib-only codecs — ``decode_media``/``resize_media`` decode 8-bit RGB
PNG (``functions/pngcodec.py``), ``extract_audio_features`` parses
RIFF/PCM16 WAV (``functions/wavcodec.py``), and ``frame_sample`` demuxes
uncompressed RIFF/AVI video (``functions/avicodec.py``, round 11). A
production build swaps PIL/soundfile/ffmpeg in behind the identical
dataframe contracts. ``fake=True`` remains the codec-free deterministic
stand-in for the lanes whose registered queries need a SQL mirror of the
payload arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import table

# Schema of a multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("content_md5", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def as_media(docs: DataFrame) -> DataFrame:
    """Lift documents into the multimodal record shape: text bytes stand in
    for an encoded media payload (deterministic; real corpora would read the
    payload from object storage)."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.md5("text").alias("content_md5"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads → per-record features via Arrow-batched mapInPandas.

    ``fake=True`` runs a deterministic stand-in (dimensions and a 16-dim
    byte-histogram feature derived from payload bytes) so the distributed
    plumbing is exercised without any codec. ``fake=False`` runs the REAL
    codec path: payloads are decoded as 8-bit RGB PNG via the stdlib-only
    codec (functions/pngcodec.py — zlib + chunk framing; a production
    build swaps in PIL/libvips behind the same dataframe contract), the
    feature is a 16-bin luminance histogram. Undecodable payloads (wrong
    format, truncated, None) yield null width/height/feature rows instead
    of failing the task — a 100 TB media corpus always contains garbage
    and a decode stage must be dirty-row-tolerant.
    """
    if not fake:

        def _decode_real(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
            import numpy as np
            import pandas as pd

            from mapreduce_framework_api_spark.functions.pngcodec import decode_png

            for pdf in batches:
                widths, heights, feats = [], [], []
                for b in pdf["payload"]:
                    try:
                        w, h, rgb = decode_png(bytes(b))
                    except (ValueError, TypeError, OSError):
                        widths.append(None)
                        heights.append(None)
                        feats.append(None)
                        continue
                    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
                    # integer BT.601-ish luma: deterministic, no FP rounding
                    luma = (
                        299 * px[:, 0].astype(np.int64)
                        + 587 * px[:, 1].astype(np.int64)
                        + 114 * px[:, 2].astype(np.int64)
                    ) // 1000
                    hist = np.bincount(luma // 16, minlength=16)[:16]
                    widths.append(w)
                    heights.append(h)
                    feats.append([float(c) for c in hist])
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "kind": pdf["kind"],
                        "n_bytes": pdf["payload"]
                        .map(lambda b: len(b) if b is not None else 0)
                        .astype("int64"),
                        "width": pd.array(widths, dtype="Int32"),
                        "height": pd.array(heights, dtype="Int32"),
                        "feature": feats,
                    }
                )

        return media.mapInPandas(_decode_real, schema=FEATURE_SCHEMA)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    # fake dimensions derived deterministically from size
                    "width": (n_bytes % 640 + 16).astype("int32"),
                    "height": (n_bytes % 480 + 16).astype("int32"),
                    "feature": payloads.map(
                        lambda b: [float((b or b"").count(bytes([i]))) for i in range(97, 113)]
                    ),
                }
            )
            yield out

    return media.mapInPandas(_decode, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_media(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize every payload to (width, height) via Arrow-batched
    mapInPandas — 1 row in, 1 row out, payload replaced.

    ``fake=True`` substitutes a deterministic byte-stride downsample
    (every k-th byte so the output length is proportional to the target
    area) — same schema, batching and partition inheritance as the real
    kernel. ``fake=False`` is the REAL path: decode 8-bit RGB PNG
    (stdlib codec, functions/pngcodec.py), nearest-neighbor resample,
    re-encode PNG; undecodable payloads yield a null payload row rather
    than failing the task. Either way this is a pure map stage at 100 TB:
    no shuffle, parallelism = scan splits."""
    if not fake:

        def _resize_real(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
            import pandas as pd

            from mapreduce_framework_api_spark.functions.pngcodec import (
                decode_png,
                encode_png,
                resize_rgb_nearest,
            )

            def scale(b):
                try:
                    w, h, rgb = decode_png(bytes(b))
                    return encode_png(
                        width, height, resize_rgb_nearest(w, h, rgb, width, height)
                    )
                except (ValueError, TypeError, OSError):
                    return None

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "kind": pdf["kind"],
                        "payload": pdf["payload"].map(scale),
                        "width": width,
                        "height": height,
                    }
                )

        return media.mapInPandas(_resize_real, schema=RESIZED_SCHEMA)

    target = max(1, width * height // 64)

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            def shrink(b):
                if b is None:
                    return None
                step = max(1, len(b) // target)
                return bytes(b[::step][:target])

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"].map(shrink),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def frame_sample(media: DataFrame, frame_bytes: int = 64, every_n: int = 4,
                 fake: bool = False) -> DataFrame:
    """Sample every ``every_n``-th frame of a video payload — a 1→many
    generator implemented in mapInPandas (output batches need not align
    with input rows, so frame explosion is free of any JVM-side explode).

    ``fake=True`` treats the payload as a flipbook of fixed
    ``frame_bytes``-sized frames (``frame_bytes`` is the flipbook knob
    only). ``fake=False`` is the REAL demux path: payloads are parsed as
    uncompressed RIFF/AVI (24-bit BI_RGB DIB frames) by the stdlib-only
    codec in ``functions/avicodec.py`` — genuine container framing:
    nested LIST chunk walk, bottom-up padded BGR rows flipped and
    swapped to top-down RGB24 — and every ``every_n``-th frame is
    emitted as its raw RGB24 bytes. A production build swaps the parser
    for an ffmpeg/PyAV keyframe demuxer behind the identical dataframe
    contract. Undecodable payloads (non-RIFF bytes, compressed fourccs,
    truncated chunks, geometry-mismatched frames, None) contribute zero
    frame rows instead of failing the task — the 1→many analogue of the
    image/audio lanes' null-row dirty tolerance.

    Frames inherit the scan's partitioning; downstream per-frame feature
    extraction stays co-partitioned with no shuffle."""
    if not fake:

        def _frames_real(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
            import pandas as pd

            from mapreduce_framework_api_spark.functions.avicodec import decode_avi

            for pdf in batches:
                ids, idxs, frames = [], [], []
                for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                    try:
                        _, _, _, rgb_frames = decode_avi(bytes(b) if b is not None else b"")
                    except (ValueError, TypeError):
                        continue
                    for i in range(0, len(rgb_frames), every_n):
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(rgb_frames[i])
                yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

        return media.mapInPandas(_frames_real, schema=FRAME_SCHEMA)

    def _frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None:
                    continue
                n_frames = max(1, len(b) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(b[i * frame_bytes:(i + 1) * frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)


# Frame-inventory oracle. The fake flipbook sampler slices the payload
# into 64-byte frames and keeps every 4th; DuckDB in this environment has
# no BLOB substring/md5, so the oracle slices in HEX space — hex(payload)
# is a string, one byte == 2 hex chars, and hex()/substring()/md5() are
# bit-identical across engines (uppercase, 1-based; verified) — so
# md5(hex(frame)) is a full CONTENT check, not just byte accounting.
# NULL-text docs have a NULL payload and are skipped by the sampler on
# both sides; an empty payload is one empty frame (md5('') both engines).
_MM_FRAMES_SQL = """
WITH vf AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents WHERE text IS NOT NULL
), fr AS (
  SELECT doc_id,
         unnest(range(0, GREATEST(n // 64, 1), 4)) AS fi,
         hx
  FROM vf
)
SELECT doc_id,
       CAST(fi AS INTEGER) AS frame_idx,
       CAST(length(substring(hx, CAST(fi * 128 + 1 AS BIGINT), 128)) // 2
            AS BIGINT) AS frame_bytes,
       md5(substring(hx, CAST(fi * 128 + 1 AS BIGINT), 128)) AS frame_hex_md5
FROM fr
ORDER BY doc_id, frame_idx
"""


@register(
    "q_multimodal_video_frames",
    group="I",
    oracle=_MM_FRAMES_SQL,
)
def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling inventory — the 1→many demux contract as a
    declared, oracle-checked query (round 10: the last pytest-only
    multimodal lane, following the audio/image lanes' round-7/8 path
    from library function to driver-hashed capability). Documents stand
    in as video payloads (kind='video', text bytes = the encoded
    stream); ``frame_sample``'s deterministic flipbook sampler cuts
    64-byte frames and keeps every 4th, and the query emits one row per
    sampled frame: (doc_id, frame_idx, frame_bytes, frame_hex_md5) —
    the md5 of the frame's hex rendering, a full content check chosen
    because it is computable identically in DuckDB (no BLOB md5 there;
    see _MM_FRAMES_SQL).

    Scale shape: the sampler is Arrow-batched mapInPandas — output
    batches need not align with input rows, so the 1→many explosion
    never materializes a JVM-side explode row set, frames inherit the
    scan's partitioning (parallelism = file splits, zero shuffle before
    the presentation sort), and a real ffmpeg keyframe demuxer swaps in
    behind the identical dataframe contract (frame_sample's fake=False
    guard). Dirty rows follow the sampler's contract: NULL payloads
    drop, empty payloads yield one empty frame."""
    media = as_media(table(spark, sf_dir, "documents")).withColumn(
        "kind", F.lit("video")
    )
    frames = frame_sample(media, frame_bytes=64, every_n=4, fake=True)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame").cast("bigint").alias("frame_bytes"),
        F.md5(F.hex("frame")).alias("frame_hex_md5"),
    ).orderBy("doc_id", "frame_idx")


# Per-(lang, source) corpus profile, emitted in engine-independent bytes.
# Round 1 hashed the interpolated percentile (Spark `percentile` vs DuckDB
# `quantile_cont`) and a ROUND(avg,2): both can flip at a .xx5 tie because
# the engines' interpolation/summation expressions differ in low-order
# bits. Fix: (1) avg is derived from the EXACT integer sum and count, so
# the one double division is bit-identical everywhere, then emitted as an
# x100-scaled BIGINT; (2) quantiles switch to the discrete definition
# (percentile_disc: the element at rank CEIL(p*n)) computed by the same
# rank expression on both engines — the output is an exact table element,
# no interpolation, no FP ambiguity. CEIL(n*p) is safe in double: n*p is
# > 1/10 away from any integer it could cross, far beyond one ulp.
#
# NULL n_chars contract (edge-corpus finding): Spark ranks NULLS FIRST by
# default, DuckDB NULLS LAST, so a bare ORDER BY n_chars put the percentile
# rank on DIFFERENT elements when a dirty row was in the group. The
# percentiles are now defined over the OBSERVED values only: rank with
# explicit NULLS FIRST on both engines, and the target rank is
# (n - nn) + CEIL(p * nn) — the null prefix offset plus the discrete rank
# within the nn non-null values. The average divides by COUNT(n_chars)
# (measure-complete denominator), not COUNT(*).
_MM_STATS_SQL = """
WITH ranked AS (
  SELECT lang, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY n_chars NULLS FIRST) AS rn,
         COUNT(*) OVER (PARTITION BY lang, source) AS n,
         COUNT(n_chars) OVER (PARTITION BY lang, source) AS nn
  FROM documents
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(FLOOR(CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(n_chars) AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS avg_chars_x100,
       MAX(CASE WHEN rn = n - nn + CAST(CEIL(CAST(nn AS DOUBLE) * 0.5) AS BIGINT) THEN n_chars END) AS p50_chars,
       MAX(CASE WHEN rn = n - nn + CAST(CEIL(CAST(nn AS DOUBLE) * 0.9) AS BIGINT) THEN n_chars END) AS p90_chars
FROM ranked
GROUP BY lang, source
ORDER BY lang, source
"""


@register(
    "q_multimodal_stats",
    group="I",
    oracle=_MM_STATS_SQL,
)
def q_multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus profile: count, total chars, exact-sum
    average (x100-scaled integer), and DISCRETE p50/p90 (rank CEIL(p*n) —
    an actual element, so the hashed bytes are engine-independent; see
    _MM_STATS_SQL). The Spark side is an independent DataFrame plan with
    the same algebra — NOT spark.sql of the oracle text, so the oracle
    stays a real cross-check of this implementation. Every aggregate is
    cast so both engines emit the same value types (a bare integer SUM is
    BIGINT on Spark but HUGEINT→decimal128 on DuckDB: equal values,
    different hashed bytes). The window rank is one shuffle+sort per
    (lang, source), the same cost shape as a sort-based exact percentile
    aggregate."""
    d = table(spark, sf_dir, "documents")
    wp = W.partitionBy("lang", "source")
    ranked = d.select(
        "lang",
        "source",
        "n_chars",
        # explicit NULLS FIRST (Spark's asc default, DuckDB's is NULLS
        # LAST): the rank target below skips the null prefix, so the
        # percentiles are over OBSERVED values on both engines
        F.row_number().over(wp.orderBy(F.col("n_chars").asc_nulls_first())).alias("rn"),
        F.count("*").over(wp).alias("n"),
        F.count("n_chars").over(wp).alias("nn"),
    )
    nn_dbl = F.col("nn").cast("double")
    null_off = F.col("n") - F.col("nn")
    total = F.sum("n_chars")
    return (
        ranked.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            total.cast("bigint").alias("total_chars"),
            F.floor(total.cast("double") / F.count("n_chars").cast("double") * 100.0 + 0.5)
            .cast("bigint")
            .alias("avg_chars_x100"),
            F.max(
                F.when(
                    F.col("rn") == null_off + F.ceil(nn_dbl * 0.5).cast("bigint"),
                    F.col("n_chars"),
                )
            ).alias("p50_chars"),
            F.max(
                F.when(
                    F.col("rn") == null_off + F.ceil(nn_dbl * 0.9).cast("bigint"),
                    F.col("n_chars"),
                )
            ).alias("p90_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "q_multimodal_meta",
    group="I",
    oracle="""
SELECT doc_id,
       'image' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       source
FROM documents
ORDER BY doc_id
""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metadata lane of the multimodal record shape (payload size,
    content hash, provenance) — pure JVM expressions, full oracle. The
    binary payload lane is exercised by decode_media (tests), which has no
    SQL equivalent."""
    media = as_media(table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
        F.col("meta.source").alias("source"),
    ).orderBy("doc_id")


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("peak_abs", T.IntegerType(), True),
        T.StructField("energy", T.LongType(), True),
    ]
)


def extract_audio_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Audio lane of the multimodal contract: payload -> per-record PCM
    features via Arrow-batched mapInPandas (the audio sibling of
    ``decode_media``).

    ``fake=True`` derives deterministic stand-in features from payload
    bytes so the distributed plumbing runs codec-free. ``fake=False`` is
    the REAL path: payloads are parsed as RIFF/PCM16 WAV by the
    stdlib-only codec (functions/wavcodec.py — pure struct framing; a
    production build swaps in soundfile/torchaudio behind the same
    dataframe contract) and reduced to exact integer stats (frames,
    duration, peak, energy). Undecodable payloads (float WAV, truncated
    RIFF, arbitrary bytes) yield null feature rows instead of failing the
    task — same dirty-row tolerance as the image lane.
    """
    if not fake:

        def _audio_real(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
            import pandas as pd

            from mapreduce_framework_api_spark.functions.wavcodec import (
                decode_wav,
                pcm_stats,
            )

            for pdf in batches:
                rates, chans, frames, durs, peaks, energies = [], [], [], [], [], []
                for b in pdf["payload"]:
                    try:
                        rate, nch, samples = decode_wav(bytes(b) if b is not None else b"")
                    except (ValueError, TypeError):
                        for acc in (rates, chans, frames, durs, peaks, energies):
                            acc.append(None)
                        continue
                    nf, dur, peak, energy = pcm_stats(samples, nch, rate)
                    rates.append(rate)
                    chans.append(nch)
                    frames.append(nf)
                    durs.append(dur)
                    peaks.append(peak)
                    energies.append(energy)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "kind": pdf["kind"],
                        "n_bytes": pdf["payload"]
                        .map(lambda b: len(b) if b is not None else 0)
                        .astype("int64"),
                        "sample_rate": pd.array(rates, dtype="Int32"),
                        "n_channels": pd.array(chans, dtype="Int32"),
                        "n_frames": pd.array(frames, dtype="Int64"),
                        "duration_ms": pd.array(durs, dtype="Int64"),
                        "peak_abs": pd.array(peaks, dtype="Int32"),
                        "energy": pd.array(energies, dtype="Int64"),
                    }
                )

        return media.mapInPandas(_audio_real, schema=AUDIO_FEATURE_SCHEMA)

    def _audio_fake(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            n_bytes = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "sample_rate": pd.array([16000] * len(pdf), dtype="Int32"),
                    "n_channels": pd.array((n_bytes % 2 + 1).astype("int32"), dtype="Int32"),
                    "n_frames": pd.array(n_bytes.astype("int64"), dtype="Int64"),
                    "duration_ms": pd.array(
                        (n_bytes.astype("int64") * 1000 // 16000), dtype="Int64"
                    ),
                    "peak_abs": pd.array((n_bytes % 32768).astype("int32"), dtype="Int32"),
                    "energy": pd.array((n_bytes.astype("int64") ** 2), dtype="Int64"),
                }
            )

    return media.mapInPandas(_audio_fake, schema=AUDIO_FEATURE_SCHEMA)


@register(
    "q_multimodal_audio_stats",
    group="I",
    oracle="""
WITH feats AS (
  SELECT source,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(octet_length(encode(text)) AS BIGINT) * 1000 // 16000
           AS duration_ms,
         CAST(octet_length(encode(text)) % 32768 AS BIGINT) AS peak_abs,
         CAST(octet_length(encode(text)) AS BIGINT)
           * CAST(octet_length(encode(text)) AS BIGINT) AS energy
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms,
       CAST(MAX(peak_abs) AS BIGINT) AS max_peak,
       CAST(SUM(energy) AS BIGINT) AS total_energy
FROM feats GROUP BY source ORDER BY source
""",
)
def q_multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-lane rollup, ORACLE-CHECKED: documents lift into audio-kind
    media records and flow through the REAL Arrow-batched
    extract_audio_features plumbing (fake=True — the deterministic
    stand-in whose features are pure functions of payload length, which
    is what makes a SQL mirror possible), then aggregate per source.
    This gives the audio lane the same differential coverage the image
    lane has via q_multimodal_stats: the mapInPandas batch shape, the
    nullable Arrow dtypes, and the feature arithmetic are all under the
    hash. The fake=False WAV path is pytest-covered (binary payloads
    have no DuckDB analogue).

    Scale shape: one documents scan → one Arrow-batched map → one
    source-keyed aggregate; integer end to end. Overflow bound (the
    q_sim_outliers discipline): per-payload energy = n_bytes² reaches
    2^63 at a ~3 GB payload, and SUM(energy) overflows sooner (e.g.
    1000 docs × 100 MB per source) — a corpus at that scale promotes
    the energy column to DECIMAL on both engines."""
    docs = table(spark, sf_dir, "documents")
    media = as_media(docs).withColumn("kind", F.lit("audio"))
    feats = extract_audio_features(media, fake=True).select(
        "doc_id", "n_bytes", "duration_ms", "peak_abs", "energy"
    )
    return (
        feats.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_payloads"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("duration_ms").cast("long").alias("total_duration_ms"),
            F.max("peak_abs").cast("long").alias("max_peak"),
            F.sum("energy").cast("long").alias("total_energy"),
        )
        .orderBy("source")
    )


_SYNTH_RATE = 8000  # Hz; mono PCM16 throughout the synth lane


def synth_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic WAV payload synth for the REAL-codec audio lane:
    each document becomes a mono PCM16 RIFF/WAVE payload whose samples
    are a pure integer function of (doc_id, frame index) —
    ``((doc_id*31 + i*17) % 2001) - 1000`` over ``(n_chars % 50) + 10``
    frames — so every downstream PCM stat has an exact SQL mirror.
    Every 10th doc gets a deliberately undecodable payload (the
    dirty-row lane must stay exercised AND oracle-visible).

    Arrow-batched mapInPandas like every media kernel: payload build is
    a pure map stage, parallelism = scan splits, no shuffle."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from mapreduce_framework_api_spark.functions.wavcodec import encode_wav

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                doc_id = int(doc_id)
                if doc_id % 10 == 0:
                    payloads.append(b"not-a-riff" + bytes([doc_id % 251]))
                    continue
                # NULL text => NULL n_chars (dirty row): synth from 0, the
                # oracle mirrors with COALESCE(n_chars, 0)
                nf = (0 if pd.isna(n_chars) else int(n_chars)) % 50 + 10
                samples = [
                    ((doc_id * 31 + i * 17) % 2001) - 1000 for i in range(nf)
                ]
                payloads.append(encode_wav(_SYNTH_RATE, 1, samples))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": ["audio"] * len(pdf),
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(_synth, schema=schema)


@register(
    "q_multimodal_audio_real",
    group="I",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, (COALESCE(n_chars, 0) % 50) + 10 AS nf FROM documents
), samp AS (
  SELECT doc_id, nf, ((doc_id * 31 + i * 17) % 2001) - 1000 AS v
  FROM (
    SELECT doc_id, nf, unnest(range(0, nf)) AS i
    FROM d WHERE doc_id % 10 <> 0
  )
), per_doc AS (
  SELECT doc_id, nf,
         nf * 1000 // {_SYNTH_RATE} AS duration_ms,
         MAX(ABS(v)) AS peak,
         SUM(v * v) AS energy
  FROM samp GROUP BY doc_id, nf
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(COUNT(p.doc_id) AS BIGINT) AS n_decoded,
       CAST(SUM(p.nf) AS BIGINT) AS total_frames,
       CAST(SUM(p.duration_ms) AS BIGINT) AS total_duration_ms,
       CAST(MAX(p.peak) AS BIGINT) AS max_peak,
       CAST(SUM(p.energy) AS BIGINT) AS total_energy
FROM d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
GROUP BY d.source ORDER BY d.source
""",
)
def q_multimodal_audio_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec audio lane, end to end and ORACLE-CHECKED: synthesized
    RIFF/PCM16 payloads (synth_wav_media — deterministic integer samples
    with a SQL mirror, every 10th doc deliberately undecodable) are
    decoded by the fake=False extract_audio_features path — the actual
    functions/wavcodec.py parse, not the stand-in — and rolled up per
    source. The oracle recomputes every PCM stat (frames, floor-division
    duration, peak |sample|, Σ sample²) from the synth formula, so the
    codec's framing, the Arrow nullable dtypes, AND the dirty-row
    null-tolerance (n_payloads vs n_decoded) are all under the value
    hash. Closes the round-5 gap: the WAV codec was pytest-only; now a
    declared query's plan contains the real decode.

    Scale shape: one documents scan -> two Arrow-batched map stages
    (synth, decode) -> broadcast-joinable doc_id->source attach -> one
    source-keyed aggregate. Integer end to end; energy is bounded by
    1000² x 59 frames per doc, nowhere near int64."""
    docs = table(spark, sf_dir, "documents")
    media = synth_wav_media(docs)
    feats = extract_audio_features(media, fake=False)
    return (
        feats.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_payloads"),
            F.count("sample_rate").cast("long").alias("n_decoded"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.sum("duration_ms").cast("long").alias("total_duration_ms"),
            F.max("peak_abs").cast("long").alias("max_peak"),
            F.sum("energy").cast("long").alias("total_energy"),
        )
        .orderBy("source")
    )


def synth_png_media(docs: DataFrame) -> DataFrame:
    """Deterministic PNG payload synth for the REAL-codec image lane
    (the mirror of synth_wav_media): each document becomes an 8-bit RGB
    PNG of (COALESCE(n_chars,0) % 12) + 4 × (doc_id % 10) + 3 pixels whose
    channel bytes are pure integer functions of (doc_id, pixel index) —
    r=(id*7+i*13)%256, g=(id*11+i*17)%256, b=(id*3+i*19)%256 — so every
    downstream luminance stat has an exact SQL mirror. Every 10th doc gets
    a deliberately undecodable payload (dirty-row lane, oracle-visible).

    Arrow-batched mapInPandas: pure map stage, parallelism = scan splits,
    no shuffle."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from mapreduce_framework_api_spark.functions.pngcodec import encode_png

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                doc_id = int(doc_id)
                if doc_id % 10 == 0:
                    payloads.append(b"not-a-png" + bytes([doc_id % 251]))
                    continue
                nc = 0 if pd.isna(n_chars) else int(n_chars)
                w, h = nc % 12 + 4, doc_id % 10 + 3
                i = np.arange(w * h, dtype=np.int64)
                rgb = np.stack(
                    [
                        (doc_id * 7 + i * 13) % 256,
                        (doc_id * 11 + i * 17) % 256,
                        (doc_id * 3 + i * 19) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                payloads.append(encode_png(w, h, rgb.tobytes()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": ["image"] * len(pdf),
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(_synth, schema=schema)


@register(
    "q_multimodal_image_real",
    group="I",
    oracle="""
WITH d AS (
  SELECT doc_id, source,
         (COALESCE(n_chars, 0) % 12) + 4 AS w,
         (doc_id % 10) + 3 AS h
  FROM documents
), px AS (
  SELECT doc_id,
         ((299 * ((doc_id * 7 + i * 13) % 256)
         + 587 * ((doc_id * 11 + i * 17) % 256)
         + 114 * ((doc_id * 3 + i * 19) % 256)) // 1000) // 16 AS bin
  FROM (
    SELECT doc_id, unnest(range(0, w * h)) AS i
    FROM d WHERE doc_id % 10 <> 0
  )
), per_doc AS (
  SELECT doc_id,
         SUM(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS dark,
         SUM(CASE WHEN bin = 15 THEN 1 ELSE 0 END) AS bright,
         SUM(bin + 1) AS checksum,
         COUNT(*) AS n_px
  FROM px GROUP BY doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(COUNT(p.doc_id) AS BIGINT) AS n_decoded,
       CAST(SUM(p.n_px) AS BIGINT) AS total_pixels,
       CAST(SUM(p.dark) AS BIGINT) AS total_dark,
       CAST(SUM(p.bright) AS BIGINT) AS total_bright,
       CAST(SUM(p.checksum) AS BIGINT) AS hist_checksum
FROM d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
GROUP BY d.source ORDER BY d.source
""",
)
def q_multimodal_image_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec image lane, end to end and ORACLE-CHECKED — the mirror
    of q_multimodal_audio_real that closes the last pytest-only codec
    residue: synthesized 8-bit RGB PNGs (synth_png_media — deterministic
    integer channel bytes with a SQL mirror, every 10th doc deliberately
    undecodable) are decoded by the fake=False decode_media path — the
    actual functions/pngcodec.py zlib+filter parse, not the stand-in —
    and the 16-bin integer-luma histograms roll up per source. The oracle
    recomputes every luminance stat (bin-0/bin-15 pixel counts and the
    Σ(bin+1) histogram checksum, which pins ALL 16 bins) from the synth
    formula, so the codec's chunk framing, scanline filtering, the Arrow
    nullable dtypes, AND the dirty-row null-tolerance (n_payloads vs
    n_decoded) are all under the value hash.

    Scale shape: one documents scan -> two Arrow-batched map stages
    (synth, decode) -> doc_id->source attach -> one source-keyed
    aggregate. Integer end to end; the checksum is bounded by 16 x 208
    pixels per doc, nowhere near int64."""
    docs = table(spark, sf_dir, "documents")
    media = synth_png_media(docs)
    feats = decode_media(media, fake=False)
    bins = F.zip_with(
        "feature",
        F.sequence(F.lit(1), F.lit(16)).cast("array<double>"),
        lambda c, i: c * i,
    )
    checksum = F.aggregate(bins, F.lit(0.0), lambda acc, x: acc + x)
    return (
        feats.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_payloads"),
            F.count("width").cast("long").alias("n_decoded"),
            F.sum(F.col("width").cast("long") * F.col("height")).cast("long").alias("total_pixels"),
            F.sum(F.element_at("feature", 1)).cast("long").alias("total_dark"),
            F.sum(F.element_at("feature", 16)).cast("long").alias("total_bright"),
            F.sum(checksum).cast("long").alias("hist_checksum"),
        )
        .orderBy("source")
    )


_VIDEO_FPS = 10  # synth lane frame rate; fixed so duration has a SQL mirror


def synth_avi_media(docs: DataFrame) -> DataFrame:
    """Deterministic AVI payload synth for the REAL-codec video lane (the
    video mirror of synth_wav_media/synth_png_media): each document
    becomes an uncompressed RIFF/AVI of
    ``nf = (COALESCE(n_chars,0) % 6) + 2`` RGB24 frames of
    ``w = (COALESCE(n_chars,0) % 5) + 2`` × ``h = (doc_id % 4) + 2``
    pixels whose channel bytes are pure integer functions of
    (doc_id, frame index f, pixel index i) —
    r=(id*7+f*23+i*13)%256, g=(id*11+f*29+i*17)%256,
    b=(id*3+f*31+i*19)%256 — so every downstream per-frame luminance
    stat has an exact SQL mirror. Every 10th doc gets a deliberately
    undecodable payload (the dirty-row lane must stay exercised AND
    oracle-visible).

    Arrow-batched mapInPandas: pure map stage, parallelism = scan
    splits, no shuffle."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from mapreduce_framework_api_spark.functions.avicodec import encode_avi

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                doc_id = int(doc_id)
                if doc_id % 10 == 0:
                    payloads.append(b"not-an-avi" + bytes([doc_id % 251]))
                    continue
                nc = 0 if pd.isna(n_chars) else int(n_chars)
                w, h, nf = nc % 5 + 2, doc_id % 4 + 2, nc % 6 + 2
                i = np.arange(w * h, dtype=np.int64)
                frames = []
                for f in range(nf):
                    rgb = np.stack(
                        [
                            (doc_id * 7 + f * 23 + i * 13) % 256,
                            (doc_id * 11 + f * 29 + i * 17) % 256,
                            (doc_id * 3 + f * 31 + i * 19) % 256,
                        ],
                        axis=1,
                    ).astype(np.uint8)
                    frames.append(rgb.tobytes())
                payloads.append(encode_avi(w, h, _VIDEO_FPS, frames))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": ["video"] * len(pdf),
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(_synth, schema=schema)


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("dark", T.LongType(), False),
        T.StructField("bright", T.LongType(), False),
        T.StructField("luma_sum", T.LongType(), False),
    ]
)


def frame_luma_stats(frames: DataFrame) -> DataFrame:
    """Per-frame integer luminance stats over raw RGB24 frame bytes (the
    per-frame sibling of decode_media's histogram): pixel count, dark
    (luma bin 0) / bright (bin 15) counts, and the exact Σ luma — the
    same integer BT.601 luma as the image lane, so both lanes share one
    arithmetic definition. Arrow-batched mapInPandas, 1 row in → 1 row
    out, co-partitioned with the demux output (no shuffle)."""

    def _stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n_px, dark, bright, luma_sum = [], [], [], []
            for b in pdf["frame"]:
                px = np.frombuffer(bytes(b), dtype=np.uint8).reshape(-1, 3)
                luma = (
                    299 * px[:, 0].astype(np.int64)
                    + 587 * px[:, 1].astype(np.int64)
                    + 114 * px[:, 2].astype(np.int64)
                ) // 1000
                bins = luma // 16
                n_px.append(len(luma))
                dark.append(int((bins == 0).sum()))
                bright.append(int((bins == 15).sum()))
                luma_sum.append(int(luma.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "n_px": pd.array(n_px, dtype="int64"),
                    "dark": pd.array(dark, dtype="int64"),
                    "bright": pd.array(bright, dtype="int64"),
                    "luma_sum": pd.array(luma_sum, dtype="int64"),
                }
            )

    return frames.mapInPandas(_stats, schema=FRAME_STATS_SCHEMA)


@register(
    "q_multimodal_video_real",
    group="I",
    oracle="""
WITH d AS (
  SELECT doc_id, source,
         (COALESCE(n_chars, 0) % 5) + 2 AS w,
         (doc_id % 4) + 2 AS h,
         (COALESCE(n_chars, 0) % 6) + 2 AS nf
  FROM documents
), fr AS (
  SELECT doc_id, w, h, unnest(range(0, nf, 2)) AS f
  FROM d WHERE doc_id % 10 <> 0
), px AS (
  SELECT doc_id, f,
         ((299 * ((doc_id * 7 + f * 23 + i * 13) % 256)
         + 587 * ((doc_id * 11 + f * 29 + i * 17) % 256)
         + 114 * ((doc_id * 3 + f * 31 + i * 19) % 256)) // 1000) AS luma
  FROM (
    SELECT doc_id, f, unnest(range(0, w * h)) AS i
    FROM fr
  )
), per_doc AS (
  SELECT doc_id,
         COUNT(DISTINCT f) AS n_frames,
         COUNT(*) AS n_px,
         SUM(CASE WHEN luma // 16 = 0 THEN 1 ELSE 0 END) AS dark,
         SUM(CASE WHEN luma // 16 = 15 THEN 1 ELSE 0 END) AS bright,
         SUM(luma) AS luma_sum
  FROM px GROUP BY doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_payloads,
       CAST(COUNT(p.doc_id) AS BIGINT) AS n_decoded,
       CAST(SUM(p.n_frames) AS BIGINT) AS total_frames,
       CAST(SUM(p.n_px) AS BIGINT) AS total_pixels,
       CAST(SUM(p.dark) AS BIGINT) AS total_dark,
       CAST(SUM(p.bright) AS BIGINT) AS total_bright,
       CAST(SUM(p.luma_sum) AS BIGINT) AS luma_checksum
FROM d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
GROUP BY d.source ORDER BY d.source
""",
)
def q_multimodal_video_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec video lane, end to end and ORACLE-CHECKED — completes
    the audio/image/video real-codec trio (VERDICT r10 task 1):
    synthesized uncompressed RIFF/AVI payloads (synth_avi_media —
    deterministic integer channel bytes with a SQL mirror, every 10th
    doc deliberately undecodable) are demuxed by the fake=False
    frame_sample path — the actual functions/avicodec.py nested-LIST
    chunk walk and DIB row-flip/BGR-swap, not the flipbook stand-in —
    sampling every 2nd frame; per-frame integer luminance stats
    (frame_luma_stats) roll up per source. The oracle recomputes every
    stat (sampled frame count, pixel count, bin-0/bin-15 counts, exact
    Σ luma) from the synth formula, so the container framing, the DIB
    bottom-up/BGR/stride round-trip, the every_n sampling arithmetic,
    AND the dirty-row tolerance (n_payloads vs n_decoded — undecodable
    payloads contribute zero frames and surface via the left join) are
    all under the value hash.

    Scale shape: one documents scan -> three Arrow-batched map stages
    (synth, demux, stats — all co-partitioned, zero shuffle between
    them; the 1→many frame explosion happens inside the demux
    generator, never as a JVM explode) -> doc_id->source attach ->
    one source-keyed aggregate. Integer end to end; Σ luma is bounded
    by 255 × 36 px × 7 frames per doc, nowhere near int64."""
    docs = table(spark, sf_dir, "documents")
    media = synth_avi_media(docs)
    frames = frame_sample(media, every_n=2, fake=False)
    stats = frame_luma_stats(frames)
    per_doc = stats.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum("n_px").alias("n_px"),
        F.sum("dark").alias("dark"),
        F.sum("bright").alias("bright"),
        F.sum("luma_sum").alias("luma_sum"),
    )
    return (
        docs.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_payloads"),
            F.count("n_frames").cast("long").alias("n_decoded"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.sum("n_px").cast("long").alias("total_pixels"),
            F.sum("dark").cast("long").alias("total_dark"),
            F.sum("bright").cast("long").alias("total_bright"),
            F.sum("luma_sum").cast("long").alias("luma_checksum"),
        )
        .orderBy("source")
    )
