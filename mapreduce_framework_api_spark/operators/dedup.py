"""Deduplication operators (north-star LLM-pipeline surface).

Five tiers, each designed for 100 TB from the start:

- exact (``q_dedup_exact``): hash-groupBy distinct — one shuffle, partial
  dedup map-side.
- MinHash + LSH (``q_dedup_minhash``): shingle → 16 deterministic minhash
  permutations → 8 bands × 2 rows → candidates share a band bucket. The
  candidate join is an *inverted-index equi-join on (band, bucket)* — never
  an all-pairs cross join — so cost scales with bucket collision counts.
- SimHash (``q_dedup_simhash``): 64-bit weighted-bit signature, banded into
  4 × 16-bit blocks for candidate generation (hamming ≤ 3 ⇒ at least one
  exact block by pigeonhole), then exact hamming filter via bit_count(xor).
- n-gram Jaccard (``q_dedup_ngram_jaccard``): exact trigram-set Jaccard via
  a shingle-level equi-join (inverted index), fully SQL-expressible — this
  one has a complete DuckDB oracle.
- embedding cosine (``q_dedup_embedding``): near-dup pairs above a cosine
  threshold; the brute-force tier is correct at fixture scale, the LSH path
  for billions of vectors is in operators/similarity.py.

Determinism (SURVEY.md §7.3 risk 6): every "random" constant (permutation
coefficients, band layout) is a hard-coded literal; token hashes derive from
md5, which is identical everywhere. No RNG, no time.

All signatures are built with JVM-side expressions (md5/conv/pmod/transform/
array_min) — no Python in the hot path; the only Python-visible piece is
plan composition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from mapreduce_framework_api_spark.functions.textfns import tokens_nonempty
from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import parallelized, session_cache_key, table

# Hot-bucket width cap: a degenerate bucket (boilerplate band value, stop
# shingle, zero block) of width m would otherwise cost m² candidate pairs —
# the classic LSH blowup. Every banding pipeline slices its sorted bucket
# membership to this width BEFORE pair expansion, so one viral bucket costs
# at most cap² pairs. 128 is ~5× the widest bucket observed at sf0.1
# (max 25), so fixture results are exact; a production corpus tunes it via
# the env knob and watches bucket_overflow_report.
_BUCKET_CAP = int(os.environ.get("SPARK_GRAFT_BUCKET_CAP", "128"))


def capped_bucket(recs, cap: int | None = None):
    """Slice a SORTED bucket-membership array to the hot-bucket width cap.

    Deterministic: membership is sorted, the first ``cap`` members are
    kept. Approximation contract: pairs entirely inside the dropped tail
    of an over-cap bucket can be missed by THAT band — with multiple bands
    (minhash 8, simhash/LSH 4) a true near-dup pair still surfaces from
    any band where it lands in a calmer bucket. Use
    ``bucket_overflow_report`` to see what the cap is dropping."""
    return F.slice(recs, 1, cap or _BUCKET_CAP)


def bucket_overflow_report(buckets: DataFrame, recs_col: str = "recs", cap: int | None = None):
    """Diagnostic aggregate over a bucket DataFrame: how hot are the
    buckets and how many candidate pairs does the cap drop? Run alongside
    a dedup job at new data scales to validate the cap setting."""
    cap = cap or _BUCKET_CAP
    w = F.size(recs_col)
    dropped = (w * (w - 1) - F.lit(cap) * (cap - 1)) / 2
    return buckets.agg(
        F.count("*").alias("n_buckets"),
        F.max(w).alias("max_width"),
        F.sum(F.when(w > cap, 1).otherwise(0)).alias("hot_buckets"),
        F.sum(F.when(w > cap, dropped).otherwise(F.lit(0))).cast("long").alias("pairs_dropped"),
    )


def _pairs_within(arr):
    """All ordered pairs (a, b), a < b, from a SORTED array column —
    generated array-side. Turning each bucket into its own pair list
    replaces a self-equi-join (second shuffle of the full data + skew
    exposure) with a single groupBy: the standard LSH candidate-generation
    layout at scale. Callers pass the array through ``capped_bucket`` so a
    hot bucket of width m costs at most cap² pairs, never m²."""
    n = F.size(arr)
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, n), lambda y: F.struct(x.alias("a"), y.alias("b"))
            ),
        )
    )


# ---------------------------------------------------------------- exact ----


@register(
    "q_dedup_exact",
    group="D",
    oracle="""
SELECT DISTINCT user_id, event_type
FROM events
ORDER BY user_id, event_type
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a projected events subset: dropDuplicates == hash
    aggregate with map-side partial dedup; the shuffle carries only distinct
    pairs per input partition."""
    e = table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").dropDuplicates().orderBy("user_id", "event_type")


# ------------------------------------------------------------- minhash -----

# 16 fixed permutations h_i(x) = (A[i]*x + B[i]) mod P over 31-bit token
# hashes; P prime, constants chosen once (deterministic across runs/engines).
_MINHASH_P = 2_147_483_647  # 2^31 - 1
_MINHASH_A = (
    1_103_515_245, 1_103_245_617, 747_796_405, 22_695_477,
    65_793_941, 134_775_813, 214_013_477, 177_621_101,
    904_279_661, 694_847_533, 394_118_081, 297_746_757,
    720_931_181, 137_438_691, 888_888_881, 505_860_137,
)
_MINHASH_B = (
    12_345, 54_321, 98_765, 13_579,
    24_680, 11_111, 77_777, 31_415,
    27_182, 16_180, 14_142, 17_320,
    22_360, 26_457, 28_284, 30_000,
)
_N_PERM = 16
_N_BANDS = 8  # 2 rows per band


def _shingles(col, k: int = 3):
    """Array of distinct k-token shingle strings (array-side, no explode).

    Built by zip_with over k shifted slices of the token array, NOT by
    indexing per shingle position: a per-index lambda would capture the
    tokenization expression and re-evaluate the regex split once per
    shingle (measured 14s vs <1s for 5000 docs). The token array is
    evaluated only k+1 times per row this way, and callers that project
    the tokens into a named column first get it down to cheap column
    references."""
    toks = tokens_nonempty(col)
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))
    sh = F.slice(toks, 1, m)
    for j in range(1, k):
        sh = F.zip_with(sh, F.slice(toks, 1 + j, m), lambda a, b: F.concat_ws(" ", a, b))
    # Short docs: fall back to the whole text as a single shingle.
    return F.array_distinct(
        F.when(n >= k, sh).otherwise(F.array(F.col(col) if isinstance(col, str) else col))
    )


def _token_hash31(c):
    """Deterministic 31-bit hash of a shingle string, derived from md5 so
    Spark (md5 of the UTF-8 bytes) and DuckDB (md5 of the VARCHAR) compute
    identical values — this is what upgrades the minhash pipeline from
    rows-only to a full differential oracle: the 13-hex-char (52-bit) md5
    prefix folds to [0, P) with the same arithmetic on both engines.
    (xxhash64 would be ~20× cheaper per hash but has no DuckDB analogue;
    the md5 cost is one hash per distinct shingle and benches <10% of the
    pipeline.)"""
    return F.pmod(
        F.conv(F.substring(F.md5(c.cast("binary")), 1, 13), 16, 10).cast("long"),
        F.lit(_MINHASH_P),
    )


def _perm(a: int, b: int):
    """One minhash permutation as a single-arg lambda (PySpark infers higher-
    order-function arity from the Python signature, so no default args)."""

    def f(x):
        return (a * x + b) % _MINHASH_P

    return f


def minhash_signature(col) -> "F.Column":
    """Column: array<long> of 16 minhash values for the text column.

    Single-pass fold: one F.aggregate over the shingle-hash array carrying
    all 16 running minima, so the hash of each shingle is evaluated exactly
    once. (The naive form — 16 separate array_min(transform(hashes, ...)) —
    gets its shared hash subexpression re-inlined by CollapseProject and
    costs 16× the hash work; measured 46s vs 2s at 500 docs, then-md5.)"""
    hashes = F.transform(_shingles(col), _token_hash31)
    a_arr = F.array(*[F.lit(a).cast("long") for a in _MINHASH_A])
    b_arr = F.array(*[F.lit(b).cast("long") for b in _MINHASH_B])
    init = F.array_repeat(F.lit(_MINHASH_P + 1).cast("long"), _N_PERM)
    return F.aggregate(
        hashes,
        init,
        lambda acc, x: F.transform(
            F.sequence(F.lit(1), F.lit(_N_PERM)),
            lambda i: F.least(
                F.element_at(acc, i),
                (F.element_at(a_arr, i) * x + F.element_at(b_arr, i)) % _MINHASH_P,
            ),
        ),
    )


# Full DuckDB mirror of the minhash pipeline, generated from the same
# permutation constants. Every stage is replicated semantically: identical
# shingles (incl. the whole-text fallback for <3-token docs), identical
# md5-derived 31-bit shingle hashes, the same 16 (a*h+b) % P minima, the
# same 8×2 band buckets, the same sorted-slice hot-bucket cap, and the
# same round-then-filter on matches/16. All intermediate arithmetic is
# BIGINT (a*h < 2^62), so the engines agree bit-for-bit.
_MINHASH_MINS = ",\n         ".join(
    f"MIN(({a} * h + {b}) % {_MINHASH_P}) AS m{i + 1}"
    for i, (a, b) in enumerate(zip(_MINHASH_A, _MINHASH_B))
)
_MINHASH_BUCKET_CASE = "\n           ".join(
    f"WHEN {b} THEN m{2 * b + 1} || '_' || m{2 * b + 2}" for b in range(_N_BANDS)
)
_MINHASH_MATCHES = " + ".join(
    f"(CASE WHEN x.m{i + 1} = y.m{i + 1} THEN 1 ELSE 0 END)" for i in range(_N_PERM)
)
# The CTE chain shared by the minhash-estimate and verified-tier oracles:
# everything up to the banded candidate set `cand` (plus `mins` for the
# estimate). Factored so the verified tier's candidate generation can never
# drift from the proven estimate tier — same discipline as the Spark-side
# minhash_candidate_pairs() both queries call.
_MINHASH_CAND_CTES = f"""mh_t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> '') AS toks,
         text
  FROM documents
), mh_sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                ELSE [text] END) AS shingle
  FROM mh_t
), hs AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 13)) AS BIGINT) % {_MINHASH_P} AS h
  FROM mh_sh
), mins AS (
  SELECT doc_id,
         {_MINHASH_MINS}
  FROM hs GROUP BY doc_id
), bands AS (
  SELECT doc_id, bb.band_id,
         CASE bb.band_id
           {_MINHASH_BUCKET_CASE}
         END AS bucket
  FROM mins, (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) AS bb(band_id)
), bk AS (
  SELECT band_id, bucket,
         list_slice(list_sort(list(doc_id)), 1, {_BUCKET_CAP}) AS ds
  FROM bands GROUP BY band_id, bucket HAVING COUNT(*) > 1
), cand AS (
  SELECT DISTINCT ua.a AS doc_a, ub.b AS doc_b
  FROM bk, UNNEST(ds) AS ua(a), UNNEST(ds) AS ub(b)
  WHERE ua.a < ub.b
)"""

_MINHASH_ORACLE = f"""
WITH {_MINHASH_CAND_CTES}
SELECT c.doc_a, c.doc_b,
       ROUND(({_MINHASH_MATCHES}) / 16.0, 2) AS est_jaccard
FROM cand c JOIN mins x ON c.doc_a = x.doc_id JOIN mins y ON c.doc_b = y.doc_id
WHERE ROUND(({_MINHASH_MATCHES}) / 16.0, 2) >= 0.5
ORDER BY doc_a, doc_b
"""


_MINHASH_SIG_CACHE: dict[tuple[str, str], DataFrame] = {}


def minhash_sig_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig) for every non-null-text document — the Arrow
    signature kernel's output as a per-(application, sf_dir) cached,
    localCheckpoint'd table. The kernel is the dominant cost of every
    minhash tier, and two independent pipelines start from exactly this
    frame (the banded candidate generator; the incremental corpus
    index), so it is the right shared artifact — in production, the
    signature column a pipeline persists alongside the corpus."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _MINHASH_SIG_CACHE.get(key)
    if cached is not None:
        return cached
    # Null-text docs are excluded from the minhash tiers: the oracle
    # self-excludes them (every min over NULL shingle hashes is NULL and
    # the est filter never passes), so the engine filters explicitly.
    docs = parallelized(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    out = docs.select(
        "doc_id", _minhash_sig_udf()("text").alias("sig")
    ).localCheckpoint()
    _MINHASH_SIG_CACHE[key] = out
    return out


_MINHASH_CAND_CACHE: dict[tuple[str, str], DataFrame] = {}


def minhash_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidate pairs on documents.text, BEFORE any
    Jaccard filtering: (doc_a, doc_b, sig_a, sig_b), doc_a < doc_b, one row
    per (band, bucket) co-occurrence (callers dropDuplicates on the pair
    key as needed).

    shingle(3) → 16-perm minhash → 8 bands × 2 rows → bucket-join.
    Candidates = pairs agreeing on ≥1 full band. The join is on (band_id,
    bucket) so work scales with real collisions, and bucket width is capped
    (capped_bucket) so one viral bucket never goes quadratic. Shared by the
    estimate tier (q_dedup_minhash), the verified tier
    (q_dedup_minhash_verified), and through them the recall evaluation —
    so like jaccard_dup_pairs it is computed once per (application,
    sf_dir), eagerly materialized (localCheckpoint — pair-count-sized,
    each row two 16-long signatures), and cached: the dominant Arrow sig
    kernel + bucket groupBy never re-run per consumer. This is the
    persisted candidate table a production pipeline writes between the
    cheap tier and verification. The oracle-side twin is
    _MINHASH_CAND_CTES."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _MINHASH_CAND_CACHE.get(key)
    if cached is not None:
        return cached
    # Arrow-batched kernel == minhash_signature() bit-for-bit (pinned by
    # tests); served from the shared cached signature table (null-text
    # rows already excluded there per the minhash-tier null contract).
    sig = minhash_sig_table(spark, sf_dir)
    # Band layout comes from the ONE shared builder (_bands_of) so the
    # estimate/verified tiers and the incremental index can never drift
    # onto different bucket keys.
    bands = sig.select(
        F.struct("doc_id", "sig").alias("rec"),
        _bands_of().alias("band"),
    ).select("rec", "band.band_id", "band.bucket")
    buckets = (
        bands.groupBy("band_id", "bucket")
        .agg(F.sort_array(F.collect_list("rec")).alias("recs"))
        .filter(F.size("recs") > 1)
    )
    out = (
        buckets.select(
            F.explode(_pairs_within(capped_bucket(F.col("recs")))).alias("p")
        )
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.sig").alias("sig_a"),
            F.col("p.b.sig").alias("sig_b"),
        )
        .localCheckpoint()
    )
    _MINHASH_CAND_CACHE[key] = out
    return out


@register(
    "q_dedup_minhash",
    group="I",
    oracle=_MINHASH_ORACLE,
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs on documents.text: the banded
    candidates (minhash_candidate_pairs), filtered by estimated Jaccard
    (matching minhashes / 16) ≥ 0.5. md5-derived shingle hashes make the
    whole pipeline — signatures, banding, cap, estimate — exactly
    reproducible in SQL (_MINHASH_ORACLE), so this query is hash-checked,
    not rows-only."""
    pairs = minhash_candidate_pairs(spark, sf_dir)
    est_jac = (
        F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
        ).cast("double")
        / _N_PERM
    )
    return (
        pairs.select("doc_a", "doc_b", F.round(est_jac, 2).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
        .dropDuplicates(["doc_a", "doc_b"])
        .orderBy("doc_a", "doc_b")
    )


# The verified tier's oracle: banded candidates (shared CTE chain) exactly
# verified against the full trigram shingle sets. The shingle CTEs here use
# the jaccard pipeline's normalized-token fallback (array_to_string(toks,
# ' ')) because the Spark side verifies with _shingle_hash_udf — the same
# kernel behind jaccard_dup_pairs — NOT the minhash signature shingles
# (whose <3-token fallback is the raw text). No df cap: verification is
# per-candidate-pair set intersection, so there is no viral-shingle pair
# blowup to guard against.
_MINHASH_VERIFIED_ORACLE = f"""
WITH {_MINHASH_CAND_CTES}, v_sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                ELSE [array_to_string(toks, ' ')] END) AS shingle
  FROM mh_t
), v_sz AS (
  SELECT doc_id, COUNT(*) AS n FROM v_sh GROUP BY doc_id
), v_inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS common
  FROM cand c
       JOIN v_sh a ON a.doc_id = c.doc_a
       JOIN v_sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.common AS DOUBLE) / (x.n + y.n - i.common), 2) AS jaccard
FROM v_inter i JOIN v_sz x ON i.doc_a = x.doc_id JOIN v_sz y ON i.doc_b = y.doc_id
WHERE CAST(i.common AS DOUBLE) / (x.n + y.n - i.common) >= 0.5
ORDER BY doc_a, doc_b
"""


@register(
    "q_dedup_minhash_verified",
    group="I",
    oracle=_MINHASH_VERIFIED_ORACLE,
)
def q_dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB dedup composition, as one query: banded MinHash candidate
    generation (linear — see the sf1 receipt in BASELINE.md) followed by
    EXACT trigram-Jaccard verification computed only on the candidate
    pairs. This is the path the q_dedup_minhash_recall receipt justifies
    (99.93% candidate recall at sf1): the exact tier's
    pair-co-occurrence-bound inverted-index join is reserved for the
    candidate set, so verification cost scales with |candidates|, not with
    corpus-wide shingle co-occurrences.

    Plan shape: candidates (pre-estimate, all banded pairs) are
    deduplicated on the pair key, then each side picks up its full
    60-bit-hashed shingle set via two hash equi-joins on doc_id;
    |A ∩ B| = size(array_intersect) evaluates row-local, and exact Jaccard
    = |∩| / (|A| + |B| − |∩|) filters at the same 0.5 threshold as the
    exact tier. Unlike the df-capped corpus-wide tier
    (q_dedup_ngram_jaccard), verification needs NO stop-shingle cap —
    intersection is per-pair, so a viral shingle costs one array element,
    not width² pairs. Every true pair the capped tier reports that banding
    surfaces is reported here with jaccard ≥ the capped value (capped
    Jaccard lower-bounds exact Jaccard; pinned by a pytest)."""
    cand = minhash_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b").dropDuplicates()
    # Verification arrays come from the session's shared shingle table
    # (round 9): the trigram kernel ran once building it; this query adds
    # only the two per-candidate id-equi-joins and the row-local intersect.
    sized = shingle_table(spark, sf_dir)
    joined = cand.join(
        sized.select(
            F.col("doc_id").alias("doc_a"),
            F.col("harr").alias("ha"),
            F.col("n").alias("na"),
        ),
        "doc_a",
    ).join(
        sized.select(
            F.col("doc_id").alias("doc_b"),
            F.col("harr").alias("hb"),
            F.col("n").alias("nb"),
        ),
        "doc_b",
    )
    inter = F.size(F.array_intersect("ha", "hb")).cast("double")
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (
        joined.select("doc_a", "doc_b", F.round(jac, 2).alias("jaccard"), jac.alias("_j"))
        .filter(F.col("_j") >= 0.5)
        .drop("_j")
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------------------------- simhash -----

_SIMHASH_BITS = 64
_SIMHASH_BLOCKS = 4  # 16 bits each; hamming<=3 ==> >=1 identical block
_SIMHASH_BLOCK_BITS = _SIMHASH_BITS // _SIMHASH_BLOCKS


def _pow2():
    """array<long> of the 64 signature bit values — built lazily (a
    module-level Column literal would require an active SparkContext at
    import time). Bit 63 is the min-long literal: the same two's-complement
    bit pattern as 2^63, and distinct-power addition below is carry-free,
    so summing these terms assembles the signature exactly."""
    return F.array(
        *[F.lit(1 << k).cast("long") for k in range(_SIMHASH_BITS - 1)],
        F.lit(-(1 << (_SIMHASH_BITS - 1))).cast("long"),
    )


def simhash_signature(col) -> "F.Column":
    """64-bit SimHash of a text column, computed entirely array-side.

    Single-pass fold over md5-derived 64-bit token hashes (two 32-bit
    conv halves — md5, unlike xxhash64, exists in DuckDB, which is what
    makes the signature oracle-checkable bit-for-bit) carrying all 64
    running bit-sums (bit k of the signature = sign of Σ±1 over tokens,
    duplicates included), then one zip_with to assemble the integer. The
    per-bit loop is unrolled in Python (literal shift amounts), so the
    fold step is one flat 64-term array expression — shiftright reads
    the two's-complement bit pattern directly. No explode, no shuffle;
    with 16-bit banding blocks, candidate buckets stay 256× finer than
    an 8-bit-block scheme — the corpus-scale banding layout."""
    hashes = F.transform(
        tokens_nonempty(col),
        lambda t: F.struct(
            F.conv(F.substring(F.md5(t.cast("binary")), 1, 8), 16, 10)
            .cast("long")
            .alias("hi"),
            F.conv(F.substring(F.md5(t.cast("binary")), 9, 8), 16, 10)
            .cast("long")
            .alias("lo"),
        ),
    )
    init = F.array_repeat(F.lit(0).cast("long"), _SIMHASH_BITS)

    def _step(acc, x):
        terms = []
        for k in range(_SIMHASH_BITS):
            half, kk = (x["lo"], k) if k < 32 else (x["hi"], k - 32)
            terms.append(
                F.element_at(acc, k + 1)
                + F.when(F.shiftright(half, kk).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            )
        return F.array(*terms)

    sums = F.aggregate(hashes, init, _step)
    return F.aggregate(
        F.zip_with(sums, _pow2(), lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )


# ---- Arrow-batched signature kernels -------------------------------------
#
# The expression builders above (minhash_signature / simhash_signature) are
# the executable spec: every arithmetic step mirrors the DuckDB oracle
# verbatim. But as *hot paths* they are interpreted higher-order-function
# folds — measured ~2.7 s of each dedup query's cost at sf0.1 (5000 docs) is
# the per-element lambda evaluation, the same pathology the LSH code stage
# had (operators/similarity.py). These kernels compute the identical
# signatures (md5 via hashlib == Spark md5 of the UTF-8 bytes == DuckDB md5
# of the VARCHAR) in numpy over Arrow batches; tests/test_operators_unit.py
# pins kernel ≡ expression on the fixtures. A per-worker memo caches token/
# shingle digests — corpus vocabulary repeats heavily, so most md5 work is
# amortized away.

_TOKEN_RE_STR = "[A-Za-z0-9]+"
_MD5_MEMO_CAP = 1_000_000


def _minhash_sig_udf():
    """pandas_udf: text -> array<long> of the 16 minhash values,
    bit-identical to minhash_signature()."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    tok_re = re.compile(_TOKEN_RE_STR)
    A = np.array(_MINHASH_A, dtype=np.int64)[:, None]
    B = np.array(_MINHASH_B, dtype=np.int64)[:, None]
    memo: dict[str, int] = {}

    def h31(s: str) -> int:
        v = memo.get(s)
        if v is None:
            if len(memo) > _MD5_MEMO_CAP:
                memo.clear()
            v = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:13], 16) % _MINHASH_P
            memo[s] = v
        return v

    @F.pandas_udf(ArrayType(LongType()))
    def sig(texts):
        out = []
        for text in texts:
            # null text == empty text for crash-safety; the minhash tiers
            # additionally FILTER null-text docs out upstream (their
            # oracle self-excludes them: every min-hash of a NULL shingle
            # is NULL and the est filter never passes NULL).
            toks = tok_re.findall(text or "")
            if len(toks) >= 3:
                sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            else:
                # text or "" here too: the null-tolerance contract above
                # must hold regardless of caller filters (a NULL reaching
                # the sub-3-token fallback previously crashed h31 — found
                # via the streaming twin, which shares this kernel)
                sh = {text or ""}
            hs = np.array([h31(s) for s in sh], dtype=np.int64)
            out.append((A * hs + B) % _MINHASH_P if hs.size else A * 0 + _MINHASH_P + 1)
        return pd.Series([m.min(axis=1) if m.ndim > 1 else m.ravel() for m in out])

    return sig


def _simhash_sig_udf():
    """pandas_udf: text -> the 64-bit simhash long, bit-identical to
    simhash_signature() (including the empty-token-array -> 0 case)."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    tok_re = re.compile(_TOKEN_RE_STR)
    shifts = np.arange(_SIMHASH_BITS, dtype=np.uint64)
    memo: dict[str, int] = {}

    def h64(t: str) -> int:
        v = memo.get(t)
        if v is None:
            if len(memo) > _MD5_MEMO_CAP:
                memo.clear()
            hx = hashlib.md5(t.encode("utf-8")).hexdigest()
            # bit k of the word = bit k of lo for k<32, bit k-32 of hi above
            # — i.e. the word IS (hi << 32) | lo.
            v = (int(hx[:8], 16) << 32) | int(hx[8:16], 16)
            memo[t] = v
        return v

    @F.pandas_udf(LongType())
    def sig(texts):
        out = np.zeros(len(texts), dtype=np.uint64)
        for row, text in enumerate(texts):
            # null text == empty token bag -> the defined zero signature,
            # matching the oracle's inclusive LEFT JOIN + COALESCE(sig, 0)
            toks = tok_re.findall(text or "")
            if not toks:
                continue  # fold over an empty array leaves the zero init
            ws = np.array([h64(t) for t in toks], dtype=np.uint64)
            ones = ((ws[:, None] >> shifts) & 1).sum(axis=0)
            bits = (2 * ones > len(toks)).astype(np.uint64)
            out[row] = (bits << shifts).sum(dtype=np.uint64)
        return pd.Series(out.view(np.int64))

    return sig


def _shingle_hash_udf(k: int = 3):
    """pandas_udf: text -> array<long> of DISTINCT 60-bit k-shingle hashes
    (15 md5 hex chars — the h63 helper's name is historical; NORMALIZED-token-join fallback for docs shorter than k
    tokens, matching the jaccard-family oracles — NOT _shingles' raw-text
    fallback, which belongs to the minhash pipeline and its own oracle).
    Set-overlap measures (Jaccard, contamination counts) are invariant
    under ANY injective hash — so this kernel replaces the string shingles
    with no semantic change; the string-level oracles are the collision
    canary."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    tok_re = re.compile(_TOKEN_RE_STR)
    memo: dict[str, int] = {}

    def h63(s: str) -> int:
        v = memo.get(s)
        if v is None:
            if len(memo) > _MD5_MEMO_CAP:
                memo.clear()
            v = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
            memo[s] = v
        return v

    @F.pandas_udf(ArrayType(LongType()))
    def harr(texts):
        out = []
        for text in texts:
            toks = tok_re.findall(text or "")  # null text == zero tokens
            if len(toks) >= k:
                sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
            elif toks:
                # NORMALIZED-token fallback (" ".join(toks)), matching the
                # jaccard-family oracles' array_to_string(toks, ' ') CTE —
                # deliberately DIFFERENT from the minhash signature
                # pipeline, whose fallback is the raw text on both engines
                # ([text] in _MINHASH_CAND_CTES). Before round 6 this
                # kernel used the raw text too, silently diverging from
                # its own oracles for sub-k-token docs whose punctuation
                # differs from their token join; the fixtures carry no
                # such doc, so the divergence was latent — pinned now by
                # test_shingle_fallback_matches_oracle_on_short_docs.
                sh = {" ".join(toks)}
            else:
                # ZERO-token doc: no shingles — the doc is excluded from
                # the jaccard tiers entirely (set Jaccard is 0/0 for empty
                # sets; empty docs are the quality filter's problem, and
                # at corpus scale pairing every token-empty doc with every
                # other would be a self-inflicted viral bucket). Mirrors
                # the oracles exactly: array_to_string([], ' ') is NULL in
                # DuckDB and a NULL shingle never equi-joins. Caught by
                # the edge-corpus harness (tools/edge_corpus.py) — the
                # pre-fix kernel emitted {''} here and flagged all
                # zero-token docs as mutual jaccard-1.0 duplicates that
                # the oracle never saw.
                sh = set()
            out.append(np.array([h63(s) for s in sh], dtype=np.int64))
        return pd.Series(out)

    return harr


# Full DuckDB mirror of the simhash pipeline: identical tokens (with
# duplicates — term frequency weights the bit votes), identical md5-derived
# 32-bit hash halves, the same 64 sign-of-sum bits assembled with the same
# carry-free power-of-two addition (bit 63 = the min-long literal, so the
# signed signature matches Spark's long exactly), the same 4×16-bit block
# banding with the sorted-slice hot-bucket cap, and the same
# bit_count(xor) ≤ 3 verification.
_SIMHASH_BIT_TERMS = " +\n         ".join(
    "(CASE WHEN SUM(CASE WHEN ({half} >> {kk}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
    "THEN {pow} ELSE 0 END)".format(
        half="lo" if k < 32 else "hi",
        kk=k if k < 32 else k - 32,
        pow=(1 << k) if k < 63 else "(-9223372036854775807 - 1)",
    )
    for k in range(_SIMHASH_BITS)
)
_SIMHASH_BLOCK_CASE = "\n           ".join(
    f"WHEN {i} THEN (simhash >> {_SIMHASH_BLOCK_BITS * i}) & {(1 << _SIMHASH_BLOCK_BITS) - 1}"
    for i in range(_SIMHASH_BLOCKS)
)
_SIMHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> '')) AS token
  FROM documents
), th AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS hi,
         CAST(('0x' || substr(md5(token), 9, 8)) AS BIGINT) AS lo
  FROM tok
), sig_nz AS (
  SELECT doc_id,
         CAST({_SIMHASH_BIT_TERMS} AS BIGINT) AS simhash
  FROM th GROUP BY doc_id
), sig AS (
  -- INCLUSIVE of zero-token documents: the signature of an empty token
  -- bag is the defined zero (every bit's sum is 0, no bit set), matching
  -- the Spark kernel and simhash_signature()'s empty-fold. The bare
  -- GROUP BY above silently dropped token-empty docs (unnest of an empty
  -- list yields no rows), so the engine flagged empty-vs-empty pairs the
  -- oracle never saw — caught by tools/edge_corpus.py.
  SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
  FROM documents d LEFT JOIN sig_nz s ON d.doc_id = s.doc_id
), blocks AS (
  SELECT doc_id, bb.block_id,
         CASE bb.block_id
           {_SIMHASH_BLOCK_CASE}
         END AS block
  FROM sig, (VALUES (0), (1), (2), (3)) AS bb(block_id)
), bk AS (
  SELECT block_id, block,
         list_slice(list_sort(list(doc_id)), 1, {_BUCKET_CAP}) AS ds
  FROM blocks GROUP BY block_id, block HAVING COUNT(*) > 1
), cand AS (
  SELECT DISTINCT ua.a AS doc_a, ub.b AS doc_b
  FROM bk, UNNEST(ds) AS ua(a), UNNEST(ds) AS ub(b)
  WHERE ua.a < ub.b
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM cand c JOIN sig x ON c.doc_a = x.doc_id JOIN sig y ON c.doc_b = y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
ORDER BY doc_a, doc_b
"""


_SIMHASH_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}


def simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (doc_a, doc_b, hamming ≤ 3), deduped on the
    pair key — the shared intermediate behind q_dedup_simhash and its
    recall evaluation. Cached per (application, sf_dir) and eagerly
    materialized (localCheckpoint), the jaccard_dup_pairs /
    minhash_candidate_pairs discipline: the 64-bit Arrow signature
    kernel and the block-bucket groupBy run once per session, not once
    per consumer."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _SIMHASH_PAIR_CACHE.get(key)
    if cached is not None:
        return cached
    docs = parallelized(table(spark, sf_dir, "documents"))
    # Arrow-batched kernel == simhash_signature() bit-for-bit (pinned by
    # tests); the 64-bit-carrying expression fold is the slow path.
    sim = docs.select("doc_id", _simhash_sig_udf()("text").alias("simhash"))
    blocks = sim.select(
        F.struct("doc_id", "simhash").alias("rec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_id"),
                        F.shiftright(F.col("simhash"), _SIMHASH_BLOCK_BITS * i)
                        .bitwiseAND(F.lit((1 << _SIMHASH_BLOCK_BITS) - 1))
                        .alias("block"),
                    )
                    for i in range(_SIMHASH_BLOCKS)
                ]
            )
        ).alias("b"),
    ).select("rec", "b.block_id", "b.block")
    buckets = (
        blocks.groupBy("block_id", "block")
        .agg(F.sort_array(F.collect_list("rec")).alias("recs"))
        .filter(F.size("recs") > 1)
    )
    cand = buckets.select(
        F.explode(_pairs_within(capped_bucket(F.col("recs")))).alias("p")
    ).select(
        F.col("p.a.doc_id").alias("doc_a"),
        F.col("p.b.doc_id").alias("doc_b"),
        F.col("p.a.simhash").alias("sim_a"),
        F.col("p.b.simhash").alias("sim_b"),
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    out = (
        cand.select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .dropDuplicates(["doc_a", "doc_b"])
        .localCheckpoint()
    )
    _SIMHASH_PAIR_CACHE[key] = out
    return out


@register(
    "q_dedup_simhash",
    group="I",
    oracle=_SIMHASH_ORACLE,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signature from md5-derived token
    hashes (bit k of the signature = sign of Σ±1 over tokens), candidates
    via 4×16-bit block banding (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical
    block), exact bit_count(xor) ≤ 3 filter. The md5 base hash makes the
    whole bit-level pipeline reproducible in SQL (_SIMHASH_ORACLE), so
    this query is hash-checked, not rows-only. Pipeline shared with the
    recall evaluation via the cached simhash_dup_pairs table.

    Scale note: 16-bit blocks give 65536 buckets per band — an 8-bit
    scheme caps at 256 and turns into m² hot-bucket blowups beyond ~10^5
    docs. Residual hot blocks (e.g. a zero block from short docs) are
    width-capped by capped_bucket before pair expansion; the banding/verify
    plan shape is unchanged."""
    return simhash_dup_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


# ------------------------------------------------- n-gram Jaccard ----------

_JACCARD_THRESHOLD = 0.5

# Stop-shingle document-frequency cap: a shingle appearing in > this many
# documents (boilerplate header, empty-doc filler) is excluded from the
# intersection count BEFORE pair expansion — the one banding path where a
# viral key otherwise still costs width² pairs. Unlike capped_bucket (which
# silently slices membership), this is a *semantic* cap mirrored verbatim in
# the DuckDB oracles, so the differential check stays exact: both engines
# compute "capped Jaccard" = |∩ over shingles with df ≤ cap| / |A ∪ B|, a
# lower bound of true Jaccard that equals it whenever no shared shingle is
# viral. 128 is ~5× the widest shingle bucket observed at sf0.1, so fixture
# results are unchanged; a production corpus tunes the env knob.
_SHINGLE_DF_CAP = int(os.environ.get("SPARK_GRAFT_SHINGLE_DF_CAP", "128"))

# The pairs CTE shared by the jaccard and clusters oracles (kept in one
# f-string so the stop-shingle condition can never drift between them).
_JACCARD_ORACLE_CTES = f"""t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                ELSE [array_to_string(toks, ' ')] END) AS shingle
  FROM t
), sz AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), calm AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {_SHINGLE_DF_CAP}
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       JOIN calm c ON a.shingle = c.shingle
  GROUP BY a.doc_id, b.doc_id
)"""

_CONTAINMENT_THRESHOLD = 0.8

_JACCARD_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}
_SCORED_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}
_SHINGLE_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def shingle_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, harr, n) for EVERY document — the session's ONE corpus-wide
    trigram kernel invocation, cached per (application, sf_dir, fixture
    fingerprint) and eagerly materialized (localCheckpoint).

    Before round 9 the trigram kernel (_shingle_hash_udf) re-ran up to
    three times per session over the full corpus: once inside
    scored_pair_table's explode pipeline, once for
    q_dedup_minhash_verified's verification arrays, and once (size-only)
    for q_dedup_containment_est's size table — at sf1 each pass was the
    28 s × 32-task dominant stage, so two of the three were pure waste
    (SCALE.md "Known optimization debt"). This table is the shared
    artifact all of them read: in production, the persisted
    shingle-hash column a pipeline writes alongside the corpus at ingest
    (arrays ≈ the text's own size, so the artifact is corpus-scale but
    written ONCE — exactly the materialization a 100 TB run wants
    instead of three corpus-wide UDF passes). Thin consumers (the size
    tables: two longs per doc) project n and drop harr; Spark prunes the
    array column at the exchange, so nothing corpus-array-sized crosses a
    shuffle that only needs sizes (plan-asserted by
    test_containment_est_joins_sizes_not_arrays).

    Null/zero-token docs are INCLUDED with harr = [] / n = 0 — each
    consumer applies its own contract (the jaccard explode emits no rows
    for them; the containment tiers filter n > 0; the verified tier's
    candidate join never sees them), so this table stays contract-free
    and universally shareable."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _SHINGLE_TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    docs = parallelized(table(spark, sf_dir, "documents"))
    out = (
        docs.select("doc_id", _shingle_hash_udf()("text").alias("harr"))
        .withColumn("n", F.size("harr"))
        .localCheckpoint()
    )
    _SHINGLE_TABLE_CACHE[key] = out
    return out


def scored_pair_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared trigram-overlap DUP-PAIR table
    (doc_a < doc_b, na, nb, common): every document pair sharing at
    least one calm shingle that passes EITHER set-similarity tier's
    threshold — Jaccard (symmetric, |∩|/|∪| >= 0.5) OR containment
    (asymmetric, |∩|/min >= 0.8). Both tiers are scalar filters over
    the same five longs, so one inverted-index pipeline (the dominant
    cost: shingle kernel + bucket explode + pair aggregation) feeds
    both queries, and the disjunction is pushed INTO the materialized
    table so what gets checkpointed is only the union of the two tiers'
    supports — measured at 10x scale: 72.0M raw shared-shingle pairs
    flow through the aggregation, 187k survive the disjunction; an
    unfiltered checkpoint would persist the full 72M (467x the
    jaccard-tier support), which is exactly the write a 100 TB corpus
    cannot afford between stages. Cached + checkpointed per
    (application, sf_dir, fixture fingerprint); candidate fan-out is
    bounded by cap² per calm shingle bucket (never corpus-quadratic)."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _SCORED_PAIR_CACHE.get(key)
    if cached is not None:
        return cached
    # Shingles are shuffled as 8-byte hash values, not strings: Jaccard is
    # computed from |∩| and set sizes, both invariant under an injective
    # hash, so the equi-join keys shrink ~4× with identical results (60-bit
    # collision odds at ~1e6 distinct shingles: ~1e-7 — the string oracle
    # below is the collision canary). The hashes come from the session's
    # shared shingle table (round 9: the one corpus-wide trigram kernel
    # invocation), which also carries the set size n so there is no second
    # branch recomputing shingles for a per-doc size aggregate and no size
    # join at the end — the n column is redundant across a doc's exploded
    # rows (one long), a cheap trade for avoiding a shuffle + two joins.
    sh = shingle_table(spark, sf_dir).select(
        "doc_id", "n", F.explode("harr").alias("shingle")
    )
    buckets = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds"))
        # Width 1 buckets pair nothing; width > cap buckets are stop
        # shingles — dropped as a unit (semantic cap, mirrored in the
        # oracle CTE above), so pair expansion is bounded by cap² per
        # shingle no matter how viral the corpus boilerplate is.
        .filter((F.size("ds") > 1) & (F.size("ds") <= _SHINGLE_DF_CAP))
    )
    pairs = (
        buckets.select(F.explode(_pairs_within(F.col("ds"))).alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.n").alias("na"),
            F.col("p.b.n").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    common = F.col("common").cast("double")
    jac = common / (F.col("na") + F.col("nb") - F.col("common"))
    cont = common / F.least(F.col("na"), F.col("nb"))
    out = pairs.filter(
        (jac >= _JACCARD_THRESHOLD) | (cont >= _CONTAINMENT_THRESHOLD)
    ).localCheckpoint()
    _SCORED_PAIR_CACHE[key] = out
    return out


def jaccard_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-Jaccard dup pairs (doc_a, doc_b, jaccard ≥ threshold) —
    the shared intermediate behind q_dedup_ngram_jaccard AND
    q_dedup_clusters. Computed once per (application, sf_dir), eagerly
    materialized (localCheckpoint — tiny: a few rows per dup pair), and
    cached, so cluster assembly never re-runs the dominant shingle +
    inverted-index pipeline the pair query just ran. This is the persisted
    dup-pair table a production pipeline would write between stages.

    Pairs come from an inverted-index equi-join on shingle (only documents
    sharing a calm shingle ever meet — no cross join) via the shared
    scored_pair_table, then |∩| / (|A| + |B| − |∩|) from the carried
    set sizes."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _JACCARD_PAIR_CACHE.get(key)
    if cached is not None:
        return cached
    pairs = scored_pair_table(spark, sf_dir)
    jac = F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common"))
    out = (
        pairs.filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 2).alias("jaccard"))
        .localCheckpoint()
    )
    _JACCARD_PAIR_CACHE[key] = out
    return out


@register(
    "q_dedup_ngram_jaccard",
    group="I",
    oracle=f"""
WITH {_JACCARD_ORACLE_CTES}
SELECT p.doc_a, p.doc_b,
       ROUND(CAST(p.common AS DOUBLE) / (x.n + y.n - p.common), 2) AS jaccard
FROM pairs p JOIN sz x ON p.doc_a = x.doc_id JOIN sz y ON p.doc_b = y.doc_id
WHERE CAST(p.common AS DOUBLE) / (x.n + y.n - p.common) >= {_JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
""",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-set Jaccard near-dup pairs (threshold 0.5), with the
    oracle-mirrored stop-shingle df cap (see jaccard_dup_pairs /
    _SHINGLE_DF_CAP). Shares its pair pipeline with q_dedup_clusters via
    the per-session cache."""
    return jaccard_dup_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


@register(
    "q_dedup_containment",
    group="I",
    oracle=f"""
WITH {_JACCARD_ORACLE_CTES}
SELECT CASE WHEN x.n <= y.n THEN p.doc_a ELSE p.doc_b END AS doc_contained,
       CASE WHEN x.n <= y.n THEN p.doc_b ELSE p.doc_a END AS doc_container,
       ROUND(CAST(p.common AS DOUBLE) / LEAST(x.n, y.n), 2) AS containment,
       ROUND(CAST(p.common AS DOUBLE) / (x.n + y.n - p.common), 2) AS jaccard
FROM pairs p JOIN sz x ON p.doc_a = x.doc_id JOIN sz y ON p.doc_b = y.doc_id
WHERE CAST(p.common AS DOUBLE) / LEAST(x.n, y.n) >= {_CONTAINMENT_THRESHOLD}
ORDER BY doc_contained, doc_container
""",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT near-dup pairs (Broder's containment,
    c(A,B) = |A∩B| / |A| with A the smaller trigram set, threshold
    0.8): the partial-inclusion duplicate class — a document embedded
    inside a longer one (quoted articles, aggregator pages, doc-in-doc
    re-posts) — that symmetric Jaccard systematically under-scores
    (a 10% fragment fully contained in a page scores jaccard ≈ 0.1 but
    containment 1.0) and the prefix tier misses whenever the inclusion
    is not literally a head truncation. Emits
    (doc_contained, doc_container, containment, jaccard) — the jaccard
    column alongside shows exactly which pairs this tier rescues — with
    the contained side defined as the smaller set (ties: the lower
    doc_id, which is doc_a by the a < b pair convention).

    Scale shape: a scalar filter over the SAME shared scored_pair_table
    the Jaccard tier uses — the dominant inverted-index pipeline
    (shingle kernel → calm-bucket explode → pair aggregation, bounded
    cap² per bucket) runs once per session and feeds both tiers; this
    query adds no shuffle of its own beyond the presentation sort.
    Same stop-shingle df cap, same hashed-shingle equi-join trade, and
    the string-shingle oracle doubles as the hash-collision canary."""
    pairs = scored_pair_table(spark, sf_dir)
    cont = F.col("common").cast("double") / F.least(F.col("na"), F.col("nb"))
    jac = F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common"))
    small_is_a = F.col("na") <= F.col("nb")
    return (
        pairs.filter(cont >= _CONTAINMENT_THRESHOLD)
        .select(
            F.when(small_is_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
                "doc_contained"
            ),
            F.when(small_is_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
                "doc_container"
            ),
            F.round(cont, 2).alias("containment"),
            F.round(jac, 2).alias("jaccard"),
        )
        .orderBy("doc_contained", "doc_container")
    )


_CONT_EST_CACHE: dict[tuple[str, str], DataFrame] = {}

_CONTAINMENT_EST_ORACLE = f"""
WITH {_MINHASH_CAND_CTES}, ce_sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                ELSE [array_to_string(toks, ' ')] END) AS shingle
  FROM mh_t
), ce_sz AS (
  SELECT doc_id, COUNT(shingle) AS n FROM ce_sh GROUP BY doc_id
), est AS (
  SELECT c.doc_a, c.doc_b, ({_MINHASH_MATCHES}) AS k, sa.n AS na, sb.n AS nb
  FROM cand c JOIN mins x ON c.doc_a = x.doc_id JOIN mins y ON c.doc_b = y.doc_id
       JOIN ce_sz sa ON c.doc_a = sa.doc_id JOIN ce_sz sb ON c.doc_b = sb.doc_id
  WHERE sa.n > 0 AND sb.n > 0
)
SELECT CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS doc_contained,
       CASE WHEN na <= nb THEN doc_b ELSE doc_a END AS doc_container,
       ROUND(LEAST(CAST(k * (na + nb) AS DOUBLE)
                   / ((16 + k) * LEAST(na, nb)), 1.0), 2) AS est_containment
FROM est
WHERE CAST(k * (na + nb) AS DOUBLE) / ((16 + k) * LEAST(na, nb)) >= {_CONTAINMENT_THRESHOLD}
ORDER BY doc_contained, doc_container
"""


@register(
    "q_dedup_containment_est",
    group="I",
    oracle=_CONTAINMENT_EST_ORACLE,
)
def q_dedup_containment_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment ESTIMATED from the banded MinHash tier — the scale
    path for the partial-inclusion class: the exact tier
    (q_dedup_containment) scores the corpus-wide inverted-index pair
    table, which a 100 TB run reserves for candidates; this tier derives
    containment from artifacts the banded pipeline already has. From the
    MinHash identity ĵ = |∩|/|∪| and exact set sizes: |∩| ≈
    ĵ(na+nb)/(1+ĵ), so with ĵ = k/16 the estimate reduces to the pure
    integer ratio k·(na+nb) / ((16+k)·min(na,nb)) — one exact-int
    division per pair, bit-identical across engines (capped at 1.0 for
    presentation: signature noise can push the raw estimate past a true
    containment of 1).

    Honesty note (why the recall receipt next door matters): resemblance
    banding is biased AGAINST exactly this class — a small doc inside a
    big one has low Jaccard, so its bands rarely collide and the pair may
    never become a candidate. Production containment search uses
    bottom-k / LSH-Ensemble sketches; this tier receipts how far plain
    resemblance banding gets, it does not claim the paper result.

    Plan: the cached banded candidate table (sigs carried), the per-doc
    shingle-set SIZE table (one long per doc — the full arrays never
    join), two broadcast-ready size equi-joins, one scalar filter.
    Token-empty docs (n = 0) are out of contract on both engines — an
    unguarded zero min would emit under Spark's NaN >= T ordering.
    The scored frame is session-cached (localCheckpoint, the house
    pattern) so the recall evaluation next door consumes the persisted
    pair table instead of re-running the size kernel."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _CONT_EST_CACHE.get(key)
    if cached is not None:
        return cached.orderBy("doc_contained", "doc_container")
    cand = minhash_candidate_pairs(spark, sf_dir)
    k = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    ).cast("long")
    pairs = cand.select("doc_a", "doc_b", k.alias("k")).dropDuplicates(
        ["doc_a", "doc_b"]
    )
    # Thin projection of the shared shingle table: two longs per doc, the
    # harr column pruned before any exchange (round 9 — no size-only
    # kernel re-run).
    sized = shingle_table(spark, sf_dir).select("doc_id", "n").filter(F.col("n") > 0)
    j = pairs.join(
        sized.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a"
    ).join(
        sized.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b"
    )
    est = (F.col("k") * (F.col("na") + F.col("nb"))).cast("double") / (
        (F.lit(16) + F.col("k")) * F.least("na", "nb")
    )
    small_is_a = F.col("na") <= F.col("nb")
    out = (
        j.filter(est >= _CONTAINMENT_THRESHOLD)
        .select(
            F.when(small_is_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
                "doc_contained"
            ),
            F.when(small_is_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
                "doc_container"
            ),
            F.round(F.least(est, F.lit(1.0)), 2).alias("est_containment"),
        )
        .localCheckpoint()
    )
    _CONT_EST_CACHE[key] = out
    return out.orderBy("doc_contained", "doc_container")


def _containment_est_recall_oracle() -> str:
    """Composed oracle (the q_dedup_minhash_recall discipline): the exact
    containment tier and the banded estimate tier are both already
    oracle'd queries; the metric nests those proven texts verbatim."""
    from mapreduce_framework_api_spark.registry import REGISTRY

    truth_sql = REGISTRY["q_dedup_containment"].oracle
    cand_sql = _CONTAINMENT_EST_ORACLE
    return f"""
WITH truth AS ({truth_sql}),
     cand AS ({cand_sql}),
     hit AS (
       SELECT COUNT(*) AS n
       FROM truth t JOIN cand c
            ON t.doc_contained = c.doc_contained
           AND t.doc_container = c.doc_container
     )
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT n FROM hit) AS BIGINT) AS n_hit,
       CAST(FLOOR((SELECT n FROM hit) * 10000.0
                  / GREATEST((SELECT COUNT(*) FROM truth), 1)) AS BIGINT)
         AS recall_x10000
"""


@register(
    "q_dedup_containment_est_recall",
    group="I",
    oracle=_containment_est_recall_oracle(),
)
def q_dedup_containment_est_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the banded containment ESTIMATE against the exact
    containment tier at the same 0.8 bar — the instrument that makes the
    estimate tier honest: resemblance banding under-surfaces low-Jaccard
    inclusions by construction (see q_dedup_containment_est), and this
    number tells a deployment how much of the containment class the
    cheap tier actually catches on ITS corpus before trusting it at
    100 TB (the known cure when it reads low: bottom-k sketches or an
    LSH-Ensemble index, same banding plumbing, different hash family).
    Both sides reuse cached pipelines; the metric is one pair-keyed join
    + three broadcast-crossed single-row counts."""
    from mapreduce_framework_api_spark.operators.similarity import _pair_recall_frame

    truth = q_dedup_containment(spark, sf_dir).select(
        F.col("doc_contained").alias("vec_a"), F.col("doc_container").alias("vec_b")
    )
    cand = q_dedup_containment_est(spark, sf_dir).select(
        F.col("doc_contained").alias("vec_a"), F.col("doc_container").alias("vec_b")
    )
    return _pair_recall_frame(truth, cand)


# ------------------------------------------------- bottom-k containment ----

# Sketch size for the bottom-k containment tier. Candidate recall for a
# contained fragment with size ratio r = |A|/|B| is ~1 - (1-r)^k (see
# q_dedup_containment_bk), so k = 32 holds >96% even at r = 0.1 — the
# regime where resemblance banding collapses to ~coin-flip (the r8
# q_dedup_containment_est_recall receipt: 5000/10000). Env-tunable like
# _SHINGLE_DF_CAP (a production corpus sizes k to its fragment-ratio
# floor: candidate recall ~1-(1-r)^k); the oracle f-strings embed the
# same value, so the differential check tracks any setting.
_BK_K = int(os.environ.get("SPARK_GRAFT_BK_K", "32"))

# Candidate prefilter: a pair of LARGE sets (both shingle sets overflow
# the sketch, min(na, nb) > _BK_K) must share at least this many sketch
# VALUES before the scoring joins see it. One shared value is dominated by
# noise in that regime — common shingles hash globally, so a popular
# shingle with a small hash sits in thousands of unrelated sketches
# (measured at sf1: 35.7M distinct one-value pairs vs 1.23M with >= 2, a
# 28x cut in scoring-join input for the same ~250k surviving pairs). A
# true large-set inclusion at size ratio r shares ~k*r sketch values in
# expectation (k*0.15 ~ 5 even for small fragments), so P(>= 2) stays high
# exactly where the tier must not miss. SMALL-set pairs (the smaller side
# fits entirely in its sketch) are exempt: there a single shared value can
# be the genuine full overlap of a tiny document — the adversarial
# corpus's short-doc inclusions pair on exactly one value — and small
# sketches cannot fan out anyway. The count rides the same explode the
# pair dedup needed, map-side combinable, so the prefilter costs nothing.
# Env-tunable: raising it is the precision knob for corpora where even
# two-value collisions are common (the round-9 LSH-Ensemble evaluation's
# conclusion — tune bottom-k, don't switch hash families).
_BK_MIN_SHARED = int(os.environ.get("SPARK_GRAFT_BK_MIN_SHARED", "2"))

_BK_ORACLE_CTES = f"""bk_t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), bk_sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                ELSE [array_to_string(toks, ' ')] END) AS shingle
  FROM bk_t
), bk_h AS (
  -- 60-bit md5-prefix hash == the Spark kernel's h63 ([:15] hex chars);
  -- zero-token docs surface as a NULL shingle and are excluded here,
  -- mirroring the engine's n > 0 contract.
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
  FROM bk_sh WHERE shingle IS NOT NULL
), bk_sz AS (
  SELECT doc_id, COUNT(*) AS n FROM bk_h GROUP BY doc_id
), bk_sk AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS r
    FROM bk_h
  ) WHERE r <= {_BK_K}
), bk_calm AS (
  SELECT h FROM bk_sk GROUP BY h
  HAVING COUNT(*) > 1 AND COUNT(*) <= {_SHINGLE_DF_CAP}
), bk_cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bk_sk a JOIN bk_sk b ON a.h = b.h AND a.doc_id < b.doc_id
       JOIN bk_calm c ON a.h = c.h
       JOIN bk_sz sa ON a.doc_id = sa.doc_id
       JOIN bk_sz sb ON b.doc_id = sb.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {_BK_MIN_SHARED} OR LEAST(MIN(sa.n), MIN(sb.n)) <= {_BK_K}
), bk_m AS (
  SELECT c.doc_a, c.doc_b, s.h FROM bk_cand c JOIN bk_sk s ON s.doc_id = c.doc_a
  UNION
  SELECT c.doc_a, c.doc_b, s.h FROM bk_cand c JOIN bk_sk s ON s.doc_id = c.doc_b
), bk_low AS (
  SELECT doc_a, doc_b, h FROM (
    SELECT doc_a, doc_b, h,
           ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b ORDER BY h) AS r
    FROM bk_m
  ) WHERE r <= {_BK_K}
), bk_flag AS (
  SELECT l.doc_a, l.doc_b,
         SUM(CASE WHEN sa.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS ka,
         SUM(CASE WHEN sb.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS kb,
         SUM(CASE WHEN sa.doc_id IS NOT NULL AND sb.doc_id IS NOT NULL
                  THEN 1 ELSE 0 END) AS kboth
  FROM bk_low l
       LEFT JOIN bk_sk sa ON sa.doc_id = l.doc_a AND sa.h = l.h
       LEFT JOIN bk_sk sb ON sb.doc_id = l.doc_b AND sb.h = l.h
  GROUP BY l.doc_a, l.doc_b
)"""

# The tier's candidate select, shared verbatim by the standalone bk oracle
# AND the verified/precision composed oracles (one fragment, zero drift —
# the _JACCARD_ORACLE_CTES discipline).
_BK_PAIRS_SELECT = f"""SELECT CASE WHEN x.n <= y.n THEN f.doc_a ELSE f.doc_b END AS doc_contained,
       CASE WHEN x.n <= y.n THEN f.doc_b ELSE f.doc_a END AS doc_container,
       ROUND(CAST(f.kboth AS DOUBLE)
             / (CASE WHEN x.n <= y.n THEN f.ka ELSE f.kb END), 2) AS est_containment
FROM bk_flag f JOIN bk_sz x ON f.doc_a = x.doc_id JOIN bk_sz y ON f.doc_b = y.doc_id
WHERE (CASE WHEN x.n <= y.n THEN f.ka ELSE f.kb END) > 0
  AND CAST(f.kboth AS DOUBLE)
      / (CASE WHEN x.n <= y.n THEN f.ka ELSE f.kb END) >= {_CONTAINMENT_THRESHOLD}"""

_BK_ORACLE = f"""
WITH {_BK_ORACLE_CTES}
{_BK_PAIRS_SELECT}
ORDER BY doc_contained, doc_container
"""

# TRUE-containment rescoring of the bk candidates: exact |A∩B| over the
# FULL (uncapped) distinct shingle-hash sets — bk_h/bk_sz above are
# exactly those sets, so the rescoring joins reuse the tier's own CTEs.
# Intentionally NOT the stop-shingle-capped count the exact tier's
# `pairs` CTE uses: this tier measures uncapped containment (see the
# engine docstring), and the two agree wherever no shared shingle is
# viral (pytest-pinned on the adversarial corpus and sf0.001).
_BK_VERIFIED_ORACLE = f"""
WITH {_BK_ORACLE_CTES},
bkv_cand AS (
{_BK_PAIRS_SELECT}
), bkv_ex AS (
  SELECT c.doc_contained, c.doc_container, COUNT(*) AS inter
  FROM bkv_cand c
       JOIN bk_h a ON a.doc_id = c.doc_contained
       JOIN bk_h b ON b.doc_id = c.doc_container AND b.h = a.h
  GROUP BY c.doc_contained, c.doc_container
)
SELECT e.doc_contained, e.doc_container,
       ROUND(CAST(e.inter AS DOUBLE) / LEAST(x.n, y.n), 2) AS containment
FROM bkv_ex e JOIN bk_sz x ON e.doc_contained = x.doc_id
     JOIN bk_sz y ON e.doc_container = y.doc_id
WHERE CAST(e.inter AS DOUBLE) / LEAST(x.n, y.n) >= {_CONTAINMENT_THRESHOLD}
ORDER BY doc_contained, doc_container
"""


_BK_SKETCH_CACHE: dict[tuple[str, str], DataFrame] = {}
_BK_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}


def _bk_sketch_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n, sk): each document's bottom-k sketch — the _BK_K
    smallest of its 60-bit shingle hashes — as a pure array projection
    (array_sort + slice, whole-stage codegen) over the shared shingle
    table. Zero new corpus-wide kernels: the trigram kernel already ran
    once building shingle_table. Session-cached and eagerly materialized
    (k + 2 longs per doc — in production the sketch column persisted
    next to the minhash signature at ingest): one query plan consumes
    this frame three times (inverted index + both join sides), so
    without the checkpoint each use would re-sort the corpus-sized
    shingle arrays."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _BK_SKETCH_CACHE.get(key)
    if cached is not None:
        return cached
    out = (
        shingle_table(spark, sf_dir)
        .filter(F.col("n") > 0)
        .select("doc_id", "n", F.slice(F.array_sort("harr"), 1, _BK_K).alias("sk"))
        .localCheckpoint()
    )
    _BK_SKETCH_CACHE[key] = out
    return out


@register(
    "q_dedup_containment_bk",
    group="I",
    oracle=_BK_ORACLE,
)
def q_dedup_containment_bk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sketch containment — the containment-NATIVE cheap tier
    (Cohen & Kaplan's bottom-k summaries; the sketch family under
    LSH-Ensemble's partitioned index) that the round-8 instrument proved
    necessary: resemblance banding surfaces only 5000/10000 of the
    planted low-Jaccard inclusion class, because a small doc inside a big
    one rarely agrees on a full minhash band.

    Why bottom-k IS containment-sensitive where banding is not: for a
    true inclusion A ⊆ B, any element of B's bottom-k that belongs to A
    has rank_A ≤ rank_B ≤ k, hence is ALSO in A's bottom-k — so the pair
    shares a sketch value (and becomes a candidate via the sketch-value
    inverted index) whenever ANY of B's k smallest hashes falls in A:
    probability ~1 − (1 − |A|/|B|)^k, independent of how low the
    Jaccard is. No band agreement needed.

    Estimator (per candidate pair, from the two sketches alone): L = the
    k smallest of S(A) ∪ S(B) — a uniform size-k sample of A ∪ B by
    sketch mergeability; membership of any x ∈ L in either full set is
    decided exactly by its sketch (x ∈ L ∧ x ∈ B ⇒ rank_B(x) ≤ k).
    With A the smaller set, ĉ = |L ∩ S(A) ∩ S(B)| / |L ∩ S(A)| — the
    hypergeometric containment estimate; exact 1.0 for true full
    inclusions (every sampled element of A is in B).

    Scale shape: sketches are fixed k longs/doc projected from the
    shared shingle table (zero new kernels); candidates come from a
    sketch-value inverted index — groupBy(h) + bounded in-bucket pair
    expansion (viral sketch values, i.e. tiny-hash boilerplate
    shingles, are dropped at the same df cap as calm shingles, mirrored
    in the oracle) — then the _BK_MIN_SHARED >= 2 prefilter (see the
    constant's note: a 28x cut in scoring-join input at sf1, measured)
    before the two k-long-array equi-joins + row-local intersects.
    Work ∝ real sketch collisions, never corpus-quadratic.
    Output matches the containment family: (doc_contained,
    doc_container, est_containment ≥ 0.8), contained = smaller shingle
    set (ties → doc_a). The scored frame is session-cached
    (localCheckpoint, the house pattern) so the recall twin consumes
    the persisted pair table instead of re-running the tier."""
    return bk_pair_table(spark, sf_dir).orderBy("doc_contained", "doc_container")


def bk_pair_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bk tier's scored pair table (doc_contained, doc_container,
    est_containment >= 0.8), unordered — the session-cached frame behind
    q_dedup_containment_bk, named so the artifact store can persist it
    (the tier's scoring joins are its dominant cost once the kernel
    artifacts exist; a production pipeline writes this table exactly
    like the jaccard-family scored_pairs)."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _BK_PAIR_CACHE.get(key)
    if cached is not None:
        return cached
    sk = _bk_sketch_table(spark, sf_dir)
    inv = sk.select("doc_id", "n", F.explode("sk").alias("h"))
    buckets = (
        inv.groupBy("h")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= _SHINGLE_DF_CAP))
    )
    # Pair dedup and the min-shared prefilter are ONE aggregation (the
    # count replaces a bare dropDuplicates at identical shuffle cost,
    # with map-side partial counts); the set sizes ride the bucket
    # structs so the small-set exemption needs no extra join.
    pairs = (
        buckets.select(F.explode(_pairs_within(F.col("ds"))).alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.n").alias("na0"),
            F.col("p.b.n").alias("nb0"),
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(
            (F.col("n_shared") >= _BK_MIN_SHARED)
            | (F.least("na0", "nb0") <= _BK_K)
        )
        .select("doc_a", "doc_b")
    )
    j = pairs.join(
        sk.select(
            F.col("doc_id").alias("doc_a"), F.col("sk").alias("ska"), F.col("n").alias("na")
        ),
        "doc_a",
    ).join(
        sk.select(
            F.col("doc_id").alias("doc_b"), F.col("sk").alias("skb"), F.col("n").alias("nb")
        ),
        "doc_b",
    )
    low = F.slice(F.array_sort(F.array_union("ska", "skb")), 1, _BK_K)
    j = j.select(
        "doc_a", "doc_b", "na", "nb",
        F.size(F.array_intersect(low, F.col("ska"))).alias("ka"),
        F.size(F.array_intersect(low, F.col("skb"))).alias("kb"),
        F.size(F.array_intersect(F.array_intersect(low, F.col("ska")), F.col("skb"))).alias(
            "kboth"
        ),
    )
    small_is_a = F.col("na") <= F.col("nb")
    sample = F.when(small_is_a, F.col("ka")).otherwise(F.col("kb"))
    est = F.col("kboth").cast("double") / sample
    out = (
        j.filter((sample > 0) & (est >= _CONTAINMENT_THRESHOLD))
        .select(
            F.when(small_is_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
                "doc_contained"
            ),
            F.when(small_is_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
                "doc_container"
            ),
            F.round(est, 2).alias("est_containment"),
        )
        .localCheckpoint()
    )
    _BK_PAIR_CACHE[key] = out
    return out


def _containment_bk_recall_oracle() -> str:
    """Composed oracle (the q_dedup_containment_est_recall discipline):
    truth = the exact containment tier's proven oracle text, candidates =
    the bottom-k tier's — both nested verbatim."""
    from mapreduce_framework_api_spark.registry import REGISTRY

    truth_sql = REGISTRY["q_dedup_containment"].oracle
    return f"""
WITH truth AS ({truth_sql}),
     cand AS ({_BK_ORACLE}),
     hit AS (
       SELECT COUNT(*) AS n
       FROM truth t JOIN cand c
            ON t.doc_contained = c.doc_contained
           AND t.doc_container = c.doc_container
     )
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT n FROM hit) AS BIGINT) AS n_hit,
       CAST(FLOOR((SELECT n FROM hit) * 10000.0
                  / GREATEST((SELECT COUNT(*) FROM truth), 1)) AS BIGINT)
         AS recall_x10000
"""


@register(
    "q_dedup_containment_bk_recall",
    group="I",
    oracle=_containment_bk_recall_oracle(),
)
def q_dedup_containment_bk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the bottom-k containment tier against the exact
    containment tier at the same 0.8 bar — the receipt that the
    containment-native sketch family closes the gap resemblance banding
    leaves (the r8 est-tier instrument reads 5000/10000 on the same
    corpus; this tier's number sits next to it for direct comparison).
    Both sides reuse shared artifacts (shingle table, scored-pair
    table); the metric is one pair-keyed join + three
    broadcast-crossed single-row counts."""
    from mapreduce_framework_api_spark.operators.similarity import _pair_recall_frame

    truth = q_dedup_containment(spark, sf_dir).select(
        F.col("doc_contained").alias("vec_a"), F.col("doc_container").alias("vec_b")
    )
    cand = q_dedup_containment_bk(spark, sf_dir).select(
        F.col("doc_contained").alias("vec_a"), F.col("doc_container").alias("vec_b")
    )
    return _pair_recall_frame(truth, cand)


@register(
    "q_dedup_containment_bk_verified",
    group="I",
    oracle=_BK_VERIFIED_ORACLE,
)
def bk_verified_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-containment rescoring of the bottom-k tier's candidates —
    the q_dedup_minhash_verified composition applied to the containment
    family: candidates from the cached bk pair table, FULL shingle
    arrays fetched by two id-equi-joins against the session's shared
    shingle table, one row-local array_intersect, exact |∩|/min >= 0.8
    filter — cost ∝ |candidates|, never corpus-wide. Emits the exact
    tier's schema (doc_contained, doc_container, containment).

    Semantics, measured at sf1 (the round-9 study): this tier computes
    containment over the FULL shingle sets, while q_dedup_containment
    computes the documented STOP-SHINGLE-CAPPED containment (shared
    shingles with df > cap are excluded before pair counting — the
    viral-shingle bound that keeps the inverted index sub-quadratic).
    The two agree exactly whenever no shared shingle is viral (pinned
    by pytest on the adversarial corpus and sf0.001); on the 10x
    replica corpus they diverge MEANINGFULLY: replicas overlap mostly
    on corpus-common (viral) shingles, so the capped tier sees only
    17,472 of the ~250,600 genuine >= 0.8-true-containment pairs, while
    98% of the bk tier's 255,548 candidates verify as true inclusions
    here. I.e. the bottom-k candidate family + this rescoring is not
    just the cheap path — it is the only tier in the family that
    measures uncapped containment at sub-quadratic cost (sketches are
    built from the full arrays; candidate generation needs a shared
    calm sketch VALUE, a far weaker requirement than a calm shared
    shingle in every counted overlap). Registered round 10 (VERDICT r9
    task 1) with a composed oracle: candidates = the tier's own
    _BK_PAIRS_SELECT fragment, rescoring = exact uncapped |∩| over the
    bk_h full shingle-hash sets — both nested verbatim, zero drift."""
    cand = q_dedup_containment_bk(spark, sf_dir).select(
        "doc_contained", "doc_container"
    )
    st = shingle_table(spark, sf_dir)
    j = cand.join(
        st.select(
            F.col("doc_id").alias("doc_contained"),
            F.col("harr").alias("ha"),
            F.col("n").alias("na"),
        ),
        "doc_contained",
    ).join(
        st.select(
            F.col("doc_id").alias("doc_container"),
            F.col("harr").alias("hb"),
            F.col("n").alias("nb"),
        ),
        "doc_container",
    )
    inter = F.size(F.array_intersect("ha", "hb")).cast("double")
    cont = inter / F.least("na", "nb")
    return (
        j.filter(cont >= _CONTAINMENT_THRESHOLD)
        .select(
            "doc_contained",
            "doc_container",
            F.round(cont, 2).alias("containment"),
        )
        .orderBy("doc_contained", "doc_container")
    )


def _containment_bk_precision_oracle() -> str:
    """Composed oracle for the bk precision receipt: candidates = the bk
    tier's full oracle, verified = the true-containment rescoring oracle
    — both nested verbatim (the recall twin's discipline). Verified is a
    subset of candidates by construction, so the metric needs only the
    two counts."""
    return f"""
WITH cand AS ({_BK_ORACLE}),
     ver AS ({_BK_VERIFIED_ORACLE})
SELECT CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM ver) AS BIGINT) AS n_verified,
       CAST(FLOOR((SELECT COUNT(*) FROM ver) * 10000.0
                  / GREATEST((SELECT COUNT(*) FROM cand), 1)) AS BIGINT)
         AS precision_x10000
"""


@register(
    "q_dedup_containment_bk_precision",
    group="I",
    oracle=_containment_bk_precision_oracle(),
)
def q_dedup_containment_bk_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision of the bottom-k containment tier's >= 0.8 estimates
    against exact uncapped true containment at the same bar — the
    receipt beside the recall twin that closes the round-9 knob study's
    conclusion ("recall 1.0 everywhere; the precision lever is exact
    rescoring of candidates, not knobs"): the fraction of the tier's
    candidates that SURVIVE the q_dedup_containment_bk_verified
    rescoring. Verified rows are a subset of the candidate rows by
    construction (rescoring filters the cached bk pair table), so the
    metric is two single-row counts over already-materialized session
    artifacts — one broadcast cross, zero new corpus passes."""
    cand = q_dedup_containment_bk(spark, sf_dir)
    ver = bk_verified_containment(spark, sf_dir)
    n_cand = cand.agg(F.count("*").cast("long").alias("n_candidates"))
    n_ver = ver.agg(F.count("*").cast("long").alias("n_verified"))
    return n_cand.crossJoin(F.broadcast(n_ver)).select(
        "n_candidates",
        "n_verified",
        F.floor(
            F.col("n_verified") * 10000.0 / F.greatest(F.col("n_candidates"), F.lit(1))
        )
        .cast("long")
        .alias("precision_x10000"),
    )


_BK_INDEX_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def bk_corpus_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Persisted bottom-k containment index for the frozen 7/8 corpus —
    the ingest-lane artifacts of the round-9 containment-native tier,
    completing the modality set next to the minhash, prefix and SemDeDup
    indexes: ``value_idx`` (h → width-capped sorted corpus-id list, one
    row per calm sketch value) and ``corpus_sk`` (corpus_id, corpus_n,
    corpus-side sketch — k + 2 longs per doc). Member lists carry ids
    only; sketches attach by equi-join at probe time, so the inverted
    index never duplicates a sketch across the up-to-k values it appears
    under. Viral sketch values (boilerplate shingles with tiny hashes)
    are dropped at the same df cap as the batch tier.

    ``corpus_sk`` additionally carries ``corpus_calm_sk`` — the CALM
    subset of each doc's sketch (the values that survived the df cap,
    i.e. appear in the value index) — so the probe-time min-shared
    prefilter counts calm co-occurrences only, matching the batch
    tier's calm-bucket counting WITHOUT a streaming-side aggregation
    (round-10 advice fix: intersecting FULL sketches let a large-set
    pair sharing 1 calm + 1 viral value pass the ingest prefilter the
    batch tier would drop). Derived from the value index itself at
    build time (one explode + collect-back, batch-side, static), so
    the two artifacts can never disagree about which values are viral.
    Cached per (application, sf_dir, fixture fingerprint) like its
    three lane twins."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _BK_INDEX_CACHE.get(key)
    if cached is not None:
        return cached
    sk = _bk_sketch_table(spark, sf_dir).filter(~inc_is_new())
    value_idx = (
        sk.select("doc_id", F.explode("sk").alias("h"))
        .groupBy("h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        # Width-1 buckets STAY (an arrival can match a lone corpus doc —
        # unlike the batch self-join, a probe index has no pair-within
        # step to make them useless); only viral values are dropped.
        .filter(F.size("ds") <= _SHINGLE_DF_CAP)
        .localCheckpoint()
    )
    calm = (
        value_idx.select("h", F.explode("ds").alias("corpus_id"))
        .groupBy("corpus_id")
        .agg(F.sort_array(F.collect_list("h")).alias("corpus_calm_sk"))
    )
    corpus_sk = (
        sk.select(
            F.col("doc_id").alias("corpus_id"),
            F.col("n").alias("corpus_n"),
            F.col("sk").alias("corpus_sk"),
        )
        # Left join: a doc whose every sketch value is viral keeps an
        # empty calm set (it can never collide through the index anyway,
        # but it must not drop out of the sketch side's schema).
        .join(calm, "corpus_id", "left")
        .withColumn(
            "corpus_calm_sk",
            F.coalesce("corpus_calm_sk", F.array().cast("array<bigint>")),
        )
        .localCheckpoint()
    )
    _BK_INDEX_CACHE[key] = (value_idx, corpus_sk)
    return value_idx, corpus_sk


def bk_containment_check(
    new_docs: DataFrame, value_idx: DataFrame, corpus_sk: DataFrame
) -> DataFrame:
    """Flag partial-inclusion duplicates of arriving documents against
    the persisted bottom-k index: sketch the arrival (trigram kernel +
    array_sort/slice), equi-join the value index on each sketch value,
    explode colliding members, attach corpus sketches by id, then score
    row-locally with the SAME merged-bottom-k estimator and guards as
    q_dedup_containment_bk (min-shared prefilter counting CALM shared
    values only — via the index's corpus_calm_sk column, see
    bk_corpus_index — with the small-set exemption; sample > 0;
    threshold 0.8). Emits (new_id, corpus_id,
    est_containment, new_is_contained) — new_is_contained says which
    side is the fragment, the keep-longest resolution signal.

    Every stage is a stateless per-row transform or stream-static
    equi-join, so the SAME function serves batch callers and the
    Structured Streaming twin
    (streaming/pipelines.py::bk_containment_stream) — one semantics,
    two runtimes, the incremental_check contract: a pair colliding on
    several calm sketch values emits one row per value (append mode
    cannot host a global dropDuplicates without unbounded state);
    callers dedupe by pair key (a batch dropDuplicates / an idempotent
    sink upsert). Dirty arrivals follow the jaccard-tier contract:
    NULL-text and zero-token docs have no sketch and drop here."""
    sk_new = (
        new_docs.filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id").alias("new_id"),
            _shingle_hash_udf()("text").alias("harr"),
        )
        .select(
            "new_id",
            F.size("harr").alias("new_n"),
            F.slice(F.array_sort("harr"), 1, _BK_K).alias("new_sk"),
        )
        .filter(F.col("new_n") > 0)
    )
    cand = (
        sk_new.select("new_id", "new_n", "new_sk", F.explode("new_sk").alias("h"))
        .join(value_idx, "h")
        .select("new_id", "new_n", "new_sk", F.explode("ds").alias("corpus_id"))
    )
    j = cand.join(corpus_sk, "corpus_id")
    # Calm co-occurrences ONLY (corpus_calm_sk = the corpus doc's sketch
    # values that survived the df cap), matching the batch tier's
    # calm-bucket counting — a full-sketch intersect would also count
    # viral values the batch tier never sees (round-10 advice fix). A
    # row-local intersect instead of counting exploded cand rows per
    # pair keeps the lane aggregation-free, i.e. streaming-append-safe.
    shared = F.size(F.array_intersect("new_sk", "corpus_calm_sk"))
    prefilter = (shared >= _BK_MIN_SHARED) | (
        F.least("new_n", "corpus_n") <= _BK_K
    )
    low = F.slice(F.array_sort(F.array_union("new_sk", "corpus_sk")), 1, _BK_K)
    ka = F.size(F.array_intersect(low, F.col("new_sk")))
    kb = F.size(F.array_intersect(low, F.col("corpus_sk")))
    kboth = F.size(
        F.array_intersect(F.array_intersect(low, F.col("new_sk")), F.col("corpus_sk"))
    )
    new_is_contained = F.col("new_n") <= F.col("corpus_n")
    sample = F.when(new_is_contained, ka).otherwise(kb)
    est = kboth.cast("double") / sample
    return (
        j.filter(prefilter & (sample > 0) & (est >= _CONTAINMENT_THRESHOLD))
        .select(
            "new_id",
            "corpus_id",
            F.round(est, 2).alias("est_containment"),
            new_is_contained.alias("new_is_contained"),
        )
    )


# ------------------------------------------------- embedding cosine --------

_COSINE_DUP_THRESHOLD = 0.4


def _dot(a, b):
    """Sequential-fold dot product of two array<double> columns — the fold
    order is left-to-right on both Spark (aggregate) and DuckDB
    (list_dot_product), so results are bit-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


@register(
    "q_dedup_embedding",
    group="I",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 2) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {_COSINE_DUP_THRESHOLD}
ORDER BY vec_a, vec_b
""",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.4).

    Floats are cast to double BEFORE any arithmetic (FIXTURES.md gotcha #5).
    This is the exact tier — all pairs are scored, but through the same
    block-pair cogroup engine as q_sim_cosine_topk (cogroup_index_blocks:
    ONE Spark job, one Arrow-batched BLAS matmul per bounded
    (query-block × index-block) pair, no driver loop). Each (a < b) pair
    meets in exactly one block pair — (qblk(a), iblk(b)) — so the output
    is exact with no downstream dedup. The sub-quadratic candidate path
    for web-scale corpora is the LSH variant in operators/similarity.py
    (same output contract)."""
    # Function-level import: operators/similarity.py imports helpers from
    # this module at module level, so the reverse edge must resolve lazily.
    from mapreduce_framework_api_spark.operators.similarity import (
        _cosine_pair_kernel,
        cogroup_index_blocks,
    )

    # ordered=True: each (a < b) pair above threshold, emitted once (the
    # shared kernel — round-9 review factored the four hand-copied
    # cosine bodies into _cosine_score_matrix's single arithmetic).
    score_pair = _cosine_pair_kernel(_COSINE_DUP_THRESHOLD, ordered=True)

    pairs = cogroup_index_blocks(
        spark, sf_dir, score_pair, schema="vec_a long, vec_b long, cos_raw double"
    )
    return pairs.select("vec_a", "vec_b", F.round("cos_raw", 2).alias("cosine")).orderBy(
        "vec_a", "vec_b"
    )


# ------------------------------------------------- dup-cluster assembly ----

_CLUSTER_MAX_ITERS = 8

# Dup-cluster labels in oracle SQL: the shared jaccard CTEs + a
# transitive-closure recursive CTE, ending in
# labels(doc_id, cluster_id = min doc_id of the component). Shared by the
# clusters / canonical-election / dedup-report oracles so the edge
# definition can never drift between them. Tractable at fixture scale only
# — the quadratic closure is exactly why the Spark side iterates instead.
_LABELS_ORACLE_CTES = f"""{_JACCARD_ORACLE_CTES}, edges AS (
  SELECT p.doc_a AS src, p.doc_b AS dst
  FROM pairs p JOIN sz x ON p.doc_a = x.doc_id JOIN sz y ON p.doc_b = y.doc_id
  WHERE CAST(p.common AS DOUBLE) / (x.n + y.n - p.common) >= {_JACCARD_THRESHOLD}
), undirected AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
), reach(a, b) AS (
  SELECT src, dst FROM undirected
  UNION
  SELECT r.a, u.dst FROM reach r JOIN undirected u ON r.b = u.src
), labels AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
  FROM reach GROUP BY a
)"""


@register(
    "q_dedup_clusters",
    group="I",
    oracle=f"""
WITH RECURSIVE {_LABELS_ORACLE_CTES}
SELECT doc_id, cluster_id FROM labels ORDER BY doc_id
""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster assembly: connected components over the exact
    trigram-Jaccard dup pairs (threshold 0.5); cluster id = min doc_id in
    the component.

    Iterative min-label propagation with a FIXED iteration budget — each
    round is one equi-join + one min-aggregate, both hash-partitioned on
    doc_id, so a round is two exchanges regardless of data size (the
    standard large-graph CC recipe; GraphFrames does the same loop).
    Near-dup components are near-cliques with tiny diameters, so
    _CLUSTER_MAX_ITERS=8 is far beyond convergence for any realistic dup
    graph; the loop also early-exits when labels stop changing. The DuckDB
    oracle computes the same components via a recursive-CTE transitive
    closure — tractable at fixture scale, quadratic blowup at 100 TB,
    which is exactly why the Spark side iterates instead.

    The input edges come from jaccard_dup_pairs — the SAME materialized
    pair table q_dedup_ngram_jaccard serves, so running both queries in
    one session pays the (dominant) shingle/inverted-index cost once
    (round-1/2 finding: the clusters query used to re-derive the full
    pipeline and was the slowest query in every bench)."""
    return cluster_labels(spark, sf_dir).orderBy("doc_id")


_CLUSTER_LABEL_CACHE: dict[tuple[str, str], DataFrame] = {}


def cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every dup-involved document — the label
    propagation behind q_dedup_clusters, cached per (application, sf_dir)
    like jaccard_dup_pairs so downstream consumers (canonical election,
    dedup reporting) never re-run the iterative loop. The final-round
    labels are already localCheckpoint-materialized by the loop."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _CLUSTER_LABEL_CACHE.get(key)
    if cached is not None:
        return cached
    pairs = jaccard_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # Iterative plans MUST truncate lineage each round: without the
    # localCheckpoint, iteration k's logical plan embeds k full copies of
    # the pair-generation pipeline (tools/explain_all.py showed a
    # 467-exchange plan before this). Checkpointing materializes each
    # round's labels (tiny: one row per dup-involved doc) and restarts the
    # lineage from that snapshot — the iterative-algorithm analogue of the
    # reference having no lineage at all.
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    # Seed with round 1 directly: label(0) = min(self, direct neighbors).
    # Identity seeding would spend a full checkpointed round computing
    # exactly this; folding it into initialization removes ~2 jobs from
    # every invocation (every node appears as doc_a because edges carry
    # both directions).
    labels = (
        edges.groupBy(F.col("doc_a").alias("doc_id"))
        .agg(F.min("doc_b").alias("nbr"))
        .select("doc_id", F.least(F.col("doc_id"), F.col("nbr")).alias("label"))
        .localCheckpoint()
    )
    for _ in range(_CLUSTER_MAX_ITERS):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # The convergence flag rides in the same projection the checkpoint
        # materializes, so detecting a fixed point is a filter over the
        # already-cached round output — not a second labels join per round.
        new = F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label")))
        stepped = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                new.alias("label"),
                (new < F.col("label")).alias("changed"),
            )
            .localCheckpoint()
        )
        labels = stepped.select("doc_id", "label")
        if stepped.filter("changed").limit(1).count() == 0:
            break
    out = labels.select("doc_id", F.col("label").alias("cluster_id"))
    _CLUSTER_LABEL_CACHE[key] = out
    return out


# ------------------------------------------------- canonical election ------


@register(
    "q_dedup_canonical",
    group="I",
    oracle=f"""
WITH RECURSIVE {_LABELS_ORACLE_CTES}, ranked AS (
  SELECT l.doc_id, l.cluster_id,
         ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n_chars DESC, l.doc_id ASC) AS rk
  FROM labels l JOIN documents d ON l.doc_id = d.doc_id
)
SELECT doc_id, cluster_id,
       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_canonical
FROM ranked
ORDER BY cluster_id, doc_id
""",
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document election per dup cluster — the step a training
    pipeline runs right after cluster assembly: keep exactly one document
    per near-dup component (the longest text; ties to the lowest doc_id)
    and drop the rest. Emits every dup-involved doc with its cluster and a
    0/1 keep flag, so the downstream keep-list is `is_canonical = 1` and
    the kill-list is the complement.

    Scale shape: cluster labels are a cached materialized intermediate
    (cluster_labels — tiny relative to the corpus: one row per
    dup-involved doc), broadcast into the documents join; the election
    window runs over label-sized data partitioned by cluster_id, never
    over the corpus."""
    labels = cluster_labels(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = W.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.join(F.broadcast(labels), "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            F.when(F.col("rk") == 1, 1).otherwise(0).cast("int").alias("is_canonical"),
        )
        .orderBy("cluster_id", "doc_id")
    )


@register(
    "q_dedup_report",
    group="I",
    oracle=f"""
WITH RECURSIVE {_LABELS_ORACLE_CTES}
SELECT d.source,
       COUNT(*) AS n_docs,
       COUNT(l.cluster_id) AS n_dup_docs,
       COUNT(DISTINCT l.cluster_id) AS n_clusters,
       CAST(FLOOR(CAST(COUNT(l.cluster_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  * 10000.0 + 0.5) AS BIGINT) AS dup_rate_x10000
FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
GROUP BY d.source
ORDER BY d.source
""",
)
def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup health report: corpus size, dup-involved docs,
    distinct dup clusters, and the dup rate as an x10000-scaled integer
    (engine-independent bytes — the one double division is identical on
    both engines). This is the monitoring table a 100 TB dedup job emits
    per partition/source to catch a crawler or source gone degenerate.

    Scale shape: the corpus-sized side is one scan + one hash aggregate on
    source (low cardinality); the label side is the cached tiny
    intermediate, broadcast into a left join — no corpus-sized shuffle."""
    labels = cluster_labels(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    rate = F.count("cluster_id").cast("double") / F.count("*").cast("double")
    return (
        d.join(F.broadcast(labels), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("cluster_id").alias("n_dup_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.floor(rate * 10000.0 + 0.5).cast("bigint").alias("dup_rate_x10000"),
        )
        .orderBy("source")
    )


@register(
    "q_dedup_latest",
    group="I",
    oracle="""
WITH r AS (
  SELECT event_id, user_id, event_type, value,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC,
                                     event_id DESC) AS rk
  FROM events
)
SELECT user_id, event_type, event_id AS latest_event_id, ts_us AS latest_ts_us,
       ROUND(value, 2) AS latest_value
FROM r WHERE rk = 1
ORDER BY user_id, event_type
""",
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-wins compaction (the CDC/upsert merge every lakehouse
    table needs): per (user_id, event_type) key keep exactly the newest
    row, ties to the highest event_id — the deterministic form of
    'latest state per key'.

    Scale shape: one hash shuffle on the key and a WindowGroupLimit top-1
    — Spark prunes to one candidate per key per partition BEFORE the
    exchange sort materializes, so the shuffled payload approaches one
    row per key, not one per version. This is the batch twin of the
    streaming lane's dropDuplicatesWithinWatermark (which bounds the same
    semantics by a watermark instead of a full history)."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.unix_micros("ts").alias("ts_us")
    )
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts_us").alias("latest_ts_us"),
            F.round("value", 2).alias("latest_value"),
        )
        .orderBy("user_id", "event_type")
    )


_CHUNK_TOKENS = 10


@register(
    "q_dedup_repeated_chunks",
    group="I",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), c AS (
  SELECT doc_id,
         md5(array_to_string(
             list_slice(toks, ci * {_CHUNK_TOKENS} + 1, ci * {_CHUNK_TOKENS} + {_CHUNK_TOKENS}),
             ' ')) AS chunk_hash
  FROM t, unnest(range(len(toks) // {_CHUNK_TOKENS})) AS u(ci)
)
SELECT chunk_hash,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs,
       MIN(doc_id) AS first_doc_id
FROM c
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY chunk_hash
""",
)
def q_dedup_repeated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-chunk detection — the C4/RefinedWeb
    "remove spans duplicated across the corpus" step at fixed 10-token
    chunk granularity: every chunk whose exact token sequence appears in
    two or more documents, with its occurrence and document counts and
    the earliest containing doc (the canonical keeper). Complements the
    doc-LEVEL near-dup tiers (MinHash/SimHash/Jaccard score whole
    documents; this finds boilerplate repeated INSIDE otherwise-distinct
    documents — headers, license blocks, navigation chrome).

    Engine-exactness: chunk identity is md5 of the space-joined token
    slice — identical bytes on both engines; everything downstream is
    integer counts.

    Plan shape: chunking is a row-local explode of len/10 slices (no
    self-join — the naive "join docs on sharing a chunk" explodes
    quadratically in hot chunks); the ONLY exchange is the hash-agg on
    chunk_hash, and map-side partial aggregation absorbs within-partition
    duplicates of hot boilerplate before the wire. Shuffled payload is
    (16-byte hash, doc_id) — never text. At 100 TB this is the standard
    inverted-index build, bounded by total chunk count. The chunk explode
    (tokenize + per-chunk md5) is the expensive map stage, so the scan is
    ``parallelized`` — the sf1 receipt caught this stage serialized onto 2
    tasks (20 s) when the source is one unsplittable parquet file.

    The token array is BOUND TO A COLUMN in its own projection before the
    per-chunk lambda touches it: with the tokenize expression inlined into
    the transform, Catalyst re-evaluated the full split per CHUNK (cost
    n_chunks x tokenize per doc — measured 432 executor-CPU-seconds at
    sf1; column-bound: 53 s, same rows)."""
    docs = parallelized(table(spark, sf_dir, "documents")).select(
        "doc_id", tokens_nonempty("text").alias("toks")
    )
    toks = F.col("toks")
    # integer chunk count; guard the no-full-chunk case (F.sequence(0, -1)
    # would generate a DESCENDING [0, -1], not an empty list)
    n_chunks = F.floor(F.size(toks) / F.lit(_CHUNK_TOKENS)).cast("int")
    indices = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    c = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                indices,
                lambda ci: F.md5(
                    F.concat_ws(
                        " ", F.slice(toks, ci * _CHUNK_TOKENS + 1, _CHUNK_TOKENS)
                    ).cast("binary")
                ),
            )
        ).alias("chunk_hash"),
    )
    return (
        c.groupBy("chunk_hash")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("chunk_hash")
    )


def _minhash_recall_oracle() -> str:
    """Composed oracle: the exact-Jaccard truth set and the MinHash tier's
    output are both ALREADY oracle'd queries (q_dedup_ngram_jaccard /
    q_dedup_minhash); the recall evaluation nests those proven texts as
    CTE subqueries (DuckDB allows WITH inside a CTE body) so the metric's
    oracle can never drift from the tiers it evaluates — the same
    composition discipline as q_sim_pq_recall / q_pipe_split_leakage."""
    from mapreduce_framework_api_spark.registry import REGISTRY

    truth_sql = REGISTRY["q_dedup_ngram_jaccard"].oracle
    cand_sql = REGISTRY["q_dedup_minhash"].oracle
    return f"""
WITH truth AS ({truth_sql}),
     cand AS ({cand_sql}),
     hit AS (
       SELECT COUNT(*) AS n
       FROM truth t JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
     )
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT n FROM hit) AS BIGINT) AS n_hit,
       CAST(FLOOR((SELECT n FROM hit) * 10000.0
                  / GREATEST((SELECT COUNT(*) FROM truth), 1)) AS BIGINT)
         AS recall_x10000
"""


@register(
    "q_dedup_minhash_recall",
    group="I",
    oracle=_minhash_recall_oracle(),
)
def q_dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-tier quality evaluation — the dedup counterpart of
    q_sim_pq_recall: recall of the MinHash-LSH tier (banded candidates,
    est-Jaccard >= 0.5) against the EXACT trigram-Jaccard pair set, as
    one row of integer counts plus a floor-scaled recall. This is the
    number a production pipeline watches when it trades the exact tier's
    cost (see the sf1 receipt: exact-verify CPU grows with pair-shingle
    co-occurrences) for the banded tier's linearity: how many true
    near-dup pairs does the cheap tier actually surface?

    Plan shape: both sides reuse proven pipelines — the truth side the
    per-session cached jaccard_dup_pairs table (localCheckpoint'd; free
    when the dedup family already ran), the candidate side the minhash
    query's own plan — joined on the pair key, reduced to THREE
    single-row aggregates broadcast-crossed into one row. The metric adds
    one pair-keyed equi-join over two already-thinned pair tables; no
    new heavy lifting at any scale.

    Exactness: counts and a floor division — integer end to end
    (recall_x10000 = floor(hit * 10000 / max(truth, 1)))."""
    # Fused epilogue (r16): one full-outer join + one conditional
    # aggregation — see similarity._pair_recall_frame for the shape and
    # the pair-uniqueness argument (both sides are deduped pair tables).
    truth = jaccard_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cand = q_dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    j = truth.withColumn("t", F.lit(1)).join(
        cand.withColumn("c", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    return (
        j.agg(
            F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_truth"),
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce(F.sum(F.col("t") * F.col("c")), F.lit(0))
            .cast("long")
            .alias("n_hit"),
        )
        .select(
            "n_truth",
            "n_candidates",
            "n_hit",
            F.floor(
                F.col("n_hit") * 10000.0 / F.greatest(F.col("n_truth"), F.lit(1))
            )
            .cast("long")
            .alias("recall_x10000"),
        )
    )


# ------------------------------------------- incremental (batch-vs-corpus) --

# The production INGEST shape: a new document batch arrives and must be
# near-dup-checked against the frozen corpus index — never corpus-vs-corpus
# again. The banded index is reused (in production: persisted as the
# (band_id, bucket) -> member-list table this query's corpus side builds);
# the new batch joins it by equi-key, so ingest cost scales with
# |batch| × bands × bucket-occupancy, independent of corpus size.
_INC_ORACLE = f"""
WITH {_MINHASH_CAND_CTES.replace(", cand AS (", ", cand_unused AS (")},
     split AS (
  SELECT doc_id,
         substr(md5('incsplit#' || CAST(doc_id AS VARCHAR)), 1, 1) < '2' AS is_new
  FROM documents
), corpus_bk AS (
  SELECT b.band_id, b.bucket,
         list_slice(list_sort(list(b.doc_id)), 1, {_BUCKET_CAP}) AS ds
  FROM bands b JOIN split s ON b.doc_id = s.doc_id
  WHERE NOT s.is_new
  GROUP BY b.band_id, b.bucket
), cand AS (
  SELECT DISTINCT b.doc_id AS new_id, u.c AS corpus_id
  FROM bands b
       JOIN split s ON b.doc_id = s.doc_id
       JOIN corpus_bk k ON b.band_id = k.band_id AND b.bucket = k.bucket,
       UNNEST(k.ds) AS u(c)
  WHERE s.is_new
)
SELECT c.new_id, c.corpus_id,
       ROUND(({_MINHASH_MATCHES}) / 16.0, 2) AS est_jaccard,
       CASE WHEN LEAST(sa.n, sb.n) > 0
            THEN ROUND(LEAST(CAST(({_MINHASH_MATCHES}) * (sa.n + sb.n) AS DOUBLE)
                             / ((16 + ({_MINHASH_MATCHES})) * LEAST(sa.n, sb.n)),
                             1.0), 2)
       END AS est_containment
FROM cand c JOIN mins x ON c.new_id = x.doc_id JOIN mins y ON c.corpus_id = y.doc_id
     JOIN (SELECT doc_id, COUNT(shingle) AS n FROM (
             SELECT DISTINCT doc_id,
                    unnest(CASE WHEN len(toks) >= 3
                           THEN list_transform(range(1, len(toks) - 1),
                                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                           ELSE [array_to_string(toks, ' ')] END) AS shingle
             FROM mh_t) GROUP BY doc_id) sa ON c.new_id = sa.doc_id
     JOIN (SELECT doc_id, COUNT(shingle) AS n FROM (
             SELECT DISTINCT doc_id,
                    unnest(CASE WHEN len(toks) >= 3
                           THEN list_transform(range(1, len(toks) - 1),
                                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                           ELSE [array_to_string(toks, ' ')] END) AS shingle
             FROM mh_t) GROUP BY doc_id) sb ON c.corpus_id = sb.doc_id
WHERE ROUND(({_MINHASH_MATCHES}) / 16.0, 2) >= 0.5
ORDER BY new_id, corpus_id
"""


def inc_is_new():
    """The deterministic 1/8 ingest split predicate (doc_id column) —
    ONE definition shared by the batch query, the streaming twin, and
    mirrored verbatim in _INC_ORACLE's split CTE."""
    from mapreduce_framework_api_spark.functions.hashing import md5_flag

    return md5_flag("doc_id", "incsplit")


def _bands_of(sig_col: str = "sig"):
    """The 8-band (band_id, bucket) explode for a signature column —
    shared band layout across the minhash tiers."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.concat_ws(
                        "_",
                        F.element_at(sig_col, 2 * b + 1),
                        F.element_at(sig_col, 2 * b + 2),
                    ).alias("bucket"),
                )
                for b in range(_N_BANDS)
            ]
        )
    )


_INC_INDEX_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def incremental_corpus_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The persisted index-build artifacts for the frozen 7/8 corpus:
    (bucket_table(band_id, bucket, ds), signature_table(doc_id, sig),
    size_table(corpus_id, corpus_n — the trigram-shingle-set size, two
    longs per doc)), all eagerly materialized (localCheckpoint) — built
    ONCE, probed by every arriving batch or micro-batch. In production
    these are written tables; here the checkpoint stands in so neither
    the signature kernel nor the bucket groupBy re-runs per consumer (or
    per micro-batch in the streaming twin). The size table is what lets
    the probe emit the containment ESTIMATE alongside est-Jaccard (see
    incremental_check) without ever moving shingle arrays. Cached per
    (application, sf_dir, fixture fingerprint) like the signature table
    it derives from: "index built once, probed by every batch" should
    hold across repeated callers in one application, not just within
    one call."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _INC_INDEX_CACHE.get(key)
    if cached is not None:
        return cached
    # The frozen-corpus signatures are a doc_id-predicate filter over the
    # shared cached signature table (null contract already applied there);
    # the parent is materialized, so no second checkpoint is needed.
    sigs = minhash_sig_table(spark, sf_dir).filter(~inc_is_new())
    bands = sigs.select("doc_id", _bands_of().alias("band")).select(
        "doc_id", "band.band_id", "band.bucket"
    )
    bk = (
        bands.groupBy("band_id", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .select("band_id", "bucket", capped_bucket(F.col("ds")).alias("ds"))
        .localCheckpoint()
    )
    # Thin projection of the shared shingle table (round 9 — no size-only
    # kernel re-run). Null-text corpus docs ride along with corpus_n = 0
    # where the pre-r9 build filtered them on text: harmless, because
    # candidate corpus_ids come from the signature table, which applies
    # the null contract — a null-text size row can never join a candidate.
    sizes = (
        shingle_table(spark, sf_dir)
        .filter(~inc_is_new())
        .select(F.col("doc_id").alias("corpus_id"), F.col("n").alias("corpus_n"))
        .localCheckpoint()
    )
    _INC_INDEX_CACHE[key] = (bk, sigs, sizes)
    return bk, sigs, sizes


def incremental_check(
    new_docs: DataFrame,
    corpus_bk: DataFrame,
    corpus_sigs: DataFrame,
    corpus_sizes: DataFrame,
) -> DataFrame:
    """Flag near-dups of ``new_docs`` (doc_id, text) against the persisted
    index: sig kernel → band explode → equi-join the bucket table on
    (band_id, bucket) → explode members → est-Jaccard ≥ 0.5 from the
    carried signatures, PLUS the containment ESTIMATE (round 8) from the
    persisted size table — k·(na+nb)/((16+k)·min), the same exact
    integer ratio as q_dedup_containment_est, so a truncated/quoted
    arrival whose resemblance happens to clear banding is flagged with
    the signal that matters for keep-longest resolution (NULL when either
    shingle set is empty: the estimate is undefined there, and an
    unguarded divide diverges between engines). Every stage is stateless
    per row, so the SAME function serves the batch query and the
    Structured Streaming twin
    (streaming/pipelines.py::incremental_dedup_stream) — one semantics,
    two runtimes. A pair colliding in several bands emits one row per
    colliding band; callers dedupe by pair key (the batch query's
    dropDuplicates; a production streaming sink's idempotent upsert).
    The joins are plain equi-joins (no broadcast hint): at fixture scale
    AQE broadcasts them, at 100 TB the bucket table is corpus-sized and
    must shuffle-join.

    The minhash-tier null contract (text IS NOT NULL) is applied HERE, not
    only in callers, so both runtimes drop dirty rows identically — the
    streaming twin previously fed NULL text straight to the sig kernel."""
    sig = new_docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        _minhash_sig_udf()("text").alias("sig"),
        F.size(_shingle_hash_udf()("text")).alias("new_n"),
    )
    bands = sig.select("doc_id", "sig", "new_n", _bands_of().alias("band")).select(
        "doc_id", "sig", "new_n", "band.band_id", "band.bucket"
    )
    cand = (
        bands.join(corpus_bk, ["band_id", "bucket"])
        .select(
            F.col("doc_id").alias("new_id"),
            F.col("sig").alias("sig_a"),
            "new_n",
            F.explode("ds").alias("corpus_id"),
        )
    )
    est = cand.join(
        corpus_sigs.select(
            F.col("doc_id").alias("corpus_id"), F.col("sig").alias("sig_b")
        ),
        "corpus_id",
    ).join(corpus_sizes, "corpus_id")
    k = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
    ).cast("long")
    est_jac = k.cast("double") / _N_PERM
    min_n = F.least("new_n", "corpus_n")
    est_cont = F.when(
        min_n > 0,
        F.round(
            F.least(
                (k * (F.col("new_n") + F.col("corpus_n"))).cast("double")
                / ((F.lit(16) + k) * min_n),
                F.lit(1.0),
            ),
            2,
        ),
    )
    return est.select(
        "new_id",
        "corpus_id",
        F.round(est_jac, 2).alias("est_jaccard"),
        est_cont.alias("est_containment"),
    ).filter(F.col("est_jaccard") >= 0.5)


@register(
    "q_dedup_incremental",
    group="I",
    oracle=_INC_ORACLE,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup check: a NEW batch (deterministic 1/8 hash
    split of documents) against the FROZEN corpus (the other 7/8) — the
    production ingest shape, where corpus-vs-corpus dedup ran once at
    index-build time and every arriving batch only probes the persisted
    banded index. Output: (new_id, corpus_id, est_jaccard >= 0.5).

    Plan shape, and why it differs from q_dedup_minhash: the corpus side
    builds the (band_id, bucket) -> width-capped member-list table
    (incremental_corpus_index — in production the PERSISTED index, not
    rebuilt per batch); the new batch's bands equi-join that table by
    (band_id, bucket) — a plain hash join routed by bucket key, NOT a
    self-bucket pair expansion — so per-batch cost is |batch| × 8 bands ×
    capped occupancy, independent of corpus size. Estimated Jaccard then
    filters candidates using the signatures both sides carry
    (incremental_check — the same function the Structured Streaming twin
    drains micro-batches through). Deterministic md5 split + the shared
    minhash constants keep the full pipeline SQL-mirrorable (_INC_ORACLE
    reuses the estimate tier's CTE chain)."""
    bk, csigs, csizes = incremental_corpus_index(spark, sf_dir)
    new_docs = parallelized(table(spark, sf_dir, "documents")).filter(
        inc_is_new() & F.col("text").isNotNull()  # minhash-tier null contract
    )
    return (
        incremental_check(new_docs, bk, csigs, csizes)
        .dropDuplicates(["new_id", "corpus_id"])
        .orderBy("new_id", "corpus_id")
    )


# ------------------------------------------- simhash recall evaluation ----


def _simhash_recall_oracle() -> str:
    """Composed oracle (the q_dedup_minhash_recall discipline): nest the
    already-proven exact-Jaccard truth and SimHash tier texts as CTEs so
    the metric can never drift from the tiers it evaluates."""
    from mapreduce_framework_api_spark.registry import REGISTRY

    truth_sql = REGISTRY["q_dedup_ngram_jaccard"].oracle
    cand_sql = REGISTRY["q_dedup_simhash"].oracle
    return f"""
WITH truth AS ({truth_sql}),
     cand AS ({cand_sql}),
     hit AS (
       SELECT COUNT(*) AS n
       FROM truth t JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
     )
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT n FROM hit) AS BIGINT) AS n_hit,
       CAST(FLOOR((SELECT n FROM hit) * 10000.0
                  / GREATEST((SELECT COUNT(*) FROM truth), 1)) AS BIGINT)
         AS recall_x10000
"""


@register(
    "q_dedup_simhash_recall",
    group="I",
    oracle=_simhash_recall_oracle(),
)
def q_dedup_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-tier recall of SimHash (hamming ≤ 3 over 64-bit weighted
    token signatures) against the EXACT trigram-Jaccard pair set — the
    SimHash counterpart of q_dedup_minhash_recall, completing per-tier
    recall evaluations across every approximate dedup tier. SimHash
    measures token-MULTISET alignment while the truth is trigram-SET
    Jaccard, so this number quantifies how much near-dup signal the
    cheaper bag-of-tokens tier recovers — the metric that decides which
    candidate generator a 100 TB pipeline runs first. Plan adds one
    pair-keyed equi-join over two thin pair tables + three single-row
    broadcast-crossed aggregates."""
    # Fused epilogue (r16): one full-outer join + one conditional
    # aggregation — see similarity._pair_recall_frame for the shape and
    # the pair-uniqueness argument (both sides are deduped pair tables).
    truth = jaccard_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cand = simhash_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    j = truth.withColumn("t", F.lit(1)).join(
        cand.withColumn("c", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    return (
        j.agg(
            F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_truth"),
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce(F.sum(F.col("t") * F.col("c")), F.lit(0))
            .cast("long")
            .alias("n_hit"),
        )
        .select(
            "n_truth",
            "n_candidates",
            "n_hit",
            F.floor(
                F.col("n_hit") * 10000.0 / F.greatest(F.col("n_truth"), F.lit(1))
            )
            .cast("long")
            .alias("recall_x10000"),
        )
    )


# ------------------------------------------------- prefix/truncation dup ----

_PREFIX_BLOCK = 40  # chars; lossless blocking for docs >= this length


@register(
    "q_dedup_prefix",
    group="I",
    oracle=f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n, substr(text, 1, {_PREFIX_BLOCK}) AS blk
  FROM documents
  WHERE text IS NOT NULL AND length(text) >= {_PREFIX_BLOCK}
)
SELECT a.doc_id AS doc_trunc, b.doc_id AS doc_full,
       CAST(a.n AS BIGINT) AS len_trunc, CAST(b.n AS BIGINT) AS len_full
FROM d a JOIN d b
  ON a.blk = b.blk AND a.n < b.n AND substr(b.text, 1, a.n) = a.text
ORDER BY doc_trunc, doc_full
""",
)
def q_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-duplicate pairs: document A whose ENTIRE text is a
    strict prefix of document B's — the cut-off re-crawl / pagination
    artifact that Jaccard and MinHash systematically under-score (a 10%
    fragment of a long page shares only ~10% of its shingles yet is pure
    duplicated content). Emits (doc_trunc, doc_full) with both lengths,
    for keep-longest resolution downstream.

    Contract: docs shorter than _PREFIX_BLOCK (40) chars are out of
    scope (the blocking key is the first 40 chars, which is LOSSLESS
    exactly when the truncated side is at least that long);
    NULL texts drop; equal-length (identical) texts are q_dedup_exact's
    tier, excluded here by the strict n < m.

    Plan shape (the same thin-index/fetch split as the ingest lane's
    prefix_corpus_index/prefix_check): the self-join runs over a THIN
    frame of three longs per doc — (doc_id, n, bh = xxhash64 of the
    40-char head) — so the bh-keyed exchange never carries a document
    body; the strict n < m cut prunes candidates before any text moves.
    Bodies are then fetched for the surviving candidate pairs only, by
    doc_id equi-join against the corpus (at scale the candidate frame
    is the small side and broadcasts, so bodies stay partition-local
    map-side), and the full-prefix verification (substring compare)
    runs codegen'd on the fetched rows, which filters xxhash64
    collisions as a side effect. Candidate fan-out is bounded by
    shared-head cardinality squared, never corpus-quadratic; a
    boilerplate-head-heavy corpus widens blocks, and the documented
    fallback is a longer block prefix (the cap/overflow-audit
    discipline of the minhash tier applies the same way).
    tests/test_plan_quality.py::test_prefix_self_join_is_bodiless
    asserts no string column crosses the bh exchange."""
    docs = table(spark, sf_dir, "documents")
    d = docs.filter(
        F.col("text").isNotNull() & (F.length("text") >= _PREFIX_BLOCK)
    ).select(
        "doc_id",
        "text",
        F.length("text").alias("n"),
        F.xxhash64(F.substring("text", 1, _PREFIX_BLOCK)).alias("bh"),
    )
    thin = d.select("doc_id", "n", "bh")  # three longs per doc
    a = thin.select(F.col("doc_id").alias("doc_trunc"), F.col("n").alias("na"), "bh")
    b = thin.select(F.col("doc_id").alias("doc_full"), F.col("n").alias("nb"), "bh")
    cand = a.join(b, "bh").filter(F.col("na") < F.col("nb")).select(
        "doc_trunc", "doc_full", "na", "nb"
    )
    ta = d.select(F.col("doc_id").alias("doc_trunc"), F.col("text").alias("ta"))
    tb = d.select(F.col("doc_id").alias("doc_full"), F.col("text").alias("tb"))
    return (
        cand.join(ta, "doc_trunc")
        .join(tb, "doc_full")
        .filter(F.expr("substring(tb, 1, na)") == F.col("ta"))
        .select(
            "doc_trunc",
            "doc_full",
            F.col("na").cast("long").alias("len_trunc"),
            F.col("nb").cast("long").alias("len_full"),
        )
        .orderBy("doc_trunc", "doc_full")
    )


_PREFIX_INDEX_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def prefix_corpus_index(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Persisted index artifacts for the prefix/truncation ingest lane
    over the frozen 7/8 corpus: ``head_idx`` (bh = xxhash64 of the
    40-char head, corpus_id, corpus_n) — THREE LONGS PER DOC, eagerly
    materialized (localCheckpoint, standing in for the written index
    table) — plus a LAZY text-lookup frame over the corpus store
    (corpus_id, corpus_text) for the verification fetch. The split of
    responsibilities is the scale point: the persisted probe index
    carries no text at all; document bodies are fetched by equi-join on
    corpus_id only for head-block-colliding candidates, exactly like a
    production point lookup against the corpus table. Cached per
    (application, sf_dir, fixture fingerprint) like its minhash and
    SemDeDup twins, so "built ONCE, probed by every batch" holds across
    repeated callers (and stream setups) in one application instead of
    leaking a fresh checkpoint per call."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _PREFIX_INDEX_CACHE.get(key)
    if cached is not None:
        return cached
    corpus = _prefix_corpus_frame(spark, sf_dir)
    head_idx = corpus.select(
        F.xxhash64(F.substring("text", 1, _PREFIX_BLOCK)).alias("bh"),
        F.col("doc_id").alias("corpus_id"),
        F.length("text").alias("corpus_n"),
    ).localCheckpoint()
    lookup = corpus.select(
        F.col("doc_id").alias("corpus_id"), F.col("text").alias("corpus_text")
    )
    _PREFIX_INDEX_CACHE[key] = (head_idx, lookup)
    return head_idx, lookup


def _prefix_corpus_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prefix lane's frozen-corpus base frame (shared by the index
    builder and the artifact store's lookup reconstruction — ONE
    definition of the eligibility filter, so the store can never drift
    from the lane)."""
    return parallelized(table(spark, sf_dir, "documents")).filter(
        ~inc_is_new() & F.col("text").isNotNull() & (F.length("text") >= _PREFIX_BLOCK)
    )


def prefix_check(
    new_docs: DataFrame, head_idx: DataFrame, corpus_lookup: DataFrame
) -> DataFrame:
    """Classify arriving documents against the persisted head-block index:
    hash the 40-char head, equi-join the index on the 8-byte bh key,
    fetch colliding corpus texts by corpus_id, and verify the shared
    prefix with one codegen'd substring compare over min(len) chars —
    which simultaneously filters xxhash64 collisions. Emits
    (new_id, corpus_id, relation, new_len, corpus_len) with relation ∈
    truncation (the arrival is a cut-off copy of a corpus doc),
    extension (the arrival supersedes a truncated corpus doc — the
    keep-longest upgrade signal), exact (same length, same text).
    Every stage is a stateless per-row transform or stream-static
    equi-join, so the SAME function serves the batch query
    (q_dedup_prefix_incremental) and the Structured Streaming twin
    (streaming/pipelines.py::prefix_dedup_stream) — one semantics, two
    runtimes, like incremental_check for the minhash tier."""
    n = new_docs.filter(
        F.col("text").isNotNull() & (F.length("text") >= _PREFIX_BLOCK)
    ).select(
        F.col("doc_id").alias("new_id"),
        F.col("text").alias("new_text"),
        F.length("text").alias("new_n"),
        F.xxhash64(F.substring("text", 1, _PREFIX_BLOCK)).alias("bh"),
    )
    fetched = n.join(head_idx, "bh").join(corpus_lookup, "corpus_id")
    verified = fetched.filter(
        F.expr(
            "substring(new_text, 1, least(new_n, corpus_n)) = "
            "substring(corpus_text, 1, least(new_n, corpus_n))"
        )
    )
    relation = (
        F.when(F.col("new_n") < F.col("corpus_n"), "truncation")
        .when(F.col("new_n") > F.col("corpus_n"), "extension")
        .otherwise("exact")
    )
    return verified.select(
        "new_id",
        "corpus_id",
        relation.alias("relation"),
        F.col("new_n").cast("long").alias("new_len"),
        F.col("corpus_n").cast("long").alias("corpus_len"),
    )


@register(
    "q_dedup_prefix_incremental",
    group="I",
    oracle=f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n, substr(text, 1, {_PREFIX_BLOCK}) AS blk,
         substr(md5('incsplit#' || CAST(doc_id AS VARCHAR)), 1, 1) < '2' AS is_new
  FROM documents
  WHERE text IS NOT NULL AND length(text) >= {_PREFIX_BLOCK}
)
SELECT a.doc_id AS new_id, c.doc_id AS corpus_id,
       CASE WHEN a.n < c.n THEN 'truncation'
            WHEN a.n > c.n THEN 'extension'
            ELSE 'exact' END AS relation,
       CAST(a.n AS BIGINT) AS new_len, CAST(c.n AS BIGINT) AS corpus_len
FROM d a JOIN d c
  ON a.blk = c.blk AND a.is_new AND NOT c.is_new
WHERE substr(a.text, 1, LEAST(a.n, c.n)) = substr(c.text, 1, LEAST(a.n, c.n))
ORDER BY new_id, corpus_id
""",
)
def q_dedup_prefix_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix/truncation dedup at INGEST: the arriving 1/8 batch (the
    same deterministic md5 split as q_dedup_incremental) classified
    against the frozen corpus's persisted head-block index — catching
    re-crawls that arrive truncated (drop them) and arrivals that
    EXTEND a truncated corpus doc (the keep-longest upgrade a minhash
    probe misses when the fragment is small). Per-batch cost is
    |batch| × head-collision occupancy, independent of corpus size;
    the persisted index is three longs per corpus doc, and document
    bodies move only for verified-candidate fetches (prefix_check).
    The oracle blocks on the literal 40-char head (the engine's
    xxhash64 is an internal key whose collisions the substring
    verification removes), so both engines emit identical rows."""
    bk, lookup = prefix_corpus_index(spark, sf_dir)
    new_docs = parallelized(table(spark, sf_dir, "documents")).filter(inc_is_new())
    return prefix_check(new_docs, bk, lookup).orderBy("new_id", "corpus_id")
