"""Text operators: word count (the reference's flagship) + text analysis.

``q_text_wordcount`` re-expresses the reference's entire observable pipeline
W1–W7 (SURVEY.md §2.2; ``bin/mr-wordc.o``: byte-range scan → boundary adjust
→ tokenize → project (k,1) → exchange → BST count+sort → formatted sink) as
one declarative plan: scan → explode(split) → filter → hash-agg → sort.
Catalyst supplies what the reference hand-built: partitioned scan with
straddle handling (FileSourceScanExec), partial+final hash aggregation
instead of the single-reducer BST (``mapreduce.c:185``), and a
range-partitioned sort instead of in-order BST traversal (``print_tree``).

Scale notes (100 TB): the only shuffle is the hash-agg exchange on ``token``
with map-side partial aggregation, so shuffled bytes ≈ distinct tokens per
partition, not corpus size. The sort is a second exchange but runs over the
already-aggregated (small) result. No Python touches the hot path.

The text-analysis extensions (language ID, quality scoring, token counting,
fingerprinting) are all built from JVM-side expressions — per-row scalar
pipelines that scale embarrassingly (no shuffle at all until an optional
aggregate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.functions.textfns import (
    TOKEN_DELIM_RE,
    explode_tokens,
    tokens_nonempty,
)
from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import parallelized, session_cache_key, table

# DuckDB-side equivalent of tokens_nonempty(text).
_ORACLE_TOKS = "list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), t -> t <> '')"


@register(
    "q_text_wordcount",
    group="A",
    oracle=f"""
WITH toks AS (
  SELECT unnest({_ORACLE_TOKS}) AS token FROM documents
)
SELECT token, COUNT(*) AS cnt
FROM toks
GROUP BY token
ORDER BY token
""",
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: W1–W7 word count over documents.text.

    Tokens = ``[A-Za-z0-9]+`` runs, case-preserving, empties dropped;
    COUNT(*) per token; byte-wise ascending order (Spark's default binary
    UTF-8 string ordering == the reference's strcmp BST order).
    """
    return corpus_wordcount(spark, sf_dir).orderBy("token")


_WORDCOUNT_CACHE: dict[tuple[str, str], DataFrame] = {}


def corpus_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus token-frequency table (token, cnt) — the wordcount
    exchange that FOUR declared queries start from (wordcount itself,
    the Zipf fit, the surprisal unigram LM, the vocabulary-coverage
    curve). Computed once per (application, sf_dir), eagerly
    materialized (localCheckpoint — vocabulary-sized, tens of
    thousands of rows), and cached: the dedup-family pair-table
    discipline applied to the text family's shared scan+explode+agg
    prefix."""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _WORDCOUNT_CACHE.get(key)
    if cached is not None:
        return cached
    docs_wc = parallelized(table(spark, sf_dir, "documents"))
    out = (
        docs_wc.select(explode_tokens("text"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()
    )
    _WORDCOUNT_CACHE[key] = out
    return out


@register(
    "q_text_ngrams",
    group="I",
    oracle="""
WITH t AS (
  SELECT list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> '') AS toks
  FROM documents
), b AS (
  SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
)
SELECT bigram, COUNT(*) AS cnt
FROM b
GROUP BY bigram
ORDER BY bigram
""",
)
def q_text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts over tokenized documents.text.

    Bigrams are built array-side with ``zip_with`` over two slices — no
    self-join, no extra shuffle beyond the final count agg.

    The tokenize runs in its own projection BEFORE the explode (r16,
    guide §1.2 per-task work): the generator seed references ``toks``
    four times (two sizes, two slices), and GenerateExec evaluates its
    seed expression without the subexpression elimination ProjectExec
    gets — inlining the regex split made every document pay for
    tokenization four times (measured 2.6× on the noop-sink kernel at
    sf0.1)."""
    docs = parallelized(table(spark, sf_dir, "documents")).select(
        tokens_nonempty("text").alias("toks")
    )
    toks = F.col("toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy("bigram")
    )


@register(
    "q_text_tfidf",
    group="I",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_ORACLE_TOKS}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
), df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
)
SELECT tf.doc_id, tf.token, tf.tf,
       ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 2) AS tfidf
FROM tf, df, n
WHERE tf.token = df.token
ORDER BY tf.doc_id, tf.token
""",
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term): tf * ln(N / df), rounded.

    df(term) is a WINDOW count over the tf rows (PARTITION BY token, no
    ordering — no sort), not a second aggregate joined back: deriving df
    from tf as a separate lineage made Catalyst plan the dominant
    scan → explode → (doc, token) aggregate pipeline TWICE (the two
    subtrees are canonically equal but sat under different exchanges, so
    ReuseExchange never fired; measured two Generate nodes + two parquet
    scans in the physical plan). The window form states the reuse
    structurally: one scan, one explode, one tf shuffle, then a token
    shuffle of already-reduced (doc, term) rows. The doc-count N joins in
    via a broadcast of a 1-row aggregate (no driver-side ``count()``; its
    scan is column-pruned to doc_id)."""
    from pyspark.sql import Window as W

    docs = parallelized(table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", explode_tokens("text"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        tf.withColumn("df", F.count("*").over(W.partitionBy("token")))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 2).alias(
                "tfidf"
            ),
        )
        .orderBy("doc_id", "token")
    )


# Tiny deterministic stopword lexicons for the language-ID heuristic.
_LANG_LEXICONS = {
    "en": ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ich", "ein", "mit", "zu"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con", "para", "es"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour", "que", "sur"),
}


@register(
    "q_text_langid",
    group="I",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_ORACLE_TOKS}) AS token FROM documents
), hits AS (
  SELECT doc_id,
         SUM(CASE WHEN token IN {_LANG_LEXICONS['en']} THEN 1 ELSE 0 END) AS h_en,
         SUM(CASE WHEN token IN {_LANG_LEXICONS['de']} THEN 1 ELSE 0 END) AS h_de,
         SUM(CASE WHEN token IN {_LANG_LEXICONS['es']} THEN 1 ELSE 0 END) AS h_es,
         SUM(CASE WHEN token IN {_LANG_LEXICONS['fr']} THEN 1 ELSE 0 END) AS h_fr
  FROM toks GROUP BY doc_id
)
SELECT doc_id,
       CASE
         WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr AND h_en > 0 THEN 'en'
         WHEN h_de >= h_es AND h_de >= h_fr AND h_de > 0 THEN 'de'
         WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
         WHEN h_fr > 0 THEN 'fr'
         ELSE 'und'
       END AS lang_pred
FROM hits
ORDER BY doc_id
""",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-lexicon hit counting (deterministic heuristic).

    Per-doc token hit counts against four tiny lexicons; argmax with a fixed
    tie-break order (en > de > es > fr), 'und' when nothing hits. One
    hash-agg shuffle on doc_id; lexicon matching is a codegen'd IN-list.
    """
    docs = parallelized(table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", explode_tokens("text"))
    aggs = [
        F.sum(F.when(F.col("token").isin(*words), 1).otherwise(0)).alias(f"h_{lang}")
        for lang, words in _LANG_LEXICONS.items()
    ]
    hits = toks.groupBy("doc_id").agg(*aggs)
    h = {lang: F.col(f"h_{lang}") for lang in _LANG_LEXICONS}
    pred = (
        F.when((h["en"] >= h["de"]) & (h["en"] >= h["es"]) & (h["en"] >= h["fr"]) & (h["en"] > 0), "en")
        .when((h["de"] >= h["es"]) & (h["de"] >= h["fr"]) & (h["de"] > 0), "de")
        .when((h["es"] >= h["fr"]) & (h["es"] > 0), "es")
        .when(h["fr"] > 0, "fr")
        .otherwise("und")
    )
    return hits.select("doc_id", pred.alias("lang_pred")).orderBy("doc_id")


@register(
    "q_text_quality",
    group="I",
    oracle="""
SELECT doc_id,
       length(text) AS n_chars_m,
       len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), t -> t <> '')) AS n_tokens,
       length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS n_punct,
       ROUND(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
             / GREATEST(length(text), 1), 2) AS punct_ratio,
       ROUND(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
             / GREATEST(length(text), 1), 2) AS upper_ratio
FROM documents
ORDER BY doc_id
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: char/token counts, punctuation and
    uppercase ratios. Pure scalar pipeline — zero shuffles, fully codegen'd,
    trivially 100 TB-parallel."""
    docs = parallelized(table(spark, sf_dir, "documents"))
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", "[^A-Za-z0-9 ]", ""))
    n_upper = F.length(F.regexp_replace("text", "[^A-Z]", ""))
    denom = F.greatest(n_chars, F.lit(1))
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_m"),
        F.size(tokens_nonempty("text")).cast("long").alias("n_tokens"),
        n_punct.cast("long").alias("n_punct"),
        F.round(n_punct.cast("double") / denom, 2).alias("punct_ratio"),
        F.round(n_upper.cast("double") / denom, 2).alias("upper_ratio"),
    ).orderBy("doc_id")


@register(
    "q_text_tokens",
    group="I",
    oracle="""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_ish_tokens
FROM documents
ORDER BY doc_id
""",
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs | single digits | single symbols). Scalar-only; both
    counts stay JVM-side via regexp_extract_all/split."""
    docs = parallelized(table(spark, sf_dir, "documents"))
    ws = F.size(F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0))
    bpe = F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


@register(
    "q_text_fingerprint",
    group="I",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, {_ORACLE_TOKS} AS toks FROM documents
)
SELECT doc_id,
       CASE WHEN len(toks) < 5 THEN md5(text)
            ELSE list_aggregate(
                   list_transform(range(1, len(toks) - 3),
                                  i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])),
                   'min')
       END AS fingerprint
FROM t
ORDER BY doc_id
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-MD5 over 5-token shingles (a 1-permutation
    MinHash — deterministic and engine-portable). Short docs fall back to
    md5(text). Array-side shingling, no shuffle."""
    docs = parallelized(table(spark, sf_dir, "documents"))
    toks = tokens_nonempty("text")
    d = docs.select("doc_id", "text", toks.alias("toks"))
    n = F.size("toks")
    shingle_hashes = F.transform(
        F.sequence(F.lit(0), n - 5),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i + 1, 5))),
    )
    fp = F.when(n < 5, F.md5("text")).otherwise(F.array_min(shingle_hashes))
    return d.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


@register(
    "q_text_repetition",
    group="I",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_ORACLE_TOKS} AS toks FROM documents
), g AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              ELSE [] END AS tg
  FROM t
)
SELECT doc_id,
       len(toks) AS n_tokens,
       CAST(FLOOR(CAST(len(list_distinct(toks)) AS DOUBLE)
                  / CAST(len(toks) AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS distinct_ratio_x10000,
       CAST(FLOOR(CAST(COALESCE(list_max(list_transform(list_distinct(tg),
                                         s -> len(list_filter(tg, x -> x = s)))), 0) AS DOUBLE)
                  / CAST(GREATEST(len(tg), 1) AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS top_trigram_frac_x10000
FROM g
WHERE len(toks) > 0
ORDER BY doc_id
""",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals for quality filtering (the Gopher-style
    duplicate-n-gram family): per document, the distinct-token ratio and
    the fraction of trigram slots taken by the single most frequent
    trigram — boilerplate and degenerate loops push the first down and
    the second up. Entirely array-side per row (no explode, no shuffle:
    the mode is a transform over distinct trigrams, O(distinct·n) on
    ~100-token docs), emitted as x10000-scaled integers from fixed-order
    double expressions so both engines agree exactly."""
    docs = parallelized(table(spark, sf_dir, "documents"))
    toks = tokens_nonempty("text")
    d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
    n = F.size("toks")
    m = F.greatest(n - 2, F.lit(0))
    sh = F.slice(F.col("toks"), 1, m)
    for j in range(1, 3):
        sh = F.zip_with(sh, F.slice(F.col("toks"), 1 + j, m), lambda a, b: F.concat_ws(" ", a, b))
    tg = F.when(n >= 3, sh).otherwise(F.array().cast("array<string>"))
    d = d.select("doc_id", "toks", tg.alias("tg"))
    top_cnt = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct("tg"),
                lambda s: F.size(F.filter(F.col("tg"), lambda x: x == s)),
            )
        ),
        F.lit(0),
    )
    distinct_ratio = F.size(F.array_distinct("toks")).cast("double") / F.size("toks").cast("double")
    top_frac = top_cnt.cast("double") / F.greatest(F.size("tg"), F.lit(1)).cast("double")
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.floor(distinct_ratio * 10000.0 + 0.5).cast("long").alias("distinct_ratio_x10000"),
        F.floor(top_frac * 10000.0 + 0.5).cast("long").alias("top_trigram_frac_x10000"),
    ).orderBy("doc_id")


# Corpus-LM surprisal: floor(log2(corpus count)) per token, computed as an
# integer CASE chain (identical on both engines — no FP log whose last-ulp
# could flip a floor). 2^40 comfortably exceeds any single-token count this
# side of a ~10^13-token corpus; extend the chain if yours is bigger.
_SURPRISAL_MAX_LOG2 = 40
_SURPRISAL_CASE_SQL = "CASE " + " ".join(
    f"WHEN cnt >= {1 << b} THEN {b}" for b in range(_SURPRISAL_MAX_LOG2, 0, -1)
) + " ELSE 0 END"


def _bucket_expr(cnt):
    """floor(log2(cnt)) for cnt >= 1 as a pure-integer CASE chain."""
    e = F.lit(0)
    for b in range(1, _SURPRISAL_MAX_LOG2 + 1):
        e = F.when(cnt >= (1 << b), b).otherwise(e)
    return e


@register(
    "q_text_surprisal",
    group="I",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_ORACLE_TOKS}) AS token FROM documents
), vocab AS (
  SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
), b AS (
  SELECT token, {_SURPRISAL_CASE_SQL} AS bucket FROM vocab
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(FLOOR(100.0 * SUM(b.bucket) / COUNT(*) + 0.5) AS BIGINT)
         AS mean_bucket_x100
FROM toks t JOIN b USING (token)
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
)
def q_text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document quality signal: per doc, the mean over its
    tokens (duplicates included) of floor(log2(corpus frequency)) — the
    integer-exact stand-in for mean log-probability. Low scores flag
    rare-token-heavy documents (OCR garble, codes, non-language); high
    scores flag stopword/boilerplate-heavy ones — the cheap two-ended
    quality filter a pipeline applies before perplexity models.

    Plan: one scan explodes tokens; the vocabulary is a map-side-combined
    hash aggregate on token (shuffled bytes ≈ distinct vocabulary, not
    corpus size); scoring co-partitions doc tokens with the vocabulary on
    the token key (AQE broadcasts it when small); one final per-doc hash
    aggregate. Exact integer sums — the one division happens once per doc
    on both engines with identical operands."""
    docs = parallelized(table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", explode_tokens("text"))
    vocab = corpus_wordcount(spark, sf_dir)
    buckets = vocab.select("token", _bucket_expr(F.col("cnt")).alias("bucket"))
    return (
        toks.join(buckets, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.floor(100.0 * F.sum("bucket") / F.count("*") + 0.5)
            .cast("bigint")
            .alias("mean_bucket_x100"),
        )
        .orderBy("doc_id")
    )


_VOCAB_TOP_K = 100


@register(
    "q_text_vocab_coverage",
    group="I",
    oracle=f"""
WITH toks AS (
  SELECT unnest({_ORACLE_TOKS}) AS token FROM documents
), tf AS (
  SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
), tot AS (
  -- corpus token total straight off the doc rows (len(toks) is row-local)
  -- rather than re-aggregating tf: same number, no second token rollup
  SELECT CAST(SUM(len({_ORACLE_TOKS})) AS BIGINT) AS total FROM documents
), top AS (
  SELECT token, cnt FROM tf ORDER BY cnt DESC, token LIMIT {_VOCAB_TOP_K}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank,
       token,
       cnt,
       CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt,
       ROUND(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            * 100.0 / total, 2) AS cov_pct
FROM top, tot
ORDER BY rank
""",
)
def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build with cumulative corpus coverage: the top-K tokens
    by frequency, each tagged with how much of the whole token stream the
    vocabulary covers up to and including it (the curve a tokenizer-
    vocabulary or stopword-list decision is read off of).

    Engine-exactness: counts and the running sum are exact integers; the
    single coverage division happens once in double on identical operands
    and rounds identically (the running SUM is cast from DuckDB's HUGEINT
    back to int64, the q_pipe_pack_chunks lesson).

    Plan shape — why this scales to a 100 TB corpus:
    - token counts: one explode + partial/final hash-agg (map-side combine
      absorbs the Zipf head before the only wide shuffle);
    - the corpus total rides a 1-row aggregate over the vocab, broadcast
      back (BroadcastNestedLoopJoin with a single-row build side — the
      sanctioned scalar-broadcast shape, cf. q_subquery_scalar);
    - top-K is TakeOrderedAndProject: per-partition heaps + one K-row
      merge, NEVER a global sort of the vocabulary;
    - rank + running sum run a window over exactly K rows on one
      partition — bounded by construction, not by data volume."""
    docs = parallelized(table(spark, sf_dir, "documents"))
    tf = corpus_wordcount(spark, sf_dir)
    # Corpus total WITHOUT a second token rollup: size(tokens) is row-local,
    # so this lineage is scan -> project -> partial/final agg — no explode,
    # no wide exchange (the tf re-aggregation would shuffle the vocabulary
    # a second time just to add it up).
    total = docs.select(F.size(tokens_nonempty("text")).alias("n")).agg(
        F.sum("n").cast("long").alias("total")
    )
    top = tf.orderBy(F.desc("cnt"), "token").limit(_VOCAB_TOP_K)
    w = W.orderBy(F.desc("cnt"), "token")
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "token",
            "cnt",
            F.sum("cnt").over(cum).cast("long").alias("cum_cnt"),
            F.round(
                F.sum("cnt").over(cum).cast("double") * 100.0 / F.col("total"), 2
            ).alias("cov_pct"),
        )
        .orderBy("rank")
    )


_KEYWORDS_PER_DOC = 3


@register(
    "q_text_keywords",
    group="I",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_ORACLE_TOKS}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
), d AS (
  SELECT doc_id, token, tf,
         COUNT(*) OVER (PARTITION BY token) AS df
  FROM tf
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), r AS (
  SELECT doc_id, token, tf, df,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tf DESC, df ASC, token ASC) AS rk
  FROM d
)
SELECT r.doc_id, r.token, r.tf, CAST(r.df AS BIGINT) AS df,
       CAST(r.rk AS BIGINT) AS rk,
       ROUND(r.tf * ln(CAST(n.n_docs AS DOUBLE) / r.df), 2) AS tfidf
FROM r, n WHERE r.rk <= {_KEYWORDS_PER_DOC}
ORDER BY r.doc_id, r.rk
""",
)
def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the top-3 terms of every doc by
    (term frequency DESC, document frequency ASC, token) — highest-count
    rarest-first, the integer-deterministic proxy for tf-idf ranking (the
    rank key is PURE INTEGER, so no cross-engine ln() ulp drift can ever
    flip an ordering; the tf-idf score itself rides along rounded, under
    the repo's ROUND(x,2) FP-stability convention).

    Plan shape: one (doc, token) tf rollup (the only corpus-sized
    shuffle), df as a sort-free window count over the reduced tf rows
    (q_text_tfidf's single-lineage structure), the 1-row doc count
    broadcast, and WindowGroupLimit keeps 3 rows per doc below the
    per-doc rank sort. Keyword extraction at 100 TB is exactly the
    tf-idf pipeline plus a bounded top-k — no new scale surface."""
    docs = parallelized(table(spark, sf_dir, "documents"))
    tf = (
        docs.select("doc_id", explode_tokens("text"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    d = tf.withColumn("df", F.count("*").over(W.partitionBy("token")))
    rk = W.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), F.asc("token"))
    return (
        d.withColumn("rk", F.row_number().over(rk).cast("long"))
        .filter(F.col("rk") <= _KEYWORDS_PER_DOC)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.col("df").cast("long").alias("df"),
            "rk",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 2
            ).alias("tfidf"),
        )
        .orderBy("doc_id", "rk")
    )


_INDEX_DF_MIN = 5
_INDEX_POSTING_CAP = 32


@register(
    "q_text_inverted_index",
    group="I",
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT doc_id, t.token
  FROM documents,
       unnest(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'),
                          x -> x <> '')) AS t(token)
), capped AS (
  SELECT doc_id, token,
         ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rk
  FROM tok
)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string(list(doc_id ORDER BY doc_id) FILTER (rk <= {_INDEX_POSTING_CAP}),
                       ',') AS postings
FROM capped
GROUP BY token
HAVING COUNT(*) >= {_INDEX_DF_MIN}
ORDER BY token
""",
)
def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (the IR/search core): token → document
    frequency + the first 32 (_INDEX_POSTING_CAP) doc_ids of its sorted
    posting list; sub-5-df (_INDEX_DF_MIN) hapaxes are dropped.

    Scale shape: explode → per-(token, doc) distinct → per-token
    WindowGroupLimit (rank ≤ cap) → ONE token-keyed aggregate. The cap is
    what makes the build skew-proof: stopword-frequency tokens would
    otherwise produce corpus-sized posting ROWS — the classic index-build
    killer — but here no output array exceeds the 32-id cap
    regardless of corpus size, while df still reports the true frequency
    (the same viral-bucket discipline as MinHash's capped_bucket,
    dedup.py:276). sort_array(collect_list(...)) matches the oracle's
    list(... ORDER BY ...) without a sort exchange: ordering happens
    inside each already-grouped array. The posting list is emitted as a
    comma-joined STRING, not array<long>: declared-query outputs are
    scalar-only by contract (the external differential harness hashes a
    pandas frame and cannot factorize list cells) — the array form lives
    only inside this plan."""
    from mapreduce_framework_api_spark.functions.textfns import explode_tokens

    tok = (
        table(spark, sf_dir, "documents")
        .select("doc_id", explode_tokens("text"))
        .distinct()
    )
    w = W.partitionBy("token").orderBy("doc_id")
    return (
        tok.withColumn("rk", F.row_number().over(w))
        .groupBy("token")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("rk") <= _INDEX_POSTING_CAP, F.col("doc_id")
                            )
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= _INDEX_DF_MIN)
        .orderBy("token")
    )


_BPE_STEPS = 3
_BPE_SEP = "·"  # symbol boundary marker; cannot occur in [A-Za-z0-9]+ tokens


def _bpe_oracle() -> str:
    """Unrolled SQL mirror of the 3 BPE merge rounds (the q_graph_pagerank
    fixed-unroll discipline): each round counts frequency-weighted
    adjacent symbol pairs, picks the (count DESC, pair ASC) winner, and
    merges it by literal left-to-right replace over the boundary-safe
    encoding — identical semantics in both engines.

    Encoding: a word's symbols are joined by a DOUBLE separator with a
    single-separator pad at each end ('·a··bc·' = [a, bc]). The merge
    pattern '·a··b·' therefore only matches where BOTH symbols end at a
    boundary — a naive single-separator replace would substring-match
    'u·x' against [u, xy] and fuse across the boundary — and because the
    pattern's trailing '·' is consumed and re-emitted by the replacement,
    consecutive overlapping pairs merge leftmost-first exactly like the
    canonical list-walk BPE ('a a a a' -> 'aa aa'; proven equal to a
    sequential reference in tests/test_properties.py)."""
    selects = " UNION ALL ".join(f"SELECT * FROM t{i}" for i in range(_BPE_STEPS))
    return _bpe_oracle_ctes() + f"\nSELECT * FROM ({selects}) ORDER BY step"


def _bpe_oracle_ctes() -> str:
    """The shared WITH-chain of the BPE oracle: words0 (corpus word
    frequencies in boundary-safe symbol encoding) through
    words{_BPE_STEPS} (vocabulary after every merge), with t{i} as each
    round's winning pair. Shared by the induction oracle
    (q_text_bpe_merges selects the t{i}) and the encode oracle
    (q_text_bpe_encode aggregates words{_BPE_STEPS})."""
    sql = """
WITH words0 AS (
  SELECT '·' || array_to_string(regexp_extract_all(t.token, '(.)', 1), '··')
             || '·' AS sym,
         CAST(COUNT(*) AS BIGINT) AS freq
  FROM documents,
       unnest(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'),
                          x -> x <> '')) AS t(token)
  GROUP BY sym
)"""
    for i in range(_BPE_STEPS):
        sql += f""", p{i} AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS c FROM (
    SELECT unnest(list_transform(range(1, len(l)),
                                 j -> l[j] || '·' || l[j+1])) AS pair, freq
    FROM (SELECT string_split(trim(sym, '·'), '··') AS l, freq FROM words{i})
  ) GROUP BY pair
), t{i} AS (
  SELECT CAST({i + 1} AS BIGINT) AS step, pair AS merged_pair, c AS pair_count
  FROM p{i} ORDER BY c DESC, pair ASC LIMIT 1
), words{i + 1} AS (
  SELECT replace(sym,
                 '·' || replace((SELECT merged_pair FROM t{i}), '·', '··') || '·',
                 '·' || replace((SELECT merged_pair FROM t{i}), '·', '') || '·')
           AS sym, freq
  FROM words{i}
)"""
    return sql


@register("q_text_bpe_merges", group="I", oracle=_bpe_oracle())
def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge induction (the tokenizer-training primitive): 3 greedy
    merge rounds over the corpus vocabulary — each round counts
    frequency-weighted adjacent symbol pairs, merges the most frequent
    (ties to the lexicographically smaller pair) leftmost-first within
    each word, and rewrites the vocabulary. Emits one row per learned
    merge. Merge semantics are canonical BPE: the boundary-safe
    double-separator encoding (see _bpe_oracle) makes the literal replace
    equal to the sequential list-walk merge — a naive single-separator
    replace would fuse across symbol boundaries once multi-char symbols
    exist (caught by code review; the property test now pins the true
    semantics).

    Scale shape — the classic two-phase BPE trainer: the ONLY
    corpus-sized work is the initial token frequency count (one explode +
    one hash agg); every merge round then runs on the VOCABULARY table
    (≈100k rows for a real corpus, 64 here), with the winning pair as a
    1-row broadcast. Rounds are a fixed driver unroll (like PageRank's
    iterations); each round's vocabulary is localCheckpoint'ed because
    the rewrite references the round's winner twice — without the cut,
    lineage doubles per round (2^rounds replays of the base scan).
    Integer counts + literal left-to-right replace keep every round
    bit-identical across engines, so the greedy argmax chain carries a
    FULL oracle (an FP-scored trainer could not)."""
    _, merges = _bpe_run(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.union(m)
    return out.orderBy("step")


_BPE_RUN_CACHE: dict[tuple[str, str], tuple[DataFrame, list[DataFrame]]] = {}


def _bpe_run(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, list[DataFrame]]:
    """The shared BPE trainer pipeline (see q_text_bpe_merges for the full
    semantics/scale discussion): returns (vocabulary after all merge
    rounds, per-round winning-merge frames). Induction consumes the
    merges; encoding consumes the final vocabulary. Cached per
    (application, sf_dir) — every intermediate is localCheckpoint'ed, so
    when merges and encode run in the same session (the bench and the
    driver window both do) the trainer's corpus aggregate and checkpoint
    jobs run ONCE (the jaccard_dup_pairs discipline, dedup.py). The key
    carries a fixture fingerprint (mtime_ns + size of the documents
    parquet), not just the path — a fixture regenerated in place within
    one Spark application must retrain, not serve stale trainer output.
    (The fingerprint key now comes from the shared session_cache_key
    helper, which generalized this fix to every session cache.)"""
    key = session_cache_key(spark, sf_dir, "documents")
    cached = _BPE_RUN_CACHE.get(key)
    if cached is not None:
        return cached

    from mapreduce_framework_api_spark.functions.textfns import explode_tokens

    tok = table(spark, sf_dir, "documents").select(explode_tokens("text"))
    dbl = _BPE_SEP * 2
    words = (
        tok.groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
        .select(
            F.concat(
                F.lit(_BPE_SEP),
                F.array_join(
                    F.regexp_extract_all("token", F.lit("(.)"), F.lit(1)), dbl
                ),
                F.lit(_BPE_SEP),
            ).alias("sym"),
            "freq",
        )
        .groupBy("sym")
        .agg(F.sum("freq").cast("long").alias("freq"))
        .localCheckpoint()
    )
    merges = []
    for step in range(1, _BPE_STEPS + 1):
        pc = (
            words.withColumn(
                "l", F.split(F.expr(f"trim(BOTH '{_BPE_SEP}' FROM sym)"), dbl)
            )
            .filter(F.size("l") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(l)-2), "
                        f"j -> concat(element_at(l, j+1), '{_BPE_SEP}', element_at(l, j+2)))"
                    )
                ).alias("pair"),
                "freq",
            )
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("c"))
        )
        # The round winner is ONE row — pull it as a scalar control value
        # (the convergence-count discipline: a driver decision, not data
        # movement) instead of the old per-round localCheckpoint +
        # broadcast crossJoin. The per-round words update then applies
        # LITERAL search/replace strings — a pure vocabulary-sized
        # projection with no join, no broadcast, and no shuffle, so the
        # intermediate words frames need no checkpoint either: each
        # round's pair-count aggregate recomputes at most three cheap
        # string replaces above the ONE checkpointed corpus aggregate
        # (jobs per training run: 7 → 4; guide §1.2 / §2.4). This
        # no-checkpoint shape assumes _BPE_STEPS stays small: round k
        # replays k-1 prior replaces, O(steps²) replace evaluations per
        # run (and cached-vocabulary consumers replay all of them per
        # action) — fine at 3 steps; re-checkpoint words every N rounds
        # if the budget is ever raised.
        top1 = pc.orderBy(F.desc("c"), F.asc("pair")).limit(1).first()
        if top1 is None:
            # No mergeable pair (empty or single-symbol vocabulary): the
            # pre-r15 shape crossJoined words with the EMPTY winner frame,
            # which empties both the merge row and the vocabulary —
            # replicated literally so the fixed-unroll oracle replay and
            # the property tests see identical frames.
            merges.append(
                spark.createDataFrame(
                    [], "step long, merged_pair string, pair_count long"
                )
            )
            words = words.filter(F.lit(False))
            continue
        pair, cnt = top1["pair"], top1["c"]
        # '·a··b·' search / '·ab·' replacement: boundary-safe merge
        search = _BPE_SEP + pair.replace(_BPE_SEP, dbl) + _BPE_SEP
        merged = _BPE_SEP + pair.replace(_BPE_SEP, "") + _BPE_SEP
        merges.append(
            spark.createDataFrame(
                [(step, pair, cnt)],
                "step long, merged_pair string, pair_count long",
            )
        )
        words = words.select(
            F.replace(F.col("sym"), F.lit(search), F.lit(merged)).alias("sym"),
            "freq",
        )
    _BPE_RUN_CACHE[key] = (words, merges)
    return words, merges


def _bpe_encode_oracle() -> str:
    """Composed oracle over the shared BPE CTE chain: corpus token stats
    after applying the learned merges to every word of the vocabulary."""
    w = f"words{_BPE_STEPS}"
    return _bpe_oracle_ctes() + f""",
syms AS (
  SELECT string_split(trim(sym, '·'), '··') AS l,
         length(replace(sym, '·', '')) AS n_chars, freq
  FROM {w}
)
SELECT CAST((SELECT COUNT(*) FROM syms) AS BIGINT) AS n_words,
       CAST((SELECT SUM(freq) FROM syms) AS BIGINT)
         AS total_word_occurrences,
       CAST((SELECT SUM(freq * len(l)) FROM syms) AS BIGINT) AS total_tokens,
       CAST((SELECT SUM(freq * n_chars) FROM syms) AS BIGINT) AS total_chars,
       CAST((SELECT COUNT(DISTINCT s) FROM (SELECT unnest(l) AS s FROM syms))
            AS BIGINT) AS vocab_size,
       CAST(FLOOR((SELECT SUM(freq * n_chars) FROM syms) * 10000.0
                  / (SELECT SUM(freq * len(l)) FROM syms)) AS BIGINT)
         AS chars_per_token_x10000
"""


@register("q_text_bpe_encode", group="I", oracle=_bpe_encode_oracle())
def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING stats — the apply-the-tokenizer half that completes
    q_text_bpe_merges' train half: the corpus re-tokenized under the 3
    learned merges, reported as one row of exact integers — word count,
    frequency-weighted occurrences, total post-merge tokens, total
    characters, the symbol vocabulary size, and the compression ratio
    (chars per token, floor-scaled x10000 — the number a tokenizer
    team actually tracks).

    Plan shape: everything reuses the shared _bpe_run pipeline — the
    corpus-sized work remains the ONE initial token-frequency aggregate;
    encoding stats are a vocabulary-table scan (split + weighted sums)
    plus one distinct over exploded symbols, then three broadcast-crossed
    single-row aggregates. Merge application cost lives on the
    vocabulary, never the corpus — exactly how a production tokenizer
    applies merges to a word-frequency table and scores compression
    before committing to a vocab."""
    words, _ = _bpe_run(spark, sf_dir)
    dbl = _BPE_SEP * 2
    syms = words.select(
        F.split(F.expr(f"trim(BOTH '{_BPE_SEP}' FROM sym)"), dbl).alias("l"),
        F.length(F.replace(F.col("sym"), F.lit(_BPE_SEP), F.lit(""))).alias(
            "n_chars"
        ),
        "freq",
    )
    totals = syms.agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("freq").cast("long").alias("total_word_occurrences"),
        F.sum(F.col("freq") * F.size("l")).cast("long").alias("total_tokens"),
        F.sum(F.col("freq") * F.col("n_chars")).cast("long").alias("total_chars"),
    )
    vocab = syms.select(F.explode("l").alias("s")).agg(
        F.count_distinct("s").cast("long").alias("vocab_size")
    )
    return (
        totals.crossJoin(F.broadcast(vocab))
        .select(
            "n_words",
            "total_word_occurrences",
            "total_tokens",
            "total_chars",
            "vocab_size",
            F.floor(
                F.col("total_chars") * 10000.0 / F.col("total_tokens")
            )
            .cast("long")
            .alias("chars_per_token_x10000"),
        )
    )


def _langid_confusion_oracle() -> str:
    """Composed oracle: q_text_langid's exact hit-count + tie-break CASE,
    joined back to the labeled lang column and folded into confusion
    cells — so the classifier EVALUATION is hash-verified, not just the
    classifier."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_ORACLE_TOKS}) AS token FROM documents
), hits AS (
  SELECT doc_id,
         SUM(CASE WHEN token IN {_LANG_LEXICONS['en']} THEN 1 ELSE 0 END) AS h_en,
         SUM(CASE WHEN token IN {_LANG_LEXICONS['de']} THEN 1 ELSE 0 END) AS h_de,
         SUM(CASE WHEN token IN {_LANG_LEXICONS['es']} THEN 1 ELSE 0 END) AS h_es,
         SUM(CASE WHEN token IN {_LANG_LEXICONS['fr']} THEN 1 ELSE 0 END) AS h_fr
  FROM toks GROUP BY doc_id
), pred AS (
  SELECT doc_id,
         CASE
           WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr AND h_en > 0 THEN 'en'
           WHEN h_de >= h_es AND h_de >= h_fr AND h_de > 0 THEN 'de'
           WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
           WHEN h_fr > 0 THEN 'fr'
           ELSE 'und'
         END AS lang_pred
  FROM hits
)
SELECT d.lang, p.lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.lang = p.lang_pred THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct
FROM documents d JOIN pred p ON d.doc_id = p.doc_id
GROUP BY d.lang, p.lang_pred
ORDER BY d.lang, p.lang_pred
"""


@register("q_text_langid_confusion", group="I", oracle=_langid_confusion_oracle())
def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier EVALUATION as a declared query (the companion to
    q_sim_pq_recall's ANN evaluation): the confusion matrix of the
    stopword-lexicon language-ID heuristic against the corpus's labeled
    lang column — per (actual, predicted) cell counts, with the diagonal
    flag folded in. A data pipeline that ships a classifier without its
    confusion matrix is shipping a guess; this makes the matrix itself
    differential-checked.

    Plan shape: the prediction is q_text_langid's plan verbatim (one
    doc_id hash-agg over exploded tokens, codegen'd IN-lists); the
    matrix join is doc_id-keyed against the labels and folds into a
    |langs|²-bounded aggregate."""
    pred = q_text_langid(spark, sf_dir).select("doc_id", "lang_pred")
    labels = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        labels.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("lang") == F.col("lang_pred"), 1).otherwise(0))
            .cast("long")
            .alias("n_correct"),
        )
        .orderBy("lang", "lang_pred")
    )


_ZIPF_HEAD = 1000


@register(
    "q_text_zipf",
    group="I",
    oracle=f"""
WITH toks AS (
  SELECT unnest({_ORACLE_TOKS}) AS token FROM documents
), tc AS (
  SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens
  FROM tc
), head AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rk
  FROM tc ORDER BY cnt DESC, token LIMIT {_ZIPF_HEAD}
), fit AS (
  SELECT ROUND(regr_slope(ln(cnt), ln(rk)), 2) AS zipf_slope,
         ROUND(regr_intercept(ln(cnt), ln(rk)), 2) AS zipf_intercept,
         ROUND(regr_r2(ln(cnt), ln(rk)), 2) AS zipf_r2,
         CAST(SUM(cnt) AS BIGINT) AS head_tokens
  FROM head
)
SELECT n_types, n_tokens, zipf_slope, zipf_intercept, zipf_r2,
       ROUND(CAST(head_tokens AS DOUBLE) / n_tokens, 2) AS head_share
FROM tot, fit
""",
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit of the corpus token distribution: OLS of
    ln(frequency) on ln(rank) over the top-1000 types, plus the head's
    share of total token mass — the one-row corpus-health statistic
    that catches template/boilerplate corpora (slope near 0, head_share
    near 1) and degenerate tokenization (|slope| >> 1) before a corpus
    ships to training. Natural-language corpora sit near slope -1
    (Zipf's law); this corpus's fit is the declared, differential-
    checked number.

    Engine-exactness: rank ties break on (cnt DESC, token ASC) — a
    total order, so both engines fit the identical 1000 (rank, cnt)
    points; the regression sums run over 1000 O(1)-magnitude doubles,
    orders of magnitude inside the ROUND(x, 2) contract.

    Plan shape: one token hash-agg (the wordcount exchange), a
    TakeOrdered top-1000 head (never a global sort), and the OLS as a
    built-in regr_* aggregate over the 1000-row head — the corpus-sized
    work is exactly one aggregation; everything after is
    dimension-sized. n_types/n_tokens ride the same counts frame and
    broadcast-join into the single output row."""
    tc = corpus_wordcount(spark, sf_dir)
    tot = tc.agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("cnt").cast("long").alias("n_tokens"),
    )
    head = (
        tc.orderBy(F.desc("cnt"), "token")
        .limit(_ZIPF_HEAD)
        .select(
            "cnt",
            F.row_number().over(W.orderBy(F.desc("cnt"), "token")).alias("rk"),
        )
    )
    y, x = F.log(F.col("cnt")), F.log(F.col("rk"))
    fit = head.agg(
        F.round(F.regr_slope(y, x), 2).alias("zipf_slope"),
        F.round(F.regr_intercept(y, x), 2).alias("zipf_intercept"),
        F.round(F.regr_r2(y, x), 2).alias("zipf_r2"),
        F.sum("cnt").cast("long").alias("head_tokens"),
    )
    return tot.crossJoin(F.broadcast(fit)).select(
        "n_types",
        "n_tokens",
        "zipf_slope",
        "zipf_intercept",
        "zipf_r2",
        F.round(F.col("head_tokens").cast("double") / F.col("n_tokens"), 2).alias(
            "head_share"
        ),
    )
