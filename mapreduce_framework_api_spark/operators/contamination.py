"""Benchmark decontamination (north-star LLM-pipeline surface).

The hygiene step every pre-training pipeline runs before a corpus ships:
flag training documents that share long n-gram windows with the evaluation
set, so benchmark text cannot leak into training data. Here the "benchmark"
is a deterministic md5-prefix sample of the corpus itself (the fixtures
carry no external benchmark), which exercises the exact plan a production
run uses — only the eval-side source changes.

Scale shape (100 TB): the eval n-gram set is tiny relative to the corpus
(benchmarks are ~1e6-1e8 n-grams), so it is DISTINCT-aggregated and
broadcast; the corpus side is one scan + one Arrow-batched shingle kernel +
a broadcast semi-join-shaped aggregation — no corpus-sized shuffle, no
pair expansion (matches aggregate per training doc, never per doc-pair).

Reference parity: the reference engine (mapreduce.{c,h}) has no
contamination operator; this extends the dedup family (SURVEY.md §2.4-bis
group I) with the same shingle/oracle conventions as q_dedup_ngram_jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.operators.dedup import _shingle_hash_udf
from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import parallelized, table

_DECON_K = 8  # n-gram window length — long enough that overlap implies leakage
_EVAL_PREFIX = "10"  # md5(doc_id) hex prefix below this => eval doc (~6.25%)

# DuckDB mirror: identical tokenization, identical k=8 shingles with the
# whole-text fallback for short docs, the same md5-prefix eval split, and
# the same distinct-overlap counts. String shingles here vs 60-bit hashed
# shingles on the Spark side — set overlap is hash-invariant, and this
# string-level oracle is the collision canary.
_DECON_NGRAM_EXPR = " || ' ' || ".join(f"toks[i+{j}]" for j in range(_DECON_K))
_DECON_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> '') AS toks,
         text,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_EVAL_PREFIX}' AS is_eval
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, is_eval,
         unnest(CASE WHEN len(toks) >= {_DECON_K}
                THEN list_transform(range(1, len(toks) - {_DECON_K - 2}),
                                    i -> {_DECON_NGRAM_EXPR})
                ELSE [text] END) AS ng
  FROM t
), ev AS (
  SELECT DISTINCT ng FROM sh WHERE is_eval
), tr AS (
  SELECT doc_id, COUNT(*) AS n FROM sh WHERE NOT is_eval GROUP BY doc_id
), hits AS (
  SELECT s.doc_id, COUNT(*) AS n_cont
  FROM sh s JOIN ev USING (ng)
  WHERE NOT s.is_eval
  GROUP BY s.doc_id
)
SELECT h.doc_id,
       t.n AS n_ngrams,
       h.n_cont AS n_contaminated,
       CAST(FLOOR(10000.0 * h.n_cont / t.n + 0.5) AS BIGINT) AS frac_x10000
FROM hits h JOIN tr t USING (doc_id)
ORDER BY doc_id
"""


@register(
    "q_dedup_decontaminate",
    group="I",
    oracle=_DECON_ORACLE,
)
def q_dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training documents sharing ≥1 distinct 8-gram with the eval
    set: (doc_id, n_ngrams, n_contaminated, frac_x10000) per contaminated
    doc. Eval membership is the deterministic md5(doc_id) prefix sample
    (< '10' ⇒ ~6.25%), so the split is reproducible on any engine.

    Plan: one corpus scan through the Arrow-batched 8-shingle kernel;
    the eval side collapses to a DISTINCT hashed-ngram set that is
    broadcast into an equi-join against the training side (both sides
    carry each (doc, ngram) once, so join multiplicity is exactly the
    overlap count — no pair blowup); one hash aggregate per training doc.
    """
    d = parallelized(table(spark, sf_dir, "documents"))
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2) < _EVAL_PREFIX
    sh = d.select(
        "doc_id",
        is_eval.alias("is_eval"),
        _shingle_hash_udf(_DECON_K)("text").alias("harr"),
    )
    train = sh.filter(~F.col("is_eval")).select(
        "doc_id", F.size("harr").alias("n"), F.explode("harr").alias("ng")
    )
    eval_ngrams = (
        sh.filter(F.col("is_eval")).select(F.explode("harr").alias("ng")).distinct()
    )
    return (
        train.join(F.broadcast(eval_ngrams), "ng")
        .groupBy("doc_id", "n")
        .agg(F.count("*").alias("n_contaminated"))
        .select(
            "doc_id",
            F.col("n").alias("n_ngrams"),
            "n_contaminated",
            F.floor(10000.0 * F.col("n_contaminated") / F.col("n") + 0.5)
            .cast("bigint")
            .alias("frac_x10000"),
        )
        .orderBy("doc_id")
    )
