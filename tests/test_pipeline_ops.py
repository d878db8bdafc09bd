"""Units for the corpus-management operators (operators/pipeline.py):
determinism of hash-based decisions, quota/histogram invariants."""

from pyspark.sql import functions as F

from mapreduce_framework_api_spark.registry import load_all_queries

SF = "/root/testdata/sf0.001"


def _q(name):
    return load_all_queries()[name].fn


def test_sample_hash_is_deterministic_and_subset(spark):
    a = _q("q_pipe_sample_hash")(spark, SF).collect()
    b = _q("q_pipe_sample_hash")(spark, SF).collect()
    assert a == b  # same rows, same order, every run
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert 0 < len(a) < total  # a real, proper subset (~12.5%)


def test_split_assign_partitions_whole_corpus(spark):
    out = _q("q_pipe_split_assign")(spark, SF)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert total == docs  # every doc lands in exactly one split
    splits = {r["split"] for r in out.collect()}
    assert splits <= {"train", "val", "test"}
    # hash split must be stable: train is the ~75% bucket
    by_split = out.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    counts = {r["split"]: r["n"] for r in by_split}
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)


def test_quota_cap_bounds_every_bucket(spark):
    out = _q("q_pipe_quota_cap")(spark, SF)
    worst = (
        out.groupBy("lang", "source").count().agg(F.max("count")).collect()[0][0]
    )
    assert worst <= 3
    # within a bucket, ranks are 1..n with sizes non-increasing
    rows = out.filter((F.col("lang") == out.select("lang").first()[0])).collect()
    assert all(r["rn"] >= 1 for r in rows)


def test_keep_first_covers_corpus_and_elects_min(spark):
    out = _q("q_pipe_keep_first")(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == docs
    # the elected id is a member of its own group by construction (min)
    assert out.filter(F.col("keep_doc_id").isNull()).count() == 0


def test_length_hist_partitions_all_docs(spark):
    out = _q("q_pipe_length_hist")(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == docs
    for r in rows:
        assert r["bucket_lo"] <= r["min_tokens"] <= r["max_tokens"] < r["bucket_lo"] + 10


def test_percentile_matches_manual_median(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4]], ["x"])
    got = df.agg(F.expr("percentile(x, 0.5)").alias("m")).collect()[0]["m"]
    assert got == 2.5  # linear interpolation, not nearest-rank


def test_mixture_respects_targets(spark):
    """Languages over their target share get thinned; languages under it
    keep every row; the filter is deterministic across runs."""
    from pyspark.sql import functions as F

    from mapreduce_framework_api_spark.operators.pipeline import _MIX_PERMILLE
    from mapreduce_framework_api_spark.registry import load_all_queries
    from mapreduce_framework_api_spark.sources import table

    sf = "/root/testdata/sf0.001"
    d = table(spark, sf, "documents")
    n_total = d.count()
    n_lang = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    q = load_all_queries()["q_pipe_mixture"]
    kept = {
        r["lang"]: r["n"]
        for r in q.fn(spark, sf).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in n_lang.items():
        target = _MIX_PERMILLE[lang] * n_total / 1000
        if n <= target:
            assert kept.get(lang, 0) == n, (lang, kept.get(lang), n)
        else:
            # thinned to ~target; allow hash noise of 25%
            assert kept.get(lang, 0) <= n, lang
            assert abs(kept.get(lang, 0) - target) <= max(10, 0.25 * target), (
                lang, kept.get(lang), target,
            )
    again = {
        r["lang"]: r["n"]
        for r in q.fn(spark, sf).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert kept == again


def test_pack_chunks_is_a_prefix_scan(spark):
    """The distributed two-level scan must equal the sequential scan:
    positions are the exact prefix sums of token counts in doc_id order,
    and chunk ids are pos // budget."""
    from mapreduce_framework_api_spark.operators.pipeline import _PACK_BUDGET
    from mapreduce_framework_api_spark.registry import load_all_queries

    rows = (
        load_all_queries()["q_pipe_pack_chunks"]
        .fn(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id")
        .collect()
    )
    assert rows
    pos = 0
    for r in rows:
        assert r["pos"] == pos, (r["doc_id"], r["pos"], pos)
        assert r["chunk_id"] == pos // _PACK_BUDGET
        pos += r["n_tokens"]
