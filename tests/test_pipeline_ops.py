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
