"""Partitioning-invariance: the 1000-executor wrong-results class.

On a real cluster the shuffle layout is whatever the scheduler gives
you — a result that changes when ``spark.sql.shuffle.partitions``
changes is order-sensitive floating-point (or batch-sensitive kernel)
work leaking into the declared output, exactly the bug class that shows
up only at scale. Every query here is collected under 32 shuffle
partitions and again under 5 (with the session's shared-artifact caches
cleared between runs so the plan genuinely re-executes, including every
Arrow kernel with different batch boundaries) and must produce
IDENTICAL rows. The sample covers the float-heavy families: moment
aggregates, robust stats, TF-IDF/surprisal, anomaly z-scores,
time-weighted averages, quantiles, cosine tiers (BLAS block shapes
change with partitioning), banded minhash, PageRank, and quantile
normalization."""

import pytest

from conftest import SF_DIR

from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.session import clear_session_caches

INVARIANCE_SAMPLE = [
    "q_agg_stats",
    "q_agg_weighted_median",
    "q_agg_mad",
    "q_agg_corr_exact",
    "q_agg_winsorized",
    "q_text_tfidf",
    "q_text_surprisal",
    "q_events_anomaly",
    "q_events_autocorr",
    "q_events_timeweighted",
    "q_sketch_hist_quantile",
    "q_sim_cosine_topk",
    "q_dedup_embedding",
    "q_dedup_minhash",
    "q_dedup_semdedup",
    "q_dedup_semdedup_recall_planted",  # BLAS truth + quantizer under re-layout
    "q_dedup_containment",  # shared scored-pair disjunction under re-layout
    "q_dedup_containment_bk",  # sketch inverted index under re-layout
    "q_graph_pagerank",
    "q_pipe_quantile_norm",
    "q_stream_sliding",
]


def _canon(df):
    # str() on Python floats is repr: bit-identical doubles stringify
    # identically, so exact row equality is exactly what's asserted.
    return sorted(tuple(str(x) for x in row) for row in df.collect())


@pytest.mark.parametrize("name", INVARIANCE_SAMPLE)
def test_partition_invariance(spark, name):
    fn = load_all_queries()[name].fn
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        clear_session_caches()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _canon(fn(spark, SF_DIR))
        clear_session_caches()
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = _canon(fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
        clear_session_caches()
    assert len(a) > 0
    assert a == b
