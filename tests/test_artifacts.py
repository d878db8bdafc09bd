"""Persisted dedup-artifact store: parquet round-trip of the session
caches (operators/artifacts.py) — the "persist the kernel output at
ingest" production story as tested behavior."""

import json
import os

import pytest
from conftest import SF_DIR

from mapreduce_framework_api_spark.operators.artifacts import (
    load_dedup_artifacts,
    persist_dedup_artifacts,
)
from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.session import clear_session_caches

QUERIES = load_all_queries()


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_artifact_store_roundtrip_serves_queries(spark, tmp_path):
    """persist → clear caches → load → every query downstream of a
    persisted artifact returns byte-identical results while the kernels
    never re-run (the builders are served from the seeded caches). The
    store must also report the same row counts it wrote."""
    store = str(tmp_path / "artifacts")
    clear_session_caches()
    try:
        fresh = {
            name: _canon(QUERIES[name].fn(spark, SF_DIR))
            for name in (
                "q_dedup_ngram_jaccard",
                "q_dedup_containment_bk",
                "q_dedup_minhash",
            )
        }
        counts = persist_dedup_artifacts(spark, SF_DIR, store)
        assert set(counts) == {
            "shingle_table",
            "minhash_signatures",
            "scored_pairs",
            "bk_sketches",
        }
        assert all(n > 0 for n in counts.values()), counts

        clear_session_caches()
        loaded = load_dedup_artifacts(spark, SF_DIR, store)
        assert loaded == counts
        # The seeded caches ARE the seam: the builders must now return
        # the parquet-backed frames, and the queries must agree exactly.
        from mapreduce_framework_api_spark.operators import dedup
        from mapreduce_framework_api_spark.sources.readers import (
            session_cache_key,
        )

        key = session_cache_key(spark, SF_DIR, "documents")
        assert dedup.shingle_table(spark, SF_DIR) is dedup._SHINGLE_TABLE_CACHE[key]
        for name, want in fresh.items():
            assert _canon(QUERIES[name].fn(spark, SF_DIR)) == want, name
    finally:
        clear_session_caches()


def test_artifact_store_rejects_stale_fingerprint(spark, tmp_path):
    """A store built against a different (or regenerated) documents table
    must refuse to load — the explicit-staleness contract the in-memory
    caches enforce through their fingerprinted keys."""
    store = str(tmp_path / "artifacts")
    clear_session_caches()
    try:
        persist_dedup_artifacts(spark, SF_DIR, store)
        mpath = os.path.join(store, "manifest.json")
        m = json.load(open(mpath))
        m["documents_fingerprint"] = ["tampered", 0, 0]
        json.dump(m, open(mpath, "w"))
        with pytest.raises(ValueError, match="fingerprint mismatch"):
            load_dedup_artifacts(spark, SF_DIR, store)
    finally:
        clear_session_caches()
