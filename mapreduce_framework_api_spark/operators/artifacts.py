"""Persisted dedup-artifact store: the session caches as an on-disk index
layer.

SCALE.md's recurring production note — "a 100 TB pipeline persists this
table at ingest instead of re-running the kernel" — as a real API. The
four kernel-derived corpus artifacts every dedup/similarity session
rebuilds (the trigram shingle table, the MinHash signature table, the
scored dup-pair support, the bottom-k sketch table) are exactly the
columns an ingest job would write next to the corpus ONCE; afterwards any
number of sessions (or any number of queries inside one) read them back
instead of paying the Arrow-kernel passes — the dominant cost of every
set-similarity tier (at sf1 the trigram kernel alone is a 28 s × 32-task
stage; see SCALE.md).

``persist_dedup_artifacts`` materializes each artifact to parquet under
``out_dir`` with a manifest carrying the source-corpus fingerprint;
``load_dedup_artifacts`` validates the fingerprint (a stale store against
a regenerated corpus is an explicit error, the same staleness contract as
the in-memory caches' fingerprinted keys) and seeds the session caches,
so every existing builder — and every registered query downstream of one
— transparently serves from disk. No query code changes: the cache dicts
are the seam.

Scale shape: writes are one job per artifact (the build plans already
exist; parquet adds columnar compression — the shingle arrays are the
only corpus-scale artifact, the rest are thin). Loads are lazy parquet
scans: nothing is read until a consumer's plan executes, and column
pruning applies (a consumer projecting only ``n`` never reads ``harr``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from mapreduce_framework_api_spark.sources.readers import (
    fixture_fingerprint,
    session_cache_key,
)

_MANIFEST = "manifest.json"


def _artifact_specs():
    """name -> (builder, cache dict). Resolved lazily so importing this
    module never forces the operator modules (and their kernels)."""
    from mapreduce_framework_api_spark.operators import dedup

    return {
        "shingle_table": (dedup.shingle_table, dedup._SHINGLE_TABLE_CACHE),
        "minhash_signatures": (dedup.minhash_sig_table, dedup._MINHASH_SIG_CACHE),
        "scored_pairs": (dedup.scored_pair_table, dedup._SCORED_PAIR_CACHE),
        "bk_sketches": (dedup._bk_sketch_table, dedup._BK_SKETCH_CACHE),
    }


def persist_dedup_artifacts(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict:
    """Build (or reuse, if session-cached) the four dedup artifacts for
    ``sf_dir``'s documents table and write each as parquet under
    ``out_dir/<name>``, plus a manifest with the corpus fingerprint.
    Returns {name: row_count} for the ingest log."""
    os.makedirs(out_dir, exist_ok=True)
    counts = {}
    for name, (builder, _cache) in _artifact_specs().items():
        df = builder(spark, sf_dir)
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()
    manifest = {
        "sf_dir": os.path.abspath(sf_dir),
        "documents_fingerprint": fixture_fingerprint(sf_dir, "documents"),
        "rows": counts,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return counts


def load_dedup_artifacts(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """Seed the session artifact caches from a persisted store. The
    manifest's corpus fingerprint must match ``sf_dir``'s documents table
    NOW — loading a store built against a regenerated corpus is an
    explicit error, never silently-stale results. Returns
    {name: row_count} from the manifest."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    # JSON round-trips tuples as lists; normalize both sides.
    want = json.loads(json.dumps(fixture_fingerprint(sf_dir, "documents")))
    if manifest["documents_fingerprint"] != want:
        raise ValueError(
            f"artifact store at {out_dir} was built against a different "
            f"documents table than {sf_dir} (fingerprint mismatch); "
            f"re-run persist_dedup_artifacts"
        )
    key = session_cache_key(spark, sf_dir, "documents")
    for name, (_builder, cache) in _artifact_specs().items():
        cache[key] = spark.read.parquet(os.path.join(out_dir, name))
    return dict(manifest["rows"])
