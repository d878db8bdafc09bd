"""ANN serving-store maintenance runbook: the round-14 lifecycle as one
executable cycle.

    python tools/ann_maintenance.py [sf_dir] [store_dir]

Drives every maintenance op the store supports, in the order a production
scheduler would, against real parquet state:

  1. BUILD    persist_ann_indexes (skipped if a loadable manifest exists)
  2. APPEND   the deterministic 1/8 'pqsplit' arrival slice, assigned +
              encoded under the store's FROZEN quantizer/codebooks
  3. DRIFT    per-arrival routing margins from the SAME append kernel's
              margin column (the free byproduct — the monitor rides the
              encode pass), summarized as the retrain signal
  4. DELETE   tombstone the 'delsplit' slice (serves-immediately shadow)
  5. COMPACT  physical anti-join rewrite, tombstones cleared
  6. REBAND   LSH band width re-derived from the grown corpus
  7. RETRAIN  consume the drift signal (r15): scaled K re-derived at
              the grown corpus, Lloyd refinement re-run, both router
              tables rewritten (retrain == fresh rebuild, pinned)
  8. HEALTH   re-load, per-table counts, a probe smoke query (an
              exact dup of a surviving appended vector MUST collide; a
              dup of a deleted vector MUST NOT), and the per-router
              store-health dashboard rows (ann_store_health — the
              q_sim_index_health twin: occupancy shape + debt counters)

Prints ONE JSON line with each step's receipt and a ``healthy`` verdict.
The pytest integration test (tests/test_artifacts.py) runs this cycle
in-process at sf0.001 and asserts every gate, so the runbook is tested
behavior, not documentation."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cycle(spark, sf_dir: str, store: str) -> dict:
    """The full maintenance cycle against ``store``; returns the receipt
    dict (see module docstring for the step list)."""
    import numpy as np
    from pyspark.sql import functions as F

    from mapreduce_framework_api_spark.operators import similarity
    from mapreduce_framework_api_spark.operators.artifacts import (
        _ANN_MANIFEST,
        append_ann_indexes,
        compact_ann_indexes,
        load_ann_indexes,
        ann_store_health,
        persist_ann_indexes,
        reband_ann_lsh,
        retrain_ann_indexes,
        tombstone_ann_indexes,
    )
    from mapreduce_framework_api_spark.session import clear_session_caches
    from mapreduce_framework_api_spark.sources import table

    receipt: dict = {"sf_dir": os.path.abspath(sf_dir), "store": store}
    full = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # 1. BUILD — the corpus minus the arrival slice, so step 2 has
    # genuinely new rows (the append-lane fixture convention). NOTE:
    # re-running against an existing store re-appends the same slice
    # (the fixture has no real arrival feed) — use a fresh store_dir
    # per cycle.
    manifest_path = os.path.join(store, _ANN_MANIFEST)
    base_dir = store + ".basefx"
    receipt["base_fixture"] = base_dir
    if not os.path.exists(manifest_path):
        if not os.path.exists(base_dir):
            full.filter(~similarity._hash_split("pqsplit")).write.parquet(
                os.path.join(base_dir, "embeddings.parquet")
            )
        clear_session_caches()
        receipt["build_rows"] = persist_ann_indexes(spark, base_dir, store)
    else:
        receipt["build_rows"] = "existing"

    # 2. APPEND the arrival slice under the frozen state
    arrivals = full.filter(similarity._hash_split("pqsplit"))
    receipt["appended"] = append_ann_indexes(spark, arrivals, store)

    # 3. DRIFT: margins from the same kernel that just encoded the
    # arrivals, against the STORE's frozen quantizer/codebooks
    with open(manifest_path) as f:
        manifest = json.load(f)
    cq = np.array(manifest["ivf_centroids"], dtype=np.int64)
    cbook = np.array(manifest["pq_hq_codebook"], dtype=np.int64)
    margins = (
        similarity.ivfpq_append_check(arrivals, cq, cbook)
        .agg(
            F.count("*").alias("n"),
            F.sum("margin").alias("margin_sum"),
            F.min("margin").alias("min_margin"),
        )
        .collect()[0]
    )
    receipt["drift"] = {
        "n_arrivals": margins["n"],
        "margin_sum": int(margins["margin_sum"] or 0),
        "min_margin": int(margins["min_margin"] or 0),
    }

    # 4-5. DELETE a deterministic slice, then COMPACT
    victims = full.filter(similarity._hash_split("delsplit")).select("vec_id")
    receipt["tombstoned"] = tombstone_ann_indexes(spark, victims, store)
    receipt["compacted"] = compact_ann_indexes(spark, store)

    # 6. REBAND at the post-append/post-compact corpus size
    g, d, n_codes = reband_ann_lsh(spark, store)
    receipt["rebanded"] = {"g": g, "d": d, "lsh_codes": n_codes}

    # 7. RETRAIN: consume the drift signal — scaled K re-derived from
    # the post-compact physical count, the Lloyd refinement re-run over
    # the stored vectors, both router tables rewritten in place
    # (row-identical to a fresh rebuild; tests/test_artifacts.py)
    receipt["retrained"] = retrain_ann_indexes(spark, store)

    # 8. HEALTH: reload and probe — one surviving appended vector must
    # collide with its exact dup; one deleted vector must not
    clear_session_caches()
    receipt["serving_rows"] = load_ann_indexes(spark, base_dir, store)
    survivors = (
        arrivals.join(victims, "vec_id", "left_anti").limit(1).collect()
    )
    deleted = (
        full.filter(~similarity._hash_split("pqsplit"))
        .join(victims, "vec_id", "left_semi")
        .limit(1)
        .collect()
    )
    pi = similarity.ivfpq_probe_index(spark, base_dir)
    health = {"probe_index": pi is not None}
    if pi is not None and survivors and deleted:
        frame, pcq, pcb = pi
        dup = spark.createDataFrame(
            [
                (990001, survivors[0]["embedding"]),
                (990002, deleted[0]["embedding"]),
            ],
            "vec_id long, embedding array<float>",
        )
        hits = similarity.ivfpq_probe_check(dup, frame, pcq, pcb).collect()
        health["appended_served"] = any(
            r["new_id"] == 990001 and r["corpus_id"] == survivors[0]["vec_id"]
            for r in hits
        )
        health["deleted_not_served"] = all(
            r["corpus_id"] != deleted[0]["vec_id"] for r in hits
        )
    receipt["health"] = health
    # the dashboard rows (q_sim_index_health's store-side twin): one per
    # stored router — occupancy shape + debt counters post-cycle
    receipt["store_health"] = ann_store_health(spark, store)
    receipt["healthy"] = bool(
        health.get("probe_index")
        and health.get("appended_served")
        and health.get("deleted_not_served")
        and receipt["drift"]["min_margin"] >= 0
        and receipt["rebanded"]["lsh_codes"] > 0
        and receipt["retrained"]["rows"]["ivf_scaled_assigned"]
        == receipt["retrained"]["n"]
        and receipt["retrained"]["n"] == receipt["serving_rows"]["vec_norms"]
        and len(receipt["store_health"]) == 3
        and all(
            h["occ_med"] >= 1
            and h["pending_tombstones"] == 0
            and h["appended_since_compact"] == 0
            and h["n_rows"] == receipt["retrained"]["n"]
            for h in receipt["store_health"]
        )
    )
    clear_session_caches()
    return receipt


def main() -> int:
    from mapreduce_framework_api_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    store = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "ann_maint_store",
        )
    )
    spark = get_spark("ann-maintenance")
    receipt = run_cycle(spark, sf_dir, store)
    print(json.dumps(receipt))
    spark.stop()
    return 0 if receipt["healthy"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
