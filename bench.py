"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

followed by a COMPACT final line (same metric/value, slowest-query subset)
sized to survive the recorder's 2000-char stdout tail window, with the full
per-query map also written to BENCH_FULL.json.

Timing discipline (BASELINE.md): warm session, Spark startup excluded; each
query timed around its action (count of the materialized result — results
stay distributed; no driver collect). A JIT/warmup pass of the flagship
runs untimed first.

Modes: default (cold-cache board, BENCH_FULL.json); ``--from-store``
(persist all three artifact stores untimed, clear caches, load, time the
identical board — BENCH_STORE.json); ``--isolate q1,q2`` (best-of-3
adjudication in a fresh session).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.session import get_spark


def compact_summary(summary: dict, budget: int = 1800,
                    full_name: str = "BENCH_FULL.json") -> dict:
    """Tail-window-safe summary: totals always, then as many of the
    slowest per-query times as fit in ``budget`` serialized chars. The
    external recorder keeps only the last ~2000 chars of stdout, so the
    LAST printed line must parse on its own (r4/r5 recorded parsed:null
    because the one full-size line was head-truncated). Unit-tested in
    tests/test_bench_output.py."""
    per_query = summary.get("queries", {})
    compact = {
        "metric": summary["metric"],
        "value": summary["value"],
        "unit": summary["unit"],
        "queries": {},
        "sf": summary["sf"],
        "n_queries": len(per_query),
        "n_errors": len(summary.get("errors", {})),
        "full": full_name,
    }
    # Provenance markers survive compaction: a --from-store tail line must
    # never masquerade as a default board in the recorder's window.
    for k in ("mode", "store_build_sec"):
        if k in summary:
            compact[k] = summary[k]
    for name in sorted(per_query, key=per_query.get, reverse=True):
        compact["queries"][name] = per_query[name]
        if len(json.dumps(compact)) > budget:
            del compact["queries"][name]
            break
    return compact


def isolate(names: list[str]) -> None:
    """Calm-box adjudication mode: ``bench.py --isolate q1,q2,...`` times
    each named query best-of-3 in a FRESH session (flagship + Arrow-kernel
    warmup, session caches cleared between repeats so every run genuinely
    re-executes) and prints one JSON line. This is the protocol both the
    round-6/7 BASELINE.md probes and the round-7 judge used by hand to
    separate burstable-VM throttling from plan regressions — a >2x
    in-bench cell that reads at its baseline here is environment, not
    code; a cell that does NOT clear earns a plan diff."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    registry = load_all_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    from mapreduce_framework_api_spark.session import clear_session_caches

    spark = get_spark("bench-isolate")
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    flagship_sf = warm_sf if os.path.isdir(warm_sf) else sf_dir
    try:
        registry["q_text_wordcount"].fn(spark, flagship_sf).count()
    except Exception as exc:  # warmup failures cost their own row only
        print(f"# warmup: {type(exc).__name__}: {exc}", file=sys.stderr)
    spark.range(32).mapInPandas(lambda it: it, schema="id long").count()
    out: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    for name in names:
        runs = []
        for _ in range(3):
            clear_session_caches()
            t0 = time.perf_counter()
            try:
                registry[name].fn(spark, sf_dir).count()
            except Exception as exc:
                # Errored queries are RECORDED, not omitted (round-9
                # advice): an adjudication run that crashed on a query
                # must be distinguishable from one that never requested
                # it — null marks "errored", the errors map says why,
                # and the exit code goes non-zero below.
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"# {name}: ERR {errors[name]}", file=sys.stderr)
                runs = []
                break
            runs.append(time.perf_counter() - t0)
        if runs:
            out[name] = round(min(runs), 3)
            print(f"# {name}: best-of-3 {out[name]:.2f}s (all: "
                  f"{[round(r, 2) for r in runs]})", file=sys.stderr)
        else:
            out[name] = None
    summary: dict = {
        "metric": "isolated_best_of_3_sec",
        "queries": out,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        summary["errors"] = errors
    print(json.dumps(summary))
    spark.stop()
    if errors:
        sys.exit(1)


# Bench sessions enable the UI status endpoint (default sessions keep it
# off): the CPU meter reads completed-stage executorCpuTime over the
# local REST API. Steady-state cost is one idle jetty thread; nothing is
# served unless the meter asks.
_UI_CONF = {"spark.ui.enabled": "true"}


def _safe_count(fn, *args) -> tuple[int | None, str | None]:
    """Every warm-up and timed run is individually fenced: one broken query
    must cost exactly its own row (recorded as an "err"), never the whole
    bench — r02/r03 both produced rc=1 with zero timings for 77 healthy
    queries because a single AnalysisException escaped."""
    try:
        return fn(*args).count(), None
    except Exception as exc:
        return None, f"{type(exc).__name__}: {exc}"[:500]


def _warmup(spark, registry, sf_dir: str) -> None:
    """Untimed warmup: JVM/codegen/parquet-footer caches, plus one tiny
    Arrow kernel so the first Python-UDF query isn't billed for daemon
    + worker startup (warm-session discipline per BASELINE.md).
    The expression-heavy dedup signatures (trigram shingle folds, the
    16-perm minhash / 64-bit simhash / 64-bit sign-LSH assemblies)
    cost ~8-9 s of ONE-TIME whole-stage-codegen JIT on first compile —
    a per-JVM constant every warm executor pays exactly once (measured:
    q_dedup_clusters 13.5 s cold vs 4.5 s once classes are compiled,
    identical data). Compiling is schema-dependent, not data-dependent,
    so it's warmed at sf0.001 where the data cost is nil.

    Flagship warmup runs at sf0.001 (like every other warm query), NOT
    at the target sf_dir: q_text_wordcount feeds the session-cached
    corpus_wordcount table, and a target-scale warmup would pre-build
    that cache outside the timed window — the timed wordcount/zipf/
    surprisal/vocab_coverage cells must include their own share of the
    shared work, exactly as the dedup/graph families already do."""
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    flagship_sf = warm_sf if os.path.isdir(warm_sf) else sf_dir
    _, err = _safe_count(registry["q_text_wordcount"].fn, spark, flagship_sf)
    if err:
        print(f"# warmup q_text_wordcount: {err}", file=sys.stderr)
    spark.range(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    # the plain-RDD compat lane forks its own 32 pyspark.daemon workers on
    # first use (measured: 7.6 s first run vs 1.2 s after, same data)
    spark.sparkContext.parallelize(range(32), 32).map(lambda x: x).count()
    if os.path.isdir(warm_sf):
        for wq in (
            "q_dedup_ngram_jaccard",
            "q_dedup_minhash",
            "q_dedup_simhash",
            "q_dedup_canonical",  # label-propagation loop + election window
            "q_dedup_embedding",  # blocked-index mapInPandas scan
            "q_sim_ann_lsh",
            "q_sim_ivf_topk",  # quantizer + cogroup scoring plans
            "q_dedup_semdedup",  # blocked within-cluster BLAS cogroup
            "q_dedup_semdedup_incremental",  # 64-wide cosine fold join
            "q_sketch_cms",  # 4x256 counter expression tree
            # round-5 continuation queries with their own heavy codegen
            "q_agg_weighted_median",  # bin windows + refine join
            "q_dedup_repeated_chunks",  # HOF md5 chunk transform
            "q_text_keywords",  # tf->df->rank window stack
            "q_text_vocab_coverage",
            "q_pipe_end_to_end",  # fused cascade + dedup + split
            "q_graph_pagerank",  # iterative join-chain codegen
            "q_graph_triangles",  # adjacency build + array_intersect kernel
        ):
            _, err = _safe_count(registry[wq].fn, spark, warm_sf)
            if err:
                print(f"# warmup {wq}: {err}", file=sys.stderr)


# Cells whose WALL time is known to be dominated by local-mode
# Python-worker-pool latency rather than plan cost (BASELINE.md round-13
# probe forensics: ~1.3 s executor CPU under 2-7 s wall depending on
# pool history). Their boards additionally record executor CPU time —
# a second, pool-independent gate in tools/bench_compare.py, so the
# wall baseline's pool headroom can't hide a genuine plan regression.
#
# The CPU number is the MIN over _CPU_WARM_REPS warm re-executions of
# the cell AFTER the timed run, not the timed run's own CPU: the first
# execution of a stage's generated code charges its JIT compilation to
# executorCpuTime (measured r14: 3.7-11 s first run vs 1.0-1.3 s warm
# for the probe cell, same plan, same rows), so a single-shot in-board
# reading is session-history noise. Min-of-warm is the plan's steady
# kernel cost — exactly what the gate is meant to watch; JIT noise only
# ever ADDS, so min is the robust statistic.
_CPU_METERED = {"q_sim_ivfpq_probe", "q_sim_maxsim_topk"}
_CPU_WARM_REPS = 3


def _executor_cpu_since(spark, from_stage: int) -> tuple[float | None, int]:
    """(total executorCpuTime in seconds of completed stages with
    stageId >= from_stage, next watermark) via the local UI REST API —
    the same source the round-13 taskSummary forensics used. The status
    store updates via an async listener bus, so the read polls briefly
    until two consecutive totals agree. Returns (None, watermark) if the
    UI is unreachable (CPU metering is best-effort; wall rows are the
    primary record)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"

    def read():
        data = json.loads(urllib.request.urlopen(url, timeout=10).read())
        cpu_ns, max_id = 0, from_stage - 1
        for st in data:
            if st["stageId"] >= from_stage:
                cpu_ns += st.get("executorCpuTime", 0)
                max_id = max(max_id, st["stageId"])
        return cpu_ns, max_id

    try:
        prev = read()
        for _ in range(5):
            time.sleep(0.15)
            cur = read()
            if cur == prev:
                break
            prev = cur
        cpu_ns, max_id = prev
        return cpu_ns / 1e9, max_id + 1
    except Exception as exc:
        print(f"# cpu-meter unavailable: {exc}", file=sys.stderr)
        return None, from_stage


def _timed_board(spark, registry, sf_dir: str) -> tuple[dict, dict, dict]:
    """The timed loop shared by the default board and --from-store: every
    registered query timed around its action, per-query fenced. CPU-
    metered cells (_CPU_METERED) also record executor CPU seconds."""
    import gc

    per_query: dict[str, float] = {}
    per_cpu: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(registry.items()):
        metered = name in _CPU_METERED
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            n = df.count()
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERR {errors[name]}", file=sys.stderr)
            gc.collect()
            continue
        per_query[name] = round(time.perf_counter() - t0, 3)
        if metered:
            # min-of-warm-reps AFTER the timed run (see _CPU_METERED):
            # the timed run already paid the stage-codegen JIT, so these
            # reps read the steady kernel cost the gate watches
            reps = []
            for _ in range(_CPU_WARM_REPS):
                pre, watermark = _executor_cpu_since(spark, 0)
                if pre is None:
                    # the watermark read failed (REST timeout / listener
                    # lag): from_stage degraded to 0, so the post-read
                    # would attribute the WHOLE SESSION's executor CPU
                    # to this rep — skip BEFORE paying the rep's full
                    # execution (these are the two most expensive
                    # metered queries; ADVICE r14), not after
                    continue
                q.fn(spark, sf_dir).count()
                cpu, _ = _executor_cpu_since(spark, watermark)
                if cpu is not None:
                    reps.append(cpu)
            if reps:
                per_cpu[name] = round(min(reps), 3)
                print(f"# {name}: cpu {per_cpu[name]:.2f}s", file=sys.stderr)
        print(f"# {name}: {per_query[name]:.2f}s ({n} rows)", file=sys.stderr)
        # Drop the query's DataFrame/RDD references NOW so the JVM
        # ContextCleaner can release localCheckpoint blocks and broadcasts
        # between queries — otherwise storage pressure from checkpoint-heavy
        # queries (dedup/similarity) inflates everything that runs after
        # them (observed: the alphabetically-last q_win_* block 2-3x slower
        # in-bench than in isolation).
        del df
        gc.collect()
    return per_query, errors, per_cpu


def _emit(summary: dict, out_name: str) -> None:
    """Full-fidelity record first (spec line + on-disk copy): the external
    recorder keeps only the LAST ~2000 chars of stdout, and a 178-query
    map is ~4-5 KB — r4/r5 both recorded "parsed": null because the one
    big line was head-truncated inside that tail window. The LAST line is
    a compact summary sized to survive the tail window."""
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), out_name), "w"
    ) as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    print(json.dumps(compact_summary(summary, full_name=out_name)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    registry = load_all_queries()
    spark = get_spark("bench", extra_conf=_UI_CONF)
    _warmup(spark, registry, sf_dir)
    per_query, errors, per_cpu = _timed_board(spark, registry, sf_dir)
    total = round(sum(per_query.values()), 3)
    summary = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if per_cpu:
        summary["queries_cpu"] = per_cpu
    if errors:
        summary["errors"] = errors
    _emit(summary, "BENCH_FULL.json")
    spark.stop()


def from_store() -> None:
    """``bench.py --from-store``: the ingest-then-serve production shape
    as a gateable receipt. Persists all three artifact stores (dedup
    kernels, ingest probe indexes, ANN serving indexes) UNTIMED — that is
    the ingest job's cost, paid once per corpus — then clears every
    session cache (the fresh search session), seeds them from the stores,
    and times the full board identically to the default mode. The JSON
    line keeps the same metric name so tools/bench_compare.py gates it
    cell-for-cell against the same baseline; ``mode`` and
    ``store_build_sec`` mark the provenance. Output lands in
    BENCH_STORE.json (BENCH_FULL.json stays the default board's)."""
    import shutil
    import tempfile

    from mapreduce_framework_api_spark.operators.artifacts import (
        load_ann_indexes,
        load_dedup_artifacts,
        load_ingest_indexes,
        persist_ann_indexes,
        persist_dedup_artifacts,
        persist_ingest_indexes,
    )
    from mapreduce_framework_api_spark.session import clear_session_caches

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    registry = load_all_queries()
    spark = get_spark("bench-from-store", extra_conf=_UI_CONF)
    _warmup(spark, registry, sf_dir)

    store = tempfile.mkdtemp(prefix="spark_graft_store_")
    try:
        t0 = time.perf_counter()
        persist_dedup_artifacts(spark, sf_dir, os.path.join(store, "dedup"))
        persist_ingest_indexes(spark, sf_dir, os.path.join(store, "ingest"))
        persist_ann_indexes(spark, sf_dir, os.path.join(store, "ann"))
        build_sec = round(time.perf_counter() - t0, 3)
        print(f"# store build (untimed ingest cost): {build_sec:.2f}s",
              file=sys.stderr)

        clear_session_caches()  # the fresh serving session
        load_dedup_artifacts(spark, sf_dir, os.path.join(store, "dedup"))
        load_ingest_indexes(spark, sf_dir, os.path.join(store, "ingest"))
        load_ann_indexes(spark, sf_dir, os.path.join(store, "ann"))

        per_query, errors, per_cpu = _timed_board(spark, registry, sf_dir)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    total = round(sum(per_query.values()), 3)
    summary = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "mode": "from_store",
        "store_build_sec": build_sec,
    }
    if per_cpu:
        summary["queries_cpu"] = per_cpu
    if errors:
        summary["errors"] = errors
    _emit(summary, "BENCH_STORE.json")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--isolate":
        if len(sys.argv) != 3:
            print("usage: bench.py --isolate q1,q2,...", file=sys.stderr)
            sys.exit(2)
        isolate([n.strip() for n in sys.argv[2].split(",") if n.strip()])
    elif len(sys.argv) >= 2 and sys.argv[1] == "--from-store":
        from_store()
    else:
        main()
