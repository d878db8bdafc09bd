"""Deterministic per-query execution profile: job / stage / task counts and
executor run/CPU totals via the local UI REST API.

Wall-clock on a burstable sandbox swings ±50% run to run, which makes
sub-second structural regressions/wins unmeasurable by timing alone. The
counts this tool prints are DETERMINISTIC for a fixed plan (same query,
same data, same confs ⇒ same number of jobs and, modulo AQE coalescing,
stages/tasks), and executorCpuTime excludes steal/throttle — so a "this
change removed N jobs / M corpus passes" claim is checkable even on a
noisy machine. Used for the round-15 optimization evidence in
OPTIMIZATION_r15.md.

Usage:
    python tools/job_profile.py [sf_dir] q1 [q2 ...] [--reps N]

Each query runs --reps times (default 2) with session caches cleared
between reps; the FIRST rep shows cold shared-build cost, later reps the
steady state. Output: one line per rep —
    name rep=i wall=… jobs=… stages=… tasks=… cpu=…s run=…s rows=…
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.session import clear_session_caches, get_spark


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/{path}"
    return json.loads(urllib.request.urlopen(url, timeout=10).read())


def _settle(spark, read):
    """Poll until two consecutive reads agree (async listener bus)."""
    prev = read()
    for _ in range(20):
        time.sleep(0.1)
        cur = read()
        if cur == prev:
            return cur
        prev = cur
    return prev


def snapshot(spark):
    def read():
        jobs = _api(spark, "jobs?status=succeeded")
        stages = _api(spark, "stages?status=complete")
        n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
        cpu = sum(s.get("executorCpuTime", 0) for s in stages)
        run = sum(s.get("executorRunTime", 0) for s in stages)
        return (len(jobs), len(stages), n_tasks, cpu, run)

    return _settle(spark, read)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    registry = load_all_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark("job-profile", extra_conf={"spark.ui.enabled": "true"})
    # same warmup shape as bench.py's isolate mode: flagship + Arrow kernel
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    flagship_sf = warm_sf if os.path.isdir(warm_sf) else sf_dir
    try:
        registry["q_text_wordcount"].fn(spark, flagship_sf).count()
    except Exception as exc:
        print(f"# warmup: {type(exc).__name__}: {exc}", file=sys.stderr)
    spark.range(32).mapInPandas(lambda it: it, schema="id long").count()
    for name in names:
        for rep in range(reps):
            clear_session_caches()
            j0, s0, t0, c0, r0 = snapshot(spark)
            w0 = time.perf_counter()
            rows = registry[name].fn(spark, sf_dir).count()
            wall = time.perf_counter() - w0
            j1, s1, t1, c1, r1 = snapshot(spark)
            print(
                f"{name} rep={rep} wall={wall:6.2f}s jobs={j1 - j0:3d} "
                f"stages={s1 - s0:3d} tasks={t1 - t0:5d} "
                f"cpu={(c1 - c0) / 1e9:7.2f}s run={(r1 - r0) / 1e3:7.2f}s "
                f"rows={rows}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
