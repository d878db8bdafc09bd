"""Full-board partitioning-invariance sweep.

Runs EVERY registered query at sf0.001 under 32 and then 5 shuffle
partitions (shared-artifact caches cleared between runs, so plans and
Arrow kernels genuinely re-execute with different shuffle layouts and
batch boundaries) and reports any query whose collected rows differ —
order-sensitive FP or batch-sensitive kernel work leaking into declared
output. tests/test_partition_invariance.py pins an 18-query sample in
the suite; this tool is the exhaustive one-off receipt.

Usage: python tools/invariance_sweep.py [sf_dir] [axis]
  axis = "shuffle" (default: 32 vs 5 shuffle partitions) or "aqe"
  (adaptive execution on vs off — different physical strategies, same
  rows).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.session import clear_session_caches, get_spark


def canon(df):
    return sorted(tuple(str(x) for x in row) for row in df.collect())


AXES = {
    "shuffle": ("spark.sql.shuffle.partitions", "32", "5"),
    "aqe": ("spark.sql.adaptive.enabled", "true", "false"),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    axis = sys.argv[2] if len(sys.argv) > 2 else "shuffle"
    conf_key, va, vb = AXES[axis]
    registry = load_all_queries()
    spark = get_spark("invariance-sweep")
    base = spark.conf.get(conf_key)
    bad, err = [], []
    t0 = time.time()
    for name, q in sorted(registry.items()):
        try:
            clear_session_caches()
            spark.conf.set(conf_key, va)
            a = canon(q.fn(spark, sf_dir))
            clear_session_caches()
            spark.conf.set(conf_key, vb)
            b = canon(q.fn(spark, sf_dir))
        except Exception as exc:
            err.append((name, f"{type(exc).__name__}: {exc}"[:200]))
            print(f"ERR   {name}: {err[-1][1]}", flush=True)
            continue
        finally:
            spark.conf.set(conf_key, base)
        if a != b:
            bad.append(name)
            print(f"DIVERGED {name}: {len(a)} vs {len(b)} rows", flush=True)
        else:
            print(f"ok    {name} ({len(a)} rows)", flush=True)
    clear_session_caches()
    print(
        f"\n{len(registry) - len(bad) - len(err)} invariant, "
        f"{len(bad)} DIVERGED {bad}, {len(err)} errors {err} "
        f"({time.time() - t0:.0f}s)"
    )
    spark.stop()
    return 1 if (bad or err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
