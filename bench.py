"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Timing discipline (BASELINE.md): warm session, Spark startup excluded; each
query timed around its action (count of the materialized result — results
stay distributed; no driver collect). A JIT/warmup pass of the flagship
runs untimed first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    registry = load_all_queries()
    spark = get_spark("bench")

    # untimed warmup: JVM/codegen/parquet-footer caches, plus one tiny
    # Arrow kernel so the first Python-UDF query isn't billed for daemon
    # + worker startup (warm-session discipline per BASELINE.md)
    registry["q_text_wordcount"].fn(spark, sf_dir).count()
    spark.range(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    per_query: dict[str, float] = {}
    for name, q in sorted(registry.items()):
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = df.count()
        per_query[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {per_query[name]:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
