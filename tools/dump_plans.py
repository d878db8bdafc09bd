"""Dump formatted physical plans for named queries to plans/<round>/ files.

Usage:
    python tools/dump_plans.py <sf_dir> <out_dir> <suffix> q1 [q2 ...]

Writes <out_dir>/<query>_<suffix>.txt with the post-analysis formatted
plan (the same artifact tools/explain_all.py aggregates) — the judge's
receipt for before/after plan-shape claims in OPTIMIZATION_r*.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_api_spark.plans.inspect import formatted_plan
from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.session import clear_session_caches, get_spark


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark()
    registry = load_all_queries()
    for name in names:
        clear_session_caches()
        df = registry[name].fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
