"""Dump the physical plan of every registered query for audit.

Usage: python tools/explain_all.py [sf_dir] [out_path]

Writes one formatted-plan section per query plus a summary table of the
plan-shape metrics the engine optimizes for (join strategies, exchange
count, Python-UDF presence). This is the artifact to eyeball when asking
"would this plan survive a 100× scale-up?" per query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_framework_api_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    join_strategies,
    scans_python_udf,
)
from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLANS.txt"
    registry = load_all_queries()
    spark = get_spark("explain-all")
    summary, sections = [], []
    for name, q in sorted(registry.items()):
        df = q.fn(spark, sf_dir)
        joins = join_strategies(df)
        summary.append(
            f"{name:28s} exchanges={count_exchanges(df):2d} "
            f"pyudf={'Y' if scans_python_udf(df) else 'n'} joins={','.join(joins) or '-'}"
        )
        sections.append(f"{'=' * 78}\n{name}\n{'=' * 78}\n{formatted_plan(df)}\n")
    with open(out_path, "w") as f:
        f.write("\n".join(summary) + "\n\n" + "\n".join(sections))
    print(f"wrote {out_path}: {len(registry)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
