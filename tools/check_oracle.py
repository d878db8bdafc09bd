"""Local differential checker: runs every registered query on Spark AND its
DuckDB oracle, compares row count / column names / sorted value multisets.

Mimics the driver's t2 gate so failures surface before the round boundary.

Usage:
    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from mapreduce_framework_api_spark.registry import load_all_queries
from mapreduce_framework_api_spark.session import get_spark
from mapreduce_framework_api_spark.sources import TABLES


def _norm_cell(v):
    """Normalize a value for cross-engine comparison."""
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        # before int: bool is an int subclass, and True == 1 would let a
        # boolean-vs-integer engine drift slip through tuple comparison
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and collapse representation
        return repr(v + 0.0)
    if isinstance(v, decimal.Decimal):
        # Tagged, NOT collapsed to float: the driver's hash is type-aware,
        # so Spark BIGINT vs DuckDB HUGEINT/decimal128 (e.g. a bare integer
        # SUM) hash-fails there even when values are equal — exactly the
        # q_multimodal_stats failure the old float-collapse hid for two
        # rounds. An oracle must CAST so both engines emit the same type.
        return ("decimal", repr(v.normalize()))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (int, bool, str, bytes)):
        return v
    return repr(v)


def _norm_rows(cols, rows):
    """Sort columns by name, normalize cells, return sorted row multiset."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(normed, key=repr), [cols[i] for i in order]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all_queries()
    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.perf_counter()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            ores = con.execute(q.oracle).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        s_norm, s_cols = _norm_rows(scols, [tuple(r) for r in srows])
        o_norm, o_cols = _norm_rows(ocols, ores)
        status = []
        if len(s_norm) != len(o_norm):
            status.append(f"rowcount {len(s_norm)} vs {len(o_norm)}")
        if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
            status.append(f"cols {s_cols} vs {o_cols}")
        if not status and s_norm != o_norm:
            # find first diff for debugging
            diffs = [(a, b) for a, b in zip(s_norm, o_norm) if a != b][:3]
            status.append(f"values differ, first diffs: {diffs}")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(s_norm)} rows ({time.perf_counter()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAIL")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
