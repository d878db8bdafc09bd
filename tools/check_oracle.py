"""Local differential checker: runs every registered query on Spark AND its
DuckDB oracle, compares row count / column names / column TYPES / sorted
value multisets.

Mimics the driver's t2 gate so failures surface before the round boundary.
The oracle side is fetched via ``fetch_arrow_table()`` — NOT ``fetchall()``
— because DuckDB's Python cursor collapses HUGEINT/DECIMAL to plain ``int``,
hiding exactly the type drift the driver's type-aware hash fails on (a bare
``SUM(BIGINT)`` window yields HUGEINT; ``q_pipe_pack_chunks`` was red at the
driver for a round while green here). Arrow preserves decimal128, and the
explicit per-column type-tag comparison makes the mismatch a named failure
instead of a value-diff puzzle.

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


def _spark_type_tag(dt) -> str:
    """Type-FAMILY tag for a Spark DataType (mirrors _arrow_type_tag).

    Family-level, not width-level, on purpose: the driver's r1–r4 record shows
    int32-vs-int64 drift hash-passes (q_win_rank's rank() int32 vs DuckDB's
    BIGINT was green) while decimal-vs-int drift hash-fails (q_pipe_pack_chunks,
    q_multimodal_stats). The tags encode exactly that boundary."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_type_tag(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{_spark_type_tag(dt.keyType)},{_spark_type_tag(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{_spark_type_tag(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    return dt.simpleString()


def _arrow_type_tag(t) -> str:
    """Type-FAMILY tag for a pyarrow DataType (mirrors _spark_type_tag)."""
    import pyarrow as pa

    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_type_tag(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{_arrow_type_tag(t.key_type)},{_arrow_type_tag(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_arrow_type_tag(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


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
            otbl = con.execute(q.oracle).fetch_arrow_table()
            ocols = otbl.column_names
            ores = [tuple(d[c] for c in ocols) for d in otbl.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        s_tags = {f.name.lower(): _spark_type_tag(f.dataType) for f in sdf.schema.fields}
        o_tags = {
            f.name.lower(): _arrow_type_tag(f.type) for f in otbl.schema
        }
        s_norm, s_cols = _norm_rows(scols, [tuple(r) for r in srows])
        o_norm, o_cols = _norm_rows(ocols, ores)
        status = []
        if len(s_norm) != len(o_norm):
            status.append(f"rowcount {len(s_norm)} vs {len(o_norm)}")
        if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
            status.append(f"cols {s_cols} vs {o_cols}")
        type_drift = [
            f"{c}: spark {s_tags[c]} vs oracle {o_tags[c]}"
            for c in sorted(set(s_tags) & set(o_tags))
            if s_tags[c] != o_tags[c]
        ]
        if type_drift:
            status.append(f"type drift ({'; '.join(type_drift)})")
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
