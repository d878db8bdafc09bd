"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real engine lives in ``mapreduce_framework_api_spark/``; this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_framework_api_spark.registry import load_all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's W1–W7 word-count pipeline) on
    /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all_queries()
    return registry["q_text_wordcount"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. EVERY registered query carries a
    full oracle — including the approximate tiers (MinHash/SimHash
    banding, sign-LSH and IVF ANN, the HLL/CMS/Bloom sketches), whose
    md5/integer primitives replay bit-exactly in SQL — so the driver
    records zero rows-only checks."""
    return {name: q.oracle for name, q in load_all_queries().items() if q.oracle is not None}
