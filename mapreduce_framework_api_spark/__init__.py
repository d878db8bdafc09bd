"""mapreduce_framework_api_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference MapReduce framework (Shubhangam11/MapReduce-Framework-API:
``mapreduce.h:48-56`` map_fn/reduce_fn callbacks over opaque kv pairs, plus
the word-count application in ``bin/mr-wordc.o``), re-expressed Spark-first:

- every concrete operator is a declarative DataFrame / SQL plan so Catalyst
  and Tungsten pick the physical strategy (pushdown, pruning, broadcast,
  whole-stage codegen, AQE);
- a thin RDD-flavored compatibility facade (``compat.mapreduce``) covers the
  generalized ``mr_create/mr_start/mr_finish`` surface;
- LLM-data-pipeline extensions (dedup, similarity search, multimodal
  columns, text analysis) are first-class operators designed for
  partition-parallel execution at 100 TB scale.

Layout:
    session.py      - configured SparkSession factory
    registry.py     - query registry (name -> builder + DuckDB oracle SQL)
    sources/        - table readers / format connectors
    operators/      - relational, window, dedup, similarity, text, multimodal
    functions/      - reusable column expression helpers
    streaming/      - Structured Streaming variants of the event queries
    compat/         - MapReduce (map_fn/reduce_fn) facade on RDDs
    plans/          - plan inspection utilities (pushdown/broadcast asserts)
"""

from mapreduce_framework_api_spark.registry import REGISTRY, load_all_queries
from mapreduce_framework_api_spark.session import get_spark

__all__ = ["REGISTRY", "load_all_queries", "get_spark"]
__version__ = "0.1.0"
