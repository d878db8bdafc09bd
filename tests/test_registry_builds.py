"""Every registered query must BUILD — import, plan construction, analysis.

This is the regression net for dangling imports and analysis-time breakage:
round 2 shipped a refactor that deleted a helper (broadcast_index) while one
query still imported it, and nothing exercised that code path before the
commit — the query errored, the whole bench run crashed, and two plan-sweep
tests failed. A single sweep that calls every registered fn and forces
analysis makes that class of error unshippable.

Build-time cost note: a few queries do bounded driver work during plan
construction (blocked index collection, IVF centroid training, the cluster
label loop); at sf0.001 that is sub-second per query.
"""

import pytest
from conftest import SF_DIR

from mapreduce_framework_api_spark.registry import load_all_queries

QUERIES = load_all_queries()

# Populated by test_registered_query_builds so the registry-wide schema
# sweep below does not rebuild all plans; it self-heals if run standalone.
_SCHEMAS: dict = {}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registered_query_builds(spark, name):
    # Parametrized per query (not one sweep loop): a single broken operator
    # must fail exactly its own case — in round 3 one reader bug failed
    # three whole sweep tests and the report could not localize it.
    df = QUERIES[name].fn(spark, SF_DIR)
    _SCHEMAS[name] = df.schema  # force analysis, not just construction


def test_declared_outputs_are_scalar_only(spark):
    """Harness contract: no declared query may OUTPUT an array/map/struct
    column. The external differential harness canonicalizes results with a
    pandas sort-then-hash, and pandas cannot factorize list cells —
    q_text_inverted_index's array<long> postings column was the round-5
    board's one red row (`TypeError: unhashable type: 'list'`) even though
    its values were provably correct. Nested types are fine INSIDE a plan;
    at the output boundary they must be serialized (array_join, struct
    field projection, to_json)."""
    from pyspark.sql import types as T

    nested = (T.ArrayType, T.MapType, T.StructType)
    offenders = []
    for name, q in sorted(QUERIES.items()):
        schema = _SCHEMAS.get(name)
        if schema is None:  # standalone run: build it ourselves
            schema = q.fn(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, nested):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, f"nested-typed output columns: {offenders}"


def test_every_oracle_has_matching_registration(spark):
    """Oracle coverage contract: each registered query either declares a
    DuckDB oracle string or is explicitly rows-only (oracle=None); no
    oracle may be empty/whitespace."""
    for name, q in QUERIES.items():
        assert q.oracle is None or q.oracle.strip(), f"{name}: empty oracle"
