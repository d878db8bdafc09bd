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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registered_query_builds(spark, name):
    # Parametrized per query (not one sweep loop): a single broken operator
    # must fail exactly its own case — in round 3 one reader bug failed
    # three whole sweep tests and the report could not localize it.
    df = QUERIES[name].fn(spark, SF_DIR)
    _ = df.schema  # force analysis, not just construction


def test_every_oracle_has_matching_registration(spark):
    """Oracle coverage contract: each registered query either declares a
    DuckDB oracle string or is explicitly rows-only (oracle=None); no
    oracle may be empty/whitespace."""
    for name, q in QUERIES.items():
        assert q.oracle is None or q.oracle.strip(), f"{name}: empty oracle"
