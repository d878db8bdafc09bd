"""Fixture-drift canary (FIXTURES.md §B).

The driver regenerates /root/testdata between rounds and has changed
physical encodings before (r03: events.ts went parquet timestamp[ns] →
timestamp[us], which silently broke 11 queries, the bench, and 6 tests
through one reader line). This canary turns the next silent schema change
into one obvious assertion with a printed diff: it reads only parquet
footers (pyarrow, no Spark session, < 100 ms) and compares every table at
every scale factor against the expected logical schema.

Columns where the reader is deliberately encoding-adaptive list multiple
accepted types (events.ts — see sources/readers.py dtype dispatch).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIRS = [d for d in ("sf0.001", "sf0.01", "sf0.1") if os.path.isdir(os.path.join(TESTDATA, d))]

# table -> {column -> accepted pyarrow type strings}
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[ms]", "timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        # the reader dispatches on this encoding; both have shipped
        "ts": {"timestamp[ns]", "timestamp[us]"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<item: float>", "list<element: float>", "large_list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("sf", SF_DIRS)
@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_fixture_schema(sf: str, name: str) -> None:
    path = os.path.join(TESTDATA, sf, f"{name}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    actual = {f.name: str(f.type) for f in (schema.field(i) for i in range(len(schema)))}
    expected = EXPECTED[name]

    diff = []
    for col, accepted in expected.items():
        got = actual.get(col)
        if got is None:
            diff.append(f"  MISSING column {col!r} (expected one of {sorted(accepted)})")
        elif got not in accepted:
            diff.append(f"  DRIFT {col!r}: fixture has {got!r}, reader expects one of {sorted(accepted)}")
    for col in actual:
        if col not in expected:
            diff.append(f"  NEW column {col!r}: {actual[col]!r} (not in FIXTURES.md)")

    assert not diff, (
        f"fixture drift in {sf}/{name}.parquet — the driver regenerated "
        f"testdata with a different schema; update sources/readers.py + "
        f"FIXTURES.md + this canary:\n" + "\n".join(diff)
    )


def test_embeddings_have_nonzero_norm():
    """The similarity tiers' input contract (similarity.py module doc):
    every embedding has nonzero norm. A zero vector would make cosine
    0/0 = NaN, which numpy ranks LAST but Spark/DuckDB rank FIRST under
    DESC — a silent cross-engine top-k skew. This canary turns that
    latent hash mismatch into a named failure at fixture-regen time."""
    import duckdb

    for sf in SF_DIRS:  # existence-filtered, like every canary here
        (n_zero,) = duckdb.sql(
            "SELECT COUNT(*) FROM read_parquet("
            f"'{TESTDATA}/{sf}/embeddings.parquet') "
            "WHERE list_dot_product(list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)), list_transform(embedding, "
            "x -> CAST(x AS DOUBLE))) = 0"
        ).fetchall()[0]
        assert n_zero == 0, f"{sf}: {n_zero} zero-norm embeddings"
