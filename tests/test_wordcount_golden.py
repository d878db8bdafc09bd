"""Golden replay of the reference's own test corpus (SURVEY.md §5.2 tier 1).

The reference's test.sh runs word count over input/mr-wordc/* at 32 threads
and diffs against output_compare/mr-wordc/* (``test.sh:27-28``). We replay
the same inputs through BOTH engine lanes (DataFrame flagship pipeline and
the RDD compatibility facade) and byte-compare with the golden files using
the §2.5 format contract: lines ``"%s, %d\n"``, ascending byte-wise token
order, empty input → empty output.
"""

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.compat.mapreduce import wordcount
from mapreduce_framework_api_spark.functions.textfns import explode_tokens

from conftest import REFERENCE_GOLDEN, REFERENCE_INPUTS

FIXTURES = sorted(os.listdir(REFERENCE_INPUTS)) if os.path.isdir(REFERENCE_INPUTS) else []


def _golden(name: str) -> str:
    with open(os.path.join(REFERENCE_GOLDEN, name), "rb") as f:
        return f.read().decode("utf-8", errors="surrogateescape")


def _format(rows) -> str:
    return "".join(f"{k}, {v}\n" for k, v in rows)


@pytest.mark.parametrize("name", FIXTURES)
def test_dataframe_lane_matches_golden(spark, name):
    """spark.read.text → explode(split) → groupBy.count → orderBy."""
    df = (
        spark.read.text(os.path.join(REFERENCE_INPUTS, name))
        .select(explode_tokens("value"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy("token")
    )
    rows = [(r["token"], r["cnt"]) for r in df.collect()]
    assert _format(rows) == _golden(name)


@pytest.mark.parametrize("name", ["test-0.txt", "test-3.txt", "doc-0.txt"])
def test_rdd_lane_matches_golden(spark, name, tmp_path):
    """The MapReduce facade end-to-end, including the formatted file sink."""
    out = tmp_path / name
    wordcount(spark, os.path.join(REFERENCE_INPUTS, name), str(out), partitions=32)
    assert out.read_text() == _golden(name)


def test_byte_wise_ordering_contract(spark):
    """Digits sort before uppercase before lowercase (strcmp order) —
    the BST in-order traversal contract (SURVEY.md §2.2 W7)."""
    df = spark.createDataFrame([("a",), ("A",), ("0",), ("Z",), ("z",), ("9",)], ["token"])
    ordered = [r["token"] for r in df.orderBy("token").collect()]
    assert ordered == ["0", "9", "A", "Z", "a", "z"]
