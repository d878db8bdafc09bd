"""Physical-plan inspection: the engine's scale-discipline instrumentation.

The reference has no optimizer (SURVEY.md §4.1) — its one physical plan is
hard-coded. Our engine delegates planning to Catalyst, which makes the
*shape of the chosen plan* the thing to verify: a query that reads every
parquet column for a 2-column projection, or shuffles a 5-row region table,
is correct-but-wrong at 100 TB. These helpers expose the plan properties
the judge of any large-scale deployment would check:

- filters reach the scan (``pushed_filters``),
- only needed columns are read (``read_schema``),
- small dimensions broadcast instead of shuffling (``join_strategies``),
- the number of exchanges (each one is a full-cluster shuffle barrier),
- whole-stage-codegen coverage (JVM-compiled loops vs interpreted rows).

Used by tests/test_plan_quality.py to lock in plan shapes as regressions:
an edit that silently turns a broadcast join into a sort-merge join, or
drops a pushed filter, fails CI even though results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-AQE initial plan) as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    """The one-line-per-operator physical plan string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per file scan — what actually gets
    decoded from parquet (column pruning evidence)."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))]


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operator names in plan order (e.g. BroadcastHashJoin,
    SortMergeJoin, BroadcastNestedLoopJoin, CartesianProduct)."""
    pat = (
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)"
    )
    return re.findall(pat, simple_plan(df))


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles) in the physical plan. Each is
    a full re-partitioning of its input across the cluster — the unit of
    cost that dominates at 100 TB."""
    return len(re.findall(r"\bExchange\b", simple_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen stages in the *executed* plan: >0 means
    the hot loops ran as JVM-compiled fused operators rather than
    interpreted rows.

    Under AQE the physical plan is finalized stage-by-stage at runtime, so
    this executes the query once and reads ``*(n)`` codegen ids off the
    final adaptive plan. It must be ``df.collect()`` — a ``df.write`` or
    ``df.count()`` builds its *own* QueryExecution and would leave this
    DataFrame's plan unfinalized. Test-scale helper (drains the result to
    the driver); not for production data sizes."""
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", final)))


def exchange_inputs(df: DataFrame) -> list[tuple[str, str]]:
    """(partitioning-arguments, input-column-list) per Exchange node in the
    formatted plan — what each shuffle actually KEYS ON and CARRIES. The
    scale review this enables: a shuffle whose input list includes a wide
    string column (a document body) moves that payload through the
    full-cluster exchange; thin-index designs must show only fixed-width
    columns here."""
    plan = formatted_plan(df)
    out: list[tuple[str, str]] = []
    # Formatted nodes read e.g.:
    #   (4) Exchange
    #   Input [3]: [doc_id#1L, n#5, bh#7L]
    #   Arguments: hashpartitioning(bh#7L, 32), ENSURE_REQUIREMENTS, ...
    for m in re.finditer(
        r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]\nArguments: ([^\n]*)",
        plan,
    ):
        out.append((m.group(2).strip(), m.group(1).strip()))
    return out


def scans_python_udf(df: DataFrame) -> bool:
    """True if the plan contains a row-at-a-time Python UDF eval (the slow
    path; Arrow-batched mapInPandas shows as MapInPandas/ArrowEvalPython)."""
    return bool(re.search(r"BatchEvalPython", simple_plan(df)))
