"""Query registry: the declared-query surface of the engine.

Every operator the engine claims (SURVEY.md §2) registers here with
 - a builder ``fn(spark, sf_dir) -> DataFrame`` (the Spark-first plan), and
 - optionally ``oracle``: equivalent ANSI SQL for the DuckDB differential
   oracle (None => genuinely non-SQL-expressible; rows-only check).

Column-name contract: every computed/aggregate column is aliased identically
in the Spark plan and the oracle SQL (the driver sorts columns by name
before value-hashing). Float aggregates are wrapped in ROUND(x, 2) on both
sides (SURVEY.md §2.4 convention).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    group: str = ""
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    group: str = "",
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, group=group, doc=doc or (fn.__doc__ or ""), tags=tags
        )
        return fn

    return deco


_LOADED = False

# External re-verification schedule. The driver's differential check walks
# the registry in iteration order with a 50-query budget per round, while
# the registry holds more; this list — NOT import order — pins which
# queries occupy the window this round. Every query is ALWAYS covered
# locally (tools/check_oracle.py, tests/test_registry_builds.py); the
# window only schedules the external cadence. Policy: (1) queries with no
# driver row yet come first, (2) then queries whose code changed this
# round, (3) then the longest-unverified green queries; whatever sits out
# must be green-on-unchanged-code from the previous round.
#
# Round-4 window, by the standing policy: (1) the twelve NEW queries
# (funnel/retention/rollup_reuse/bloom/corr_agg/mixture/pack_chunks/
# gapfill/hist_quantile/mode/latest/interval_overlap — no driver row
# yet); (2) the twelve r03-red rows (the 11
# events-reader casualties, all fixed by the schema-adaptive reader, plus
# q_sim_ivf_topk, which now carries a full oracle); (3) the 13 queries
# last verified in r01 and 13 of the 15 last verified in r02 (2-3 rounds
# stale; tokens/fingerprint — trivially row-local, twice green — yield
# their slots to the new queries and rotate in next round); sitting out (40): everything
# else — all hash-green in r03 on code untouched this round (including
# the similarity tier, whose r03-green members were only repositioned,
# not changed, by the IVF rewrite).
_WINDOW: tuple[str, ...] = (
    # (1) new this round
    "q_events_funnel",
    "q_events_retention",
    "q_agg_rollup_reuse",
    "q_sketch_bloom",
    "q_subquery_corr_agg",
    "q_pipe_mixture",
    "q_pipe_pack_chunks",
    "q_events_gapfill",
    "q_sketch_hist_quantile",
    "q_agg_mode",
    "q_dedup_latest",
    "q_join_interval_overlap",
    # (2) r03-red
    "q_join_asof",
    "q_agg_skew_salted",
    "q_dedup_exact",
    "q_fn_json",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_late",
    "q_stream_attrib",
    "q_sketch_hll",
    "q_sketch_cms",
    "q_sim_ivf_topk",
    # (3a) last green r01
    "q_scan_project",
    "q_join_full_outer",
    "q_subquery_scalar",
    "q_subquery_exists",
    "q_agg_basic",
    "q_agg_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_agg_pivot",
    "q_sort_multi",
    "q_set_ops",
    "q_limit_offset",
    # (3b) last green r02
    "q_text_wordcount",
    "q_text_wordcount_rdd",
    "q_win_rank",
    "q_win_running",
    "q_win_topk_group",
    "q_win_lag_lead",
    "q_win_ntile_dist",
    "q_win_range_frame",
    "q_win_first_last",
    "q_text_ngrams",
    "q_text_tfidf",
    "q_text_langid",
    "q_text_quality",
)


def load_all_queries() -> dict[str, Query]:
    """Import every operator module so all queries register; return REGISTRY
    reordered so the scheduled verification window comes first."""
    global _LOADED
    if not _LOADED:
        from mapreduce_framework_api_spark.operators import (  # noqa: F401
            contamination,
            dedup,
            events,
            multimodal,
            pipeline,
            relational,
            scalar_fns,
            similarity,
            sketches,
            skew,
            stream_join,
            text,
            windows,
        )
        from mapreduce_framework_api_spark.compat import rdd_queries  # noqa: F401

        missing = [n for n in _WINDOW if n not in REGISTRY]
        if missing:
            raise RuntimeError(f"_WINDOW names unregistered queries: {missing}")
        ordered = {n: REGISTRY[n] for n in _WINDOW}
        ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
        REGISTRY.clear()
        REGISTRY.update(ordered)
        _LOADED = True
    return REGISTRY
