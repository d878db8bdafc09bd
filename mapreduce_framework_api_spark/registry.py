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
# Round-6 window, by the standing policy:
# (1) the round-5 red row (q_text_inverted_index — postings now a
# comma-joined string on both engines; values were proven equal, the
# driver canonicalizer just couldn't hash list cells), then the 13
# queries that have never had a driver row (added after the r5 window
# filled), then the one query NEW this round (q_multimodal_audio_real —
# the real-WAV-codec lane);
# (2) the 6 queries whose CODE changed this round: the graph trio
# (broadcast-per-round rework + shared array-side pair build), the
# capstone + repeated_chunks (parallelized scans; chunk dedup also fixed
# the per-chunk tokenize re-evaluation), and q_sim_pq_topk (index block
# geometry now matches the 7/8 hash split);
# (2b) the queries NEW in the round-6 continuation sessions
# (q_dedup_minhash_recall, q_text_bpe_encode, q_dedup_minhash_verified,
# q_sim_knn_classify, q_sim_ivf_recall) plus the queries whose kernels
# changed in the continuation (q_sim_ivf_topk — per-list top-k cut;
# q_sim_cosine_topk / q_sim_search_split — shared vectorized
# _rowwise_topk; q_text_bpe_merges — shared _bpe_run helper): changed
# code outranks staleness;
# (3) staleness rotation with the remaining slots — the two r2-era
# greens (fingerprint/tokens) and the highest-complexity r3-era greens,
# so the oldest receipts rotate first. Sitting out: the row-local
# expression pipelines (q_fn_* scalars, filter_pred, pipe_pii_scrub,
# text_repetition, text_surprisal, pipe_sample_hash, pipe_split_assign,
# pipe_length_hist — all r3-green on untouched code, the standing
# policy's lowest-risk yields), the plan-asserted simple joins
# (broadcast/anti/semi/theta_range — q_join_left and q_join_range_binned
# keep those families' slots), and every r4/r5 green on untouched code;
# all are covered by the committed 159-ok local receipts.
_WINDOW: tuple[str, ...] = (
    # (1) red-row fix + never-driver-checked + new this round
    "q_text_inverted_index",
    "q_fn_map",
    "q_sim_maxsim_topk",
    "q_sim_pq_recall",
    "q_sim_outliers",
    "q_events_heatmap",
    "q_events_burst",
    "q_agg_winsorized",
    "q_pipe_interleave",
    "q_pipe_quantile_norm",
    "q_pipe_split_leakage",
    "q_text_langid_confusion",
    "q_multimodal_audio_stats",
    "q_privacy_kanonymity",
    "q_multimodal_audio_real",
    # (2) code changed this round
    "q_graph_pagerank",
    "q_graph_bfs",
    "q_graph_triangles",
    "q_dedup_repeated_chunks",
    "q_pipe_end_to_end",
    "q_sim_pq_topk",
    # (2b) new in the round-6 continuation + the shared-helper refactor
    "q_dedup_minhash_recall",
    "q_dedup_minhash_verified",
    "q_dedup_incremental",
    "q_pipe_snapshot_diff",
    "q_sim_knn_classify",
    "q_sim_ivf_recall",
    "q_sim_lsh_recall",
    "q_dedup_simhash_recall",
    "q_sim_ivf_topk",
    "q_sim_cosine_topk",
    "q_sim_search_split",
    "q_text_bpe_encode",
    "q_text_bpe_merges",
    # (2c) arithmetic/contract changed by the edge-corpus hardening:
    # zero-token shingle/simhash semantics (covered via the dedup rows),
    # decimal(18,2) widening, 128-bit anomaly statistics, the
    # constant-series autocorr guard, null-text exclusion contracts
    # (quantile_norm is already in group (1); token_budget here), and the
    # explicit NULLS LAST rank tie-break in the windowed top-k.
    # q_agg_stats / q_pipe_keep_first / q_join_range_binned yielded their
    # rotation slots (r3-greens on code untouched by this round).
    "q_events_anomaly",
    "q_events_gapfill",
    "q_events_interpolate",
    "q_events_autocorr",
    "q_pipe_token_budget",
    "q_stream_topk_windowed",
    "q_agg_rollup_reuse",
    "q_mv_incremental",
    "q_join_temporal",
    # (2d) relational null/degenerate contracts from the edge-corpus
    # battery: q_join_asof carries the shared asof_join null-time fix
    # (q_join_asof_nearest uses the same helper); the sibling
    # measure-complete moment contracts (corr_exact / mode /
    # weighted_median / winsorized) are represented by the in-window
    # q_agg_stats and q_agg_winsorized rows and hold local sf0.01 +
    # edge-corpus receipts.
    "q_join_asof",
    # (3) staleness rotation. The r2-era greens (fingerprint/tokens —
    # row-local expression pipelines, the lowest-risk class) and the four
    # plan-asserted simple joins (inner/left/multi/star) yielded their
    # slots to the (2c) changed-arithmetic queries; q_join_range_binned,
    # q_join_skew_salted, and the changed q_join_temporal keep the join
    # family's driver presence.
    # q_agg_percentile rotated out (r3-green row-local exact percentile;
    # q_agg_stats keeps the aggregate family's rotation slot) for
    # q_pipe_snapshot_diff.
    "q_dedup_canonical",
    "q_dedup_decontaminate",
    "q_dedup_minhash",
    "q_dedup_ngram_jaccard",
    # q_dedup_report / q_dedup_clusters rotated out (r4-greens — the
    # least-stale rotation entries; the family stays covered by
    # canonical/minhash/ngram_jaccard/simhash plus the recall queries
    # that exercise the same pipelines) for the two tier-recall
    # evaluations new this session.
    "q_dedup_simhash",
    # q_join_broadcast / q_join_anti / q_join_semi rotated out (r3-green,
    # plan-asserted in pytest; q_join_left keeps the outer/filtering-join
    # family's slot) for the similarity queries whose kernels changed
    # this session (ivf_topk, cosine_topk, search_split).
    # Rotated out to hold the window at 50 with the two queries new this
    # session (q_dedup_minhash_verified, q_sim_knn_classify) added:
    # q_multimodal_meta (r4-green, the freshest rotation entry) and
    # q_join_theta_range (r3-green; its scale-safe sibling
    # q_join_range_binned keeps the family's slot).
    # q_multimodal_stats rotated out (r3-green; the multimodal family
    # keeps two group-(1) slots via audio_stats/audio_real) for
    # q_dedup_incremental.
    # q_pipe_quota_cap rotated out (r3-green row-local window pipeline)
    # for q_sim_ivf_recall.
    "q_sim_ann_lsh",
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
            graph,
            multimodal,
            pipeline,
            relational,
            scalar_fns,
            similarity,
            sketches,
            skew,
            stream_join,
            text,
            warehouse,
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
