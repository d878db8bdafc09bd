"""Adversarial edge-corpus differential check.

Builds a fixture directory whose ``documents`` table is a constructed set
of worst-case rows — empty text, whitespace-only, punctuation-only
(zero tokens), single-token, unicode-delimiter, megatoken, exact
duplicates — with every OTHER table symlinked from sf0.001, then the
document-centric queries can be driven through BOTH engines with the
standard differential checker:

    python tools/edge_corpus.py            # build + run the doc-centric set
    python tools/edge_corpus.py q_x q_y    # build + run specific queries

This is the harness that caught class-mates of the round-6
shingle-fallback divergence (a kernel whose sub-3-token fallback hashed
raw text while its oracle compared the normalized token join — latent on
the driver fixtures, which contain no sub-3-token doc)."""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "edge"
)

# One doc per adversarial class, plus enough near-normal filler that
# grouped/quantile queries keep non-degenerate groups.
EDGE_DOCS = [
    (0, "", "en", "edge"),                       # empty text
    (1, "   \t  ", "en", "edge"),                # whitespace only
    (2, "!!! ??? ... ---", "en", "edge"),        # punctuation only: 0 tokens
    (3, "single", "en", "edge"),                 # 1 token
    (4, "alpha, beta", "en", "edge"),            # 2 tokens, punct != join
    (5, "alpha beta", "en", "edge"),             # same 2 tokens, clean
    (6, "héllo wörld 中文 тест", "xx", "edge"),    # unicode delimiters
    (7, "spark " * 200, "en", "edge"),           # one token repeated 200x
    (8, "the quick brown fox jumps over the lazy dog", "en", "dup"),
    (9, "the quick brown fox jumps over the lazy dog", "en", "dup"),
    (10, None, "en", "edge"),                    # NULL text (dirty row)
    # prefix/truncation-dup stress (q_dedup_prefix): 11 is a strict prefix
    # of 12; 13 shares the exact 40-char blocking head with both but
    # diverges after it, so it must survive blocking and DIE in the
    # full-prefix verification against 11.
    (11, "prefix stress shared head 0123456789 abcd continuing body text", "en", "dup"),
    (12, "prefix stress shared head 0123456789 abcd continuing body text"
         " extended tail beyond the truncation point", "en", "dup"),
    (13, "prefix stress shared head 0123456789 abcdZ divergent continuation"
         " after the identical head", "en", "dup"),
    # containment stress (q_dedup_containment vs its banded estimate):
    # 15 is a CONTIGUOUS MID-FRAGMENT of 14 (not a prefix), so its
    # trigram set is fully contained (containment 1.0) while Jaccard is
    # ~4/58 — the inclusion class the symmetric tier and the prefix tier
    # both miss, and the class resemblance BANDING almost surely fails
    # to surface (est-jaccard ~0.07 -> no shared band), so the
    # est-containment recall instrument reads < 1 here BY DESIGN.
    (14, "quarto zephyr baumgartner inkwell dormouse pylon crescent "
         "vermilion oscillate thimble quagmire bastion ephemeral woodwind "
         "tarragon melisma copper gondola praline whetstone juniper "
         "madrigal tundra obelisk finch saffron riverbed calliope "
         "dulcimer foxglove ampersand topaz brocade nimbus sable "
         "porcelain verdigris hollyhock tamarind lattice sextant "
         "marzipan chicory plinth gossamer ocelot ricochet vellum "
         "sassafras bergamot", "en", "dup"),
    (15, "dulcimer foxglove ampersand topaz brocade nimbus", "en", "dup"),
]
FILLER = [
    (
        100 + i,
        f"filler document number {i} with shared words table row scan value "
        f"and a distinct tail token{i}",
        ["en", "de", "fr"][i % 3],
        f"src{i % 4}",
    )
    for i in range(40)
]


# Adversarial events: duplicate (user, ts) pairs, exact-duplicate full
# rows, events exactly on hour/window boundaries, a single-event user,
# zero/negative/extreme values, identical ts across users, and an
# out-of-order event_id sequence — the tie-break and boundary cases the
# driver fixture's generator never produces densely.
EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (0, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),      # exact hour boundary
    (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),      # full duplicate row (diff id)
    (2, "2024-01-01 00:00:00", 1, "click", 2.0, "{}"),     # same user+ts, other type
    (3, "2024-01-01 00:59:59.999999", 1, "view", 0.0, "{}"),  # window edge, zero value
    (4, "2024-01-01 01:00:00", 1, "purchase", -1.5, "{}"), # negative value on boundary
    (5, "2024-01-01 00:00:00", 2, "view", 1e12, "{}"),     # same ts as user 1, huge value
    (6, "2024-01-01 02:00:00", 3, "view", 0.015, "{}"),    # single-event user (ntile/lag edges)
    (9, "2024-01-01 03:00:00", 2, "click", 1.0, "{}"),     # id gap + out-of-order arrival
    (8, "2024-01-01 03:00:00", 2, "click", 1.0, "{}"),     # duplicate (user, ts, type, value)
    (7, "2024-01-01 04:30:00", 2, "purchase", 3.25, "{}"),
    (10, "2024-01-01 05:00:00", 9, None, None, None),  # NULL type/value/props
]
FILLER_EVENTS = [
    (
        100 + i,
        f"2024-01-0{1 + i % 7} {i % 24:02d}:{(7 * i) % 60:02d}:{(13 * i) % 60:02d}",
        4 + i % 6,
        ["view", "click", "purchase", "refund"][i % 4],
        round(0.5 * (i % 9) + 0.25, 2),
        "{}",
    )
    for i in range(80)
]

EVENT_QUERIES = [
    "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
    "q_stream_late", "q_stream_topk_windowed", "q_stream_attrib",
    "q_events_funnel", "q_events_retention", "q_events_sessionize",
    "q_events_gapfill", "q_events_ohlc", "q_events_cdc_compact",
    "q_events_anomaly", "q_events_timeweighted", "q_events_interpolate",
    "q_events_transitions", "q_events_streaks", "q_events_cooccurrence",
    "q_events_rfm", "q_events_latency_bands", "q_events_heatmap",
    "q_events_burst", "q_events_autocorr",
    "q_dedup_exact", "q_dedup_latest", "q_pipe_keep_first",
    "q_win_topk_group", "q_agg_skew_salted",
    "q_agg_rollup_reuse", "q_mv_incremental", "q_join_temporal",
]


# Adversarial embeddings: EXACT duplicate vectors under distinct ids (the
# realistic tie stress — bitwise-identical rows give exactly equal cosines
# on both engines, so every tier's (score, id) tie-break actually fires),
# plus near-identical vectors (one nudged element) and a skewed-norm pair.
# All norms are nonzero (the documented input contract).
def _edge_embeddings():
    rows = []
    for i in range(40):
        v = [0.0] * 64
        v[i % 64] = 1.0
        v[(i * 7 + 3) % 64] = 0.5 + (i % 5) * 0.1
        v[(i * 13 + 9) % 64] = -0.25
        rows.append((i, [float(x) for x in v], i % 4))
    # ids 100..119: exact duplicates of vectors 0..19 (distinct ids)
    for i in range(20):
        rows.append((100 + i, list(rows[i][1]), rows[i][2]))
    # ids 200..204: one nudged element off vector 0..4
    for i in range(5):
        v = list(rows[i][1])
        v[0] = float(v[0]) + 0.01
        rows.append((200 + i, v, rows[i][2]))
    # extreme norms WITHIN the coordinate contract (|x| <= 1024, see the
    # similarity module docstring): tiny and contract-maximal multiples of
    # vector 5 — a 1e9 norm ratio across the corpus, the integer-exact
    # tiers' documented worst case (beyond the bound numpy int64 matmuls
    # wrap silently, so the battery pins the boundary, not the abyss)
    rows.append((300, [x * 1e-6 for x in rows[5][1]], 0))
    rows.append((301, [x * 1e3 for x in rows[5][1]], 1))
    return rows


EMB_QUERIES = [
    "q_sim_cosine_topk", "q_sim_search_split", "q_sim_ann_lsh",
    "q_sim_ivf_topk", "q_sim_pq_topk", "q_sim_maxsim_topk",
    "q_sim_knn_classify", "q_sim_outliers", "q_sim_pq_recall",
    "q_sim_ivf_recall", "q_sim_lsh_recall", "q_dedup_embedding",
    # SemDeDup: the exact-duplicate block (cosine exactly 1.0 under
    # distinct ids) exercises keep-lowest-id election; the nudged and
    # skewed-norm rows stress the within-cluster cosine against the
    # integer-exact assignment boundary.
    "q_dedup_semdedup", "q_dedup_semdedup_recall",
    "q_dedup_semdedup_incremental",
    # Composed IVF-PQ family (r13-r14): exact-dup ADC ties, extreme-norm
    # integer headroom, and the scaled/filtered/append variants' derived
    # knobs (K clamps to 16 on this 67-vector corpus; labels 0..3 make
    # the (1, 2) filter predicate ~half the corpus; the append audit's
    # frozen base split is non-degenerate).
    "q_sim_ivfpq_topk", "q_sim_ivfpq_hq_topk", "q_sim_ivfpq_hq_rerank",
    "q_sim_ivfpq_probe", "q_sim_ivfpq_scaled_topk",
    "q_sim_ivfpq_scaled_recall", "q_sim_filtered_topk",
    "q_sim_filtered_recall", "q_sim_index_append_audit",
    # delete half of index maintenance + the drift monitor: the exact-dup
    # block lands identical margins (tie-rule stress for the pure-JVM
    # top-2 scan vs the oracle's ROW_NUMBER) and the delsplit slice on a
    # 67-vector corpus exercises empty-list (n_deleted=0) rows.
    "q_sim_index_delete_audit", "q_sim_index_drift",
    "q_sim_index_drift_scaled",
]


# Adversarial relational tables: NULL join keys, dangling foreign keys, a
# customer with no orders, NULL sort/measure columns (the NULLS FIRST vs
# NULLS LAST divergence class), duplicate natural keys, and boundary
# dates. nation/region/supplier/part symlink through from sf0.001, so
# nationkeys stay in their real 0..24 domain and lineitem part/supp refs
# can dangle realistically.
EDGE_CUSTOMERS = [
    # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    (1, "Customer#1", 0, 100.25, "BUILDING"),
    (2, "Customer#2", 1, -50.75, "AUTOMOBILE"),   # negative balance
    (3, "Customer#1", 2, 0.0, "BUILDING"),        # duplicate name, zero bal
    (4, "Customer#4", 3, None, None),             # NULL bal + segment
    (5, "Customer#5", None, 10.0, "MACHINERY"),   # NULL nationkey
    (6, "Customer#6", 4, 999999.99, "HOUSEHOLD"), # no orders at all
]
EDGE_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    (1, 1, "O", 1000.50, "1995-01-01", "1-URGENT"),
    (2, 1, "F", 2000.25, "1995-01-01", "2-HIGH"),      # same cust+date
    (3, 2, "O", None, "1995-06-15", "3-MEDIUM"),        # NULL totalprice
    (4, None, "F", 500.00, "1995-07-01", "4-NOT SPEC"), # NULL custkey
    (5, 999, "O", 750.10, "1995-08-01", "5-LOW"),       # dangling custkey
    (6, 3, "P", 1234.56, None, "1-URGENT"),             # NULL orderdate
    (7, 4, "O", 100.00, "1996-02-29", "2-HIGH"),        # leap day
    (8, 5, "F", 0.0, "1995-01-01", "3-MEDIUM"),         # zero price
]
EDGE_LINEITEMS = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
    (1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O", "1995-01-10"),
    (1, 2, 1, 2, 10.0, 1000.0, 0.05, 0.02, "N", "O", "1995-01-10"),  # dup measures
    (2, 1, 2, 1, None, 500.0, 0.0, 0.0, "R", "F", "1995-02-01"),     # NULL quantity
    (2, 3, 2, 2, 5.0, None, 0.10, 0.04, "A", "F", "1995-02-01"),     # NULL price
    (3, 99999, 999, 1, 1.0, 10.0, None, None, "N", "O", None),       # dangling part/supp, NULLs
    (4, 2, 1, 1, 2.0, 20.0, 1.0, 0.0, "R", "F", "1995-07-02"),       # 100% discount
    (9, 1, 1, 1, 3.0, 30.0, 0.0, 0.08, "N", "O", "1995-09-01"),      # dangling orderkey
    # returnflag "C": constant quantity 0.01 (zero variance, but 0.01 is
    # not binary-representable — exact-decimal equality vs double
    # inequality was the q_agg_stats engine/oracle divergence; both
    # engines must now DROP this group via the shared double-side test)
    (5, 1, 1, 1, 0.01, 100.0, 0.05, 0.01, "C", "O", "1995-03-01"),
    (5, 2, 1, 2, 0.01, 200.0, 0.10, 0.02, "C", "O", "1995-03-02"),
    (5, 3, 2, 3, 0.01, 300.0, 0.15, 0.03, "C", "O", "1995-03-03"),
    (5, 4, 2, 4, 0.01, 400.0, 0.20, 0.04, "C", "O", "1995-03-04"),
    (5, 1, 1, 5, 0.01, 500.0, 0.25, 0.05, "C", "O", "1995-03-05"),
    # returnflag "D": constant DISCOUNT 0.07 with varying qty/price — the
    # discount moment had no degeneracy guard at all (sqrt of a tiny
    # negative double → NaN → CAST error in one engine); both engines must
    # drop this group via the new sdd guard
    (6, 1, 1, 1, 1.0, 10.0, 0.07, 0.01, "D", "F", "1995-04-01"),
    (6, 2, 1, 2, 2.0, 20.0, 0.07, 0.02, "D", "F", "1995-04-02"),
    (6, 3, 2, 3, 3.0, 30.0, 0.07, 0.03, "D", "F", "1995-04-03"),
    (6, 4, 2, 4, 4.0, 40.0, 0.07, 0.04, "D", "F", "1995-04-04"),
]

REL_QUERIES = [
    "q_join_inner", "q_join_left", "q_join_semi", "q_join_anti",
    "q_join_full_outer", "q_join_broadcast", "q_join_multi", "q_join_star",
    "q_join_theta_range", "q_join_range_binned", "q_join_interval_overlap",
    "q_join_asof", "q_join_asof_nearest", "q_join_lateral_topn",
    "q_join_fuzzy", "q_join_skew_salted",
    "q_agg_basic", "q_agg_distinct", "q_agg_rollup", "q_agg_cube",
    "q_agg_grouping_sets", "q_agg_stats", "q_agg_pivot", "q_agg_unpivot",
    "q_agg_mode", "q_agg_mad", "q_agg_weighted_median", "q_agg_winsorized",
    "q_agg_corr_exact", "q_agg_string_agg", "q_agg_percentile",
    "q_win_rank", "q_win_running", "q_win_topk_group", "q_win_lag_lead",
    "q_win_ntile_dist", "q_win_range_frame", "q_win_first_last",
    "q_sort_multi", "q_limit_offset", "q_set_ops", "q_set_ops_all",
    "q_subquery_scalar", "q_subquery_exists", "q_subquery_corr_agg",
    "q_scan_project", "q_filter_pred", "q_profile_columns",
    "q_privacy_kanonymity", "q_graph_pagerank", "q_graph_triangles",
    "q_graph_bfs",
]


# Queries whose inputs are documents-only (oracle views cover the rest via
# symlinks anyway; this list keeps the run focused and fast).
DOC_QUERIES = [
    "q_dedup_minhash", "q_dedup_minhash_verified", "q_dedup_minhash_recall",
    "q_dedup_simhash", "q_dedup_simhash_recall", "q_dedup_ngram_jaccard",
    "q_dedup_clusters", "q_dedup_canonical", "q_dedup_report",
    "q_dedup_repeated_chunks", "q_dedup_decontaminate", "q_dedup_incremental",
    "q_text_wordcount", "q_text_ngrams", "q_text_tfidf", "q_text_tokens",
    "q_text_langid", "q_text_quality", "q_text_repetition",
    "q_text_fingerprint", "q_text_surprisal", "q_text_keywords",
    "q_text_vocab_coverage", "q_text_inverted_index", "q_text_bpe_merges",
    "q_text_bpe_encode", "q_text_langid_confusion", "q_text_zipf",
    "q_dedup_prefix", "q_dedup_prefix_incremental", "q_dedup_containment",
    "q_dedup_containment_est", "q_dedup_containment_est_recall",
    "q_dedup_containment_bk", "q_dedup_containment_bk_recall",
    "q_dedup_containment_bk_verified", "q_dedup_containment_bk_precision",
    "q_pipe_sample_hash", "q_pipe_split_assign", "q_pipe_quota_cap",
    "q_pipe_keep_first", "q_pipe_length_hist", "q_pipe_mixture",
    "q_pipe_pack_chunks", "q_pipe_chunk_overlap", "q_pipe_upsample_epochs",
    "q_pipe_shuffle_order", "q_pipe_token_budget", "q_pipe_filter_cascade",
    "q_pipe_end_to_end", "q_pipe_dataset_card", "q_pipe_interleave",
    "q_pipe_quantile_norm", "q_pipe_split_leakage", "q_pipe_pii_scrub",
    "q_pipe_split_by_cluster",
    "q_pipe_snapshot_diff", "q_privacy_kanonymity",
    "q_multimodal_stats", "q_multimodal_meta", "q_multimodal_audio_stats",
    "q_multimodal_audio_real", "q_multimodal_image_real",
    "q_multimodal_video_frames",
]


def build() -> str:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    rows = EDGE_DOCS + FILLER
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?, ?)", rows)
    con.execute(
        f"COPY (SELECT doc_id, text, lang, source, length(text) AS n_chars "
        f"FROM d ORDER BY doc_id) TO '{DST}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?, ?, ?, ?, ?, ?)", EDGE_EVENTS + FILLER_EVENTS)
    con.execute(
        f"COPY (SELECT * FROM e ORDER BY event_id) TO '{DST}/events.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        "CREATE TABLE c (c_custkey BIGINT, c_name VARCHAR, c_nationkey INTEGER, "
        "c_acctbal DOUBLE, c_mktsegment VARCHAR)"
    )
    con.executemany("INSERT INTO c VALUES (?, ?, ?, ?, ?)", EDGE_CUSTOMERS)
    con.execute(f"COPY (SELECT * FROM c ORDER BY c_custkey) TO '{DST}/customer.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE o (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR)"
    )
    con.executemany("INSERT INTO o VALUES (?, ?, ?, ?, ?, ?)", EDGE_ORDERS)
    con.execute(f"COPY (SELECT * FROM o ORDER BY o_orderkey) TO '{DST}/orders.parquet' (FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE l (l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, "
        "l_linestatus VARCHAR, l_shipdate TIMESTAMP)"
    )
    con.executemany("INSERT INTO l VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)", EDGE_LINEITEMS)
    con.execute(f"COPY (SELECT * FROM l ORDER BY l_orderkey, l_linenumber) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)")

    import pyarrow as pa
    import pyarrow.parquet as pq

    emb = _edge_embeddings()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in emb], pa.int64()),
                "embedding": pa.array([r[1] for r in emb], pa.list_(pa.float32())),
                "label": pa.array([r[2] for r in emb], pa.int32()),
            }
        ),
        f"{DST}/embeddings.parquet",
    )
    for t in os.listdir(SRC):
        if t.endswith(".parquet") and t not in (
            "documents.parquet",
            "events.parquet",
            "embeddings.parquet",
            "customer.parquet",
            "orders.parquet",
            "lineitem.parquet",
        ):
            link = os.path.join(DST, t)
            if os.path.lexists(link):
                os.unlink(link)
            os.symlink(os.path.join(SRC, t), link)
    return DST


def main() -> int:
    dst = build()
    names = sys.argv[1:] or (DOC_QUERIES + EVENT_QUERIES + EMB_QUERIES + REL_QUERIES)
    here = os.path.dirname(os.path.abspath(__file__))
    return subprocess.call(
        [sys.executable, os.path.join(here, "check_oracle.py"), dst, *names]
    )


if __name__ == "__main__":
    raise SystemExit(main())
