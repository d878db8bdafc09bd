"""Graph analytics over relationally-derived edges.

The reference has no graph surface at all; this module exists because a
corpus/product analytics engine keeps meeting graph-shaped questions
(dup clusters — already in dedup.py as bounded label propagation — and
influence/centrality over co-occurrence graphs, here). Everything is
DataFrame joins + aggregates: at 100 TB a "graph engine" on Spark IS a
sequence of equi-joins keyed on vertex id, and Catalyst/AQE handle the
rest (cf. the label-propagation notes at dedup.py:920).

Exactness discipline: PageRank is usually FP-iterative (order-dependent
sums); here every score is an integer PPM (parts-per-million) and each
contribution is floor(score/degree) — pure integer arithmetic, so the
fixed 3-iteration unroll replays bit-exactly in SQL and the query
carries a FULL differential oracle like everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import session_cache_key, table

_PR_ITERS = 3
_PR_DAMP_PPM = 850_000  # 0.85 in ppm
_PR_BASE_PPM = 150_000  # (1 - d) in ppm


_ADJ_CACHE: dict[tuple[str, str], DataFrame] = {}


def _copurchase_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirrored co-purchase ADJACENCY ``(node, nbrs sorted asc)``: parts
    are neighbors when they appear in the same order. The one shared
    materialized graph artifact — built once per (application, sf_dir)
    (localCheckpoint + cache dict, the jaccard_dup_pairs / _bpe_run
    discipline) and consumed by BOTH pagerank and triangles, which
    previously shared a 1.2M-row distinct pair table and then each
    re-derived their own per-node views from it.

    Adjacency-first beats pairs-first twice over:
    - the checkpointed artifact is VERTEX-sized (20k array rows vs 1.2M
      pair rows — same bytes, 60x fewer rows to write/scan), and
    - set-fold aggregation at the node level dedups cross-order repeats
      for free, so the pre-node-level ``distinct()`` exchange of the
      pair form disappears entirely.
    Built ARRAY-SIDE, not as a self-join, and TRANSPOSED without a pair
    explosion: one groupBy(l_orderkey) collects each order's distinct
    parts, then each member is exploded carrying its order's WHOLE part
    set (one row per (order, member) — corpus-linear, vs the
    width-squared pair fan-out), and one groupBy(node) folds the
    collected sets with codegen'd array ops
    (flatten -> array_distinct -> remove self -> sort). Measured
    min-of-3 at sf0.1: 1.1 s vs 1.5 s for the pair-explosion form that
    shuffled ~1.8M pair rows instead of 600k set-carrying rows, both
    bit-identical. The checkpoint preserves the groupBy's hash(node)
    partitioning — the property the pagerank rounds lean on to run
    exchange-free."""
    key = session_cache_key(spark, sf_dir, "lineitem")
    cached = _ADJ_CACHE.get(key)
    if cached is not None:
        return cached
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    grouped = li.groupBy("ok").agg(F.collect_set("pk").alias("pks"))
    member = grouped.select(F.explode("pks").alias("node"), "pks")
    adj = (
        member.groupBy("node")
        .agg(
            F.expr(
                "array_sort(array_remove(array_distinct(flatten(collect_list(pks))), node))"
            ).alias("nbrs")
        )
        .localCheckpoint()
    )
    _ADJ_CACHE[key] = adj
    return adj


def _copurchase_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-oriented adjacency ``(u, nbrs)`` with nbrs = {v > u}: a
    codegen'd array filter over the shared mirrored adjacency (sorted
    order is preserved by ``filter``), no rebuild. Exploding it yields
    the canonical u<v edge list."""
    adj = _copurchase_adj(spark, sf_dir)
    return adj.select(
        F.col("node").alias("u"), F.expr("filter(nbrs, y -> y > node)").alias("nbrs")
    )


def _pr_round(scores: DataFrame, adj: DataFrame) -> DataFrame:
    """One integer PageRank round: s'(v) = base + d * Σ_u→v floor(s(u)/deg(u)),
    all in ppm with floor division (bit-exact on any engine).

    Shuffle budget: ZERO per round. The score frame CARRIES the degree
    (r16): deg = size(nbrs) is re-emitted by each round's gather (min
    over the group — constant per node, so the pick is deterministic),
    which deletes the per-round scores⋈deg broadcast join and the
    separate deg broadcast build the r15 shape paid (guide §2.4: two
    operations keyed the same way share one pass). ``give`` is then a
    pure projection of the previous round's output, broadcast into the
    gather; explode(nbrs) preserves the checkpointed adjacency's
    hash(node) partitioning, so the per-node sum needs no exchange at
    all: each round is one scan of the vertex-sized adjacency plus ONE
    dimension-sized broadcast. (History: round 5 measured the
    3-shuffle-per-round edge-join form at 5.6 s sf0.1; round 6's
    broadcast-give edge join halved it; the adjacency-gather form cut
    the remaining per-round work ~30% again with an identical result
    hash — min-of-3 rounds-only 2.85 s vs 3.98 s.)"""
    give = scores.select(
        F.col("node").alias("u"),
        F.floor(F.col("s_ppm") / F.col("deg")).cast("long").alias("give"),
    )
    contrib = (
        adj.select("node", F.size("nbrs").alias("deg"), F.explode("nbrs").alias("u"))
        .join(F.broadcast(give), "u")
        .groupBy("node")
        .agg(F.sum("give").alias("gathered"), F.min("deg").alias("deg"))
    )
    return contrib.select(
        "node",
        "deg",
        (
            F.lit(_PR_BASE_PPM)
            + F.floor(F.lit(_PR_DAMP_PPM) * F.col("gathered") / F.lit(1_000_000)).cast(
                "long"
            )
        ).alias("s_ppm"),
    )


_PR_ORACLE_ROUND = """
  SELECT e.dst AS node,
         {base} + CAST(FLOOR({damp} * CAST(SUM(
             CAST(FLOOR(CAST(s.s_ppm AS DOUBLE) / d.deg) AS BIGINT)
         ) AS DOUBLE) / 1000000.0) AS BIGINT) AS s_ppm
  FROM {prev} s JOIN deg d ON s.node = d.node JOIN edges e ON s.node = e.node
  GROUP BY e.dst
"""


@register(
    "q_graph_pagerank",
    group="I",
    oracle=f"""
WITH li AS (
  SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), pairs AS (
  SELECT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY u, v
), edges AS (
  SELECT u AS node, v AS dst FROM pairs
  UNION ALL
  SELECT v AS node, u AS dst FROM pairs
), deg AS (
  SELECT node, COUNT(*) AS deg FROM edges GROUP BY node
), s0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS s_ppm FROM deg
), s1 AS ({_PR_ORACLE_ROUND.format(prev="s0", base=_PR_BASE_PPM, damp=_PR_DAMP_PPM)}
), s2 AS ({_PR_ORACLE_ROUND.format(prev="s1", base=_PR_BASE_PPM, damp=_PR_DAMP_PPM)}
), s3 AS ({_PR_ORACLE_ROUND.format(prev="s2", base=_PR_BASE_PPM, damp=_PR_DAMP_PPM)}
), ranked AS (
  SELECT node, s_ppm,
         ROW_NUMBER() OVER (ORDER BY s_ppm DESC, node) AS rk
  FROM s3
)
SELECT CAST(rk AS BIGINT) AS rk, node AS part_key, s_ppm
FROM ranked WHERE rk <= 20
ORDER BY rk
""",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by 3-iteration PageRank over the co-purchase graph
    (parts are linked when they appear in the same order) — the
    influence/centrality question every recommendation pipeline asks of
    a co-occurrence graph.

    Engine-exactness: scores are integer PPM; each round gives
    floor(score/degree) per neighbor and re-damps with one integer
    floor — NO floating accumulation across rows, so the fixed unroll is
    bit-identical in SQL (the iterative-FP PageRank has no such oracle).

    Plan shape: the graph artifact is the shared mirrored adjacency
    (_copurchase_adj — array-side pair generation, vertex-sized
    checkpoint). Each round is an exchange-free gather over that
    adjacency plus one dimension-sized broadcast (_pr_round); since the
    graph is undirected, in-neighbors == neighbors, so the gather
    s'(v) = Σ_{u∈N(v)} give(u) walks adj(v) directly and the per-node
    sum reuses the adjacency's hash(node) partitioning. The unroll is
    FIXED (3 rounds, so the lineage stays bounded without checkpointing;
    the convergence-driven variant would localCheckpoint per round
    exactly like dedup.py's label propagation). Final top-20 is
    TakeOrdered, not a global sort.

    100 TB note: the per-round broadcast of ``give`` assumes the VERTEX
    set (parts) is dimension-sized — true for product co-occurrence
    graphs; for a billion-vertex graph the round falls back to the
    shuffled vertex-keyed edge join (the pre-round-6 shape, kept in git
    history), which is the same semantics with exchanges instead of
    broadcasts."""
    # Isolated vertices (a part appearing only in single-distinct-part
    # orders has an empty co-purchase neighborhood) are NOT part of the
    # graph: the oracle's deg CTE groups the edge list, so such nodes
    # never get a degree row or a seed score there — and an unfiltered
    # deg=0 row here is a division by zero under ANSI. Found by the
    # adversarial relational battery (the driver fixtures have no
    # single-part-only parts).
    adj = _copurchase_adj(spark, sf_dir).filter(F.size("nbrs") > 0)
    scores = adj.select(
        "node",
        F.size("nbrs").alias("deg"),
        F.lit(1_000_000).cast("long").alias("s_ppm"),
    )
    for _ in range(_PR_ITERS):
        scores = _pr_round(scores, adj)
    return (
        scores.orderBy(F.desc("s_ppm"), "node")
        .limit(20)
        .select(
            F.row_number()
            .over(W.orderBy(F.desc("s_ppm"), "node"))
            .cast("long")
            .alias("rk"),
            F.col("node").alias("part_key"),
            "s_ppm",
        )
        .orderBy("rk")
    )


@register(
    "q_graph_triangles",
    group="I",
    oracle="""
WITH li AS (
  SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), e AS (
  SELECT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY u, v
), wedges AS (
  SELECT e1.u, e1.v, e2.v AS w
  FROM e e1 JOIN e e2 ON e1.v = e2.u
), tri AS (
  SELECT wg.u, wg.v, wg.w
  FROM wedges wg JOIN e e3 ON wg.u = e3.u AND wg.w = e3.v
)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM wedges) AS BIGINT) AS n_wedges,
       CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles
""",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph (the clustering/
    community-density statistic), by the adjacency-intersection
    formulation: edges stay in canonical u<v orientation, each node
    carries its sorted forward-neighbor array, and a triangle u<v<w is
    found as w ∈ N⁺(u) ∩ N⁺(v) for the edge (u, v) — every triangle
    counted exactly once at its smallest-id edge.

    Engine-exactness: pure joins, array intersections and counts —
    integers end to end. (The oracle counts the same triangles through
    the equivalent wedge-join SQL; formulation differs, semantics
    proven equal.)

    Plan shape: measured 2.2x faster than the textbook wedge join at
    sf0.1 (3.4 s vs 7.5 s, same 1.88M triangles): the wedge join
    materializes Σ in·out ≈ 75M wedge rows through a shuffle before the
    closure check, while the intersection form touches only the 1.2M
    edges with two bounded neighbor arrays attached and does the wedge
    work INSIDE a codegen'd array_intersect per edge — compute instead
    of data movement, the same trade the dedup tiers make with
    array-side pair generation. The forward adjacency (and the edge
    list, by exploding it) derives from the SHARED mirrored adjacency
    artifact (_copurchase_adj) with one codegen'd array filter — no
    rebuild, no distinct; and since that adjacency is vertex-sized, both
    per-endpoint neighbor attachments are BROADCAST joins (the edge list
    never shuffles at all; for a billion-vertex graph drop the hints and
    the same plan runs with exchanges). Degree skew bounds the array
    width (avg ~120 here); at adversarial skew the standard
    degree-ordered orientation shrinks the forward arrays further
    (documented). The wedge total still rides along from degree products
    (a 20k-row aggregate), so the output also supports the clustering
    coefficient."""
    fadj = _copurchase_fwd(spark, sf_dir)  # from the shared materialized adj
    e = fadj.select("u", F.explode("nbrs").alias("v"))
    au = fadj.select(F.col("u").alias("ju"), F.col("nbrs").alias("nu"))
    av = fadj.select(F.col("u").alias("jv"), F.col("nbrs").alias("nv"))
    tri_per_edge = (
        e.join(F.broadcast(au), e.u == au.ju)
        .join(F.broadcast(av), e.v == av.jv)
        .select(F.size(F.array_intersect("nu", "nv")).alias("t"))
    )
    # wedge total (for the clustering coefficient): Σ_mid in(mid)·out(mid)
    # over the oriented edge list — a node-count-sized aggregate.
    outd = fadj.select(F.col("u").alias("node"), F.size("nbrs").alias("outd"))
    ind = e.groupBy(F.col("v").alias("node")).agg(F.count("*").alias("ind"))
    # COALESCE to 0: a wedge-free graph (every node degree <= 1 after
    # orientation) makes these SUMs aggregate zero rows, which is SQL
    # NULL — the oracle's COUNT(*) forms say 0 (edge-corpus finding on a
    # 2-edge graph).
    wedge_total = outd.join(ind, "node").agg(
        F.coalesce(F.sum(F.col("ind") * F.col("outd")), F.lit(0))
        .cast("long")
        .alias("n_wedges")
    )
    return (
        e.agg(F.count("*").cast("long").alias("n_edges"))
        .crossJoin(F.broadcast(wedge_total))
        .crossJoin(
            F.broadcast(
                tri_per_edge.agg(
                    F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_triangles")
                )
            )
        )
        .select("n_edges", "n_wedges", "n_triangles")
    )


def _adjline_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirrored SPARSE adjacency over the adjacent-lineitem graph
    (parts on consecutive line numbers of the same order) — the shared
    artifact behind BFS and connected components, built once per
    (application, sf_dir) like _copurchase_adj.

    Adjacent-line pairs are built ARRAY-SIDE (the _copurchase_adj
    trade): one groupBy(ok) collects each order's (ln, pk) structs, and
    the ln±1 pairing runs inside a codegen'd nested transform over that
    array — one lineitem shuffle instead of shuffling BOTH sides of the
    (ok, ln) self-equi-join. BOTH orientations come out of the SAME
    transform (|y.ln - x.ln| = 1 pairs x with its predecessor AND its
    successor). The inner filter pairs x with EVERY y at adjacent ln
    (not just the next array slot), so semantics match the oracles'
    self-join exactly even if (ok, ln) were ever non-unique. The
    mirrored multi-edges fold straight into a VERTEX-sized adjacency:
    collect_set dedups per node inside the same groupBy(src) shuffle,
    and the checkpointed artifact is ~17k array rows instead of 587k
    pair rows (~30x fewer rows for the materialize + every iterative
    scan; measured min-of-3 at sf0.1: edge stage 1.23 s -> ~0.6 s)."""
    key = (*session_cache_key(spark, sf_dir, "lineitem"), "adjline")
    cached = _ADJ_CACHE.get(key)
    if cached is not None:
        return cached
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_partkey").alias("pk"),
    )
    raw = (
        li.groupBy("ok")
        .agg(F.collect_list(F.struct("ln", "pk")).alias("arr"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(arr, x -> "
                    "transform(filter(arr, y -> abs(y.ln - x.ln) = 1 AND y.pk <> x.pk), "
                    "y -> struct(x.pk AS src, y.pk AS dst))))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
    )
    adj = (
        raw.groupBy("src").agg(F.collect_set("dst").alias("nbrs")).localCheckpoint()
    )
    _ADJ_CACHE[key] = adj
    return adj


_BFS_MAX_HOPS = 3

# The adjacent-line edge derivation, in ONE fragment shared by the BFS
# and connected-components oracles (the _ivf_assign_ctes discipline: two
# consumers of one graph definition can never drift).
_ADJLINE_EDGES_CTES = """li AS (
  SELECT l_orderkey AS ok, l_linenumber AS ln, l_partkey AS pk FROM lineitem
), pairs AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND b.ln = a.ln + 1 AND a.pk <> b.pk
), edges AS (
  SELECT u AS src, v AS dst FROM pairs
  UNION
  SELECT v AS src, u AS dst FROM pairs
)"""


@register(
    "q_graph_bfs",
    group="I",
    oracle=f"""
WITH RECURSIVE {_ADJLINE_EDGES_CTES}, seeds AS (
  SELECT p_partkey AS node FROM part
  WHERE substr(md5('bfs#' || CAST(p_partkey AS VARCHAR)), 1, 1) = '0'
), reach(node, lvl) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, r.lvl + 1
  FROM reach r JOIN edges e ON r.node = e.src
  WHERE r.lvl < {_BFS_MAX_HOPS}
)
SELECT node, CAST(MIN(lvl) AS BIGINT) AS level
FROM reach GROUP BY node ORDER BY node
""",
)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: hop distance (≤3, _BFS_MAX_HOPS) from a
    deterministic 1/16 hash-slice of parts, over the SPARSE
    adjacent-lineitem graph (parts on consecutive line numbers of the
    same order — unlike the dense co-purchase clique graph pagerank
    uses, this one has bounded degree, so BFS levels stay interesting).

    Spark-first iterative shape: the edge multiset is folded ONCE into a
    checkpointed vertex-sized adjacency (node -> distinct neighbor set);
    level k's frontier equi-joins that adjacency and explodes the
    matched neighbor arrays, new nodes are the left-anti against
    everything already visited, and each level is localCheckpoint'ed —
    the lineage cut that keeps iteration k from replaying 0..k-1 (same
    discipline as dedup's label propagation, dedup.py:975). Hop count is
    the ONLY driver loop, fixed at _BFS_MAX_HOPS (3); every per-level
    step is one shuffle over a frontier-bounded row set. First-visit
    level IS min level, so no min-aggregate is needed.

    The oracle is DuckDB's recursive CTE (UNION-dedup'd frontier +
    MIN(lvl)) — semantically the same frontier expansion, proving the
    iterative DataFrame plan equals the declarative fixpoint.

    100 TB note: frontier/visited broadcasts assume the vertex set is
    dimension-sized (parts). For billion-vertex graphs, drop the
    broadcast hints — the identical plan degrades gracefully to shuffled
    vertex-keyed joins, with the per-level checkpoints still bounding the
    lineage."""
    adj = _adjline_adj(spark, sf_dir)
    seeds = (
        table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("node"))
        .filter(
            F.substring(
                F.md5(F.concat(F.lit("bfs#"), F.col("node").cast("string"))), 1, 1
            )
            == "0"
        )
    )
    # Only each level's FRONTIER is checkpointed (it feeds the next join
    # and the left-anti); the accumulated level set is a plain union of
    # those already-materialized pieces — checkpointing it too would
    # re-materialize all prior levels once per hop (measured ~2x the
    # whole query at sf0.1).
    levels = seeds.withColumn("level", F.lit(0).cast("long")).localCheckpoint()
    frontier = levels.select("node")
    visited = levels.select("node")
    for hop in range(1, _BFS_MAX_HOPS + 1):
        # The frontier and visited sets are vertex-count-bounded (tiny next
        # to the edge list), so BOTH sides of the per-hop work broadcast:
        # the frontier into the adjacency join (the vertex-sized adjacency
        # is never re-shuffled per hop) and the visited set into the
        # left-anti (BroadcastHashJoin LeftAnti, not a shuffled anti-join).
        # The only per-hop exchange left is the distinct on the exploded
        # neighbor set, and the scan side is the ~vertex-count adjacency,
        # not the edge multiset.
        nxt = (
            adj.join(F.broadcast(frontier), frontier.node == adj.src)
            .select(F.explode("nbrs").alias("node"))
            .distinct()
            .join(F.broadcast(visited), "node", "left_anti")
            .withColumn("level", F.lit(hop).cast("long"))
            .localCheckpoint()
        )
        levels = levels.union(nxt)
        frontier = nxt.select("node")
        visited = visited.union(frontier)
    return levels.orderBy("node")


_CC_MAX_ROUNDS = 25


@register(
    "q_graph_components",
    group="I",
    oracle=f"""
WITH RECURSIVE {_ADJLINE_EDGES_CTES}, nodes AS (
  SELECT DISTINCT src AS node FROM edges
), cc(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, c.label FROM cc c JOIN edges e ON c.node = e.src
)
SELECT node, CAST(MIN(label) AS BIGINT) AS component
FROM cc GROUP BY node ORDER BY node
""",
)
def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components — the canonical distributed graph operator
    (dup-cluster grouping, entity resolution, community seeds all reduce
    to it) — over the same sparse adjacent-lineitem graph as BFS, so the
    two share one checkpointed adjacency artifact. Each node's component
    label is the MINIMUM node id reachable from it; output is one
    (node, component) row per vertex with at least one edge.

    Spark-first iterative shape: min-label propagation with POINTER
    JUMPING. Labels initialize to least(node, array_min(nbrs)) — the
    first propagation round for free, as a codegen'd array expression
    over the checkpointed adjacency. Per round: (1) every node lowers
    its label to the min of its neighbors' labels (the exploded
    adjacency joins the BROADCAST label frame, and the groupBy-min rides
    the adjacency checkpoint's hash(src) partitioning — zero exchanges,
    the pagerank gather trick); (2) the label map composes with itself
    (label <- label(label), a broadcast self-join on the checkpointed
    round frame) — the path-halving step that turns O(diameter)-round
    propagation into O(log n) rounds on chain-shaped components;
    (3) the new label frame is localCheckpoint'ed (the per-round lineage
    cut, same discipline as BFS levels and dedup's label propagation)
    and ONE scalar action counts changed labels — the driver loop is
    convergence-checked, never collect()s data rows. Labels only
    decrease and are bounded below by the component minimum, so the
    fixpoint is exact: at convergence every label equals its component's
    min id (the min node keeps its own id; constancy across every
    mirrored edge forces the component constant down to it).

    The oracle is the declarative fixpoint of the SAME definition:
    DuckDB's recursive CTE enumerates (node, reachable-label) pairs over
    the mirrored edges and takes MIN per node — proving the iterative
    plan equals exhaustive reachability. _CC_MAX_ROUNDS (25) is a
    divergence guard only (measured: 4 rounds, ~2.8 s rounds-only warm,
    at sf0.1's 17k-node graph); hitting the guard raises rather than
    returning unconverged labels.

    100 TB note: the broadcasts assume the LABEL frame is vertex-sized
    and fits the broadcast budget — the same dimension-sized assumption
    BFS documents; for billion-vertex graphs drop the hints and the
    identical plan degrades gracefully to shuffled vertex-keyed joins,
    with the per-round checkpoints still bounding the lineage and the
    convergence counter still the only driver-side value."""
    adj = _adjline_adj(spark, sf_dir)
    edges = adj.select(F.col("src").alias("node"), F.explode("nbrs").alias("nbr"))
    labels = adj.select(
        F.col("src").alias("node"),
        F.least(
            F.col("src").cast("long"), F.expr("array_min(nbrs)").cast("long")
        ).alias("label"),
    ).localCheckpoint()
    for _round in range(_CC_MAX_ROUNDS):
        nbr_min = (
            edges.join(
                F.broadcast(labels.select(F.col("node").alias("nbr"), "label")),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("label").alias("nmin"))
        )
        # NOT checkpointed (r16): the jump self-join reads ``lowered``
        # twice, but both occurrences contain the SAME canonical
        # BroadcastExchange(nbr_min) subtree, which Spark's exchange
        # reuse materializes once — so the expensive per-round gather
        # still runs exactly once, and the duplicated remainder is a
        # broadcast-join projection over the previous round's (already
        # checkpointed) vertex-sized label frame. One lineage-cut
        # barrier per round (the ``jumped`` checkpoint below) instead of
        # two (guide §2.4 / §5; VERDICT r15 item 4).
        lowered = labels.join(F.broadcast(nbr_min), "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias(
                "label"
            ),
            # carried so the convergence flag below needs no re-join
            # against the previous round's frame
            F.col("label").alias("prev"),
        )
        # pointer jump: label <- label(label); every label IS a node id
        # (labels start as ids and only ever copy other labels), so the
        # left join matches except transiently — coalesce covers it.
        # The convergence flag rides in the same projection the checkpoint
        # materializes (the dedup label-propagation discipline), so
        # detecting the fixed point is a filter over the already-
        # checkpointed round output — not a jumped×labels join plus a
        # broadcast per round (measured: that join was one of ~12 AQE
        # jobs each round charged).
        jumped = (
            lowered.join(
                F.broadcast(
                    lowered.select(
                        F.col("node").alias("label"), F.col("label").alias("jlabel")
                    )
                ),
                "label",
                "left",
            )
            .select(
                "node",
                F.coalesce("jlabel", "label").alias("label"),
                (F.coalesce("jlabel", "label") != F.col("prev")).alias("changed"),
            )
            .localCheckpoint()
        )
        labels = jumped.select("node", "label")
        if jumped.filter("changed").limit(1).count() == 0:
            break
    else:
        raise RuntimeError(
            f"connected components did not converge in {_CC_MAX_ROUNDS} rounds"
        )
    return labels.select("node", F.col("label").alias("component")).orderBy("node")
