"""Similarity search over the embeddings table (north-star surface).

Three tiers:

- ``q_sim_cosine_topk``: exact brute-force top-k — the correctness
  baseline. Queries stream through an Arrow-batched BLAS kernel against a
  BLOCKED broadcast index: the index is collected in bounded chunks, each
  chunk broadcast → scored → its per-block candidates materialized → the
  broadcast released — so no single process (driver or executor) ever
  holds more than one block. Global top-k merges the per-block top-k.
- ``q_sim_ann_lsh``: the bucketed scale path — 64-bit deterministic
  sign-LSH code banded into 4 × 16-bit blocks (mirroring the SimHash
  banding in operators/dedup.py): candidates share at least one block
  value, so each band offers 65 536 buckets instead of the 256 an 8-bit
  scheme caps at. Buckets are width-capped (hot-bucket guard) and pair
  generation is array-side — never a cross join.
- ``q_sim_ivf_topk``: IVF — deterministic k-means coarse quantizer trained
  on a bounded hash-sample, inverted lists probed per query via cogroup.

Design note: Spark has no vector index; all tiers are DataFrame plans plus
Arrow-batched kernels. The blocked-broadcast loop is the same shape a
1000-executor cluster needs: block size bounds executor broadcast memory,
and the per-block candidate unions are tiny (top-k per query, or
thresholded pairs).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mapreduce_framework_api_spark.operators.dedup import (
    _dot,
    _pairs_within,
    capped_bucket,
)
from mapreduce_framework_api_spark.registry import register
from mapreduce_framework_api_spark.sources import table

_TOP_K = 5

# Rows per broadcast index block. 1024 × 64 dims × 8 bytes ≈ 0.5 MB per
# block at fixture dimensionality; a production corpus tunes this to the
# executor broadcast budget (e.g. 1–4 M rows ≈ 0.5–2 GB at d=768). The
# fixture default keeps sf0.1 (2000 rows) at 2 blocks so the loop is
# exercised by every bench run.
_INDEX_BLOCK_ROWS = int(os.environ.get("SPARK_GRAFT_INDEX_BLOCK_ROWS", "1024"))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with double-cast vectors and precomputed norms."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return e.select("vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"))


def scan_index_blocked(
    spark: SparkSession,
    sf_dir: str,
    make_kernel,
    schema: str,
    block_rows: int | None = None,
) -> DataFrame:
    """Stream the query side against the index in bounded broadcast blocks.

    For each block b (rows with pmod(vec_id, nblocks) == b):
      1. collect ONLY that block to the driver (bounded: ≤ block_rows rows),
      2. broadcast it as (ids int64[n], M float64[n,d], norms float64[n]),
      3. run ``make_kernel(bc)`` as a mapInPandas over the full query side,
      4. localCheckpoint the (small) per-block candidates eagerly,
      5. destroy the broadcast before touching the next block.
    Union of the per-block candidate frames is returned. Peak memory is one
    block on the driver and one block per executor, independent of corpus
    size — the outer loop the round-1 single-broadcast version lacked.
    float32 → float64 before any arithmetic (FIXTURES.md gotcha #5).

    Blocks are assigned by pmod(xxhash64(vec_id), nblocks), NOT by raw
    vec_id mod: clustered or strided id distributions (e.g. all-even ids,
    snowflake ids sharing low bits) would pile arbitrarily many rows into
    one raw-mod block and defeat the memory bound, while a 64-bit hash is
    uniform regardless of id shape (block width concentrates tightly
    around n/nblocks; overshooting a 1024-row target by even 2× is
    vanishingly unlikely and still bounded). An exact per-block row bound
    would need a global rank over vec_id — a single-partition window sort,
    the one thing a 100 TB index build cannot afford. An empty table (or a
    table smaller than one block with all-empty remainder blocks) returns
    an empty frame with the declared schema."""
    import numpy as np

    block_rows = block_rows or _INDEX_BLOCK_ROWS
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    nblocks = max(1, math.ceil(n / block_rows))
    parts: list[DataFrame] = []
    for b in range(nblocks):
        pdf = e.filter(F.pmod(F.xxhash64("vec_id"), F.lit(nblocks)) == b).toPandas()
        if pdf.empty:
            continue
        ids = pdf["vec_id"].to_numpy(dtype="int64")
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        bc = spark.sparkContext.broadcast((ids, m, norms))
        part = e.mapInPandas(make_kernel(bc), schema=schema)
        if nblocks > 1:
            # Materialize this block's candidates so the broadcast can be
            # released before the next block is collected.
            part = part.localCheckpoint()
            bc.destroy()
        parts.append(part)
    if not parts:
        return spark.createDataFrame([], schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "q_sim_cosine_topk",
    group="I",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
), scored AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_raw
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id, cos_raw,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_raw DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT vec_id, neighbor_id, ROUND(cos_raw, 2) AS cosine, rk
FROM ranked WHERE rk <= {_TOP_K}
ORDER BY vec_id, rk
""",
)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors per vector (brute force, vectorized).

    Queries stream through an Arrow-batched mapInPandas kernel doing one
    BLAS matmul per (batch × index block) — per-block top-k candidates are
    unioned and a global window re-ranks them (a query's true top-k is
    always inside the union of its per-block top-k). Ties broken by
    neighbor_id (lexsort), so the cutoff is deterministic."""
    k = _TOP_K

    def make_kernel(bc):
        def score(batches):
            import numpy as np
            import pandas as pd

            ids, m, norms = bc.value
            for pdf in batches:
                q_ids = pdf["vec_id"].to_numpy(dtype="int64")
                q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                q_norms = np.sqrt((q * q).sum(axis=1))
                s = (q @ m.T) / (q_norms[:, None] * norms[None, :])
                out_q, out_n, out_c = [], [], []
                for row in range(len(q_ids)):
                    srow = s[row]
                    mask = ids != q_ids[row]
                    cand_ids, cand_s = ids[mask], srow[mask]
                    order = np.lexsort((cand_ids, -cand_s))[:k]
                    out_q.extend([q_ids[row]] * len(order))
                    out_n.extend(cand_ids[order])
                    out_c.extend(cand_s[order])
                yield pd.DataFrame(
                    {"vec_id": out_q, "neighbor_id": out_n, "cos_raw": out_c}
                )

        return score

    cand = scan_index_blocked(
        spark, sf_dir, make_kernel, schema="vec_id long, neighbor_id long, cos_raw double"
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("vec_id", "neighbor_id", F.round("cos_raw", 2).alias("cosine"), "rk")
        .orderBy("vec_id", "rk")
    )


# Sign-LSH: a 64-bit code from the signs of 64 fixed coordinate differences
# (deterministic hyperplanes of the form e_i - e_j; no RNG). gcd(17, 64) = 1
# so the i-coordinates sweep all 64 dims; the +29 offset never aliases i = j.
_LSH_BITS = 64
_LSH_BLOCKS = 4  # 16 bits each => 65 536 buckets per band
_LSH_BLOCK_BITS = _LSH_BITS // _LSH_BLOCKS
_LSH_DIM_PAIRS = tuple(((17 * k) % 64, (17 * k + 29) % 64) for k in range(_LSH_BITS))
_LSH_TOP_K = 3


def _lsh_code(v) -> "F.Column":
    """64-bit deterministic sign-LSH code for an array<double> column —
    one flat carry-free sum of 64 when-terms (same assembly trick as the
    SimHash signature: distinct powers of two, bit 63 via the min-long
    literal)."""
    bits = [
        F.when(
            F.element_at(v, i + 1) - F.element_at(v, j + 1) > 0,
            F.lit(1 << k if k < 63 else -(1 << 63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for k, (i, j) in enumerate(_LSH_DIM_PAIRS)
    ]
    return sum(bits[1:], bits[0])


@register(
    "q_sim_ann_lsh",
    group="I",
    oracle=None,  # approximate by construction: rows-only check
)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors via banded sign-LSH.

    64-bit code → 4 × 16-bit blocks; two vectors are candidates iff they
    share at least one block value (the SimHash pigeonhole layout, so each
    band has 65 536 buckets — the round-1 single-8-bit-bucket scheme capped
    at 256 and would m²-blow-up past ~10^5 docs). Candidate generation is
    a width-capped bucket groupBy + array-side pair expansion (ids only —
    vectors are NOT shuffled through the buckets); scoring joins the two
    id sides back to the vector table. Queries with no co-bucketed
    neighbor return no rows (the honest ANN contract)."""
    vecs = _vectors(spark, sf_dir)
    sigs = vecs.select("vec_id", _lsh_code(F.col("v")).alias("code"))
    blocks = sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_id"),
                        F.shiftright(F.col("code"), _LSH_BLOCK_BITS * i)
                        .bitwiseAND(F.lit((1 << _LSH_BLOCK_BITS) - 1))
                        .alias("block"),
                    )
                    for i in range(_LSH_BLOCKS)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "b.block_id", "b.block")
    buckets = (
        blocks.groupBy("block_id", "block")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("recs"))
        .filter(F.size("recs") > 1)
    )
    pairs = (
        buckets.select(F.explode(_pairs_within(capped_bucket(F.col("recs")))).alias("p"))
        .select(F.col("p.a").alias("ida"), F.col("p.b").alias("idb"))
        .dropDuplicates()
    )
    # Per-query candidates need both directions (a is a neighbor candidate
    # of b and vice versa).
    cand = pairs.unionByName(
        pairs.select(F.col("idb").alias("ida"), F.col("ida").alias("idb"))
    )
    a = vecs.select(
        F.col("vec_id").alias("ida"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = vecs.select(
        F.col("vec_id").alias("idb"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    scored = (
        cand.join(a, "ida")
        .join(b, "idb")
        .select(
            F.col("ida").alias("vec_id"),
            F.col("idb").alias("neighbor_id"),
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos_raw"),
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _LSH_TOP_K)
        .select("vec_id", "neighbor_id", F.round("cos_raw", 2).alias("cosine"), "rk")
        .orderBy("vec_id", "rk")
    )


# ---------------------------------------------------------------- IVF ------

_IVF_K = 16  # inverted lists
_IVF_NPROBE = 2  # clusters scored per query
_IVF_ITERS = 5  # Lloyd refinement passes (deterministic)
_IVF_TOP_K = 3
_IVF_TRAIN_CAP = 1000 * _IVF_K  # k-means needs ~1000×K points, no more


def ivf_centroids(spark: SparkSession, sf_dir: str):
    """Deterministic IVF coarse quantizer: k-means with init = the K
    lowest-vec_id training vectors and a fixed iteration count (no RNG, no
    early stop — identical output every run).

    Training pulls a BOUNDED deterministic hash-sample to the driver
    (pmod(xxhash64(vec_id)) thinning — the q_pipe_sample_hash trick), capped
    at ~1000×K rows, so the driver footprint is constant in corpus size.
    Fixture tables are under the cap and train on every row. Returns the
    row-normalized centroid matrix [K, d] float64."""
    import numpy as np

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    if n > _IVF_TRAIN_CAP:
        keep = int(1_000_000 * _IVF_TRAIN_CAP / n)
        e = e.filter(F.pmod(F.xxhash64("vec_id"), F.lit(1_000_000)) < keep)
    pdf = e.orderBy("vec_id").toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    c = x[:_IVF_K].copy()
    for _ in range(_IVF_ITERS):
        c_n = c / np.linalg.norm(c, axis=1, keepdims=True)
        assign = (x @ c_n.T).argmax(axis=1)
        for j in range(_IVF_K):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


@register(
    "q_sim_ivf_topk",
    group="I",
    oracle=None,  # approximate by construction: rows-only check
)
def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 cosine neighbors via an IVF index (the third ANN
    tier next to brute force and sign-LSH).

    Structure: (1) deterministic coarse quantizer (broadcast K×d centroids,
    trained on a bounded hash-sample); (2) every vector is assigned to its
    nearest centroid's inverted list; (3) every query probes its
    _IVF_NPROBE nearest lists — an equi-join on cluster id, so the shuffle
    routes each query to ≤2 of K partitions instead of all of them;
    (4) per-cluster scoring is one Arrow-batched BLAS matmul per
    (query-batch × list); (5) global top-k merges the probed lists with a
    window. Recall > sign-LSH at the same candidate budget because lists
    follow the data distribution."""
    import numpy as np
    import pandas as pd

    cent = spark.sparkContext.broadcast(ivf_centroids(spark, sf_dir))
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def assign(batches):
        for pdf in batches:
            q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = qn @ cent.value.T
            top = np.argsort(-sims, axis=1)[:, :_IVF_NPROBE]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cluster": top[:, 0].astype("int32"),
                    "probes": list(top.astype("int32")),
                }
            )

    # Materialize the assignment once (eager localCheckpoint): it feeds BOTH
    # cogroup sides below, and the two input stages would otherwise each
    # re-run the Python assign pass over the full table. This is also the
    # real-world shape — IVF list assignment is the persisted index-build
    # step, scored queries stream against it.
    assigned = e.mapInPandas(
        assign,
        schema="vec_id long, embedding array<float>, cluster int, probes array<int>",
    ).localCheckpoint()
    index_side = assigned.select("vec_id", "embedding", "cluster")
    query_side = assigned.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.explode("probes").alias("cluster"),
    )

    def score_cluster(qs: "pd.DataFrame", idx: "pd.DataFrame") -> "pd.DataFrame":
        if qs.empty or idx.empty:
            return pd.DataFrame(
                {"vec_id": [], "neighbor_id": [], "cos_raw": []}
            ).astype({"vec_id": "int64", "neighbor_id": "int64", "cos_raw": "float64"})
        q = np.stack(qs["q_emb"].to_numpy()).astype(np.float64)
        m = np.stack(idx["embedding"].to_numpy()).astype(np.float64)
        q_ids = qs["q_id"].to_numpy(dtype="int64")
        m_ids = idx["vec_id"].to_numpy(dtype="int64")
        s = (q @ m.T) / (
            np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(m, axis=1)[None, :]
        )
        keep = q_ids[:, None] != m_ids[None, :]
        rows, cols = np.nonzero(keep)
        return pd.DataFrame(
            {"vec_id": q_ids[rows], "neighbor_id": m_ids[cols], "cos_raw": s[rows, cols]}
        )

    # cogroup, NOT a join: each cluster id yields ONE (queries, members)
    # frame pair for one matmul — a join on cluster would materialize the
    # per-cluster cross product row-by-row, the exact blowup IVF avoids.
    scored = (
        query_side.groupBy("cluster")
        .cogroup(index_side.groupBy("cluster"))
        .applyInPandas(score_cluster, schema="vec_id long, neighbor_id long, cos_raw double")
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.dropDuplicates(["vec_id", "neighbor_id"])
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _IVF_TOP_K)
        .select("vec_id", "neighbor_id", F.round("cos_raw", 2).alias("cosine"), "rk")
        .orderBy("vec_id", "rk")
    )
