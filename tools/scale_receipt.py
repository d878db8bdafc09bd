"""sf1 composition receipt: run the capstone + dedup family at 10x bench
scale and measure per-stage task skew.

There is no driver-generated sf1 fixture, so this builds a deterministic
10x scale-up of sf0.1 under .scratch/sf1 (gitignored): documents and
embeddings are replicated 10x with offset ids; replica 0 is exact and
replicas 1-9 are lightly perturbed (suffix tokens / one nudged embedding
element), so near-dup bucket populations REALLY grow ~10x — exactly the
collision growth the MinHash/SimHash width caps must absorb. All other
tables copy through unchanged.

Skew gate: for every stage with median task time >= 100 ms, max task time
must be <= 2x median (tiny stages are pure scheduling noise). Stage task
quantiles come from the local Spark UI REST API.

Usage: python tools/scale_receipt.py [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
REPLICAS = 10
OFFSET = 1_000_000

QUERIES = [
    "q_pipe_end_to_end",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_recall",
    "q_dedup_embedding",
    "q_dedup_clusters",
    "q_dedup_canonical",
    "q_dedup_report",
    "q_dedup_repeated_chunks",
]


def build_sf1() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    parts = []
    for r in range(REPLICAS):
        if r == 0:
            parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM read_parquet('{SRC}/documents.parquet')"
            )
        else:
            parts.append(
                f"SELECT doc_id + {r * OFFSET} AS doc_id, "
                f"text || ' replica{r} tag' || CAST(doc_id % 7 AS VARCHAR) AS text, "
                f"lang, source, "
                f"n_chars + length(' replica{r} tag') + length(CAST(doc_id % 7 AS VARCHAR)) AS n_chars "
                f"FROM read_parquet('{SRC}/documents.parquet')"
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/documents.parquet' (FORMAT PARQUET)"
    )
    parts = []
    for r in range(REPLICAS):
        if r == 0:
            parts.append(
                f"SELECT vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet')"
            )
        else:
            parts.append(
                f"SELECT vec_id + {r * OFFSET} AS vec_id, "
                f"list_transform(embedding, (x, i) -> CASE WHEN i = {r} THEN x + 0.01 ELSE x END) AS embedding, "
                f"label FROM read_parquet('{SRC}/embeddings.parquet')"
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)"
    )
    # events: replicate 10x along the USER axis (user_id/event_id offset,
    # ts/type/value/props unchanged) — 10x the user population with the
    # same per-user history, which is the axis event analytics (funnel,
    # retention, sessionize, per-user windows) must scale on; per-key
    # group sizes stay constant, group COUNT grows 10x.
    parts = []
    for r in range(REPLICAS):
        if r == 0:
            parts.append(f"SELECT * FROM read_parquet('{SRC}/events.parquet')")
        else:
            parts.append(
                f"SELECT event_id + {r * OFFSET} AS event_id, ts, "
                f"user_id + {r * OFFSET} AS user_id, event_type, value, props "
                f"FROM read_parquet('{SRC}/events.parquet')"
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/events.parquet' (FORMAT PARQUET)"
    )
    # Relational core: replicate customers/orders/lineitem 10x with
    # CONSISTENT key offsets (c_custkey, o_orderkey+o_custkey, l_orderkey)
    # so referential joins survive; part/supplier/nation/region copy
    # through unchanged — the realistic shape (same catalog, 10x the
    # order volume), which also makes the lineitem-derived co-purchase
    # graph 10x DENSER over the same part nodes (a real stress for the
    # graph trio, not just a wider one).
    replicated_rel = {
        "customer": "SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey, "
        "c_acctbal, c_mktsegment FROM read_parquet('{src}')",
        "orders": "SELECT o_orderkey + {off} AS o_orderkey, o_custkey + {off} AS "
        "o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        "FROM read_parquet('{src}')",
        "lineitem": "SELECT l_orderkey + {off} AS l_orderkey, l_partkey, l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate FROM read_parquet('{src}')",
    }
    for t, tmpl in replicated_rel.items():
        src_path = f"{SRC}/{t}.parquet"
        parts = [
            tmpl.format(off=r * OFFSET, src=src_path)
            if r
            else f"SELECT * FROM read_parquet('{src_path}')"
            for r in range(REPLICAS)
        ]
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in os.listdir(SRC):
        if t.endswith(".parquet") and t not in (
            "documents.parquet",
            "embeddings.parquet",
            "events.parquet",
            "customer.parquet",
            "orders.parquet",
            "lineitem.parquet",
        ):
            shutil.copy(os.path.join(SRC, t), os.path.join(DST, t))
    with open(os.path.join(DST, ".fixture_version"), "w") as fh:
        fh.write("v3-relational-replicated\n")
    print(f"built {DST}", file=sys.stderr)


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    marker = os.path.join(DST, ".fixture_version")
    want = "v3-relational-replicated"
    have = ""
    if os.path.exists(marker):
        with open(marker) as fh:
            have = fh.read().strip()
    if not os.path.exists(f"{DST}/documents.parquet") or have != want:
        build_sf1()
    from mapreduce_framework_api_spark.registry import load_all_queries
    from mapreduce_framework_api_spark.session import get_spark

    only = sys.argv[1:]
    names = only or QUERIES
    registry = load_all_queries()
    spark = get_spark("scale-receipt", extra_conf={"spark.ui.enabled": "true"})
    base = spark.sparkContext.uiWebUrl
    # warm codegen at sf0.001
    for n in names:
        registry[n].fn(spark, "/root/testdata/sf0.001").count()

    worst = []
    for n in names:
        t0 = time.perf_counter()
        app = _api(base, "/api/v1/applications")[0]["id"]
        before = {
            (s["stageId"], s["attemptId"])
            for s in _api(base, f"/api/v1/applications/{app}/stages?status=complete")
        }
        rows = registry[n].fn(spark, DST).count()
        wall = time.perf_counter() - t0
        fresh = [
            s
            for s in _api(base, f"/api/v1/applications/{app}/stages?status=complete")
            if (s["stageId"], s["attemptId"]) not in before
        ]
        print(f"\n== {n}: {wall:.2f}s, {rows} rows, {len(fresh)} stages")
        for st in sorted(fresh, key=lambda s: -s.get("executorRunTime", 0))[:8]:
            sid, att = st["stageId"], st["attemptId"]
            try:
                q = _api(
                    base,
                    f"/api/v1/applications/{app}/stages/{sid}/{att}/taskSummary"
                    "?quantiles=0.0,0.5,1.0",
                )
                med, mx = q["duration"][1], q["duration"][2]
            except Exception:
                med = mx = 0.0
            flag = ""
            if med >= 100 and mx > 2 * med:
                flag = "  <-- SKEW"
                worst.append((n, sid, med, mx))
            print(
                f"   stage {sid}: tasks={st['numTasks']} median={med:.0f}ms "
                f"max={mx:.0f}ms{flag} {st['name'].splitlines()[0][:50]}"
            )
    print()
    if worst:
        print(f"SKEW-SUSPECT stages: {worst}")
    else:
        print("skew gate PASS: no stage with median>=100ms has max > 2x median")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
