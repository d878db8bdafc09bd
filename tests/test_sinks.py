"""Sink surface: format roundtrips, partition pruning, bucketed joins, and
the reference's formatted text contract (SURVEY.md §2.5)."""

import glob
import os

import pytest

from pyspark.sql import functions as F

from conftest import SF_DIR

from mapreduce_framework_api_spark.plans.inspect import count_exchanges, simple_plan
from mapreduce_framework_api_spark.sources import table
from mapreduce_framework_api_spark.sources.readers import read_any
from mapreduce_framework_api_spark.sources.writers import (
    write_any,
    write_bucketed,
    write_formatted_text,
    write_partitioned,
)


def _orders(spark):
    return table(spark, SF_DIR, "orders")


def test_format_roundtrips(spark, tmp_path):
    df = _orders(spark).select("o_orderkey", "o_custkey", "o_orderstatus")
    n = df.count()
    for fmt in ("parquet", "orc", "json", "csv"):
        p = str(tmp_path / fmt)
        write_any(df, p, fmt=fmt, **({"header": True} if fmt == "csv" else {}))
        opts = {"header": True, "inferSchema": True} if fmt == "csv" else {}
        back = read_any(spark, p, fmt=fmt, **opts)
        assert back.count() == n, fmt
        assert set(back.columns) == set(df.columns), fmt


def test_partitioned_write_prunes(spark, tmp_path):
    p = str(tmp_path / "by_status")
    write_partitioned(_orders(spark), p, ["o_orderstatus"])
    # layout: one dir per status value
    dirs = {os.path.basename(d) for d in glob.glob(f"{p}/o_orderstatus=*")}
    assert len(dirs) >= 2, dirs
    # a filter on the partition column must show a PartitionFilter, not a data filter
    back = spark.read.parquet(p).filter(F.col("o_orderstatus") == "F")
    plan = simple_plan(back)
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan
    assert back.count() == _orders(spark).filter("o_orderstatus = 'F'").count()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key join with zero shuffles — the
    write-time exchange is amortized across every subsequent join."""
    # (warehouse dir is a static conf; tables land in ./spark-warehouse and
    # are dropped — which deletes the files — in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # forbid broadcast
    try:
        o = _orders(spark)
        c = table(spark, SF_DIR, "customer")
        write_bucketed(o, "t_orders_b", "o_custkey", n_buckets=8, sort_col="o_custkey")
        write_bucketed(c, "t_customer_b", "c_custkey", n_buckets=8, sort_col="c_custkey")
        ob, cb = spark.table("t_orders_b"), spark.table("t_customer_b")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        assert count_exchanges(joined) == 0, simple_plan(joined)
        assert joined.count() == o.join(c, o.o_custkey == c.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_formatted_text_contract(spark, tmp_path):
    """write_formatted_text reproduces the reference's output bytes for a
    known aggregation (format '%s, %d\\n', byte-wise key order)."""
    df = spark.createDataFrame(
        [("a", 271), ("A", 12), ("0", 3), ("z", 1)], ["token", "cnt"]
    )
    p = str(tmp_path / "out")
    write_formatted_text(df, p, "token", "cnt", coalesce_to_one=True)
    (part,) = glob.glob(f"{p}/part-*")
    assert open(part).read() == "0, 3\nA, 12\na, 271\nz, 1\n"


def test_lake_stub_guarded_without_jars(spark, tmp_path):
    """The lake-format connectors without jars (r15 behavior): DELTA
    falls back to the pure-Spark log resolver — a non-table path is its
    named ValueError, never a raw JVM ClassNotFound; ICEBERG keeps the
    guarded NotImplementedError; unknown formats are a ValueError."""
    import pytest

    from mapreduce_framework_api_spark.sources.readers import (
        lake_format_available,
        read_lake,
    )

    if lake_format_available(spark, "delta"):
        pytest.skip("delta jars present; the real-path test covers this")
    with pytest.raises(ValueError, match="no _delta_log"):
        read_lake(spark, str(tmp_path / "t"), "delta")
    if not lake_format_available(spark, "iceberg"):
        with pytest.raises(NotImplementedError, match="jars on the classpath"):
            read_lake(spark, str(tmp_path / "t"), "iceberg")
    with pytest.raises(ValueError, match="unsupported lake format"):
        read_lake(spark, str(tmp_path / "t"), "hudi")
    assert lake_format_available(spark, "hudi") is False


def test_lake_read_path_when_jars_present(spark, tmp_path):
    """The REAL lake read branch: runs only when a launch provided the
    jars (--packages io.delta:... / iceberg-spark-runtime); skips
    cleanly in jarless environments like this sandbox."""
    import pytest

    from mapreduce_framework_api_spark.sources.readers import (
        lake_format_available,
        read_lake,
    )

    available = [f for f in ("delta", "iceberg") if lake_format_available(spark, f)]
    if not available:
        pytest.skip("no lake-format jars on this classpath")
    for fmt in available:
        p = str(tmp_path / f"lake_{fmt}")
        spark.range(10).withColumn("v", F.col("id") * 2).write.format(fmt).save(p)
        got = read_lake(spark, p, fmt)
        assert got.count() == 10


def test_compact_small_files(spark, tmp_path):
    """Small-file compaction: a deliberately fragmented table (64 files for
    ~100KB of data) compacts to the size-targeted file count with
    byte-identical row content; the row-count paranoia gate and the
    staging-then-swap protect the destructive rewrite."""
    from mapreduce_framework_api_spark.sources.readers import read_any
    from mapreduce_framework_api_spark.sources.writers import compact_small_files

    p = str(tmp_path / "fragged")
    src = spark.range(20000).withColumn("v", F.md5(F.col("id").cast("string")))
    src.repartition(64).write.parquet(p)
    before = sorted(tuple(r) for r in read_any(spark, p).collect())
    stats = compact_small_files(spark, p, target_bytes=1 << 20)
    assert stats["files_before"] == 64
    assert 1 <= stats["files_after"] <= 4, stats
    after = sorted(tuple(r) for r in read_any(spark, p).collect())
    assert after == before


def test_compact_small_files_preserves_partition_layout(spark, tmp_path):
    """Partitioned compaction: the rewrite keeps the dt=... directory tree
    (partition pruning stays intact for every later scan) while collapsing
    the per-partition file fragmentation."""
    import glob as _glob

    from mapreduce_framework_api_spark.sources.readers import read_any
    from mapreduce_framework_api_spark.sources.writers import compact_small_files

    p = str(tmp_path / "part_fragged")
    src = spark.range(9000).select(
        F.col("id"),
        (F.col("id") % 3).alias("dt"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )
    src.repartition(16).write.partitionBy("dt").parquet(p)
    before_rows = sorted(tuple(r) for r in read_any(spark, p).collect())
    n_before = len(_glob.glob(f"{p}/dt=*/part-*"))
    assert n_before >= 30  # ~16 files x 3 partitions
    stats = compact_small_files(
        spark, p, target_bytes=1 << 20, partition_cols=["dt"]
    )
    dirs = sorted(os.path.basename(d) for d in _glob.glob(f"{p}/dt=*"))
    assert dirs == ["dt=0", "dt=1", "dt=2"], dirs
    assert stats["files_after"] <= 6, stats
    after_rows = sorted(tuple(r) for r in read_any(spark, p).collect())
    assert after_rows == before_rows


def test_compact_small_files_handles_partition_skew(spark, tmp_path):
    """Round-9 skew fix: per-partition split counts come from each
    directory's OWN listed bytes, not the mean — under a ~10:1 skewed
    layout the hot partition must still compact to files within 2x of
    the target size (the mean-based sizing collapsed it into one
    oversized blob), while the cold partitions stay at one file each."""
    import glob as _glob

    from mapreduce_framework_api_spark.sources.readers import read_any
    from mapreduce_framework_api_spark.sources.writers import compact_small_files

    p = str(tmp_path / "skewed")
    # dt=0 gets ~10x the rows (and bytes) of dt=1..9.
    src = spark.range(190_000).select(
        F.col("id"),
        F.when(F.col("id") < 100_000, F.lit(0)).otherwise(
            (F.col("id") % 9) + 1
        ).alias("dt"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )
    src.repartition(16).write.partitionBy("dt").parquet(p)
    before_rows = read_any(spark, p).count()
    target = 1 << 20  # hot partition ~5MB of parquet -> several files
    compact_small_files(spark, p, target_bytes=target, partition_cols=["dt"])
    hot_files = _glob.glob(f"{p}/dt=0/part-*")
    assert len(hot_files) >= 2, "hot partition collapsed to a single file"
    for f in hot_files:
        assert os.path.getsize(f) <= 2 * target, (
            f"{f}: {os.path.getsize(f)} bytes exceeds 2x target"
        )
    for d in range(1, 10):
        cold = _glob.glob(f"{p}/dt={d}/part-*")
        assert len(cold) == 1, (d, cold)
    assert read_any(spark, p).count() == before_rows


def test_compact_swap_crash_between_renames_is_recoverable(spark, tmp_path, monkeypatch):
    """The round-9 rename-aside swap's failure-window contract, as a test
    (VERDICT r9 task 5): a crash BETWEEN the two renames (live table
    already moved aside, staging not yet promoted) must leave the full
    table intact at <path>._compact_old AND the complete compacted copy
    in staging — recoverable by hand or by the next run — never a
    deleted table. Simulated by making the SECOND os.rename raise."""
    import os as _os

    from mapreduce_framework_api_spark.sources.readers import read_any
    from mapreduce_framework_api_spark.sources.writers import compact_small_files

    p = str(tmp_path / "crashy")
    spark.range(2000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("v")
    ).repartition(8).write.parquet(p)
    before_rows = sorted(tuple(r) for r in read_any(spark, p).collect())

    real_rename = _os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash between the two renames")
        return real_rename(src, dst)

    monkeypatch.setattr("os.rename", failing_rename)
    with pytest.raises(OSError, match="simulated crash"):
        compact_small_files(spark, p, target_bytes=1 << 20)
    monkeypatch.setattr("os.rename", real_rename)

    old = p + "._compact_old"
    staging = p + "._compact_staging"
    assert not _os.path.exists(p), "live path was mid-swap at the crash"
    assert _os.path.isdir(old) and _os.path.isdir(staging)
    # Both surviving copies are COMPLETE — recovery is one rename of
    # either (old = the untouched original, staging = the compacted copy).
    assert sorted(tuple(r) for r in read_any(spark, old).collect()) == before_rows
    assert (
        sorted(tuple(r) for r in read_any(spark, staging).collect()) == before_rows
    )


def test_compact_rejects_temp_column_collision(spark, tmp_path):
    """Round-10 advice fix: a table that already has a _pk/_nsplit/_split
    column must be an explicit error — the partitioned path's temp
    columns would otherwise silently clobber and then DROP it while the
    row-count gate still passes."""
    from mapreduce_framework_api_spark.sources.writers import compact_small_files

    p = str(tmp_path / "collide")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 2).alias("dt"), F.lit(1).alias("_split")
    ).write.partitionBy("dt").parquet(p)
    with pytest.raises(ValueError, match="_split"):
        compact_small_files(spark, p, target_bytes=1 << 20, partition_cols=["dt"])
    # The table is untouched: the guard fires before any write or swap.
    assert spark.read.parquet(p).count() == 100


def test_compact_null_partition_gets_own_sizing_row(spark, tmp_path):
    """Round-10 advice fix: NULL partition values (written by Spark as
    __HIVE_DEFAULT_PARTITION__ directories) must join their OWN sizing
    row — concat_ws used to skip NULLs, aliasing distinct partition
    tuples onto one sizing key. A fragmented NULL partition with ~10x
    the bytes of its siblings must compact to multiple target-sized
    files (the aliased sizing collapsed or missized it), with rows
    intact."""
    import glob as _glob

    from mapreduce_framework_api_spark.sources.readers import read_any
    from mapreduce_framework_api_spark.sources.writers import compact_small_files

    p = str(tmp_path / "nullpart")
    src = spark.range(110_000).select(
        F.col("id"),
        F.when(F.col("id") < 100_000, F.lit(None).cast("string")).otherwise(
            F.lit("a")
        ).alias("dt"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )
    src.repartition(16).write.partitionBy("dt").parquet(p)
    before_rows = read_any(spark, p).count()
    target = 1 << 20  # NULL partition ~5MB of parquet -> several files
    compact_small_files(spark, p, target_bytes=target, partition_cols=["dt"])
    null_files = _glob.glob(f"{p}/dt=__HIVE_DEFAULT_PARTITION__/part-*")
    assert len(null_files) >= 2, "null partition lost its own sizing row"
    for f in null_files:
        assert os.path.getsize(f) <= 2 * target, (f, os.path.getsize(f))
    assert len(_glob.glob(f"{p}/dt=a/part-*")) == 1
    assert read_any(spark, p).count() == before_rows


def test_compact_sort_by_clusters_layout_for_pruning(spark, tmp_path):
    """``sort_by`` clustering (round-12): an unpartitioned compaction with
    a clustering column must produce (a) byte-identical content, (b)
    files holding DISJOINT value ranges (repartitionByRange → whole-file
    min/max pruning), and (c) sorted row groups inside each file
    (row-group min/max pruning). Verified against the parquet footers —
    the same statistics any engine's scan pruner reads."""
    import pyarrow.parquet as pq

    from mapreduce_framework_api_spark.sources.readers import read_any
    from mapreduce_framework_api_spark.sources.writers import compact_small_files

    p = str(tmp_path / "clust")
    # shuffled key so the pre-compaction layout has NO clustering
    src = spark.range(20000).select(
        F.xxhash64("id").alias("k"), F.col("id").alias("v")
    )
    src.repartition(32).write.parquet(p)
    before = sorted(tuple(r) for r in read_any(spark, p).collect())
    stats = compact_small_files(spark, p, target_bytes=256 << 10, sort_by="k")
    assert stats["files_before"] == 32
    after = sorted(tuple(r) for r in read_any(spark, p).collect())
    assert after == before

    files = sorted(
        os.path.join(p, f)
        for f in os.listdir(p)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    assert len(files) >= 2, "need >=2 files to prove disjoint ranges"
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_mins, col_maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # k is the first column
            assert col.statistics is not None and col.statistics.has_min_max
            col_mins.append(col.statistics.min)
            col_maxs.append(col.statistics.max)
        # row groups inside a file are sorted and non-overlapping
        for a_max, b_min in zip(col_maxs, col_mins[1:]):
            assert a_max <= b_min
        ranges.append((min(col_mins), max(col_maxs)))
    ranges.sort()
    for (_lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, "file value ranges overlap — no file-level pruning"


def test_compact_sort_by_within_partitioned_layout(spark, tmp_path):
    """Partitioned compaction with ``sort_by``: the dt=... tree survives
    (partition pruning intact) and every rewritten file has internally
    sorted, non-overlapping row groups on the clustering column."""
    import glob as _glob

    import pyarrow.parquet as pq

    from mapreduce_framework_api_spark.sources.readers import read_any
    from mapreduce_framework_api_spark.sources.writers import compact_small_files

    p = str(tmp_path / "part_clust")
    src = spark.range(9000).select(
        F.xxhash64("id").alias("k"),
        (F.col("id") % 3).alias("dt"),
    )
    src.repartition(16).write.partitionBy("dt").parquet(p)
    before = sorted(tuple(r) for r in read_any(spark, p).collect())
    compact_small_files(
        spark, p, target_bytes=1 << 20, partition_cols=["dt"], sort_by="k"
    )
    after = sorted(tuple(r) for r in read_any(spark, p).collect())
    assert after == before
    assert sorted(
        os.path.basename(d) for d in _glob.glob(os.path.join(p, "dt=*"))
    ) == ["dt=0", "dt=1", "dt=2"]
    for f in _glob.glob(os.path.join(p, "dt=*", "*.parquet")):
        md = pq.ParquetFile(f).metadata
        stats = [
            md.row_group(rg).column(0).statistics for rg in range(md.num_row_groups)
        ]
        for a, b in zip(stats, stats[1:]):
            assert a.max <= b.min


def test_compact_rejects_unknown_sort_column(spark, tmp_path):
    from mapreduce_framework_api_spark.sources.writers import compact_small_files

    p = str(tmp_path / "t")
    spark.range(100).write.parquet(p)
    with pytest.raises(ValueError, match="sort_by columns not in table"):
        compact_small_files(spark, p, sort_by="nope")


def test_compact_rejects_null_placeholder_collision(spark, tmp_path):
    """A REAL column value equal to __HIVE_DEFAULT_PARTITION__ reaching a
    partitioned rewrite would (a) alias onto the null partition's sizing
    row and (b) — far worse — be written as the null-partition directory,
    so every later read returns NULL where the value was (Spark maps that
    directory name to null). The hazard arises on the re-layout path: an
    UNPARTITIONED table being compacted INTO a partitioned layout still
    carries the literal in its data. The compactor must refuse loudly
    (round-11 advice)."""
    from mapreduce_framework_api_spark.sources.writers import compact_small_files

    p = str(tmp_path / "clash")
    spark.createDataFrame(
        [(1, "__HIVE_DEFAULT_PARTITION__"), (2, "ok")], "id long, dt string"
    ).write.parquet(p)  # unpartitioned: the literal survives on disk
    with pytest.raises(ValueError, match="null-partition placeholder"):
        compact_small_files(spark, p, partition_cols=["dt"])


def _delta_commit(log_dir, version, actions):
    import json

    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _delta_protocol_and_meta(schema_json, part_cols=()):
    return [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "00000000-0000-0000-0000-000000000001",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": list(part_cols),
                "configuration": {},
                "createdTime": 0,
            }
        },
    ]


def test_delta_log_resolver_reads_multi_commit_snapshot(spark, tmp_path):
    """The jarless Delta read path for REAL (r15, the carried lake gap):
    a protocol-conformant hand-written log — protocol + metaData, two
    adds, then a second commit that removes one file and adds another
    (the OSS writer's rewrite-style update) — must resolve to exactly
    the live snapshot with the log's schema. Exercised through
    read_lake, which falls back to the resolver when the classpath has
    no delta jar."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_framework_api_spark.sources.readers import (
        lake_format_available,
        read_lake,
    )

    if lake_format_available(spark, "delta"):
        pytest.skip("delta jars present; the jar path test covers this env")
    tbl = str(tmp_path / "dtable")
    log = os.path.join(tbl, "_delta_log")
    os.makedirs(log)
    schema_json = spark.createDataFrame([], "id long, v string").schema.json()

    def data_file(name, ids):
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "v": pa.array([f"v{i}" for i in ids], pa.string()),
                }
            ),
            os.path.join(tbl, name),
        )
        return {
            "add": {
                "path": name,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(tbl, name)),
                "modificationTime": 0,
                "dataChange": True,
            }
        }

    _delta_commit(
        log,
        0,
        _delta_protocol_and_meta(schema_json)
        + [data_file("part-0001.parquet", [1, 2, 3]),
           data_file("part-0002.parquet", [4, 5])],
    )
    _delta_commit(
        log,
        1,
        [
            {
                "remove": {
                    "path": "part-0002.parquet",
                    "deletionTimestamp": 0,
                    "dataChange": True,
                }
            },
            data_file("part-0003.parquet", [6]),
        ],
    )
    got = read_lake(spark, tbl, "delta")
    assert [f.simpleString() for f in got.schema.fields] == [
        "id:bigint",
        "v:string",
    ]
    assert sorted((r["id"], r["v"]) for r in got.collect()) == [
        (1, "v1"),
        (2, "v2"),
        (3, "v3"),
        (6, "v6"),
    ]


def test_delta_log_resolver_partitioned_and_empty(spark, tmp_path):
    """Partition values live in the LOG, not the data files: the
    resolver must re-attach them per file group, cast through the log
    schema. And a snapshot whose every add was removed is an EMPTY
    frame with the full schema, not an error."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduce_framework_api_spark.sources.readers import (
        lake_format_available,
        read_delta_log,
    )

    if lake_format_available(spark, "delta"):
        pytest.skip("delta jars present; the jar path test covers this env")
    tbl = str(tmp_path / "ptable")
    log = os.path.join(tbl, "_delta_log")
    os.makedirs(log)
    schema_json = spark.createDataFrame(
        [], "id long, label int, v string"
    ).schema.json()

    def pfile(name, ids, label):
        os.makedirs(os.path.dirname(os.path.join(tbl, name)), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "v": pa.array([f"v{i}" for i in ids], pa.string()),
                }
            ),
            os.path.join(tbl, name),
        )
        return {
            "add": {
                "path": name,
                "partitionValues": {"label": str(label)},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        }

    _delta_commit(
        log,
        0,
        _delta_protocol_and_meta(schema_json, part_cols=["label"])
        + [
            pfile("label=1/part-0001.parquet", [1, 2], 1),
            pfile("label=2/part-0002.parquet", [3], 2),
        ],
    )
    got = read_delta_log(spark, tbl)
    assert sorted((r["id"], r["label"], r["v"]) for r in got.collect()) == [
        (1, 1, "v1"),
        (2, 1, "v2"),
        (3, 2, "v3"),
    ]
    assert dict((f.name, f.dataType.simpleString()) for f in got.schema.fields)[
        "label"
    ] == "int"

    # empty snapshot: remove everything
    _delta_commit(
        log,
        1,
        [
            {"remove": {"path": "label=1/part-0001.parquet", "dataChange": True}},
            {"remove": {"path": "label=2/part-0002.parquet", "dataChange": True}},
        ],
    )
    empty = read_delta_log(spark, tbl)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id", "label", "v"]


def test_delta_log_resolver_refuses_outside_its_subset(spark, tmp_path):
    """Never silently wrong: a checkpointed log, a v2+ reader protocol,
    a deletion vector, and a non-parquet provider must each refuse with
    a NAMED error (replaying past any of them from JSON alone would
    produce incorrect snapshots)."""
    from mapreduce_framework_api_spark.sources.readers import read_delta_log

    schema_json = spark.createDataFrame([], "id long").schema.json()

    def fresh(name):
        tbl = str(tmp_path / name)
        os.makedirs(os.path.join(tbl, "_delta_log"))
        return tbl, os.path.join(tbl, "_delta_log")

    tbl, log = fresh("ckpt")
    _delta_commit(log, 0, _delta_protocol_and_meta(schema_json))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        f.write('{"version": 0, "size": 1}')
    with pytest.raises(NotImplementedError, match="checkpointed"):
        read_delta_log(spark, tbl)

    tbl, log = fresh("v3")
    _delta_commit(
        log,
        0,
        [{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}],
    )
    with pytest.raises(NotImplementedError, match="protocol"):
        read_delta_log(spark, tbl)

    tbl, log = fresh("dv")
    _delta_commit(
        log,
        0,
        _delta_protocol_and_meta(schema_json)
        + [
            {
                "add": {
                    "path": "f.parquet",
                    "partitionValues": {},
                    "dataChange": True,
                    "deletionVector": {"storageType": "u"},
                }
            }
        ],
    )
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        read_delta_log(spark, tbl)

    tbl, log = fresh("orc")
    meta = _delta_protocol_and_meta(schema_json)
    meta[1]["metaData"]["format"]["provider"] = "orc"
    _delta_commit(log, 0, meta)
    with pytest.raises(NotImplementedError, match="parquet tables only"):
        read_delta_log(spark, tbl)
