"""Sources: table readers and format connectors.

The reference's only source is a per-mapper POSIX fd on one local file
(``mapreduce.h:48``, byte-range split computed by the app,
``bin/mr-wordc.o:wc_count+0x2d-0x72``). Spark's FileSourceScanExec computes
the same splits (``spark.sql.files.maxPartitionBytes``) with straddle
handling built in, so the "source layer" here is a thin catalog over
``spark.read`` — columnar parquet scans get predicate pushdown and column
pruning from Catalyst for free, which is exactly what a 100 TB scan needs.

Format support beyond the reference (parquet/csv/json/orc/text) is provided
by ``read_any``. Lake formats: with runtime jars, ``read_lake`` uses the
genuine DataSource; without them, DELTA reads through the pure-Spark
transaction-log resolver (``read_delta_log`` — public-protocol subset,
refuses loudly outside it) and ICEBERG stays a guarded stub.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-generated synthetic catalog (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def fixture_fingerprint(sf_dir: str, name: str) -> tuple:
    """(filename, mtime_ns, size) fingerprint of one catalog table's
    parquet file (or file-per-partition directory). Session caches fold
    this into their keys so a fixture regenerated IN PLACE within one
    Spark application rebuilds the cached artifact instead of serving
    stale results (the q_text_bpe_merges trainer-cache fix, round 6
    advice, generalized to every session cache)."""
    path = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
    if os.path.isdir(path):
        return tuple(
            sorted(
                (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                for e in os.scandir(path)
                if e.is_file()
            )
        )
    if os.path.isfile(path):
        st = os.stat(path)
        return (("", st.st_mtime_ns, st.st_size),)
    # Missing fixture: let the actual read raise the clear error; the
    # sentinel just keeps key construction total.
    return (("missing", 0, 0),)


def session_cache_key(spark: SparkSession, sf_dir: str, *names: str) -> tuple:
    """Key for per-session materialized-artifact caches (the
    jaccard_dup_pairs / _copurchase_adj / corpus_wordcount discipline):
    (applicationId, abspath(sf_dir), input-table fingerprints). One
    definition so every cache gets the staleness guard."""
    return (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        tuple(fixture_fingerprint(sf_dir, n) for n in names),
    )


# Lazy scan-HANDLE cache (r15 optimization): ``spark.read.parquet`` costs
# ~80 ms per call on this sandbox (driver-side file listing + footer
# schema inference + py4j round trips), and the engine makes one to three
# ``table()`` calls inside every timed query build — ~20 s of pure driver
# latency across a 203-query board (guide §5: the driver should do almost
# no data work, and §6: repeated listings are cacheable). The cached
# object is an UNMATERIALIZED logical plan: every action still reads the
# parquet files in full, physical planning (shuffle-partition count, AQE)
# still happens per action, so this caches no result — only the schema
# discovery. Keyed by (applicationId, path, fixture fingerprint) like
# every session cache, so an in-place fixture regeneration re-infers.
# Wired into clear_session_caches like every other session cache: a lazy
# handle re-executes by construction so clearing costs only the ~80 ms
# rebuild, and the repo invariant is that every *_CACHE dict is cleared.
_TABLE_HANDLE_CACHE: dict[tuple, DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table as a DataFrame (lazy; pushdown-capable).

    events.ts normalization is schema-adaptive — fixtures have shipped both
    parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS), and a reader that
    hard-codes one physical encoding breaks on the other:

    - TIMESTAMP(NANOS): Spark 4 refuses to read it as a timestamp
      ([PARQUET_TYPE_ILLEGAL]); retry with legacy.parquet.nanosAsLong and
      convert ns → µs in the plan (``ts DIV 1000`` — integer division; a
      double roundtrip would lose precision above 2^53 ns). Matches
      DuckDB's CAST(ts AS TIMESTAMP) truncation.
    - TIMESTAMP(MICROS) (isAdjustedToUTC=false): reads natively as
      TIMESTAMP_NTZ; cast to TimestampType (value-preserving: the session
      timezone is pinned to UTC) so downstream plans see one type either
      way.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(path),
        fixture_fingerprint(sf_dir, name),
    )
    cached = _TABLE_HANDLE_CACHE.get(key)
    if cached is not None:
        return cached
    out = _build_table(spark, sf_dir, name, path)
    _TABLE_HANDLE_CACHE[key] = out
    return out


def _build_table(
    spark: SparkSession, sf_dir: str, name: str, path: str
) -> DataFrame:
    if name == "events":
        from pyspark.sql import functions as F

        try:
            df = spark.read.parquet(path)
        except Exception:
            # Schema inference failed — the nanos encoding. Enable the
            # legacy long read and retry.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type in ("bigint", "long"):
            # nanosAsLong path (also hit when the conf is already set from
            # an earlier read in this session).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def read_any(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    """Generic format connector: parquet/orc/csv/json/text.

    The reference supports exactly one format (local text file via fd); this
    is the widened, Spark-native source surface.
    """
    fmt = fmt.lower()
    reader = spark.read.options(**options)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "csv":
        return reader.csv(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "text":
        return reader.text(path)
    raise ValueError(f"unsupported format: {fmt}")


# Lake-format connectors as an OPTIONAL EXTRA: the provider class each
# format registers on the JVM classpath when its jars are present. The
# sandbox ships neither jar, so the default path is the guarded stub —
# but the detection is a real runtime probe, not a hardcoded no: a
# deployment that launches with --packages io.delta:delta-spark_2.13:...
# or org.apache.iceberg:iceberg-spark-runtime-... gets the genuine read
# path from the same call sites with zero code changes.
_LAKE_PROVIDERS = {
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
}


def lake_format_available(spark: SparkSession, fmt: str) -> bool:
    """True iff ``fmt``'s DataSource provider class is loadable by SPARK's
    classloader — a driver-side probe, no job, no file IO. Unknown formats
    are False.

    The probe goes through ``org.apache.spark.util.Utils.classForName``
    (falling back to the context classloader, then bare Class.forName):
    jars added via ``--packages`` / ``spark.jars.packages`` live in
    Spark's MUTABLE context classloader, which a plain
    ``java.lang.Class.forName`` through the py4j gateway's loader cannot
    see — the round-8 advisor's finding: the old probe could return False
    in exactly the advertised deployment mode, making read_lake raise on
    a working classpath (and the auto-skip test, keyed on the same probe,
    would never catch it)."""
    cls = _LAKE_PROVIDERS.get(fmt.lower())
    if cls is None:
        return False
    jvm = spark._jvm  # type: ignore[union-attr]
    try:
        # Spark's own resolution order: context classloader first.
        jvm.org.apache.spark.util.Utils.classForName(cls, True, False)
        return True
    except Exception:
        pass
    try:
        jvm.java.lang.Thread.currentThread().getContextClassLoader().loadClass(cls)
        return True
    except Exception:
        pass
    try:
        jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def read_delta_log(spark: SparkSession, path: str) -> DataFrame:
    """Pure-Spark Delta Lake SNAPSHOT resolver — the jarless read path
    (round 15, closing the carried lake gap as far as this container
    allows): the Delta transaction log is a PUBLIC protocol
    (delta.io/protocol: ordered ``_delta_log/<v020>.json`` commit files
    of newline-delimited actions over plain parquet data files), so a
    read-only snapshot needs no runtime jar — replay the log, keep the
    last-action-wins live file set, and scan those parquet files with
    the log's own schema.

    Protocol SUBSET, refused loudly outside it (never silently wrong):
    - reader protocol version 1 only (``minReaderVersion`` > 1 — column
      mapping, deletion vectors, v2 checkpoints — raises
      NotImplementedError naming the protocol);
    - JSON commits only: a ``_last_checkpoint`` means the log head is
      checkpoint-compacted and replay from JSON alone would be WRONG,
      so it refuses (the jar path handles checkpointed tables);
    - parquet data files only (``format.provider`` guard);
    - any ``add.deletionVector`` refuses.

    Supported: multi-commit add/remove replay (updates/deletes via file
    rewrite — the OSS writer's default), partitioned tables (partition
    values live in the LOG, not the files — re-attached per file group
    and cast through the log schema), URL-encoded file paths, empty
    snapshots (full-schema empty frame). Scale shape: the log replay is
    driver-side metadata (KBs per commit — the same work the jar's
    Snapshot class does); the data scan is a normal parquet read per
    partition-value group, so pushdown/pruning apply. With the jar on
    the classpath ``read_lake`` prefers the real DataSource — this
    resolver is the documented fallback, exercised for real in
    tests/test_sinks.py against hand-written protocol-conformant logs."""
    import json as _json
    import re as _re
    from collections import defaultdict
    from urllib.parse import unquote

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise ValueError(f"not a Delta table (no _delta_log under {path})")
    if os.path.exists(os.path.join(log_dir, "_last_checkpoint")):
        raise NotImplementedError(
            f"Delta table at {path} has a checkpointed log "
            f"(_last_checkpoint): the jarless resolver replays JSON "
            f"commits only — reading past a checkpoint needs the delta "
            f"runtime jar"
        )
    commits = sorted(
        f for f in os.listdir(log_dir) if _re.fullmatch(r"\d{20}\.json", f)
    )
    if not commits:
        raise ValueError(f"Delta log at {log_dir} has no commit files")
    schema = None
    part_cols: list[str] = []
    live: dict[str, dict] = {}
    for fname in commits:
        with open(os.path.join(log_dir, fname)) as f:
            for line in f:
                if not line.strip():
                    continue
                act = _json.loads(line)
                if "protocol" in act:
                    p = act["protocol"]
                    if p.get("minReaderVersion", 1) > 1:
                        raise NotImplementedError(
                            f"Delta reader protocol {p} exceeds the "
                            f"jarless resolver's v1 subset (column "
                            f"mapping / deletion vectors / v2 "
                            f"checkpoints need the runtime jar)"
                        )
                elif "metaData" in act:
                    md = act["metaData"]
                    provider = md.get("format", {}).get("provider", "parquet")
                    if provider != "parquet":
                        raise NotImplementedError(
                            f"Delta data format {provider!r}: the "
                            f"resolver reads parquet tables only"
                        )
                    schema = T.StructType.fromJson(
                        _json.loads(md["schemaString"])
                    )
                    part_cols = list(md.get("partitionColumns", []))
                elif "add" in act:
                    a = act["add"]
                    if a.get("deletionVector"):
                        raise NotImplementedError(
                            "Delta deletion vectors need the runtime jar"
                        )
                    live[a["path"]] = a
                elif "remove" in act:
                    live.pop(act["remove"]["path"], None)
    if schema is None:
        raise ValueError(f"Delta log at {log_dir} has no metaData action")
    if not live:
        return spark.createDataFrame([], schema)
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    groups: dict[tuple, list[str]] = defaultdict(list)
    for a in live.values():
        pv = tuple(sorted((a.get("partitionValues") or {}).items()))
        groups[pv].append(os.path.join(path, unquote(a["path"])))
    parts = []
    for pv, files in sorted(groups.items()):
        df = spark.read.schema(data_schema).parquet(*files)
        pvmap = dict(pv)
        for name in part_cols:
            field = schema[name]
            df = df.withColumn(
                name, F.lit(pvmap.get(name)).cast(field.dataType)
            )
        parts.append(df.select([f.name for f in schema.fields]))
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out


def read_lake(spark: SparkSession, path: str, fmt: str = "delta") -> DataFrame:
    """Lake-format read path (Delta Lake / Apache Iceberg). With the
    runtime jars present this is a plain
    ``spark.read.format(fmt).load(path)`` — snapshot isolation, file
    skipping and column stats come from the format's own reader. Without
    them, DELTA falls back to the pure-Spark log resolver
    (``read_delta_log`` — read-only, protocol-subset v1, refuses
    loudly outside it), so the lake read path is executable in jarless
    containers too; ICEBERG (a manifest-list format whose avro
    metadata has no jarless reader here) keeps the guarded
    NotImplementedError. tests/test_sinks.py exercises the jar branch
    when available (auto-skip otherwise) AND the resolver branch
    against hand-written protocol-conformant logs."""
    fmt = fmt.lower()
    if fmt not in _LAKE_PROVIDERS:
        raise ValueError(f"unsupported lake format: {fmt}")
    if not lake_format_available(spark, fmt):
        if fmt == "delta":
            return read_delta_log(spark, path)
        raise NotImplementedError(
            f"{fmt} requires its runtime jars on the classpath (launch with "
            f"--packages; provider {_LAKE_PROVIDERS[fmt]} not loadable)"
        )
    return spark.read.format(fmt).load(path)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake connector — the ``read_lake`` delta lane (kept as the
    round-1 entry point name)."""
    return read_lake(spark, path, "delta")


def _size_to_bytes(s: str) -> int:
    """Parse a Spark size conf string ('134217728', '128MB', '1g', '512k')."""
    s = s.strip().lower().removesuffix("b")
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}.get(s[-1:], 1)
    return int(s[:-1] if mult > 1 else s) * mult


def _estimated_scan_partitions(df: DataFrame) -> int:
    """Estimate the scan's partition count from FILE METADATA — no RDD
    handle, no job. Each file contributes ceil(size / maxPartitionBytes)
    splits (the FilePartition math, ignoring small-file packing, which only
    ever LOWERS the true count — so for >=-target gating the estimate can
    overshoot; the affected shape, thousands of tiny files, is a scan
    that needs compaction, not a repartition). Non-local URIs fall back to
    one split per file."""
    spark = df.sparkSession
    try:
        max_bytes = _size_to_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
    except ValueError:
        max_bytes = 128 << 20
    total = 0
    for uri in df.inputFiles():
        path = uri.removeprefix("file:")
        try:
            total += max(1, -(-os.path.getsize(path) // max_bytes))
        except OSError:
            total += 1
    return total


def parallelized(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster default
    parallelism) partitions before CPU-heavy per-row work.

    Small parquet fixtures arrive as 1-3 scan partitions
    (files < spark.sql.files.maxPartitionBytes), which would serialize
    expensive map-side kernels (shingling, signatures) onto one core. The
    repartition is GATED: a scan that already has enough partitions — every
    real 100 TB scan — passes through untouched, so this never adds a
    shuffle at scale; locally it shuffles only the (tiny) raw input once in
    exchange for full-width parallelism on the expensive stage. The gate
    reads file metadata (``_estimated_scan_partitions``) instead of
    ``df.rdd.getNumPartitions()`` — the RDD handle materialized a Java RDD
    per query build just to read one number."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if _estimated_scan_partitions(df) >= target:
        return df
    return df.repartition(target)
