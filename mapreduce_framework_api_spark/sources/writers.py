"""Sinks: format writers, partitioned layout, bucketing, and the
reference's formatted text sink.

The reference's only sink is ``dprintf(outfd, "%s, %d\\n", key, count)`` to
one local fd (``bin/mr-wordc.o:print_tree+0x3a-0x4c``, format string at
``.rodata+0x2a``) — single file, single thread. Spark generalizes this to
distributed, atomic (job-commit) writes in columnar and text formats; this
module adds the layout decisions that matter at 100 TB:

- ``write_any``: format × mode × compression in one call;
- ``write_partitioned``: directory partitioning (`partitionBy`) so future
  scans prune whole directories (partition pruning = free predicate
  pushdown at the filesystem level);
- ``write_bucketed``: pre-shuffled, pre-sorted table layout — two tables
  bucketed by the same key join WITHOUT a shuffle (the exchange is done
  once at write time, amortized over every later join);
- ``write_formatted_text``: the reference's exact ``"%s, %d\n"`` sink
  contract (SURVEY.md §2.5) as a distributed text write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options,
) -> None:
    """Generic sink: parquet/orc/csv/json/text with per-format options.
    Writes are job-atomic (task commit protocol) — a failed job leaves no
    partial output visible."""
    fmt = fmt.lower()
    writer = df.write.mode(mode).options(**options)
    if fmt not in ("parquet", "orc", "csv", "json", "text"):
        raise ValueError(f"unsupported format: {fmt}")
    getattr(writer, fmt)(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Directory-partitioned write: one subdirectory per distinct partition
    value. Readers filtering on the partition column scan only matching
    directories (PartitionFilters in the plan — zero data read for pruned
    partitions). Keep partition cardinality moderate (≤ ~10k dirs);
    ``max_records_per_file`` caps file size for downstream parallelism."""
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    getattr(writer, fmt.lower())(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-pre-shuffled) managed table: rows are routed to
    ``n_buckets`` files by hash(bucket_col) and optionally sorted within
    each bucket. Two tables bucketed the same way equi-join with NO
    exchange and (if sorted) NO sort — the standard layout for a fact
    table joined repeatedly on the same key at warehouse scale. Requires
    ``saveAsTable`` (bucket metadata lives in the catalog, not the files).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def write_formatted_text(
    df: DataFrame,
    path: str,
    key_col: str,
    value_col: str,
    sep: str = ", ",
    coalesce_to_one: bool = False,
) -> None:
    """The reference's sink contract (SURVEY.md §2.5): lines
    ``"<key><sep><value>"``, byte-ordered by key ascending. Distributed by
    default (one file per partition, globally ordered across files via the
    range-partitioned sort); ``coalesce_to_one`` reproduces the single-fd
    layout for byte-exact golden replay — a deliberate scaling bottleneck,
    only for small outputs."""
    out = df.orderBy(key_col).select(
        F.concat_ws(sep, F.col(key_col).cast("string"), F.col(value_col).cast("string")).alias(
            "value"
        )
    )
    if coalesce_to_one:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


def compact_small_files(
    spark,
    path: str,
    fmt: str = "parquet",
    target_bytes: int = 128 << 20,
    partition_cols: list[str] | None = None,
    sort_by: str | list[str] | None = None,
) -> dict:
    """Small-file compaction — the table-maintenance pass every long-lived
    100 TB lakehouse table needs: streaming ingests and fine-grained
    partition writes accumulate thousands of KB-sized files, and each one
    costs a task-schedule + open + footer-parse on every later scan (a
    10k-file partition can spend more time in scheduling than in IO).

    Rewrites ``path`` in place to ceil(total_bytes / target_bytes) files
    via a round-robin repartition (no shuffle KEY — repartition(n) is a
    pure rebalance exchange; row content is unchanged and row order was
    never part of the files' contract). The write goes to a sibling
    staging directory first and swaps in atomically-enough for a
    maintenance window (write-then-rename, the classic non-transactional
    compactor; a lake-format table would instead commit a replace
    snapshot through read_lake's formats). Returns
    {files_before, files_after, bytes_total} for the maintenance log.

    ``partition_cols`` preserves a directory-partitioned layout: the
    rewrite then targets ceil(dir_bytes/target) files PER PARTITION VALUE
    — sized from each directory's own listed bytes, so skewed partitions
    compact to target-sized files too — via a content-hash split key
    (retry-deterministic) + partitionBy at the sink, instead of
    flattening the directory tree: compacting a dt=.../ partitioned
    ingest keeps every later scan's partition pruning intact.

    ``sort_by`` adds CLUSTERING to the rewrite — the compaction pass is
    the one time the whole table moves anyway, so sorting it then is
    free-ish and every later predicate scan on the clustering column(s)
    pays less forever:

    - unpartitioned: ``repartitionByRange(n, sort_by)`` +
      ``sortWithinPartitions`` — output files hold DISJOINT value ranges
      and sorted row groups, so a selective predicate prunes whole FILES
      (footer min/max) and then whole row groups inside the survivors.
      The range exchange replaces the round-robin one (same single
      shuffle; Spark samples the sort key to place the bounds, so skewed
      keys still yield even file sizes).
    - partitioned: rows must route by partition key, so cross-file
      ranges within one partition value stay hash-split; ``sort_by``
      then clusters WITHIN each file (sorted row groups → row-group
      min/max pruning), which is where most of the win lives once
      partition pruning has already cut the directory list.

    Driver cost: one file listing (the same listing any scan does).
    Cluster cost: one read + one rebalance exchange + one write — linear,
    no aggregation state (the optional sort is per-output-partition)."""
    import math
    import os
    import shutil

    from mapreduce_framework_api_spark.sources.readers import read_any

    sort_cols = (
        [sort_by] if isinstance(sort_by, str) else list(sort_by or [])
    )

    def _data_files(p):
        out = []
        for root, _dirs, names in os.walk(p):
            for n in names:
                if not n.startswith(("_", ".")):
                    out.append(os.path.join(root, n))
        return out

    before = _data_files(path)
    total = sum(os.path.getsize(f) for f in before)
    n_files = max(1, math.ceil(total / target_bytes))
    df = read_any(spark, path, fmt)
    missing = [c for c in sort_cols if c not in df.columns]
    if missing:
        raise ValueError(f"sort_by columns not in table: {missing}")
    staging = path.rstrip("/") + "._compact_staging"
    if partition_cols:
        # Rebalance rows onto their partition key (plus a within-partition
        # split when one value alone exceeds the target), then let
        # partitionBy lay out the tree. Round 9, twice over:
        # (a) SKEW-AWARE sizing — the split count comes from each
        #     partition directory's OWN listed bytes (the `key=value`
        #     path segments the writer produced), not the mean across
        #     directories, so a 10:1-hot partition also compacts to
        #     target-sized files instead of one oversized blob;
        # (b) DETERMINISTIC split key — pmod(xxhash64(<all data
        #     columns>), n) in place of monotonically_increasing_id(),
        #     whose value depends on task/row order: under a task retry
        #     or speculative execution a nondeterministic shuffle key
        #     re-routes recomputed rows (the SPARK-23207 bug class —
        #     Spark protects round-robin repartition(n), not explicit
        #     nondeterministic keys), and an offsetting duplicate+loss
        #     would slip past the row-count gate. Content-hashed keys
        #     reproduce the same placement on every attempt; fully
        #     duplicate rows co-locating is a file-size estimate error,
        #     not a correctness one.
        # Directory names hold Spark's ESCAPED partition values (URL-style
        # escapes for special chars; __HIVE_DEFAULT_PARTITION__ for null).
        # The string match below compares them to cast-to-string column
        # values, so a partition whose value escapes differently simply
        # falls back to ONE split (fewer, larger files — a sizing
        # degradation, never misplaced rows: row routing comes from
        # repartition on the real columns, not from this estimate).
        dir_bytes: dict[tuple, int] = {}
        for f in before:
            rel = os.path.relpath(os.path.dirname(f), path)
            kv = dict(
                seg.split("=", 1) for seg in rel.split(os.sep) if "=" in seg
            )
            key = tuple(kv.get(c) for c in partition_cols)
            # Files outside a full key=value tree (a previously
            # unpartitioned write being re-laid-out) carry no usable
            # key: they fall to the default one split below rather than
            # polluting the sizing table.
            if any(v is None for v in key):
                continue
            dir_bytes[key] = dir_bytes.get(key, 0) + os.path.getsize(f)
        # Split counts route to rows via a BROADCAST-JOINED sizing frame
        # (one row per partition value), not a per-value CASE chain — a
        # few thousand partition dirs would otherwise build a
        # few-thousand-node when-tree evaluated per row (this repo's own
        # measured expression-tree pathology; see the LSH codes note).
        #
        # The temp columns below (_pk/_nsplit/_split) would silently
        # clobber-and-drop same-named table columns — and the row-count
        # gate would still pass (counts unchanged, column gone) — so a
        # collision is an explicit error, not a layout quirk (round-10
        # advice fix).
        taken = set(df.columns) & {"_pk", "_nsplit", "_split"}
        if taken:
            raise ValueError(
                f"compact_small_files uses temp columns {sorted(taken)} that "
                f"already exist in the table; rename them before compacting"
            )
        sep = "\x1f"
        sizing = [
            (sep.join(k), max(1, math.ceil(b / target_bytes)))
            for k, b in dir_bytes.items()
        ]
        # NULL partition values: concat_ws SKIPS nulls, which would alias
        # distinct partition tuples onto one sizing key in the
        # multi-column case (sizing-only — row routing uses the real
        # columns). The directory side already encodes nulls as Spark's
        # __HIVE_DEFAULT_PARTITION__ segment, so coalescing to that same
        # placeholder makes null partitions join their own sizing row.
        # A REAL value equal to the placeholder string would collide with
        # the null partition's sizing row (and is ambiguous on disk too:
        # Spark writes that literal unescaped) — make it an explicit
        # error rather than a silent mis-sizing. One column-pruned probe
        # scan of the partition columns, cheap next to the full
        # read+rewrite this pass does anyway (round-11 advice fix).
        from functools import reduce as _reduce
        from operator import or_ as _or

        sentinel = "__HIVE_DEFAULT_PARTITION__"
        clash = df.where(
            _reduce(
                _or,
                [F.col(c).cast("string") == sentinel for c in partition_cols],
            )
        ).take(1)
        if clash:
            raise ValueError(
                f"partition column value collides with Spark's null-"
                f"partition placeholder {sentinel!r}; rewrite that value "
                f"before compacting"
            )
        key_expr = F.concat_ws(
            sep,
            *[
                F.coalesce(
                    F.col(c).cast("string"), F.lit("__HIVE_DEFAULT_PARTITION__")
                )
                for c in partition_cols
            ],
        )
        # All-partition-column tables have no data columns to hash; rows
        # within a partition are then indistinguishable and one split is
        # the only meaningful layout — hash the partition key itself.
        data_cols = [c for c in df.columns if c not in partition_cols]
        hash_cols = data_cols or list(partition_cols)
        routed = df.withColumn("_pk", key_expr)
        if sizing:
            sizes_df = spark.createDataFrame(sizing, "_pk string, _nsplit int")
            routed = routed.join(F.broadcast(sizes_df), "_pk", "left")
        else:
            routed = routed.withColumn("_nsplit", F.lit(1))
        split = F.pmod(
            F.xxhash64(*[F.col(c) for c in hash_cols]),
            F.coalesce(F.col("_nsplit"), F.lit(1)),
        )
        out = (
            routed.withColumn("_split", split)
            .drop("_pk", "_nsplit")
            .repartition(*[F.col(c) for c in partition_cols], F.col("_split"))
            .drop("_split")
        )
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        (
            out.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .format(fmt)
            .save(staging)
        )
    else:
        if sort_cols:
            out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
        else:
            out = df.repartition(n_files)
        out.write.mode("overwrite").format(fmt).save(staging)
    rows_before = df.count()
    rows_after = read_any(spark, staging, fmt).count()
    if rows_after != rows_before:  # paranoia gate before the destructive swap
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} -> {rows_after}; aborted"
        )
    # Recoverable swap order (round-9 advice): move the live table ASIDE
    # first, then promote staging, then delete the old copy — a crash at
    # any step leaves a complete directory on disk (previously
    # rmtree-then-rename maximized the loss window: a failure between the
    # two left the table deleted with the data stranded in staging).
    old = path.rstrip("/") + "._compact_old"
    shutil.rmtree(old, ignore_errors=True)  # stale leftover from a crash
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes_total": total,
    }
