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
    rewrite then targets ceil(bytes/target) files PER PARTITION VALUE
    (repartition on the partition key + partitionBy at the sink) instead
    of flattening the directory tree — compacting a dt=.../ partitioned
    ingest keeps every later scan's partition pruning intact.

    Driver cost: one file listing (the same listing any scan does).
    Cluster cost: one read + one rebalance exchange + one write — linear,
    no aggregation state."""
    import math
    import os
    import shutil

    from mapreduce_framework_api_spark.sources.readers import read_any

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
    staging = path.rstrip("/") + "._compact_staging"
    if partition_cols:
        # Rebalance rows onto their partition key (plus a within-partition
        # round-robin split when one value alone exceeds the target), then
        # let partitionBy lay out the tree. The per-value split count is
        # sized from the MEAN partition-dir bytes (one listing, no extra
        # scan); a skewed value compacts to fewer, larger files than ideal
        # — a maintenance-op estimate, not a contract.
        n_dirs = max(1, len({os.path.dirname(f) for f in before}))
        per_dir = max(1, math.ceil(total / n_dirs / target_bytes))
        split = F.pmod(F.monotonically_increasing_id(), F.lit(per_dir))
        (
            df.withColumn("_split", split)
            .repartition(*[F.col(c) for c in partition_cols], F.col("_split"))
            .drop("_split")
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .format(fmt)
            .save(staging)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").format(fmt).save(staging)
    rows_before = df.count()
    rows_after = read_any(spark, staging, fmt).count()
    if rows_after != rows_before:  # paranoia gate before the destructive swap
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} -> {rows_after}; aborted"
        )
    shutil.rmtree(path)
    os.rename(staging, path)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes_total": total,
    }
