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
