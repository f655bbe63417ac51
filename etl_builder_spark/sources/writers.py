"""Sinks (SURVEY.md §2 A4, A7).

100 TB posture:
- Partition by low-cardinality query-pruning columns only (date,
  category) — partitioning by a high-cardinality key creates a
  small-file explosion.
- Bucket by the hot join/agg key so downstream joins on that key are
  shuffle-free (bucketed scans report the partitioning to Catalyst).
- Control output file count with repartition(n) / repartitionByRange
  before the write — one file per final partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_parquet_sorted(
    df: DataFrame, path: str, sort_by: tuple[str, ...], n_files: int, mode: str = "overwrite"
) -> None:
    """Range-partition + in-partition sort → globally sorted file set
    with parquet min/max stats that enable row-group skipping on the
    sort key at read time."""
    out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    out.write.mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: tuple[str, ...],
    n_buckets: int,
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by key so joins between
    tables bucketed on the same key skip the shuffle entirely."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name, format="parquet")


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
