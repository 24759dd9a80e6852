"""Storage layout for scale — SURVEY.md §4.2 rows that live at write time:
partitioned parquet (static + dynamic partition pruning) and bucketed
tables (co-located joins with no exchange).

At 100 TB these two decisions dominate query cost: a date-partitioned
fact table turns time-range scans into partition pruning, and bucketing
the fact tables on their join key removes the per-query shuffle entirely
(the shuffle is paid once, at write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = 5_000_000,
) -> None:
    """Write parquet partitioned by the given columns (hive-style dirs).
    Readers filtering on partition_cols get partition pruning — verify
    with .explain: 'PartitionFilters'.

    max_records_per_file caps file size inside each partition (file-size
    hygiene at 100 TB: too-large files serialize row groups, too many
    small files melt the listing); None disables the cap."""
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) table in the session
    catalog. Two tables bucketed on the same key with the same bucket
    count join WITHOUT a shuffle (SortMergeJoin over pre-bucketed data, no
    Exchange) — the write-once-shuffle-never pattern."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
