"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input is under-parallelized for CPU-heavy work.

    Single-file/single-row-group parquet inputs plan as 1-3 scan tasks —
    fine for IO-light plans, but anything doing per-row heavy lifting
    (shingle explosion, hash fan-out, pandas UDFs) would run on one core.
    A round-robin repartition costs one shuffle of the (small) input rows
    and buys full-width execution of the expensive stage. On a real
    cluster with many input files this is a no-op.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
