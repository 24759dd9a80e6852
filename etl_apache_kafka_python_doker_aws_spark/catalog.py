"""Fixture-table catalog: load the TESTDATA.md star schema as DataFrames.

Tables (TPC-H-ish): region nation customer supplier part orders lineitem,
plus events (stream fixture), documents and embeddings (LLM-pipeline
fixtures). All parquet; schemas in FIXTURES.md.

At 100 TB these would be partitioned/bucketed tables behind a metastore;
here the loader is a thin seam so every operator takes DataFrames, never
paths — swapping in a real catalog touches only this module.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Columnar parquet scan → Catalyst gets
    predicate pushdown + column pruning for free on every operator.

    All fixture timestamp columns are naive parquet ``timestamp[us]``
    (regenerated 2026-08-13), which Spark 4 loads as TIMESTAMP_NTZ —
    wall-time values with no session-timezone dependence. Use
    ``util.epoch_us`` / ``util.day_bucket`` for epoch and day-bucket
    arithmetic (``unix_micros`` rejects NTZ; ``date_trunc`` coerces it
    through the session zone). An earlier generation stored ``events.ts``
    as TIMESTAMP(NANOS) and needed a nanosAsLong shim here — dead code,
    removed.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"fixture table {name!r} not found at {path} — known tables: "
            f"{', '.join(TABLES)}; sf dirs live under /root/testdata/"
        )
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load all fixture tables present in sf_dir (via load_table, so the
    events ns-timestamp conversion applies here too)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (for spark.sql queries)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
