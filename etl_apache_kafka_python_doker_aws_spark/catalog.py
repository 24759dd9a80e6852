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

    The ``events`` fixture stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; we read nanos as long (runtime conf,
    works on any session incl. the driver's) and convert to a microsecond
    TimestampType column — sub-µs digits are truncated, so oracle SQL must
    compare through ``CAST(ts AS TIMESTAMP)`` on the DuckDB side.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"fixture table {name!r} not found at {path} — known tables: "
            f"{', '.join(TABLES)}; sf dirs live under /root/testdata/"
        )
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer DIV, not /: ns epoch values exceed double's 53-bit
            # mantissa and float division rounds the microsecond up
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
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
