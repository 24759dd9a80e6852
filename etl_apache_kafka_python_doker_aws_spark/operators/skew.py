"""Skew mitigation — SURVEY.md §4 / build-brief 'salting for skew'.

AQE's skew-join split (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool when one join key dominates so
heavily that even split partitions bottleneck, or when the skewed side
feeds a groupBy (AQE doesn't salt aggregations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` with the left side salted and the right side
    exploded `salt_factor` ways, so a hot key's rows spread over
    salt_factor reducers instead of one.

    left gains a random salt in [0, salt_factor); right is replicated
    once per salt value (sequence+explode, JVM-side). Join key becomes
    (key, salt). Use when the LEFT side is the skewed fact; the right
    side's replication cost is size(right) × salt_factor, so keep
    salt_factor × right small (dimension-sized).

    Returns the joined frame with helper columns dropped — semantically
    identical to left.join(right, key, how).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=42) * salt_factor).cast("int")
    )
    exploded_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return (
        salted_left.join(exploded_right, on=[key, "_salt"], how=how)
        .drop("_salt")
    )


def salted_group_count(
    df: DataFrame, key: str, salt_factor: int = 8
) -> DataFrame:
    """Two-stage aggregation for a skewed group key: partial count on
    (key, salt), then final sum on key — the shuffle for stage 1 spreads
    the hot key over salt_factor partitions. (Spark's partial aggregation
    already does this for algebraic aggs when map-side state fits; the
    explicit form is for high-cardinality maps or collect-style aggs.)"""
    return (
        df.withColumn("_salt", (F.rand(seed=42) * salt_factor).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").cast("long").alias("n"))
    )
