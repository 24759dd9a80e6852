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
    salt_on: list[str] | None = None,
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

    The salt is DETERMINISTIC (xxhash64 over ``salt_on`` — by default
    every hashable left column — not rand()): any salt value spreads a
    hot key correctly, but rand() is seeded per-partition, so a task
    retry or a different input partitioning would re-salt rows
    differently — fine for a single job's result, hostile to
    speculative execution and to debugging skew by re-running a stage
    (same r5 rule as salted_agg). Map-typed columns are excluded
    automatically (xxhash64 rejects MapType). Pass ``salt_on``
    explicitly when the default would hash only LOW-CARDINALITY payload
    columns — if the hot key's rows carry e.g. 3 distinct payloads, the
    default salt lands them in ≤3 buckets and the straggler returns; a
    unique-ish column (row id, event id) is the right salt input.

    MEASURED (20M-row left with 50% of rows on ONE key, 100k-row right,
    broadcast disabled, local[32], cached, median-of-2 warm): plain SMJ
    4.0-4.5 s, salted(16) 2.3-2.5 s — ~1.8× — and the numbers are the
    SAME with AQE on, because the hot partition (~160 MB of longs)
    stays under AQE's skewedPartitionThreshold (256 MB default), so
    OptimizeSkewedJoin never fires. That is precisely this operator's
    regime: skew bad enough to straggle, not bad enough for AQE's
    byte-size heuristics to notice.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    if salt_on is None:
        from pyspark.sql import types as _T

        salt_on = [
            f.name
            for f in left.schema.fields
            if not isinstance(f.dataType, _T.MapType)
        ]
        if not salt_on:
            raise ValueError(
                "salted_join: no hashable left columns; pass salt_on explicitly"
            )
    salted_left = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]), F.lit(salt_factor)).cast(
            "int"
        ),
    )
    exploded_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return (
        salted_left.join(exploded_right, on=[key, "_salt"], how=how)
        .drop("_salt")
    )


#: Aggregates supported by salted_agg: name -> (partial fn, merge fn).
#: All are algebraic (partials combine losslessly), which is what makes
#: the two-phase rewrite semantics-preserving.
_SALTABLE = {
    "count": (lambda c: F.count(c), lambda p: F.sum(p).cast("long")),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_factor: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """LOSSLESS two-phase aggregation for hot group keys (VERDICT r4
    next-round #5): partial-aggregate on (keys…, salt), then merge on the
    keys alone. A key holding 40% of a 100 TB table overwhelms one
    reducer in a plain groupBy; here its rows spread over `salt_factor`
    partial groups, bounding every first-stage partition at roughly
    hot_key_rows / salt_factor — and unlike the dedup band guard's
    max_bucket_size drop, NOTHING is discarded.

    The salt is DETERMINISTIC — pmod(xxhash64(salt_on…), salt_factor) of
    payload columns, never rand(): a task retry or a different input
    partitioning reproduces the identical salt, so speculative execution
    and incremental re-runs stay exactly consistent (the r4 salted_join
    house rule applied to aggregation). ``salt_on`` defaults to every
    non-key column.

    ``aggs``: out_name -> (fn, col) with fn in {count, sum, min, max}.
    All supported fns are algebraic, so partial+merge equals the direct
    aggregate exactly — asserted against DuckDB by the a18 registered
    query and measured on a skewed fixture in SCALING.md.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _SALTABLE:
            raise ValueError(f"salted_agg: unsupported agg {fn!r} for {name}")
    if salt_on is None:
        salt_on = [c for c in df.columns if c not in keys]
        if not salt_on:
            salt_on = keys
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]), F.lit(salt_factor))
    partial_exprs = [
        _SALTABLE[fn][0](col).alias(f"_p_{name}") for name, (fn, col) in aggs.items()
    ]
    merge_exprs = [
        _SALTABLE[fn][1](f"_p_{name}").alias(name) for name, (fn, _col) in aggs.items()
    ]
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*merge_exprs)
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
