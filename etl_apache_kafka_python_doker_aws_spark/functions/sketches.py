"""Distributed probabilistic sketches with exact-verify second passes.

Two operators the reference's row-at-a-time loop could never run at
scale, built so their *registered* output is exactly checkable:

* **Bloom filter build + probe** — set membership over a corpus column.
  The filter is built distributed (positions exploded, OR-folded into a
  64-bit-word bitmap via ``bit_or``) and the resulting bitmap table is
  tiny by construction (``num_bits / 64`` rows max), so the probe side
  broadcast-joins it: no shuffle of the probe stream at any scale.
  Guarantee used by the oracle: NO false negatives — a value that was
  inserted always probes true.

* **Misra-Gries heavy hitters** — frequent-key detection in bounded
  memory. Phase 1 runs a per-partition Misra-Gries summary inside
  ``mapInPandas`` (capacity ``ceil(1/ratio)`` counters per partition —
  constant memory regardless of key cardinality); by the standard
  averaging argument every key with global frequency ≥ ratio·n survives
  in at least one partition's summary, so the union of survivors is a
  SUPERSET of the true heavy hitters. Phase 2 exact-counts only the
  candidates (semi-join + hash agg) and filters by the true threshold —
  making the final answer EXACT, which is why a plain GROUP BY/HAVING
  DuckDB oracle can check it. The point at 100 TB: ``groupBy(key)`` on a
  high-cardinality key shuffles every distinct key; this shuffles only
  the bounded candidate set's rows through the final agg while phase 1
  is a single narrow pass.

Reference parity anchor: the reference has no aggregation surface at all
(its only "aggregate" is materializing rows into one JSON array,
``/root/reference/dags/etl_dags.py:58-60``); these are engine-side
additions for the training-data-pipeline tier (SURVEY.md §2.11).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "bloom_build",
    "bloom_merge",
    "bloom_might_contain",
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "misra_gries_candidates",
    "heavy_hitters",
]


def _bloom_positions(col: str, num_bits: int, num_hashes: int) -> list:
    """k bit positions for a value: ``pmod(xxhash64(value, i), m)``.

    Seeding by hashing the value TOGETHER with the hash index (xxhash64
    is variadic over columns) gives k decorrelated 64-bit hashes without
    any Python-side hashing; everything stays in whole-stage codegen.
    """
    return [
        F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame, col: str, *, num_bits: int = 1 << 22, num_hashes: int = 4
) -> DataFrame:
    """Build a Bloom-filter bitmap over ``df[col]`` as a DataFrame of
    ``(word: long, bits: long)`` — 64 filter bits per row, only words
    with at least one set bit present (≤ num_bits/64 rows, and ≤
    rows·num_hashes while the filter is sparse).

    The build is one explode + one hash aggregation: map-side partial
    ``bit_or`` folds most duplicates before the (tiny) shuffle. Nulls
    are skipped (a NULL member is not representable; probe returns
    false).
    """
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    pos = F.explode(F.array(*_bloom_positions(col, num_bits, num_hashes)))
    return (
        ensure_parallelism(df.filter(F.col(col).isNotNull()))
        .select(pos.alias("pos"))
        .select(
            F.expr("pos DIV 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_might_contain(
    probes: DataFrame,
    col: str,
    bitmap: DataFrame,
    *,
    num_bits: int = 1 << 22,
    num_hashes: int = 4,
    result_col: str = "might_contain",
) -> DataFrame:
    """Probe every row of ``probes`` against a ``bloom_build`` bitmap.

    Returns ``probes`` + a boolean ``result_col``. Membership depends
    only on the probed VALUE, so the result is computed once per
    DISTINCT value (explode the k positions, broadcast-join the
    ≤ num_bits/64-row bitmap, ``bool_and`` fold grouped BY THE VALUE)
    and joined back to the probe rows on the value itself — no
    surrogate row id anywhere. (The previous implementation folded on a
    ``monotonically_increasing_id`` surrogate, which is assigned
    per-evaluation: when the probe frame's row order is not
    deterministic — e.g. the output of a groupBy — the id assignment
    can DIFFER between the fold branch and the join-back branch of the
    same plan, silently mispairing results. Caught via cms_estimate's
    impossible undercounts, r6.)

    NULL probes are not representable in the filter (build skips them)
    and never equi-join back — they get ``false`` via the coalesce.
    ``num_bits``/``num_hashes`` MUST match the build call.
    """
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    pos = F.explode(F.array(*_bloom_positions(col, num_bits, num_hashes)))
    flags = (
        ensure_parallelism(probes.filter(F.col(col).isNotNull()))
        .select(col)
        .distinct()
        .select(F.col(col), pos.alias("pos"))
        .select(
            F.col(col),
            F.expr("pos DIV 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias(
                "mask"
            ),
        )
        .join(F.broadcast(bitmap), "word", "left")
        .select(
            F.col(col),
            F.coalesce(
                F.expr("(bits & mask) <> CAST(0 AS BIGINT)"), F.lit(False)
            ).alias("_bit_set"),
        )
        .groupBy(col)
        .agg(F.expr("bool_and(_bit_set)").alias(result_col))
    )
    return probes.join(flags, [col], "left").withColumn(
        result_col, F.coalesce(F.col(result_col), F.lit(False))
    )


def _mg_merge(counters: dict, batch_counts: dict, capacity: int) -> dict:
    """Merge one batch's exact counts into a Misra-Gries summary and
    shrink it to ``capacity`` with the batched decrement (subtract the
    minimum surviving count from every counter, drop zeros, repeat).

    Pure function so the guarantee is property-testable without Spark:
    every decrement round removes ≥ capacity+1 units of mass in total,
    so the total decrement D satisfies D ≤ n/(capacity+1) and any key
    with true count > n/(capacity+1) survives with a positive counter.
    """
    for key, c in batch_counts.items():
        counters[key] = counters.get(key, 0) + int(c)
    while len(counters) > capacity:
        decrement = min(counters.values())
        counters = {k: v - decrement for k, v in counters.items() if v > decrement}
    return counters


def misra_gries_candidates(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned: a DataFrame of
    candidate keys guaranteed to be a SUPERSET of every key with global
    frequency > n/(capacity+1).

    Memory is O(capacity) per partition no matter how many distinct keys
    stream through; each Arrow batch is counted vectorized
    (``value_counts``) and merged into the summary, then the summary is
    shrunk by the batched MG decrement (subtract the minimum counter,
    drop zeros) until it fits. Output size ≤ partitions · capacity.
    NULL keys are dropped BEFORE the Arrow transfer: a nullable BIGINT
    batch containing an actual null reaches pandas as float64, which
    silently corrupts non-null keys above 2^53 (distinct keys collapse)
    and would break the superset guarantee; filtering JVM-side keeps the
    batch int64.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    field = df.schema[key_col]
    out_schema = T.StructType([field])
    df = df.filter(F.col(key_col).isNotNull())
    # Float NaN keys must ALSO stay JVM-side: the Arrow bridge delivers
    # them to pandas fine, but converts the yielded NaN back to Spark
    # NULL, silently corrupting the candidate (observed). heavy_hitters
    # accounts the NaN group directly, like the NULL group.
    if isinstance(field.dataType, (T.FloatType, T.DoubleType)):
        df = df.filter(~F.isnan(F.col(key_col)))

    def mg(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            counters = _mg_merge(
                counters, dict(pdf[key_col].value_counts().items()), capacity
            )
        if counters:
            yield pd.DataFrame({key_col: list(counters.keys())})

    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    return ensure_parallelism(df.select(key_col)).mapInPandas(mg, out_schema)


def heavy_hitters(
    df: DataFrame, key_col: str, *, min_freq_ratio: float
) -> DataFrame:
    """EXACT heavy hitters — every key whose frequency is ≥
    ``min_freq_ratio`` of the table — in bounded memory.

    Misra-Gries candidates (capacity ``ceil(1/ratio)``, superset
    guarantee) → semi-join restricts the exact count to candidate rows →
    threshold filter against the true total. Output columns:
    ``(key_col, cnt, n_total, freq)``. The candidate set is bounded by
    partitions·capacity but carries NO explicit broadcast hint — the
    repo's hint policy (test_plans.py::test_no_fact_table_broadcast_hints)
    reserves hints for structurally size-bounded inputs, and a
    mapInPandas output is only bounded by this operator's contract, not
    by construction; AQE converts the semi-join to broadcast at runtime
    once the candidate stage's actual (tiny) size is known. The total is
    a 1-row aggregate and is hinted.

    MEASURED (50M rows, 5M distinct keys + one 10% hot key, ratio=1e-4,
    local[32], cached input): heavy_hitters 7.3–15.5 s vs plain
    groupBy+filter 2.9–8.0 s — on ONE box the full groupBy wins because
    shuffling 5M keys is a memory copy while the MG pass pays an Arrow
    round-trip of every row. Reach for this form when reducer STATE is
    the failure mode (distinct keys ~ rows, so the groupBy's own hash
    tables/output are what OOMs), not for wall-clock on data that fits.
    """
    if not 0.0 < min_freq_ratio <= 1.0:
        raise ValueError(f"min_freq_ratio must be in (0, 1], got {min_freq_ratio}")
    capacity = max(1, math.ceil(1.0 / min_freq_ratio))
    cands = misra_gries_candidates(df, key_col, capacity).distinct()
    counts = (
        df.join(cands, key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
    )
    # NULL (and float NaN) keys can't flow through the MG/Arrow path —
    # the sketch filters them JVM-side (a semi-join never matches NULL;
    # Arrow converts a yielded NaN back to NULL) — but a plain groupBy
    # DOES report both groups. Count each directly in the same 1-row
    # total pass and union them back when they clear the threshold, so
    # the EXACT-equivalence claim holds on nullable/NaN keys too.
    key_type = df.schema[key_col].dataType
    is_float = isinstance(key_type, (T.FloatType, T.DoubleType))
    nan_flag = (
        F.isnan(F.col(key_col)) if is_float else F.lit(False)
    ) & F.col(key_col).isNotNull()
    total = df.agg(
        F.count("*").alias("n_total"),
        F.sum(F.col(key_col).isNull().cast("long")).alias("_n_null"),
        F.sum(nan_flag.cast("long")).alias("_n_nan"),
    )
    thresh = F.col("n_total") * F.lit(min_freq_ratio)

    def _special(count_col: str, key_lit) -> DataFrame:
        return total.filter(
            (F.col(count_col) > 0) & (F.col(count_col) >= thresh)
        ).select(
            key_lit.cast(key_type).alias(key_col),
            F.col(count_col).alias("cnt"),
            "n_total",
        )

    specials = _special("_n_null", F.lit(None))
    if is_float:
        specials = specials.unionByName(_special("_n_nan", F.lit(float("nan"))))
    return (
        counts.crossJoin(F.broadcast(total.select("n_total")))
        .filter(F.col("cnt") >= thresh)
        .select(key_col, "cnt", "n_total")
        .unionByName(specials)
        .select(
            key_col,
            "cnt",
            "n_total",
            (F.col("cnt") / F.col("n_total")).alias("freq"),
        )
    )


def bloom_merge(*bitmaps: DataFrame) -> DataFrame:
    """Union Bloom filters built with IDENTICAL (num_bits, num_hashes):
    a Bloom filter is a pure OR-fold, so merging bitmaps word-by-word is
    LOSSLESS — ``bloom_merge(build(A), build(B))`` is bit-for-bit equal
    to ``build(A ∪ B)`` (asserted in tests). This is the incremental
    maintenance path: yesterday's corpus filter + today's batch filter
    combine in O(num_bits/64) rows without touching yesterday's data —
    the same partial-merge shape as d6's aggregate state.
    """
    if not bitmaps:
        raise ValueError("bloom_merge needs at least one bitmap")
    merged = bitmaps[0]
    for b in bitmaps[1:]:
        merged = merged.unionByName(b)
    return merged.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))


def _cms_cells(col: str, depth: int, width: int) -> list:
    """One (row, column) hash per sketch row for a value — xxhash64 with
    the row index as seed, pmod to the width (the standard CMS layout)."""
    return [
        F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width)) for d in range(depth)
    ]


def cms_build(
    df: DataFrame, col: str, *, depth: int = 4, width: int = 1024
) -> DataFrame:
    """SK4: COUNT-MIN SKETCH build over ``df[col]`` as a DataFrame of
    ``(d: int, w: long, cnt: long)`` — ≤ depth·width rows regardless of
    input size, the fixed-memory frequency summary that complements
    Bloom (membership) and Misra-Gries (top-k): point-frequency
    estimates with ONE-SIDED error (never under, over by at most the
    collision mass in the estimate's min cell).

    Build is one explode + hash aggregation with map-side partial
    counts; NULLs are skipped (not representable — estimate 0). The
    sketch is LINEAR: cms_merge of two builds equals the build of the
    union cell-for-cell (asserted in tests), which is the incremental/
    distributed maintenance path.
    """
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    cells = F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("d"), c.alias("w"))
                for d, c in enumerate(_cms_cells(col, depth, width))
            ]
        )
    )
    return (
        ensure_parallelism(df.filter(F.col(col).isNotNull()))
        .select(cells.alias("c"))
        .select(F.col("c.d").alias("d"), F.col("c.w").alias("w"))
        .groupBy("d", "w")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame,
    col: str,
    sketch: DataFrame,
    *,
    depth: int = 4,
    width: int = 1024,
    result_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimates for every probe row against a
    ``cms_build`` sketch: est = min over rows d of counter[d, h_d(x)]
    (an absent cell counts 0). Returns ``probes`` + ``result_col``.

    Like bloom_might_contain, the estimate depends only on the probed
    VALUE: computed once per distinct value (explode depth cells,
    broadcast-join the ≤ depth·width-row sketch, ``min`` fold grouped
    by the value) and joined back on the value — no surrogate row id,
    so a probe frame with non-deterministic row order (a groupBy
    output) cannot mispair results. ``depth``/``width`` MUST match the
    build. NULL probes estimate 0.
    """
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    cells = F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("d"), c.alias("w"))
                for d, c in enumerate(_cms_cells(col, depth, width))
            ]
        )
    )
    ests = (
        ensure_parallelism(probes.filter(F.col(col).isNotNull()))
        .select(col)
        .distinct()
        .select(F.col(col), cells.alias("c"))
        .select(F.col(col), F.col("c.d").alias("d"), F.col("c.w").alias("w"))
        .join(F.broadcast(sketch), ["d", "w"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(result_col))
    )
    return probes.join(ests, [col], "left").withColumn(
        result_col, F.coalesce(F.col(result_col), F.lit(0)).cast("long")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Count-Min sketches built with IDENTICAL (depth, width): the
    sketch is linear, so cell-wise ADDITION is lossless —
    ``cms_merge(build(A), build(B))`` equals ``build(A ∪ B)``
    cell-for-cell (asserted in tests). Incremental maintenance in
    O(depth·width) rows, the bloom_merge shape with SUM instead of OR."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))
