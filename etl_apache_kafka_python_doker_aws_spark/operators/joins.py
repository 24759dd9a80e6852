"""Join compositions Spark lacks as native operators — SURVEY.md §2.3
(J7 as-of join, J8 interval join).

Both are built from shuffle-friendly primitives (union + window, equi-join
+ range filter) rather than per-group pandas merges: one hash shuffle on
the key column, no driver-side collection, no nested-loop blowup — the
shapes that survive a 1000-executor 100 TB run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType
from pyspark.sql.window import Window


def _bq(name: str) -> Column:
    """Column reference by VERBATIM name: backtick-quoted so names with
    dots/spaces/dashes/reserved words resolve as one identifier instead
    of being parsed as an expression (ADVICE r5: interpolating raw names
    into parsed strings breaks on anything needing quoting)."""
    return F.col("`" + name.replace("`", "``") + "`")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the payload of the latest
    right row with ``right.ts <= left.ts`` and equal ``key`` — ``key``
    may be one column name or a sequence (composite keys, e.g.
    (custkey, region) alignment); all key columns must exist on BOTH
    sides.

    Implementation (scale-first): tag and union both sides, hash-shuffle
    once on the key columns, sort each partition by (ts, side, tiebreak), and
    forward-fill the right payload with ``last(..., ignorenulls=True)``
    over an unbounded-preceding frame. Right rows sort before left rows
    at equal ts, so an exactly-simultaneous right row matches (<=
    semantics).

    Row-atomic payload: the right payload forward-fills as ONE STRUCT,
    never per column — per-column ignorenulls would substitute stale
    earlier values for a latest row's genuine NULLs and fabricate a
    composite row that never existed (r5 third-review finding). A NULL
    field in the latest matching right row is therefore returned as
    NULL, verbatim. Right rows with a NULL timestamp are excluded — no
    left ts satisfies ``NULL <= ts``, and letting them sort first would
    fill rows that have no true predecessor.

    ``tiebreak`` names a RIGHT-side column ordering simultaneous right
    rows (the row with the GREATEST tiebreak value wins, matching
    "latest wins"); without it the winner among equal-ts right rows is
    partition-order-dependent.

    NULL keys follow SQL JOIN semantics (review r6): a NULL never
    equals a NULL, so right rows with any NULL key column are excluded
    up front and left rows with NULL keys always get a NULL payload —
    the window would otherwise co-partition all NULL-key rows and
    cross-fill them, diverging from both an ASOF JOIN oracle and
    pandas merge_asof.

    Contrast with the driver-side or merge_asof-per-group alternatives:
    this is a single shuffle + sort, identical in shape to a sort-merge
    join, and spills via Spark's external sorter at any scale.
    """
    lcols = [c for c in left.columns]
    keys = [key] if isinstance(key, str) else list(key)
    marker = "_asof_side"

    if not keys:
        raise ValueError("asof_join needs at least one key column")
    for kcol in keys:
        if kcol not in left.columns:
            raise ValueError(f"key column {kcol!r} must exist on the left side")
        if kcol not in right.columns:
            raise ValueError(f"key column {kcol!r} must exist on the right side")
    if tiebreak is not None and tiebreak not in right.columns:
        raise ValueError(f"tiebreak column {tiebreak!r} must exist on the right side")
    # Validate payload membership up front (ADVICE r5: a missing payload
    # column surfaced as a raw KeyError deep in the plan build).
    for c in payload_cols:
        if c not in right.columns:
            raise ValueError(f"payload column {c!r} must exist on the right side")

    left_fields = {f.name: f.dataType for f in left.schema.fields}
    right_fields = {f.name: f.dataType for f in right.schema.fields}
    # The NULL payload on left rows is a typed null struct built from the
    # right schema's DataType objects — never a DDL string, which would
    # need quoting rules for field names with spaces/dashes/reserved
    # words (ADVICE r5) and can drift from the real type on exotic types.
    payload_type = StructType(
        [StructField(c, right_fields[c], True) for c in payload_cols]
    )
    tb_type = right_fields[tiebreak] if tiebreak is not None else IntegerType()

    l_tagged = left.select(
        *[_bq(c) for c in lcols],
        _bq(left_ts).alias("_asof_ts"),
        F.lit(1).alias(marker),
        # typed NULL of the struct type (NOT a struct of nulls, which
        # would be non-null and break the ignorenulls forward fill)
        F.lit(None).cast(payload_type).alias("_r_payload"),
        F.lit(None).cast(tb_type).alias("_asof_tb"),
    )
    # Right rows carry their own keys; every other left column rides as
    # NULL. A NULL key can never match (SQL semantics) — drop those
    # rows here so they cannot fill the NULL-key window partition.
    right_keyed = right.filter(_bq(right_ts).isNotNull())
    for kcol in keys:
        right_keyed = right_keyed.filter(_bq(kcol).isNotNull())
    r_tagged = right_keyed.select(
        *[
            _bq(c).alias(c)
            if c in keys
            else F.lit(None).cast(left_fields[c]).alias(c)
            for c in lcols
        ],
        _bq(right_ts).alias("_asof_ts"),
        F.lit(0).alias(marker),
        F.struct(*[_bq(c).alias(c) for c in payload_cols]).alias("_r_payload"),
        (
            _bq(tiebreak) if tiebreak is not None else F.lit(None).cast("int")
        ).alias("_asof_tb"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*[_bq(k) for k in keys])
        .orderBy(F.col("_asof_ts"), F.col(marker), F.col("_asof_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[_bq(c) for c in lcols],
        F.col(marker),
        F.last(F.col("_r_payload"), ignorenulls=True).over(w).alias("_filled"),
    )
    return filled.filter(F.col(marker) == 1).select(
        *[_bq(c) for c in lcols],
        *[F.col("_filled").getField(c).alias(f"asof_{c}") for c in payload_cols],
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str | None,
    ts_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Interval/overlap join (J8): event rows matched to interval rows with
    ``lo <= ts < hi``, optionally on an equi key.

    With an equi key Catalyst plans a hash/sort-merge join and applies the
    range predicate as a post-join filter — linear shuffle, no nested loop.
    Without a key the intervals side must be small enough to broadcast
    (BroadcastNestedLoopJoin); callers with large keyless interval sets
    should bucketize ts first.
    """
    range_pred = (F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) < F.col(hi_col))
    if key is not None:
        return events.join(intervals, on=[key], how="inner").filter(range_pred)
    return events.join(F.broadcast(intervals), range_pred, "inner")


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str | None,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Scalable point-in-interval join: bucketize both sides so the
    candidate join is a plain hash equi-join on (key, bin), then verify
    exact containment (half-open: lo <= p < hi).

    Why: Spark plans a large non-equi range join as BroadcastNestedLoop
    or a cartesian SMJ — O(n·m). Binning makes it O(n + m·span/bin) with
    hash partitioning, the same bucket-then-verify shape as the LSH
    family (functions/dedup.py). Interval rows explode to one row per
    covered bin (choose bin_width ≈ median interval span so the blowup
    is small); points map to exactly one bin; the final dedup is by the
    natural (interval, point) pair, carried as all surviving columns.

    ``point_col``/``lo_col``/``hi_col`` must be integer-valued numerics
    (epoch seconds/micros/nanos, cents, …). ``key`` optionally
    co-partitions (None = global bins).
    """

    def _floor_bin(col_name: str):
        # Integer FLOOR division, not cast-truncation and not `/`:
        # truncation rounds toward zero, so a negative value just below a
        # bin boundary would land one bin high and its candidate pairs
        # would be missed entirely; and Spark `/` is DOUBLE division,
        # exact only below 2^53 — epoch NANOS (~1.7e18) would silently
        # bin wrong. Expressed as trunc-DIV with a -1 correction for
        # negative non-exact values (rather than the (c - pmod) trick,
        # whose subtraction wraps for values within bin_width of
        # Long.MIN_VALUE): DIV and % never overflow for positive
        # bin_width, so this is exact over the entire 64-bit range.
        c = f"CAST(`{col_name}` AS BIGINT)"
        return F.expr(
            f"CAST(CASE WHEN {c} >= 0 OR {c} % {bin_width} = 0 "
            f"THEN {c} DIV {bin_width} "
            f"ELSE {c} DIV {bin_width} - 1 END AS BIGINT)"
        )

    pts = points.withColumn("_bin", _floor_bin(point_col))
    ivs = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(_floor_bin(lo_col), _floor_bin(hi_col))),
    )
    on = [pts["_bin"] == ivs["_bin"]]
    if key is not None:
        on.append(pts[key] == ivs[key])
    joined = pts.join(ivs, on[0] if len(on) == 1 else (on[0] & on[1]))
    verified = joined.filter(
        (pts[point_col] >= ivs[lo_col]) & (pts[point_col] < ivs[hi_col])
    )
    drop_cols = [pts["_bin"], ivs["_bin"]] + ([ivs[key]] if key is not None else [])
    return verified.drop(*drop_cols)
