"""MERGE / upsert emulation over parquet (SURVEY.md §2.1 S4 semantics,
pyspark_guide 'CDC / SCD2' pattern): without a transactional table format
(Delta/Iceberg jars absent in v1), upsert = anti-join + union + atomic
swap. This is the idempotent sink the reference's keyed INSERT wanted to
be (/root/reference/dags/etl_dags.py:37,47-49).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _swap_in(staging: str, target_path: str) -> None:
    """Table swap via paired renames: move the live table aside, rename
    staging in, drop the old copy. A kill between the two renames leaves
    no target dir — that window is repaired by `_recover`, which every
    merge entry point runs first, so the data is never lost (it sits
    whole in .old, and the merged copy in .staging)."""
    old = target_path.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target_path):
        os.rename(target_path, old)
    os.rename(staging, target_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def _is_complete(path: str) -> bool:
    """A parquet dir Spark finished writing carries a _SUCCESS marker."""
    return os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS"))


def _recover(target_path: str) -> None:
    """Repair an interrupted `_swap_in` (ADVICE r1): if the target is
    missing but a complete copy survives in .staging (the merged result —
    finish the swap) or .old (the pre-merge table — roll back), restore
    it. Without this, the next merge would treat the table as absent and
    silently rebuild it from updates only, dropping all survivor rows."""
    old = target_path.rstrip("/") + ".old"
    staging = target_path.rstrip("/") + ".staging"
    if os.path.exists(target_path):
        if _is_complete(target_path):
            return
        # a live dir with no _SUCCESS is only provably TORN when a
        # .staging/.old twin exists — that pair is this module's own
        # crash signature (a write killed mid-commit / mid-swap).
        # Restore the complete twin if one exists, refuse loudly if a
        # twin exists but is itself incomplete. A markerless dir with
        # NO twin is legitimate external data (parquet copied/produced
        # by tools that drop _SUCCESS — rsync, DuckDB, committers with
        # mapreduce.fileoutputcommitter.marksuccessfuljobs=false) and
        # must stay mergeable (ADVICE r12: the r12 blanket refusal
        # permanently bricked such tables).
        if _is_complete(staging) or _is_complete(old):
            shutil.rmtree(target_path)
        elif os.path.exists(staging) and not os.path.exists(old):
            # markerless EXTERNAL target + incomplete .staging, no .old
            # (ADVICE r13): the state a kill leaves when the FIRST merge
            # over an external table dies mid-staging-write. It is
            # provably not a torn swap — module-internal staging crashes
            # always leave the target WITH _SUCCESS (the target is only
            # ever (re)created by a completed swap), and _swap_in cannot
            # have run without leaving .old while the target exists. The
            # staging dir holds a disposable partial merge; drop it and
            # keep serving the external table.
            shutil.rmtree(staging)
            return
        elif os.path.exists(old):
            raise RuntimeError(
                f"merge target {target_path!r} carries no _SUCCESS marker "
                "and an incomplete .old twin exists — a swap was "
                "interrupted and no complete copy survives; "
                "inspect/restore manually"
            )
        else:
            return  # markerless but twin-free: external table, trust it
    if _is_complete(staging):
        os.rename(staging, target_path)
        if os.path.exists(old):
            shutil.rmtree(old)
    elif _is_complete(old):
        os.rename(old, target_path)
    elif os.path.exists(old) or os.path.exists(staging):
        raise RuntimeError(
            f"merge target {target_path!r} is missing and neither "
            f"{staging!r} nor {old!r} holds a complete copy — refusing to "
            "treat the table as empty; inspect/restore manually"
        )


def _reject_null_keys(updates: DataFrame, key_cols: list[str], op: str) -> None:
    """Fail fast on NULL business keys: every join this module builds
    (left_anti replacement, semi/anti SCD2 splits) uses null-rejecting
    equality, so a NULL-key update can never match — it would append a
    duplicate on every re-delivery instead of replacing. One limit(1)
    probe per sink call (the sink already runs write jobs)."""
    null_pred = None
    for c in key_cols:
        p = F.col(c).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    if updates.filter(null_pred).limit(1).count() > 0:
        raise ValueError(
            f"{op}: NULL values in key columns {key_cols} — keyed merge "
            "semantics cannot match NULL keys; filter or surrogate them first"
        )


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Upsert `updates` into the parquet table at target_path by key:
    rows with matching keys are replaced, new keys appended.

    Implementation: target ⟕anti updates (keep unmatched target rows) ∪
    updates, written to a staging dir then swapped in — the atomic-rename
    pattern. At scale the anti-join is a shuffle on the key; with Delta or
    Iceberg on the classpath this function would delegate to MERGE INTO
    (same call signature, swap-in point documented here).

    Updates must be unique per key (enforced with dropDuplicates).
    NULL keys are REJECTED: the anti-join that makes replacement work
    never matches NULL = NULL, so a NULL-key update would APPEND on
    every re-delivery — the exact duplicate-growth bug this sink exists
    to fix (r5 third review, verified live).

    Pre-existing targets: a dir WITHOUT a _SUCCESS marker is accepted
    as the live table as long as no .staging/.old twin exists (external
    writers legitimately drop the marker); a markerless dir WITH an
    incomplete twin is a provable torn swap and raises. Same rule for
    scd2_apply (shared `_recover`).
    """
    _recover(target_path)
    _reject_null_keys(updates, key_cols, "merge_upsert")
    updates = updates.dropDuplicates(key_cols)
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path)
        survivors = target.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = survivors.unionByName(updates)
    else:
        merged = updates

    staging = target_path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    _swap_in(staging, target_path)
    return spark.read.parquet(target_path)


def scd2_apply(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """SCD2: close out current versions of changed keys (valid_to = new
    row's ts) and append the new versions as current (valid_to = NULL).

    Pure DataFrame composition: one anti/semi split + union; no driver
    loops. Target schema gains (valid_from, valid_to). NULL keys are
    rejected (see merge_upsert — the anti/semi splits would never close
    a NULL-key current row and would append a new one each run). A batch
    carrying several versions of one key keeps the LATEST by ``ts_col``
    (same-ts versions tie-break arbitrarily — give versions distinct
    event times)."""
    from pyspark.sql.window import Window

    _recover(target_path)
    _reject_null_keys(updates, key_cols, "scd2_apply")
    latest = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    upd = (
        updates.withColumn("_rn", F.row_number().over(latest))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    ).withColumn(
        "valid_from", F.col(ts_col)
    ).withColumn(
        # match the caller's event-time type exactly: a hardcoded
        # cast("timestamp") would mix LTZ NULLs into an NTZ history and
        # shift wall-times under non-UTC sessions (r5 TZ probe)
        "valid_to", F.lit(None).cast(updates.schema[ts_col].dataType)
    )

    if not os.path.exists(target_path):
        # staging + swap even for the FIRST write (review r12): a direct
        # write killed mid-commit would leave a torn dir that a later
        # run trusts as the live table
        staging = target_path.rstrip("/") + ".staging"
        upd.write.mode("overwrite").parquet(staging)
        _swap_in(staging, target_path)
        return spark.read.parquet(target_path)

    # persisted: the anti/semi/closing splits below are three lineages
    # over the same target scan, and upd feeds four (review r12)
    target = spark.read.parquet(target_path).persist()
    upd = upd.persist()
    changed_keys = upd.select(*key_cols)
    untouched = target.join(changed_keys, key_cols, "left_anti")
    closing = (
        target.join(changed_keys, key_cols, "left_semi")
        .filter(F.col("valid_to").isNull())
        .drop("valid_to")
        .join(
            upd.select(*key_cols, F.col("valid_from").alias("_new_from")), key_cols
        )
        # out-of-order/redelivered batches fail LOUDLY (review r12): a
        # new ts at or before the open version's valid_from would write
        # a zero/negative-length interval and install stale history as
        # current — silent corruption of every as-of read. raise_error
        # rides the staging write (zero extra jobs, the cdc_apply rule).
        .withColumn(
            "valid_to",
            F.when(F.col("_new_from") > F.col("valid_from"), F.col("_new_from"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "scd2_apply: update ts is not after the open "
                            "version's valid_from for key(s) — out-of-order "
                            "or redelivered batch (got "
                        ),
                        F.col("_new_from").cast("string"),
                        F.lit(" vs open "),
                        F.col("valid_from").cast("string"),
                        F.lit("); apply batches in event-time order, once"),
                    )
                )
            ),
        )
        .drop("_new_from")
    )
    already_closed = (
        target.join(changed_keys, key_cols, "left_semi").filter(F.col("valid_to").isNotNull())
    )
    merged = untouched.unionByName(already_closed).unionByName(closing).unionByName(upd)

    staging = target_path.rstrip("/") + ".staging"
    try:
        merged.write.mode("overwrite").parquet(staging)
    finally:
        target.unpersist()
        upd.unpersist()
    _swap_in(staging, target_path)
    return spark.read.parquet(target_path)


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    validate: bool = True,
) -> DataFrame:
    """D9: apply a CDC op-log (I/U/D rows with a total per-key order
    ``seq_col``) to a base snapshot and return the FINAL STATE — the
    Debezium/binlog replay primitive the reference's at-least-once
    consumer loop needed (it crashed on re-delivered keys instead,
    /root/reference/dags/etl_dags.py:46-51).

    Semantics: per key, the change with the greatest ``seq_col`` wins;
    'D' removes the key, 'I'/'U' upsert the row's payload; keys without
    changes keep their base row. Late/duplicate deliveries are absorbed
    by the same rule (idempotent replay — applying the log twice is a
    no-op because max-seq is stable).

    Plan: tag base rows as seq=-inf inserts, union with the log, ONE
    hash-shuffle window on the key (row_number by seq desc), keep rank 1
    that is not a delete. No driver-side state; scales like any window.
    Ties on (key, seq) break toward the CHANGE side then by op for
    determinism — but a log with duplicate seq per key is malformed;
    callers should guarantee uniqueness.

    ``changes`` must carry every ``base`` column plus ``op_col`` and
    ``seq_col``; NULL keys are rejected (never matchable, the
    merge_upsert rule).

    This is a pure TRANSFORM — it runs zero Spark jobs (ADVICE r6: the
    eager ``_reject_null_keys`` + ``limit(1).count()`` probes cost ~3
    extra full scans of base+log per apply at scale). The guards are
    folded into the one window pass as ``raise_error`` conditionals on
    the ``_op``/``_is_change`` projections, so a NULL key or an op
    outside {I,U,D} still fails loudly — at ACTION time, riding the
    shuffle the apply pays anyway. ``validate=False`` drops the guard
    expressions entirely for callers that already validated upstream.
    """
    from pyspark.sql.window import Window

    for c in [op_col, seq_col]:
        if c not in changes.columns:
            raise ValueError(f"cdc_apply: changes is missing column {c!r}")

    def _key_ok() -> Column:
        pred = None
        for kc in key_cols:
            p = F.col(kc).isNotNull()
            pred = p if pred is None else (pred & p)
        return pred

    def _guarded(value: Column, ok: Column, msg: str) -> Column:
        # NULL ok-predicate (e.g. NULL op under isin) falls to otherwise
        # and raises — exactly the rows the guard exists for.
        return F.when(ok, value).otherwise(F.raise_error(F.lit(msg)))

    # An op outside {I,U,D} (or NULL) would silently act as a delete:
    # NULL != 'D' is NULL, so the filter drops the winning row. A NULL
    # key can never match (merge_upsert rule) — and NULL-key BASE rows
    # (review r6) would share the single NULL window partition and the
    # row_number dedup would silently drop all but one.
    change_op: Column = F.col(op_col)
    base_tag: Column = F.lit(0)
    if validate:
        change_op = _guarded(
            change_op,
            _key_ok()
            & F.col(op_col).isin("I", "U", "D")
            & F.col(seq_col).isNotNull(),
            f"cdc_apply: NULL key in {key_cols}, {op_col!r} outside "
            "'I'/'U'/'D', or NULL "
            f"{seq_col!r} (a NULL seq has no position in the per-key "
            "order — it would silently out-rank or be out-ranked; "
            "NULL/unknown ops would silently drop their key; NULL keys "
            "can never match)",
        )
        base_tag = _guarded(
            base_tag,
            _key_ok(),
            f"cdc_apply(base): NULL values in key columns {key_cols} — "
            "keyed replay cannot match NULL keys; filter or surrogate "
            "them first",
        ).cast("int")
    payload_cols = [c for c in base.columns]
    b = base.select(
        *payload_cols,
        F.lit(None).cast(dict(changes.dtypes)[seq_col]).alias("_seq"),
        F.lit("I").alias("_op"),
        base_tag.alias("_is_change"),
    )
    c = changes.select(
        *payload_cols,
        F.col(seq_col).alias("_seq"),
        change_op.alias("_op"),
        F.lit(1).alias("_is_change"),
    )
    # NULLS LAST would float base rows above changes under desc order in
    # some engines; make it explicit: order by (_seq desc nulls last,
    # _is_change desc) so any change outranks the base row and higher
    # seq outranks lower.
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_seq").desc_nulls_last(),
        F.col("_is_change").desc(),
        F.col("_op").asc(),
    )
    latest = (
        b.unionByName(c)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col("_op") != "D")
    )
    return latest.select(*payload_cols)
