"""MERGE / upsert emulation over parquet (SURVEY.md §2.1 S4 semantics,
pyspark_guide 'CDC / SCD2' pattern): without a transactional table format
(Delta/Iceberg jars absent in v1), upsert = anti-join + union + atomic
swap. This is the idempotent sink the reference's keyed INSERT wanted to
be (/root/reference/dags/etl_dags.py:37,47-49).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _swap_in(staging: str, target_path: str) -> None:
    """Crash-safe table swap: move the live table aside BEFORE renaming
    the staging dir in, so no instant exists where the data lives only in
    .staging (a kill between rmtree and rename would otherwise lose the
    table — the next merge would see no target and keep only updates)."""
    old = target_path.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(target_path):
        os.rename(target_path, old)
    os.rename(staging, target_path)
    if os.path.exists(old):
        shutil.rmtree(old)


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
    """
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
    loops. Target schema gains (valid_from, valid_to)."""
    upd = updates.dropDuplicates(key_cols).withColumn(
        "valid_from", F.col(ts_col)
    ).withColumn("valid_to", F.lit(None).cast("timestamp"))

    if not os.path.exists(target_path):
        upd.write.mode("overwrite").parquet(target_path)
        return spark.read.parquet(target_path)

    target = spark.read.parquet(target_path)
    changed_keys = upd.select(*key_cols)
    untouched = target.join(changed_keys, key_cols, "left_anti")
    closing = (
        target.join(changed_keys, key_cols, "left_semi")
        .filter(F.col("valid_to").isNull())
        .drop("valid_to")
        .join(
            upd.select(*key_cols, F.col("valid_from").alias("_new_from")), key_cols
        )
        .withColumn("valid_to", F.col("_new_from"))
        .drop("_new_from")
    )
    already_closed = (
        target.join(changed_keys, key_cols, "left_semi").filter(F.col("valid_to").isNotNull())
    )
    merged = untouched.unionByName(already_closed).unionByName(closing).unionByName(upd)

    staging = target_path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    _swap_in(staging, target_path)
    return spark.read.parquet(target_path)
