"""Persisted MinHash band index → INCREMENTAL corpus dedup (VERDICT r6
#1): deduplicate each NEW batch (crawl snapshot) against the existing
corpus WITHOUT recomputing the corpus — the one shape a 100 TB training
pipeline actually runs. ``minhash_near_dup_pairs`` is corpus-vs-itself;
this module persists the banded signatures it already computes
(`banded_minhash_signatures`, one row per (doc, band)) as a partitioned
parquet index, then answers "which docs in this batch near-duplicate
anything already indexed (or each other)?" with one equi-join.

Index layout at ``path``:
  * data rows, ``partitionBy("band_idx", "_bgroup")`` parquet:
      (_id, _sig array<long>[, payload cols...], band_hash long,
      _batch string, band_idx, _bgroup)
    where ``payload cols`` are optional creation-pinned per-doc
    attribute columns (r15 — served by ``pairs_vs_batch(where=...)``
    as pushed scan predicates) and ``_bgroup = pmod(band_hash,
    bgroups)`` (r10,
    VERDICT r9 #2). The second partition level exists for DELETE
    locality: every doc lands in ALL band_idx partitions 0..bands-1,
    so band_idx alone localizes nothing — a retraction under the flat
    layout rewrote the whole index (~1.1 TB per weekly GDPR batch at
    10⁹ docs). With ``bgroups`` hash sub-partitions per band, a delete
    rewrites only the ``band_idx=*/_bgroup=*`` directories its ids
    hash into (≤ bands × |distinct groups hit|). Pairs queries ignore
    the column (the band equi-join keys are unchanged). Pre-r10
    indexes (no ``bgroups`` in meta) keep the flat layout — appends
    follow the index's pinned layout, deletes fall back to the full
    rewrite, and the migration is a rebuild into a fresh path.
    The full 32-long signature is stored per band row ON PURPOSE — the
    verify stage needs both sides' signatures, and re-attaching them
    after an ids-only join was measured 5.7x slower at 1M docs
    (functions/dedup.py join note). Index size ≈ bands × (8B id +
    num_hashes×8B sig + 8B hash) per doc ≈ 1.1 KB/doc at 4×32 — ~1.1 TB
    per billion docs, a flat parquet table any executor count can scan.
  * ``_graft_meta/`` — one JSON row pinning (num_hashes, bands,
    shingle_n, seed) + ``bgroups`` (r10, layout — pinned at creation
    like the table tier's bucket count) + ``payload_cols`` (r15, the
    attribute schema — every append must carry it). Appends with
    different LSH
    params are REJECTED loudly: signatures hashed under different
    seeds never collide, so a silent mismatch wouldn't fail — it would
    just find nothing.
  * ``_graft_batches/`` — one JSON row per appended batch_id. A
    duplicate batch_id is REJECTED (the keyed-merge redelivery lesson:
    anti-join-style "it'll dedup out" reasoning silently doubles every
    bucket; re-delivery must be explicit).
  * ``_graft_counts/`` — per-batch (band_idx, band_hash, _batch, cnt)
    parquet, appended with each batch: the PERSISTED skew-guard state
    (VERDICT r7 #1 / ADVICE r7). Bucket totals come from summing this
    sidecar (~16 B per distinct bucket) instead of re-running a count
    window over the full index per query — the guard scan shrinks ~70×
    (counts bytes vs 1.1 KB/doc index bytes) and never shuffles index
    rows.
  All subdirs start with ``_`` so Spark's parquet listing of ``path``
  ignores them.

Scale notes (SCALING.md "incremental dedup"):
  * Per-batch candidate work is BATCH-proportional (VERDICT r7 #1):
    the query pre-filters the index scan to ``_batch == batch_id``
    (pushed to parquet) and joins that batch side against the index on
    (band_idx, band_hash) — candidate mass is O(batch_bucket_rows ×
    index_bucket_rows) in only the buckets the batch touches. The
    previous form self-joined full×full with the batch membership as a
    non-pushable disjunction, re-enumerating the whole corpus's
    per-bucket m² candidates every batch.
  * The path form's batch-vs-index join shuffles index+batch rows on
    (band_idx, band_hash). The cluster-scale upgrade is the BUCKETED
    TABLE tier below (``minhash_table_*``, r8): index + counts sidecar
    bucketed on exactly the join keys → guard agg, semi-join and band
    join all plan with ZERO Exchange (plan-pinned); the path form stays
    for storage-agnostic use.
  * Skew guard semantics under append: bucket sizes are evaluated over
    the CURRENT index (the summed counts sidecar), so a bucket that
    crosses ``max_bucket_size`` stops producing pairs for later batches
    but earlier batches' pairs were already emitted — incremental
    recall is ≥ a from-scratch run's (which would drop the whole
    bucket). Never worse, by construction.
  * Maintenance: appends create one file-set per batch — run
    ``sources/layout.compact_small_files`` on ``path`` periodically
    (it discovers the nested ``band_idx=*/_bgroup=*`` layout);
    ``minhash_index_delete`` retracts documents — LOCALIZED on the
    r10 layout (only the directories the ids hash into are rewritten;
    guard counts updated sidecar-proportionally, batch markers
    preserved so redelivery stays rejected), full rewrite + atomic
    swap on a pre-r10 flat index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.util import tiny_rows_df

from etl_apache_kafka_python_doker_aws_spark.functions.dedup import (
    banded_minhash_signatures,
    estimate_jaccard_pairs,
)

_META_DIR = "_graft_meta"
_BATCH_DIR = "_graft_batches"
_COUNTS_DIR = "_graft_counts"
_PARAMS = ("num_hashes", "bands", "shingle_n", "seed")

#: Column names the band-index machinery owns — a payload column
#: shadowing one would silently corrupt the layout or the guard
#: (r15, the ann_index _RESERVED_COLS rule on the band tier).
_RESERVED_BAND_COLS = frozenset(
    {"_id", "_sig", "band_idx", "band_hash", "_batch", "_bgroup", "cnt",
     "del_seq"}
)


def _check_payload_request(df: DataFrame, payload_cols: list, who: str,
                           reserved: frozenset = _RESERVED_BAND_COLS) -> None:
    """Creation-time payload schema validation (r15): reserved-name
    shadowing, duplicates, and absence from the batch frame are all
    caller bugs — reject loudly before anything is written.
    ``reserved`` lets other tiers (exact_index) pass their own
    index-owned column set."""
    bad = [c for c in payload_cols if c in reserved]
    if bad:
        raise ValueError(
            f"{who}: payload column(s) {bad} shadow index-owned columns; "
            f"reserved names: {sorted(reserved)}"
        )
    if len(set(payload_cols)) != len(payload_cols):
        raise ValueError(f"{who}: duplicate payload column names {payload_cols}")
    missing = [c for c in payload_cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"{who}: payload column(s) {missing} not in the input frame "
            f"(columns: {df.columns})"
        )


def _pinned_payloads(
    df: DataFrame, meta: dict | None, payload_cols, who: str,
    reserved: frozenset = _RESERVED_BAND_COLS,
) -> list[str]:
    """Resolve the effective payload column list for an append (r15):
    the index's pinned schema wins once it exists — a conflicting
    explicit request is a caller bug, and every later batch must carry
    the pinned columns (a silent NULL payload would corrupt ``where=``
    filtering downstream, the ann_index_append rule)."""
    if meta is None:
        req = list(payload_cols or [])
        _check_payload_request(df, req, who, reserved)
        return req
    pinned = list(meta.get("payload_cols") or [])
    if payload_cols is not None and list(payload_cols) != pinned:
        raise ValueError(
            f"{who}: index pins payload_cols={pinned}, append requested "
            f"{list(payload_cols)} — the payload schema is a creation-time "
            "layout property; rebuild to change it"
        )
    missing = [c for c in pinned if c not in df.columns]
    if missing:
        raise ValueError(
            f"{who}: index pins payload column(s) {pinned} but the batch "
            f"lacks {missing} — every append must carry the creation-time "
            "payload schema"
        )
    return pinned


def _require_local_path(path: str, who: str) -> None:
    """Index DELETES stage + swap through os.rename/shutil (local-FS
    semantics); on an hdfs://... or s3a://... index the Spark staging
    write would succeed REMOTELY while the local empty-check finds
    nothing and falsely raises 'would EMPTY the index', stranding
    remote staging garbage (ADVICE r8). Fail fast with the real reason
    instead. Reads/appends/searches work on any Hadoop filesystem."""
    from urllib.parse import urlparse

    scheme = urlparse(path).scheme
    if scheme not in ("", "file"):
        raise ValueError(
            f"{who}: delete is local-filesystem-only (the staging swap "
            f"uses os.rename); got scheme {scheme!r} for {path} — run the "
            "delete where the index is locally mounted, or rebuild the "
            "index minus the retracted ids"
        )


def _retraction_forms(full: DataFrame, ids, who: str):
    """Normalize a delete request (Python list or DataFrame whose FIRST
    column holds the ids) into ``(hit, drop, gone)`` with ONE NULL
    semantics across every delete path (review r10 — the four
    copy-pasted blocks had drifted: the list form's ``~isin`` silently
    erased NULL-id index rows it was never asked to delete, while the
    DataFrame form kept them):

    * a NULL in the REQUEST is rejected loudly — anti-joins and In
      predicates never match NULL, so the request would silently no-op
      (the r5 keyed-merge lesson);
    * a NULL-``_id`` INDEX row is never deleted — it matches no
      requested id under either input form.

    ``hit`` = the full frame filtered to requested rows; ``drop`` maps
    any frame to its survivors; ``gone`` is the distinct-id DataFrame
    (None for the list form — list callers keep the pushed-In shape)."""
    spark = full.sparkSession
    if isinstance(ids, DataFrame):
        key = ids.columns[0]
        gone = ids.select(F.col(key).alias("_id")).distinct()
        if gone.filter(F.col("_id").isNull()).count():
            raise ValueError(
                f"{who}: delete ids contain NULL — an anti-join never "
                "matches NULL, so the request would silently delete "
                "nothing for it; drop the NULL from the request"
            )
        hit = full.join(gone, "_id", "left_semi")
        drop = lambda df: df.join(gone, "_id", "left_anti")  # noqa: E731
        return hit, drop, gone
    ids = list(ids)
    if any(i is None for i in ids):
        raise ValueError(
            f"{who}: delete ids contain None — an In predicate never "
            "matches NULL, so the request would silently delete nothing "
            "for it; drop the None from the request"
        )
    hit = full.filter(F.col("_id").isin(ids))
    drop = lambda df: df.filter(  # noqa: E731
        ~F.col("_id").isin(ids) | F.col("_id").isNull()
    )
    return hit, drop, None


def minhash_index_meta(spark: SparkSession, path: str) -> dict | None:
    """Read the index's pinned LSH parameters, or None if no index
    exists at ``path`` yet. ``bgroups`` (r10, the delete-locality
    sub-partition count) is None for a pre-r10 flat-layout index —
    appends follow the pinned layout and deletes fall back to the
    full rewrite on those."""
    from etl_apache_kafka_python_doker_aws_spark.util import sidecar_json_rows

    # driver-side FS read (r15, util.sidecar_json_rows): one tiny JSON
    # row — the spark.read.json form paid two Spark jobs per call
    try:
        rows = sidecar_json_rows(spark, f"{path}/{_META_DIR}")
    except Exception:
        return None
    row = rows[0] if rows else None
    if row is None:
        return None
    meta = {k: int(row[k]) for k in _PARAMS}
    meta["bgroups"] = (
        int(row.bgroups)
        if "bgroups" in row.__fields__ and row.bgroups is not None
        else None
    )
    # pre-r15 indexes (and payload-less creates) read as [] — every
    # consumer treats [] as "no payload machinery"
    meta["payload_cols"] = (
        list(row.payload_cols)
        if "payload_cols" in row.__fields__ and row.payload_cols
        else []
    )
    return meta


def _recover_partition_dirs(root: str) -> None:
    """Heal a localized delete killed mid-swap (r9): ``_dir_swap``
    renames live partition dir → ``<dir>.old`` then staged → live; a
    kill between the renames leaves only the .old copy — restore it
    (the delete is then simply incomplete and re-runnable). A leftover
    .old NEXT TO a live dir means the swap completed but cleanup
    didn't — drop it."""
    import glob
    import os
    import shutil

    if not os.path.isdir(root):
        return
    for old in glob.glob(os.path.join(root, "**", "*=*.old"), recursive=True):
        live = old[: -len(".old")]
        if os.path.exists(live):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, live)


def _dir_swap(root: str, part_col: str, values: list, write_staging) -> None:
    """Localized partition-directory rewrite (r9, VERDICT r8 #7): write
    the survivors of the AFFECTED partitions to a staging dir (hive
    layout), then swap each affected ``<part_col>=<v>`` directory in
    with paired renames — untouched partition directories are never
    read or written (their files stay byte-identical; mtime-pinned in
    tests). A partition whose survivors are empty simply has its live
    dir removed (partition discovery skips missing dirs). Staging lives
    NEXT TO root (``.delstage``), distinct from the whole-dir
    ``.staging`` machinery so plans/merge._recover never mistakes it
    for a complete table copy. ``values`` may include nested partition
    paths (e.g. ``band_idx=0/_bgroup=3``) — pass them as rendered
    RELATIVE dir strings; plain scalars are rendered ``col=value``."""
    import os
    import shutil

    staging = root.rstrip("/") + ".delstage"
    shutil.rmtree(staging, ignore_errors=True)
    write_staging(staging)
    try:
        for v in values:
            rel = v if isinstance(v, str) and "=" in str(v) else f"{part_col}={v}"
            live = os.path.join(root, rel)
            new = os.path.join(staging, rel)
            old = live + ".old"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(live):
                os.rename(live, old)
            if os.path.exists(new):
                os.makedirs(os.path.dirname(live), exist_ok=True)
                os.rename(new, live)
            shutil.rmtree(old, ignore_errors=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def _marker_rows(spark: SparkSession, source) -> list:
    """Raw batch-marker rows in append order (empty for a fresh index).
    ``source`` is a marker-dir path or a pre-read DataFrame. One tiny
    JSON/table row per batch — metadata-cheap at any index size. Marker
    fields: batch_id, seq, and (r9) ``counted`` — written True AFTER
    the counts sidecar, so a marked batch with counted=True provably
    has its guard counts on disk (markers are written LAST).

    Absence (fresh index) is an explicit existence check; a READ error
    on an existing marker dir propagates (review r12 — swallowing it
    as "no batches" would strip every row's seq, so tombstone
    retraction anti-joins nothing and pairs queries see zero marked
    batches: correctness, not availability)."""
    from etl_apache_kafka_python_doker_aws_spark.util import sidecar_json_rows

    if isinstance(source, DataFrame):
        rows = source.collect()
    else:
        # driver-side FS read (r15): no Spark job per marker read
        fs_rows = sidecar_json_rows(spark, source)
        if fs_rows is None:
            return []
        rows = fs_rows
    return sorted(rows, key=lambda r: r.seq)


def _counts_complete(rows: list) -> bool:
    """True when every marked batch carries the r9 ``counted=True``
    flag — the guard sidecar is then provably complete as a TRUE
    metadata read (no distinct-scan of the sidecar needed). Pre-r9
    markers lack the field → the caller falls back to the scan check."""
    return bool(rows) and all(
        "counted" in r.__fields__ and bool(r.counted) for r in rows
    )


def minhash_index_batches(spark: SparkSession, path: str) -> list[str]:
    """Batch ids already appended, in append order (empty for a fresh
    path). One tiny JSON row per batch — listing this is metadata-cheap
    regardless of index size."""
    return [r.batch_id for r in _marker_rows(spark, f"{path}/{_BATCH_DIR}")]


def minhash_index_append(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    *,
    batch_id: str,
    num_hashes: int = 32,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    bgroups: int | None = 16,
    payload_cols: list[str] | None = None,
) -> None:
    """Sign ``df`` and APPEND its band rows to the index at ``path``
    (creating the index, and pinning the LSH params, on first use).

    ``payload_cols`` (r15, the ann_index payload rule on the band
    tier): caller-named per-doc ATTRIBUTE columns (lang, license,
    source, doc ids — keep them SLIM) stored on every band row and
    pinned in meta at CREATION. Later appends must carry the pinned
    columns (absence fails loudly — a silent NULL payload would
    corrupt ``where=`` filtering); a conflicting explicit list is
    rejected. ``minhash_index_pairs_vs_batch(where=...)`` then filters
    on stored attributes as a PUSHED parquet predicate — zero
    caller-side allowed frames at any selectivity. Payload values ride
    the zero-shuffle signature projection (``carry_cols``), are
    replicated per band row (bands× the attribute bytes — the price of
    scan-time filtering), and survive delete/compact/relayout
    unchanged (whole-row rewrites).

    ``bgroups`` (r10) pins the delete-locality sub-partition count at
    CREATION — like the table tier's bucket count, it is a LAYOUT
    property: appends into an existing index follow its pinned value
    (the argument is ignored then; mixing layouts in one index would
    break partition discovery). ``bgroups=None`` creates the flat
    pre-r10 layout (deletes then rewrite the whole index). At 10⁹
    docs size it so each ``band_idx=*/_bgroup=*`` directory holds a
    few GB — a delete rewrites ≤ bands × groups-hit directories.

    Sink helper — runs write jobs (four: data, guard counts, meta +
    batch markers). The batch's banded rows are persisted (memory+disk,
    batch-sized) across the data and counts writes so signatures are
    computed once. Raises ValueError on param drift or batch_id
    redelivery; callers that legitimately retry a failed append must
    remove the batch's files first. Crash windows (marker written
    LAST): a crash between the DATA write and the COUNTS write leaves
    band rows that join as candidates while contributing nothing to
    the bucket totals — those buckets under-guard until the partial
    batch is cleaned up; a crash after counts leaves data+counts
    consistent but unmarked. Either way the batch is unmarked —
    re-append under a NEW batch_id only after cleanup (document over
    guess).
    """
    spark = df.sparkSession
    meta = minhash_index_meta(spark, path)
    params = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "seed": seed,
    }
    if meta is not None and {k: meta[k] for k in _PARAMS} != params:
        raise ValueError(
            f"minhash_index_append: index at {path} was built with {meta}, "
            f"append requested {params} — signatures hashed under different "
            "params never collide; rebuild the index or match its params"
        )
    existing = minhash_index_batches(spark, path)
    if batch_id in existing:
        raise ValueError(
            f"minhash_index_append: batch_id {batch_id!r} already appended "
            f"to {path} — duplicate appends double every bucket silently; "
            "use a fresh batch_id per delivery"
        )
    # layout is creation-pinned: an existing index's bgroups wins
    g = meta["bgroups"] if meta is not None else bgroups
    pay = _pinned_payloads(df, meta, payload_cols, "minhash_index_append")
    if meta is None:
        row = dict(params)
        if g:
            row["bgroups"] = g
        if pay:
            # key written only when non-empty — minhash_index_meta reads
            # an absent field as [] (the payload-less layout)
            row["payload_cols"] = pay
        tiny_rows_df(spark, [row]).coalesce(1).write.mode("overwrite").json(
            f"{path}/{_META_DIR}"
        )
    # n_rows on the marker (r15): the resume contract's "same delivery"
    # evidence — one count job over the batch lineage, batch-sized
    n_in = df.count()
    banded = banded_minhash_signatures(
        df, id_col, text_col, num_hashes, bands, shingle_n, seed,
        carry_cols=tuple(pay),
    ).withColumn("_batch", F.lit(batch_id))
    part_cols = ["band_idx"]
    if g:
        banded = banded.withColumn(
            "_bgroup", F.pmod(F.col("band_hash"), F.lit(int(g))).cast("int")
        )
        part_cols.append("_bgroup")
        # repartition ON the partition columns so each directory is
        # written by exactly one task → ONE file per dir per append
        # (r10): a naive partitionBy write opens tasks × bands × bgroups
        # writers — measured 6,185 files after three appends at the
        # 1M-doc probe, and the per-batch pairs query paid it in listing
        # + footer reads (12.7 s vs 2.0 s on the flat layout). Hash
        # distribution keeps parallelism = min(shuffle.partitions,
        # bands × bgroups), which also holds on a cluster (size bgroups
        # so bands × bgroups ≳ shuffle parallelism there).
        banded = banded.repartition(F.col("band_idx"), F.col("_bgroup"))
    banded.persist()
    try:
        banded.write.mode("append").partitionBy(*part_cols).parquet(path)
        # every batch writes at least the zero-count sentinel row
        # (band_idx -1, matches no real bucket — ADVICE r8): a batch
        # with zero shingle-eligible docs would otherwise leave no
        # counts rows at all and permanently fail the completeness
        # check, forcing the full-index guard recompute forever
        banded.groupBy("band_idx", "band_hash").agg(
            F.count("*").alias("cnt")
        ).withColumn("_batch", F.lit(batch_id)).unionByName(
            tiny_rows_df(
                spark,
                [(-1, 0, 0, batch_id)],
                "band_idx int, band_hash long, cnt long, _batch string",
            )
        ).write.mode("append").parquet(f"{path}/{_COUNTS_DIR}")
    finally:
        banded.unpersist()
    # counted=True is only ever written AFTER the counts write above —
    # a marked batch with the flag provably has its guard counts.
    # Driver-side one-row FS append (r15, util.sidecar_json_append):
    # the Spark write job per marker was fixed scheduling tax
    from etl_apache_kafka_python_doker_aws_spark.util import sidecar_json_append

    sidecar_json_append(
        spark,
        f"{path}/{_BATCH_DIR}",
        {"batch_id": batch_id, "seq": len(existing), "counted": True,
         "n_rows": n_in},
        name_hint="marker",
    )


def minhash_index_pairs_vs_batch(
    spark: SparkSession,
    path: str,
    batch_id: str,
    *,
    threshold: float = 0.5,
    max_bucket_size: int = 200,
    allowed: DataFrame | None = None,
    where: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard) where AT LEAST
    ONE side belongs to ``batch_id`` — batch-vs-index candidates plus
    within-batch candidates, in ONE band equi-join over the persisted
    index (no signature recomputation for any previously indexed doc).
    ``allowed`` restricts BOTH pair sides to a caller-evaluated id set
    before the band join (per-filtered-corpus enumeration — semantics
    and cost documented on ``_pairs_for_batch``). ``where`` (r15) is
    the PREDICATE form: a SQL boolean expression over stored columns
    (append-time ``payload_cols``; ``_id`` is also legal), applied to
    both sides as a PUSHED parquet filter — the right form for broad
    attribute filters ("lang = 'en'"), where an ``allowed`` id frame
    would be corpus-sized and shuffle the index on ``_id``. Composes
    with ``allowed`` (AND).

    Across batches b0..bn this tiles the whole-corpus pair set exactly:
    every pair (x ∈ bi, y ∈ bj, i ≤ j) is emitted by the bj query and
    no other — so ⋃ pairs_vs_batch(bi) == minhash_near_dup_pairs(corpus)
    whenever the skew cap doesn't bind (the registered
    l2_incremental_dedup contract pins this union-losslessness on the
    fixture; under a binding cap the incremental union is a superset —
    see the module docstring).

    Plan shape (VERDICT r7 #1, pinned in tests/test_plans.py): the
    batch side is a ``_batch == batch_id`` filter PUSHED into its own
    parquet scan, then one equi-join against the full index on
    (band_idx, band_hash) with ``a._id != b._id``; pair ids are
    normalized to (least, greatest) and the within-batch double
    emission collapses in ``estimate_jaccard_pairs``'s dedup. Candidate
    mass is confined to buckets the batch touches — batch-proportional,
    not corpus-proportional. The skew guard reads the summed
    ``_graft_counts`` sidecar (no full-index count window); an index
    predating the sidecar falls back to one groupBy-count scan of the
    index (migration path, logged in the plan as an extra aggregate).
    Oversized buckets are excluded on the BATCH side only — an index
    row in a dropped bucket can only pair with batch rows of that same
    bucket, so the emitted pair set is identical to guarding both
    sides.
    """
    meta = minhash_index_meta(spark, path)
    if meta is None:
        raise ValueError(f"minhash_index_pairs_vs_batch: no index at {path}")
    markers = _marker_rows(spark, f"{path}/{_BATCH_DIR}")
    marked = [r.batch_id for r in markers]
    if batch_id not in marked:
        # an unmarked batch_id is either a typo or a crashed append
        # (data written, marker absent) — returning empty would read as
        # "no duplicates", silent data corruption downstream
        raise ValueError(
            f"minhash_index_pairs_vs_batch: batch_id {batch_id!r} is not a "
            f"MARKED batch of {path} (marked: {marked}) — a crashed append "
            "must be cleaned up and re-appended under a new batch_id"
        )
    # crash-window containment (VERDICT r8 #4): a crashed append leaves
    # band rows without counts/marker, which would join as UNDER-GUARDED
    # candidates — filter the index scan to marked batches (tiny pushed
    # In predicate) so leftovers are invisible until cleanup
    full = spark.read.parquet(path).filter(F.col("_batch").isin(marked))
    per_batch = None
    if _counts_complete(markers):
        # r9 markers: counted=True per batch ⇒ sidecar provably complete
        # — a TRUE metadata read (no distinct-scan of the sidecar)
        per_batch = spark.read.parquet(f"{path}/{_COUNTS_DIR}")
    else:
        try:
            counts = spark.read.parquet(f"{path}/{_COUNTS_DIR}")
            # pre-r9 markers lack the counted flag: one distinct-scan of
            # the (small) sidecar — missing counts for any MARKED batch
            # would silently UNDER-count bucket totals and re-open the
            # m² blowup; fall back to the one-scan recompute instead
            counted = {
                r._batch for r in counts.select("_batch").distinct().collect()
            }
            if set(marked) <= counted:
                per_batch = counts
        except Exception:
            per_batch = None
    if per_batch is not None:
        # counts rows from a crashed append (counts written, marker not)
        # would INFLATE bucket totals and spuriously drop buckets
        per_batch = per_batch.filter(F.col("_batch").isin(marked))
    return _pairs_for_batch(
        full, per_batch, batch_id, meta["num_hashes"], threshold,
        max_bucket_size, allowed, where,
    )


def _pairs_for_batch(
    full: DataFrame,
    per_batch: DataFrame | None,
    batch_id: str,
    num_hashes: int,
    threshold: float,
    max_bucket_size: int,
    allowed: DataFrame | None = None,
    where: str | None = None,
) -> DataFrame:
    """The shared batch-vs-index pair plan (path-backed and
    table-bucketed forms must never drift): guard whitelist from the
    summed counts (or the one-scan recompute when ``per_batch`` is
    None), batch-side filter, one band equi-join, (least, greatest)
    normalization, signature verify.

    ``allowed`` (r14, VERDICT r13 #3 — the filtered-ANN rule on the
    band tier): a DataFrame whose FIRST column holds the ids the pair
    query may touch ("near-duplicates among the licensed/English
    subset"). Applied as a PRE-filter semi-join on the index frame
    BEFORE the batch split and the band self-join, so BOTH pair sides
    are allowed and candidate enumeration is per-FILTERED-corpus — a
    post-filter of the unfiltered pairs would pay the full candidate
    m² first (the r8 blowup this module exists to avoid). A selective
    allowed set broadcasts under AQE (zero index shuffle); a broad one
    shuffles the index rows once on ``_id``. NULL ids match nothing
    (null-rejecting equality). The skew guard keeps reading the
    UNFILTERED counts sidecar — a conservative resource bound (filtered
    buckets are never bigger), so the bounded-candidate-mass contract
    is untouched.

    ``where`` (r15 — the predicate form): a stored-column SQL filter
    applied to the WHOLE frame before the batch split, so BOTH pair
    sides satisfy it and enumeration is per-filtered-corpus, exactly
    like ``allowed``. Being a deterministic expression over scan
    columns it PUSHES into the parquet reader (plan-pinned) — zero
    extra frames, joins, or shuffles at any selectivity. The skew
    guard stays on the UNFILTERED counts, same as ``allowed``."""
    if per_batch is None:
        # recompute from the UNFILTERED frame (below, before the allowed
        # semi-join narrows `full`): the guard statistic must not drift
        # between the sidecar path and this fallback (review r14 — a
        # filtered recompute would whitelist buckets the sidecar path
        # drops, flipping pair sets on sidecar presence)
        per_batch = full.groupBy("band_idx", "band_hash").agg(
            F.count("*").alias("cnt")
        )
    if where is not None:
        full = full.filter(where)
    if allowed is not None:
        akey = allowed.columns[0]
        full = full.join(
            allowed.select(F.col(akey).alias("_id")), "_id", "left_semi"
        )
    bucket_ok = (
        per_batch.groupBy("band_idx", "band_hash")
        .agg(F.sum("cnt").alias("_n"))
        .filter(F.col("_n") <= max_bucket_size)
        .select("band_idx", "band_hash")
    )
    batch = (
        full.filter(F.col("_batch") == batch_id)
        .join(bucket_ok, ["band_idx", "band_hash"], "left_semi")
        .alias("a")
    )
    cand = batch.join(
        full.alias("b"),
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a._id") != F.col("b._id")),
    ).select(
        F.least("a._id", "b._id").alias("id_a"),
        F.greatest("a._id", "b._id").alias("id_b"),
        F.col("a._sig").alias("sig_a"),
        F.col("b._sig").alias("sig_b"),
    )
    return estimate_jaccard_pairs(cand, num_hashes, threshold)



def _resume_skips_append(markers, batch_id: str, new_df: DataFrame,
                         who: str) -> bool:
    """Shared resume contract (r15 — the ann_index_dedup_batch rule on
    the band tier): True = the batch marker proves THIS delivery already
    appended (skip the append, re-run only the pairs side); False = no
    marker, append normally. A marker whose recorded ``n_rows`` differs
    from the input (or predates the field) raises — same batch_id with
    different payload is a redelivery bug, not a retry."""
    marked = next((r for r in markers if r.batch_id == batch_id), None)
    if marked is None:
        return False
    n_in = new_df.count()
    n_marked = (
        int(marked.n_rows)
        if "n_rows" in marked.__fields__ and marked.n_rows is not None
        else None
    )
    if n_marked != n_in:
        raise ValueError(
            f"{who}: resume of batch_id {batch_id!r} found a marker with "
            f"n_rows={n_marked} but the input has {n_in} rows — not the "
            "same delivery; use a fresh batch_id for new data"
        )
    return True


def minhash_index_dedup_batch(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    *,
    batch_id: str,
    threshold: float = 0.5,
    max_bucket_size: int = 200,
    where: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """Convenience production step: append the new batch to the index,
    then return its near-dup pairs vs everything indexed (itself
    included). Equivalent to ``minhash_index_append`` +
    ``minhash_index_pairs_vs_batch``; LSH params come from the index
    meta (a fresh path gets the defaults via an explicit append first).
    ``where`` (r15) passes to the pairs query — filter both pair sides
    by a stored-payload predicate; note the append itself is UNfiltered
    (the whole batch becomes searchable for later snapshots).

    ``resume`` (r15, the ann_index_dedup_batch retry contract): the
    append commits (marker written LAST) before the caller consumes the
    pairs, so a crash in between leaves a rerun hitting the
    duplicate-batch_id guard. ``resume=True`` on a retry of the SAME
    delivery skips the append when the batch marker's recorded
    ``n_rows`` matches this input and re-runs only the pairs query —
    identical pair set, since the index state is byte-identical to the
    first run's post-append state. A count mismatch (or a pre-r15
    marker without the field) raises; no marker at all means the crash
    hit MID-append — clean up the unmarked files first (the append
    contract above), then re-run.
    """
    spark = new_df.sparkSession
    meta = minhash_index_meta(spark, path)
    if meta is None:
        raise ValueError(
            f"minhash_index_dedup_batch: no index at {path} — create it "
            "with minhash_index_append (pinning the LSH params) first"
        )
    if not (resume and _resume_skips_append(
        _marker_rows(spark, f"{path}/{_BATCH_DIR}"), batch_id, new_df,
        "minhash_index_dedup_batch",
    )):
        minhash_index_append(
            new_df,
            id_col,
            text_col,
            path,
            batch_id=batch_id,
            **meta,
        )
    return minhash_index_pairs_vs_batch(
        spark, path, batch_id, threshold=threshold,
        max_bucket_size=max_bucket_size, where=where,
    )


# --- Bucketed-table tier (round 8): the SCALING.md upgrade, built ---
#
# The path-backed index above shuffles index+batch rows on
# (band_idx, band_hash) for every per-batch join. Writing the index as
# a BUCKETED TABLE on those keys makes the join co-located: both sides
# are bucketed scans with matching specs, so SortMergeJoin plans with
# ZERO Exchange — no index shuffle per crawl snapshot, the property
# that matters when the index is 10⁹ docs and the batch is 10⁵
# (plan-pinned in tests/test_plans.py). Sidecars become sibling tables
# (`<name>_meta` / `<name>_batches` / `<name>_counts`) so the whole
# index lives in the catalog.


def _table_exists(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)


def minhash_table_meta(spark: SparkSession, table: str) -> dict | None:
    """Pinned LSH params (+ bucket count) of a bucketed band index, or
    None if the index table doesn't exist yet."""
    if not _table_exists(spark, f"{table}_meta"):
        return None
    row = spark.table(f"{table}_meta").first()
    if row is None:
        return None
    meta = {k: int(row[k]) for k in _PARAMS + ("buckets",)}
    # pre-r15 meta tables lack the column — read as [] (see the path
    # tier's minhash_index_meta)
    meta["payload_cols"] = (
        list(row.payload_cols)
        if "payload_cols" in row.__fields__ and row.payload_cols
        else []
    )
    return meta


def _table_marker_rows(spark: SparkSession, table: str) -> list:
    if not _table_exists(spark, f"{table}_batches"):
        return []
    return _marker_rows(spark, spark.table(f"{table}_batches"))


def minhash_table_batches(spark: SparkSession, table: str) -> list[str]:
    return [r.batch_id for r in _table_marker_rows(spark, table)]


def minhash_table_append(
    df: DataFrame,
    id_col: str,
    text_col: str,
    table: str,
    *,
    batch_id: str,
    buckets: int = 64,
    num_hashes: int = 32,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    payload_cols: list[str] | None = None,
) -> None:
    """Sign ``df`` and APPEND its band rows to the bucketed index table
    (created, with params+buckets pinned in ``<table>_meta``, on first
    use). Same guards and write order as the path form: param/bucket
    drift and batch_id redelivery are rejected loudly; marker row
    written LAST. ``buckets`` sizes the (band_idx, band_hash) bucketing
    — at 10⁹ docs pick buckets so each holds a few hundred MB; it is
    pinned at creation because appends into a different bucket count
    would silently break join co-location. ``payload_cols`` (r15): same
    contract as the path tier (see ``minhash_index_append``) — pinned
    at creation, required of every append, served by
    ``minhash_table_pairs_vs_batch(where=...)`` as a scan predicate
    that keeps this tier's zero-Exchange property (unlike a broad
    ``allowed`` set, which shuffles on ``_id``)."""
    spark = df.sparkSession
    _table_swap_recover(spark, table)
    meta = minhash_table_meta(spark, table)
    params = {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "seed": seed,
        "buckets": buckets,
    }
    if meta is not None and {
        k: meta[k] for k in _PARAMS + ("buckets",)
    } != params:
        raise ValueError(
            f"minhash_table_append: index {table} was built with {meta}, "
            f"append requested {params} — rebuild or match its params"
        )
    existing = minhash_table_batches(spark, table)
    if batch_id in existing:
        raise ValueError(
            f"minhash_table_append: batch_id {batch_id!r} already appended "
            f"to {table} — use a fresh batch_id per delivery"
        )
    pay = _pinned_payloads(df, meta, payload_cols, "minhash_table_append")
    if meta is None:
        row = dict(params)
        if pay:
            row["payload_cols"] = pay
        tiny_rows_df(spark, [row]).coalesce(1).write.mode(
            "overwrite"
        ).saveAsTable(f"{table}_meta")
    n_in = df.count()
    banded = banded_minhash_signatures(
        df, id_col, text_col, num_hashes, bands, shingle_n, seed,
        carry_cols=tuple(pay),
    ).withColumn("_batch", F.lit(batch_id))
    banded.persist()
    try:
        banded.write.mode("append").bucketBy(
            buckets, "band_idx", "band_hash"
        ).format("parquet").saveAsTable(table)
        # counts bucketed on the SAME keys: the guard's sum-by-bucket
        # and its semi-join against the (equally bucketed) batch side
        # then also plan shuffle-free — the only Exchange left in the
        # whole pairs query is the tiny pair-dedup
        banded.groupBy("band_idx", "band_hash").agg(
            F.count("*").alias("cnt")
        ).withColumn("_batch", F.lit(batch_id)).unionByName(
            # zero-count sentinel (ADVICE r8) — see minhash_index_append
            tiny_rows_df(
                spark,
                [(-1, 0, 0, batch_id)],
                "band_idx int, band_hash long, cnt long, _batch string",
            )
        ).write.mode("append").bucketBy(
            buckets, "band_idx", "band_hash"
        ).format("parquet").saveAsTable(f"{table}_counts")
    finally:
        banded.unpersist()
    marker = {"batch_id": batch_id, "seq": len(existing), "counted": True,
              "n_rows": n_in}
    if _table_exists(spark, f"{table}_batches") and "n_rows" not in spark.table(
        f"{table}_batches"
    ).columns:
        # pre-r15 marker table: appending an extra column would fail the
        # saveAsTable schema match — keep the legacy shape (resume=True
        # then reports n_rows=None, the "not provable" path)
        marker.pop("n_rows")
    tiny_rows_df(spark, [marker]).write.mode("append").saveAsTable(
        f"{table}_batches"
    )


def minhash_table_pairs_vs_batch(
    spark: SparkSession,
    table: str,
    batch_id: str,
    *,
    threshold: float = 0.5,
    max_bucket_size: int = 200,
    allowed: DataFrame | None = None,
    where: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs for one batch vs the bucketed index — the
    same plan as ``minhash_index_pairs_vs_batch`` (shared
    ``_pairs_for_batch``, including the r14 ``allowed`` pre-filter —
    note a BROAD allowed set costs this tier its zero-Exchange property
    for the call: the semi-join shuffles on ``_id``, not the bucket
    keys; a selective set broadcasts and keeps it — and the r15
    ``where`` predicate on stored payload columns, which being a scan
    filter keeps zero-Exchange at ANY selectivity: the predicate form
    is strictly better than ``allowed`` here whenever a stored column
    encodes the filter) except the band equi-join is CO-LOCATED:
    both sides are bucketed scans of ``table`` on exactly the join
    keys, so SortMergeJoin plans with zero Exchange (pinned in
    tests/test_plans.py::test_bucketed_index_join_has_no_exchange).
    Per-batch cost = one bucketed scan + per-partition sorts; nothing
    shuffles, at any index size.

    MEASURED at 1M docs single-JVM (quiet, median of 3): bucketed pairs
    query 4.8 s vs 2.0 s for the path form — the bucketed scan caps
    parallelism at the bucket count and pays mandatory per-bucket
    sorts, while a local shuffle is nearly free. The zero-Exchange
    property is the CLUSTER trade (shuffling ~1.1 TB of index per
    snapshot at 10⁹ docs is the cost that matters); registered
    scale_form="bounded" accordingly — locally, prefer the path form."""
    _table_swap_recover(spark, table)
    meta = minhash_table_meta(spark, table)
    if meta is None:
        raise ValueError(f"minhash_table_pairs_vs_batch: no index table {table}")
    markers = _table_marker_rows(spark, table)
    marked = [r.batch_id for r in markers]
    if batch_id not in marked:
        raise ValueError(
            f"minhash_table_pairs_vs_batch: batch_id {batch_id!r} is not a "
            f"MARKED batch of {table} (marked: {marked}) — a crashed append "
            "must be cleaned up and re-appended under a new batch_id"
        )
    # same crash-window containment as the path form (VERDICT r8 #4);
    # pending tombstones (r11 retraction sidecar) are anti-joined out —
    # request-sized build side, the index itself never shuffles for it
    full = _apply_tombstones(
        spark.table(table).filter(F.col("_batch").isin(marked)),
        _tombstones(spark, table),
        markers,
    )
    per_batch = None
    if _counts_complete(markers):
        per_batch = spark.table(f"{table}_counts")
    elif _table_exists(spark, f"{table}_counts"):
        counts = spark.table(f"{table}_counts")
        counted = {r._batch for r in counts.select("_batch").distinct().collect()}
        if set(marked) <= counted:
            per_batch = counts
    if per_batch is not None:
        per_batch = per_batch.filter(F.col("_batch").isin(marked))
    return _pairs_for_batch(
        full, per_batch, batch_id, meta["num_hashes"], threshold,
        max_bucket_size, allowed, where,
    )


def drop_minhash_table(spark: SparkSession, table: str) -> None:
    """Drop a bucketed band index (data + meta/batches/counts sidecar
    tables) INCLUDING their warehouse locations. ``DROP TABLE IF
    EXISTS`` alone is not idempotent across sessions: a fresh session's
    in-memory catalog has never heard of the table, so the DROP no-ops
    while the warehouse directory persists, and the next ``saveAsTable``
    fails with LOCATION_ALREADY_EXISTS. Deleting the location through
    the Hadoop FS API makes rebuild-from-scratch runs (driver reruns,
    tests) idempotent on any filesystem.

    Default-database bare names only (review r8): Spark lowercases
    managed-table locations ({warehouse}/{lower(name)}) and nests
    qualified names under {db}.db/ — a naive concat would delete the
    wrong (or no) directory, leaving exactly the stale-location failure
    this function exists to prevent."""
    if "." in table:
        raise ValueError(
            f"drop_minhash_table: qualified name {table!r} not supported — "
            "its location lives under <db>.db/; pass the bare table name "
            "in the default database"
        )
    # the `_deleting` staging twins MUST go too (review r11): a twin
    # left by a compact killed mid-swap would otherwise be renamed back
    # into place by _table_swap_recover when a NEW index is later built
    # under the same name — resurrecting GDPR-purged rows
    # `_compacting` twins (ADVICE r11 #3): compact_bucketed_table's CTAS
    # staging — purge them too, or a crashed hygiene compaction strands
    # a twin the next build under a reused name trips over
    for t in (
        table,
        f"{table}_meta",
        f"{table}_batches",
        f"{table}_counts",
        f"{table}_tombstones",
        f"{table}_deleting",
        f"{table}_counts_deleting",
        f"{table}_compacting",
        f"{table}_counts_compacting",
    ):
        _drop_table_and_location(spark, t)


def _drop_table_and_location(spark: SparkSession, name: str) -> None:
    """DROP TABLE IF EXISTS *and* delete its default warehouse
    location: a fresh session's catalog has never heard of a table
    written by a crashed earlier session, so the DROP no-ops while the
    directory persists and the next ``saveAsTable`` fails with
    LOCATION_ALREADY_EXISTS (the r8 lesson, now shared by
    drop_minhash_table and the compact staging prep)."""
    sc = spark.sparkContext
    wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    p = sc._jvm.org.apache.hadoop.fs.Path(f"{wh}/{name.lower()}")
    fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
    if fs.exists(p):
        fs.delete(p, True)


def minhash_table_dedup_batch(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    table: str,
    *,
    batch_id: str,
    threshold: float = 0.5,
    max_bucket_size: int = 200,
    where: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """Bucketed-tier mirror of ``minhash_index_dedup_batch``: append the
    new batch (signed with the table's pinned params/buckets), then
    return its near-dup pairs vs everything indexed. Maintenance note:
    unlike the path form, do NOT run ``compact_small_files`` on a
    bucketed table's directory — bucket membership is encoded in the
    file names, and rewriting files outside ``bucketBy`` writes would
    silently break join co-location. Use
    ``sources/layout.compact_bucketed_table`` (r9), which rewrites
    through a CTAS staging table with the pinned bucket spec.
    ``where`` / ``resume`` (r15): same contracts as the path form."""
    spark = new_df.sparkSession
    meta = minhash_table_meta(spark, table)
    if meta is None:
        raise ValueError(
            f"minhash_table_dedup_batch: no index table {table} — create it "
            "with minhash_table_append (pinning params + buckets) first"
        )
    if not (resume and _resume_skips_append(
        _table_marker_rows(spark, table), batch_id, new_df,
        "minhash_table_dedup_batch",
    )):
        minhash_table_append(
            new_df,
            id_col,
            text_col,
            table,
            batch_id=batch_id,
            **meta,
        )
    return minhash_table_pairs_vs_batch(
        spark, table, batch_id, threshold=threshold,
        max_bucket_size=max_bucket_size, where=where,
    )


def _table_swap_recover(spark: SparkSession, table: str) -> bool:
    """Heal a ``minhash_table_compact`` killed mid-swap (ADVICE r10: the
    DROP→RENAME pairs are per-statement catalog-atomic, not atomic
    across the pair). Run by EVERY read/write entry point, so no append
    can interleave with a half-applied swap. The states are
    unambiguous because compact drops BOTH staging twins upfront and
    stages data before counts — so a ``_deleting`` twin next to a
    MISSING live table is a swap killed between its DROP and RENAME
    (rename the twin in), and a ``counts_deleting`` twin with NO
    ``{table}_deleting`` beside both live tables means the data swap
    COMPLETED and the counts swap never ran (review r11 — without this
    arm the next compact's nothing-to-rewrite early exit would strand
    the recomputed counts forever, and a batch appended meanwhile
    would land its counts in the stale table): complete the counts
    swap. A missing table with no twin is left alone (e.g. a
    half-finished first append — not this function's crash window).
    Returns True if anything was repaired.

    SINGLE-WRITER assumption (ADVICE r11 #1): recovery distinguishes
    crash states by table/twin PRESENCE, which is only unambiguous when
    no compact is running concurrently — a reader in another session
    that recovers mid-compact races the live writer's own swap (see
    ``minhash_table_compact``). One maintenance writer per index."""
    repaired = False
    data_was_missing = not _table_exists(spark, table)
    for n in (table, f"{table}_counts"):
        tmp = f"{n}_deleting"
        if not _table_exists(spark, n) and _table_exists(spark, tmp):
            spark.sql(f"ALTER TABLE {tmp} RENAME TO {n}")
            repaired = True
    if (repaired and data_was_missing) or (
        not data_was_missing
        and _table_exists(spark, table)
        and _table_exists(spark, f"{table}_counts")
        and not _table_exists(spark, f"{table}_deleting")
        and _table_exists(spark, f"{table}_counts_deleting")
    ):
        # either the data swap was just recovered above (counts swap
        # never started), or it completed on its own before the kill —
        # in both cases the staged counts pair with the CURRENT data
        tmp = f"{table}_counts_deleting"
        if _table_exists(spark, tmp):
            spark.sql(f"DROP TABLE IF EXISTS {table}_counts")
            spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}_counts")
            repaired = True
    return repaired


def _tombstones(spark: SparkSession, table: str) -> DataFrame | None:
    """The delete-request sidecar (``<table>_tombstones``: ``_id`` +
    ``del_seq``), or None when no delete is pending. Dropped whole by
    compaction — its absence is the common fast path."""
    if not _table_exists(spark, f"{table}_tombstones"):
        return None
    return spark.table(f"{table}_tombstones")


# Past this many batch markers the batch→seq translation switches from
# an inlined ``create_map`` literal to a broadcast join against the
# (metadata-sized) marker frame (r12, VERDICT r11 #4 / ADVICE r11 #2):
# a long-lived crawl table at 15-min snapshots accumulates ~35k markers
# a year, and a 70k-element literal map in every pairs plan is
# driver-side analysis/codegen bloat on the hot query path. Below the
# bound the literal map stays — zero extra plan nodes for the common
# hundreds-of-batches case.
_MARKER_MAP_MAX = 1_000


def _marker_seq_join(df: DataFrame, markers, how: str) -> DataFrame:
    """Attach each row's batch SEQUENCE by joining the metadata-sized
    marker frame (one tiny row per batch) — the ONE batch→seq
    translation both index tiers share (review r12: the band tier's
    >``_MARKER_MAP_MAX`` branch and the ANN tier's ``_with_seq`` were
    verbatim copies that could drift). ``how="left"`` keeps unmarked
    (crashed-append) rows with a NULL seq; ``how="inner"`` restricts to
    marked rows. The broadcast hint is structural: the build side is
    one row per batch marker, metadata-bounded at any corpus size."""
    mdf = tiny_rows_df(
        df.sparkSession,
        [(r.batch_id, int(r.seq)) for r in markers],
        "_mb string, _seq int",
    )
    return df.join(F.broadcast(mdf), df["_batch"] == mdf["_mb"], how).drop("_mb")


def _apply_tombstones(full: DataFrame, tomb: DataFrame | None, markers) -> DataFrame:
    """Filter a bucketed-index frame down to its LIVE rows: a row is
    dead iff some tombstone names its ``_id`` AND the row's batch was
    already marked when the delete ran (``seq < del_seq``) — so a
    RE-APPEND of a retracted id after the delete is a new observation
    and lives, while the retracted batches stay dead (an id-only
    tombstone would either resurrect GDPR-deleted rows on clearing or
    permanently kill re-ingested docs). The batch→seq translation is a
    literal map over the marker list while it is small, and a broadcast
    join against the one-row-per-batch marker frame past
    ``_MARKER_MAP_MAX`` (see above); the anti-join's tombstone side is
    delete-request-sized, so AQE broadcasts it — the index itself never
    shuffles for retraction."""
    if tomb is None:
        return full
    t = tomb.select(F.col("_id").alias("_t_id"), "del_seq")
    if len(markers) > _MARKER_MAP_MAX:
        with_seq = _marker_seq_join(full, markers, "left")
    else:
        pairs = []
        for r in markers:
            pairs += [F.lit(r.batch_id), F.lit(int(r.seq))]
        seq = (
            F.element_at(F.create_map(*pairs), F.col("_batch"))
            if pairs
            else F.lit(None).cast("int")
        )
        with_seq = full.withColumn("_seq", seq)
    return (
        with_seq.join(
            t,
            (F.col("_id") == F.col("_t_id")) & (F.col("_seq") < F.col("del_seq")),
            "left_anti",
        )
        .drop("_seq")
    )


def _tombstone_delete(
    spark: SparkSession,
    table: str,
    ids,
    *,
    who: str,
    drop_hint: str,
    markers: list,
    live: DataFrame,
    full: DataFrame,
    n_total_fn,
    compact_fn,
    compact_threshold: float,
) -> int:
    """Shared tombstone-retraction core for the catalog-table tiers
    (band ``minhash_table_delete`` and exact ``sha_table_delete`` —
    review r12: the two bodies were drifting clones, the exact failure
    mode ``_retraction_forms`` was factored out to prevent). ONE index
    scan computes both statistics (live rows + requested live rows);
    the EMPTY guard, seq-scoped del_seq, id-type-pinned sidecar write
    and threshold'd auto-compaction are identical across tiers.
    ``n_total_fn`` is only invoked when auto-compaction is possible
    (``compact_threshold`` ≤ 1) — a deferred-compaction delete pays no
    corpus-proportional accounting beyond the single stats scan."""
    if not isinstance(ids, DataFrame):
        ids = list(ids)  # one-shot-iterable lesson (ADVICE r10)
    hit, _, gone = _retraction_forms(live, ids, who)
    if gone is not None:
        marked_live = live.join(
            gone.withColumn("_dead", F.lit(1)), "_id", "left"
        )
    else:
        marked_live = live.withColumn(
            "_dead", F.when(F.col("_id").isin(ids), F.lit(1))
        )
    stats = marked_live.agg(
        F.count(F.lit(1)).alias("n_live"), F.count("_dead").alias("removed")
    ).first()
    n_live, removed = int(stats.n_live), int(stats.removed)
    if removed == 0:
        # nothing LIVE matches — ids unknown, already tombstoned, or
        # stranded in unmarked crash-append rows (compact sweeps those)
        return 0
    if n_live == removed:
        raise ValueError(
            f"{who}: deleting these ids would EMPTY the index table "
            f"{table} — drop it ({drop_hint}) instead"
        )
    del_seq = 1 + max((int(r.seq) for r in markers), default=-1)
    # pin the sidecar's _id to the INDEX's id type (second review r11):
    # the first delete's request form must not fix a schema a later,
    # differently-typed request fails to append under
    id_type = full.schema["_id"].dataType
    tomb_rows = (
        gone.select(F.col("_id").cast(id_type).alias("_id"))
        if gone is not None
        else tiny_rows_df(spark, [(i,) for i in ids], full.select("_id").schema)
    ).withColumn("del_seq", F.lit(del_seq))
    # coalesce(1): without it the Arrow local-relation frame appends one
    # file PER ID (measured: a 5-id delete wrote 5 files — 1000 GDPR
    # requests of 25 ids would leave 25k tiny files on every pairs
    # query's anti-join read path). One request-sized file per delete;
    # compaction drops the table whole.
    tomb_rows.coalesce(1).write.mode("append").format("parquet").saveAsTable(
        f"{table}_tombstones"
    )
    if compact_threshold <= 1:
        n_total = n_total_fn()
        dead = n_total - (n_live - removed)
        if n_total and dead / n_total > compact_threshold:
            compact_fn()
    return removed


def minhash_table_delete(
    spark: SparkSession, table: str, ids, *, compact_threshold: float = 0.2
) -> int:
    """Delete documents from the BUCKETED band index table — retraction
    for the zero-Exchange tier. ``ids`` is a Python list or a DataFrame
    whose FIRST column holds the ids.

    TOMBSTONE sidecar (r11, VERDICT r10 #2 — the r10 form CTAS-rewrote
    the whole table per delete): bucket membership lives in file NAMES,
    so there is nothing to localize on disk; instead each delete
    APPENDS its request to ``<table>_tombstones`` (``_id`` + the marker
    sequence at delete time) and every pairs query anti-joins the
    tombstones out (see ``_apply_tombstones`` — request-sized build
    side, no index shuffle). The WRITE side is therefore
    request-sized — data and counts tables stay byte-untouched
    (mtime-pinned in tests) — and the accounting is one columnar
    counting scan of the index plus a metadata-sized sidecar sum;
    measured at the 1M-doc probe: delete 3.7 s vs 13.0 s for the CTAS
    rewrite, pairs-query overhead of the anti-join ≈ 0 (SCALING.md
    r11). The CTAS rewrite is demoted to
    ``minhash_table_compact``, run automatically once dead rows exceed
    ``compact_threshold`` of the table (pass 0 to force, or a value
    > 1 to never auto-compact). Guard counts stay UNTOUCHED until
    compaction — they over-count dead rows, which can only make the
    skew guard drop a bucket early (the bounded-resource outcome the
    cap already allows), never re-open the m² blowup.

    Markers and meta are untouched: a fully-deleted batch still rejects
    redelivery. A re-appended id LIVES (its batch seq is past every
    tombstone) while its retracted history stays dead. Returns the
    number of live band rows retracted."""
    _table_swap_recover(spark, table)
    meta = minhash_table_meta(spark, table)
    if meta is None:
        raise ValueError(f"minhash_table_delete: no index table {table}")
    markers = _table_marker_rows(spark, table)
    # marked batches only: unmarked crash rows are invisible to pairs
    # (crash containment) and a seq-scoped tombstone can never kill
    # them — they must not count as "removed" or trip the EMPTY guard
    # (compaction sweeps them physically; review r11)
    full = spark.table(table).filter(
        F.col("_batch").isin([r.batch_id for r in markers])
    )
    live = _apply_tombstones(full, _tombstones(spark, table), markers)

    def n_total_fn():
        # dead-mass fraction from the METADATA-sized counts sidecar
        # when complete (tombstones never change the physical row
        # count); incomplete counts fall back to one real count
        if _counts_complete(markers):
            return (
                spark.table(f"{table}_counts")
                .filter(F.col("band_idx") >= 0)
                .filter(F.col("_batch").isin([r.batch_id for r in markers]))
                .agg(F.sum("cnt").alias("s"))
                .first()
                .s
                or 0
            )
        return full.count()

    return _tombstone_delete(
        spark,
        table,
        ids,
        who="minhash_table_delete",
        drop_hint="drop_minhash_table",
        markers=markers,
        live=live,
        full=full,
        n_total_fn=n_total_fn,
        compact_fn=lambda: minhash_table_compact(spark, table),
        compact_threshold=compact_threshold,
    )


def minhash_table_compact(spark: SparkSession, table: str) -> int:
    """Fold accumulated tombstones into the bucketed band index: one
    CTAS rewrite of data + recomputed guard counts with the PINNED
    bucket spec (repartition on the bucket columns so co-location —
    the tier's whole point — survives), zero-count sentinels re-seeded
    per marked batch, then the tombstone sidecar is dropped LAST — a
    crash before that drop leaves tombstones that re-kill already-gone
    rows (an anti-join no-op), so compaction is idempotent. The
    DROP→RENAME swap windows are healed by ``_table_swap_recover``
    (run here and by every read/write entry point). Also the PHYSICAL
    sweep for unmarked crash-append rows — those never get tombstones
    (invisible to pairs, unreachable by seq scoping), so compact
    rewrites whenever marked survivors differ from the physical table,
    tombstones pending or not. Returns the number of dead rows
    compacted away (0 when there is nothing to fold or sweep).

    SINGLE-WRITER assumption (ADVICE r11 #1): run one maintenance
    writer per index at a time. ``_table_swap_recover`` fires from
    every read/write entry point, and a READER in another session that
    lands between this compact's data swap and its counts swap will
    itself complete the counts swap — after which this compact's own
    counts DROP deletes the just-renamed table and the RENAME throws,
    leaving ``<table>_counts`` missing until a compact re-run. Fine
    under a single coordinating writer (the deployment shape for every
    swap-based maintenance op here); concurrent multi-session
    compaction needs an external lock."""
    _table_swap_recover(spark, table)
    meta = minhash_table_meta(spark, table)
    if meta is None:
        raise ValueError(f"minhash_table_compact: no index table {table}")
    tomb = _tombstones(spark, table)
    markers = _table_marker_rows(spark, table)
    full = spark.table(table)
    # survivors = tombstone-filtered MARKED rows: compaction also
    # physically sweeps unmarked crash-append garbage (review r11 —
    # those rows are invisible to pairs and unreachable by seq-scoped
    # tombstones, so without this sweep a GDPR id stranded in a crashed
    # append would sit in the warehouse forever). The sweep runs even
    # with NO tombstones pending (second review r11: a GDPR id whose
    # rows exist ONLY in an unmarked batch produces no tombstone —
    # delete returns 0 — so compact must be able to purge it alone).
    survivors = _apply_tombstones(
        full.filter(F.col("_batch").isin([r.batch_id for r in markers])),
        tomb,
        markers,
    )
    before = full.count()
    after = survivors.count()
    if after == 0:
        raise ValueError(
            f"minhash_table_compact: pending tombstones would EMPTY the "
            f"index table {table} — drop it (drop_minhash_table) instead"
        )
    if after == before:
        # nothing to rewrite (a compact killed between its two swaps
        # also lands here on re-run — but the entry-point
        # _table_swap_recover above already completed the stranded
        # counts swap for that case)
        if tomb is not None:
            spark.sql(f"DROP TABLE {table}_tombstones")
        return 0
    buckets = meta["buckets"]
    counts = (
        survivors.groupBy("band_idx", "band_hash", "_batch")
        .agg(F.count("*").alias("cnt"))
        .select("band_idx", "band_hash", "cnt", "_batch")
        .unionByName(
            tiny_rows_df(
                spark,
                [(-1, 0, 0, b) for b in minhash_table_batches(spark, table)],
                "band_idx int, band_hash long, cnt long, _batch string",
            )
        )
    )
    auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old_auto = spark.conf.get(auto_key)
    spark.conf.set(auto_key, "false")
    try:
        # stage BOTH rewrites before any swap: the counts CTAS reads the
        # ORIGINAL data table (survivors lineage), so dropping it first
        # would compute counts against a dead relation
        targets = ((table, survivors), (f"{table}_counts", counts))
        # clear BOTH staging twins BEFORE the first CTAS (second review
        # r11): dropping each twin lazily just before its own CTAS
        # leaves a reachable state where a STALE counts twin survives a
        # staging crash without its data twin — indistinguishable from
        # the data-swap-completed crash window _table_swap_recover
        # heals, so recovery would rename pre-crash counts over the
        # live table. With both drops upfront, a counts twin can only
        # exist alongside this attempt's data twin (staged) or after
        # the data swap consumed it (renamed away) — exactly the two
        # states recovery distinguishes. Location too: a CTAS killed
        # mid-write leaves files under {wh}/{tmp} with NO catalog
        # entry — a bare DROP no-ops and the retry bricks on
        # LOCATION_ALREADY_EXISTS (the r8 drop_minhash_table lesson).
        for name, _df in targets:
            _drop_table_and_location(spark, f"{name}_deleting")
        for name, df in targets:
            tmp = f"{name}_deleting"
            df.repartition(
                buckets, F.col("band_idx"), F.col("band_hash")
            ).write.bucketBy(buckets, "band_idx", "band_hash").format(
                "parquet"
            ).saveAsTable(tmp)
        # IF EXISTS (ADVICE r10): a retry after _table_swap_recover
        # healed a mid-swap kill must not fail on the bare DROP
        for name, _ in targets:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            spark.sql(f"ALTER TABLE {name}_deleting RENAME TO {name}")
    finally:
        spark.conf.set(auto_key, old_auto)
    if tomb is not None:
        spark.sql(f"DROP TABLE {table}_tombstones")
    return before - after


def minhash_index_delete(
    spark: SparkSession,
    path: str,
    ids,
    id_col_hint: str = "_id",
) -> int:
    """Delete documents from the path-backed band index — the
    right-to-be-forgotten / retraction op a long-lived crawl index
    needs. ``ids`` is a Python list (the GDPR shape: small, explicit)
    or a DataFrame whose FIRST column holds the ids (bulk retractions).

    LOCALIZED rewrite on an r10 layout (VERDICT r9 #2 — the flat
    layout rewrote the whole ~1.1 TB-per-10⁹-docs index on every
    weekly GDPR batch, because every doc lands in ALL band_idx
    partitions): one pushed-filter scan finds the affected
    ``band_idx=*/_bgroup=*`` directories (≤ bands × distinct
    band-hash groups the ids hash into); only those are rewritten and
    swapped — every untouched directory keeps its files byte-identical
    (mtime-pinned in tests/test_dedup_index.py). Guard counts are
    rewritten as a sidecar-proportional job (drop the affected
    buckets' rows, append recomputed survivor counts — the sidecar is
    ~70× smaller than the index); meta and batch markers are NOT
    touched, so a fully-deleted batch still rejects redelivery. Crash
    windows: per-directory swaps are healed by
    ``_recover_partition_dirs`` (re-run the delete to finish —
    idempotent); a crash after the data swaps but before the counts
    rewrite leaves the affected buckets OVER-counted, which can only
    make the skew guard drop them (the bounded-resource outcome the
    cap already allows), never re-open the m² blowup.

    A pre-r10 index (no ``bgroups`` in meta) falls back to the full
    staging rewrite + atomic swap of the whole index — migrate with
    ``minhash_index_relayout`` (a pure re-layout: signatures are
    stored, nothing retrains). Returns the
    number of band rows removed. Batch deletes together: cost scales
    with affected directories, and one call per id still pays a scan
    each."""
    _require_local_path(path, "minhash_index_delete")
    meta = minhash_index_meta(spark, path)
    if meta is None:
        raise ValueError(f"minhash_index_delete: no index at {path}")
    if meta["bgroups"]:
        return _minhash_delete_localized(spark, path, ids, meta)
    return _minhash_delete_full_rewrite(spark, path, ids)


def _minhash_delete_localized(
    spark: SparkSession, path: str, ids, meta: dict
) -> int:
    import os

    from etl_apache_kafka_python_doker_aws_spark.plans.merge import (
        _recover,
        _swap_in,
    )

    g = int(meta["bgroups"])
    _recover(path)  # heal a pre-r10 whole-dir delete killed mid-swap
    _recover_partition_dirs(path)
    full = spark.read.parquet(path)
    hit, drop, _ = _retraction_forms(full, ids, "minhash_index_delete")
    per_dir = (
        hit.groupBy("band_idx", "_bgroup").agg(F.count("*").alias("_n")).collect()
    )
    removed = sum(r._n for r in per_dir)
    if removed == 0:
        return 0
    by_band: dict[int, list[int]] = {}
    for r in per_dir:
        by_band.setdefault(int(r.band_idx), []).append(int(r._bgroup))
    # partition-pruning predicate over BOTH partition columns: only the
    # affected directories are read for the survivor rewrite
    from functools import reduce
    from operator import or_

    affected = reduce(
        or_,
        [
            (F.col("band_idx") == bi) & F.col("_bgroup").isin(sorted(gs))
            for bi, gs in sorted(by_band.items())
        ],
    )
    live_dirs = {
        (int(b.split("=", 1)[1]), int(sg.split("=", 1)[1]))
        for b in os.listdir(path)
        if b.startswith("band_idx=") and os.path.isdir(os.path.join(path, b))
        for sg in os.listdir(os.path.join(path, b))
        if sg.startswith("_bgroup=")
    }
    hit_dirs = {(bi, bg) for bi, gs in by_band.items() for bg in gs}
    keep = drop(full.filter(affected))
    rels = [
        f"band_idx={bi}/_bgroup={bg}"
        for bi, gs in sorted(by_band.items())
        for bg in sorted(gs)
    ]

    # r15 (guide §1.2 — don't compute things you throw away): the
    # would-EMPTY refusal needs keep.count() ONLY when every live dir is
    # affected (live_dirs == hit_dirs — the all-ids GDPR edge). The
    # common delete has untouched dirs, so the refusal can never fire
    # and the old unconditional count() re-ran the whole
    # affected-dir anti-join once per delete just to discard it. When
    # the check IS needed, it now counts the already-written staging
    # parquet (footer statistics, no data scan) and raises BEFORE the
    # swap — _dir_swap never runs its renames on a raise, so the live
    # index stays untouched exactly as before (refusal test unchanged).
    would_empty_possible = not (live_dirs - hit_dirs)

    def _write_staging(staging: str) -> None:
        keep.repartition(F.col("band_idx"), F.col("_bgroup")).write.partitionBy(
            "band_idx", "_bgroup"
        ).parquet(staging)
        if would_empty_possible:
            # ADVICE r15: the old ``try: count() except: n_kept = 0``
            # misreported ANY transient read failure on a NON-empty
            # staging dir as the would-EMPTY refusal, permanently
            # blocking a legitimate delete under that fault. Emptiness
            # is now an FS fact — an empty partitionBy write commits
            # only _SUCCESS, so "no visible file anywhere under
            # staging" ⇔ zero survivors — and real read errors have no
            # swallow site left.
            sc = spark.sparkContext
            jstaging = sc._jvm.org.apache.hadoop.fs.Path(staging)
            fs = jstaging.getFileSystem(sc._jsc.hadoopConfiguration())
            it = fs.listFiles(jstaging, True)  # recursive
            n_kept = 0
            while it.hasNext():
                if not it.next().getPath().getName().startswith(("_", ".")):
                    n_kept = 1
                    break
            if n_kept == 0:
                import shutil

                # drop the staging dir ourselves — _dir_swap only cleans
                # it after a write_staging that RETURNED
                shutil.rmtree(staging, ignore_errors=True)
                raise ValueError(
                    f"minhash_index_delete: deleting these ids would EMPTY "
                    f"the index at {path} — an empty parquet dir cannot be "
                    "read back; remove the index path instead (live index "
                    "left untouched)"
                )

    _dir_swap(path, "band_idx", rels, _write_staging)
    # counts sidecar: sidecar-proportional rewrite (70× smaller than the
    # index) — drop the affected buckets' rows, append recomputed
    # survivor counts; sentinels (band_idx −1) never match a real dir so
    # the NOT-affected filter keeps them
    counts_dir = f"{path}/{_COUNTS_DIR}"
    _recover(counts_dir)
    affected_counts = reduce(
        or_,
        [
            (F.col("band_idx") == bi)
            & F.pmod(F.col("band_hash"), F.lit(g)).cast("int").isin(sorted(gs))
            for bi, gs in sorted(by_band.items())
        ],
    )
    kept_counts = spark.read.parquet(counts_dir).filter(~affected_counts)
    new_counts = (
        spark.read.parquet(path)
        .filter(affected)
        .groupBy("band_idx", "band_hash", "_batch")
        .agg(F.count("*").alias("cnt"))
        .select("band_idx", "band_hash", "cnt", "_batch")
    )
    staging = counts_dir.rstrip("/") + ".staging"
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    kept_counts.unionByName(new_counts, allowMissingColumns=False).write.parquet(
        staging
    )
    _swap_in(staging, counts_dir)
    return removed


def minhash_index_relayout(
    spark: SparkSession,
    path: str,
    new_path: str,
    *,
    bgroups: int = 16,
) -> None:
    """Re-layout a band index into the r10 ``band_idx/_bgroup``
    partitioning at ``new_path`` — the MIGRATION path for pre-r10 flat
    indexes (whose deletes fall back to a full-index rewrite). Unlike
    ``ann_index_rebuild`` this never retrains anything: the index
    STORES the signatures, and ``_bgroup = pmod(band_hash, bgroups)``
    is derived from stored columns, so the move is one partitioned
    rewrite of the data rows plus verbatim copies of the counts
    sidecar (layout-independent: keyed on (band_idx, band_hash,
    _batch)) and the batch markers (redelivery stays rejected after
    the repoint). Meta is written LAST with the new ``bgroups`` — the
    blue/green rule: a half-finished relayout reads as "no index",
    the live index keeps serving until the caller repoints. Also the
    re-bgrouping path for an index whose group count no longer fits
    its scale."""
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        _fs_nonempty,
    )

    meta = minhash_index_meta(spark, path)
    if meta is None:
        raise ValueError(f"minhash_index_relayout: no index at {path}")
    if minhash_index_meta(spark, new_path) is not None:
        raise ValueError(
            f"minhash_index_relayout: {new_path} already holds an index — "
            "relayout targets a FRESH path (the live index keeps serving "
            "until the repoint)"
        )
    if _fs_nonempty(spark, new_path):
        # meta is written LAST, so meta-less leftovers = a crashed
        # relayout; every write below is mode("append") and a retry
        # onto leftovers would silently double band rows, counts AND
        # markers (review r10 — the ann_index_build retry rule)
        raise ValueError(
            f"minhash_index_relayout: {new_path} holds leftover files "
            "without index meta — a crashed relayout; remove the path "
            "and re-run (live index untouched)"
        )
    if not bgroups or int(bgroups) < 1:
        raise ValueError(f"minhash_index_relayout: bgroups {bgroups!r} must be >= 1")
    # heal SOURCE swap leftovers before reading (ADVICE r10): a
    # localized delete killed between _dir_swap's paired renames leaves
    # a `_bgroup=N.old` dir whose name contains '=' — Spark does NOT
    # hide it, so it would be discovered as a partition value and its
    # pre-delete rows (including GDPR-retracted ids) silently migrated.
    # Same healing every delete entry point runs.
    from etl_apache_kafka_python_doker_aws_spark.plans.merge import _recover

    _recover(path)
    _recover_partition_dirs(path)
    _recover(f"{path}/{_COUNTS_DIR}")
    g = int(bgroups)
    rows = spark.read.parquet(path).drop("_bgroup")
    rows.withColumn(
        "_bgroup", F.pmod(F.col("band_hash"), F.lit(g)).cast("int")
    ).repartition(F.col("band_idx"), F.col("_bgroup")).write.mode(
        "append"
    ).partitionBy("band_idx", "_bgroup").parquet(new_path)
    spark.read.parquet(f"{path}/{_COUNTS_DIR}").write.mode("append").parquet(
        f"{new_path}/{_COUNTS_DIR}"
    )
    spark.read.json(f"{path}/{_BATCH_DIR}").coalesce(1).write.mode(
        "append"
    ).json(f"{new_path}/{_BATCH_DIR}")
    row = {k: meta[k] for k in _PARAMS}
    row["bgroups"] = g
    if meta.get("payload_cols"):
        # payload schema is part of the index contract (r15) — the data
        # rows above carried the values verbatim, meta must keep the pin
        row["payload_cols"] = list(meta["payload_cols"])
    tiny_rows_df(spark, [row]).coalesce(1).write.mode("overwrite").json(
        f"{new_path}/{_META_DIR}"
    )


def _minhash_delete_full_rewrite(spark: SparkSession, path: str, ids) -> int:
    """Pre-r10 flat layout: full rewrite via staging + atomic swap
    (plans/merge machinery — a crash mid-delete leaves the original
    index readable): remaining band rows re-partitioned by band_idx,
    guard counts RECOMPUTED from the surviving rows per (band_idx,
    band_hash, _batch), meta/batch markers copied through, zero-count
    sentinels re-seeded per marked batch."""
    import shutil

    from etl_apache_kafka_python_doker_aws_spark.plans.merge import (
        _recover,
        _swap_in,
    )

    _recover(path)
    full = spark.read.parquet(path)
    _, drop, _ = _retraction_forms(full, ids, "minhash_index_delete")
    remaining = drop(full)
    before = full.count()
    staging = path.rstrip("/") + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    remaining.write.partitionBy("band_idx").parquet(staging)
    import glob
    import os

    if not glob.glob(os.path.join(staging, "**", "*.parquet"), recursive=True):
        shutil.rmtree(staging, ignore_errors=True)
        raise ValueError(
            f"minhash_index_delete: deleting these ids would EMPTY the "
            f"index at {path} — an empty parquet dir cannot be read back; "
            "remove the index path instead (live index left untouched)"
        )
    survivors = spark.read.parquet(staging)
    counts = survivors.groupBy("band_idx", "band_hash", "_batch").agg(
        F.count("*").alias("cnt")
    ).select("band_idx", "band_hash", "cnt", "_batch")
    sentinels = tiny_rows_df(
        spark,
        [(-1, 0, 0, b) for b in minhash_index_batches(spark, path)],
        "band_idx int, band_hash long, cnt long, _batch string",
    )
    counts.unionByName(sentinels).write.parquet(f"{staging}/{_COUNTS_DIR}")
    for side in (_META_DIR, _BATCH_DIR):
        shutil.copytree(f"{path}/{side}", f"{staging}/{side}")
    after = survivors.count()
    _swap_in(staging, path)
    return before - after
