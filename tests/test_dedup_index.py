"""Persisted MinHash band index / incremental dedup (VERDICT r6 #1)."""

import pytest

from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.functions.dedup import minhash_near_dup_pairs
from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
    minhash_index_append,
    minhash_index_batches,
    minhash_index_dedup_batch,
    minhash_index_meta,
    minhash_index_pairs_vs_batch,
)

DOCS = [
    # b0: the "existing corpus"
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "sphinx of black quartz judge my vow"),
    (4, "how vexingly quick daft zebras jump"),
    # b1: the "new crawl" — 101 duplicates 1 (cross-batch), 102/103
    # duplicate each other (within-batch), 104 is novel
    (101, "the quick brown fox jumps over the lazy dog"),
    (102, "bright vixens jump dozy fowl quack together loudly"),
    (103, "bright vixens jump dozy fowl quack together loudly"),
    (104, "two driven jocks help fax my big quiz"),
]


def _frames(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return df.filter("doc_id < 100"), df.filter("doc_id >= 100"), df


def _strip_counted_flags(path):
    """Rewrite batch markers WITHOUT the r9 ``counted`` field — what a
    genuine pre-r9 index looks like (the flag is the metadata-read
    proof that a batch's guard counts are on disk; tests simulating
    older indexes must not leave it behind)."""
    import glob
    import json
    import os

    for f in glob.glob(f"{path}/_graft_batches/*.json"):
        lines = []
        with open(f) as fh:
            for line in fh:
                if line.strip():
                    row = json.loads(line)
                    row.pop("counted", None)
                    lines.append(json.dumps(row))
        with open(f, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        # the local Hadoop FS keeps .crc sidecars — a rewritten file
        # with a stale checksum fails the read with ChecksumException
        crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
        if os.path.exists(crc):
            os.remove(crc)


def test_incremental_pairs_tile_the_whole_corpus(spark, tmp_path):
    """batch-vs-index + within-batch pairs, unioned across batches,
    equal the from-scratch whole-corpus run (the losslessness
    contract); the cross-batch and within-batch planted dups are both
    recovered by the b1 query specifically."""
    base, new, both = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0")
    p0 = minhash_index_pairs_vs_batch(spark, path, "b0")
    p1 = minhash_index_dedup_batch(new, "doc_id", "text", path, batch_id="b1")
    got1 = {(r.id_a, r.id_b) for r in p1.collect()}
    assert (1, 101) in got1  # cross-batch dup via the persisted index
    assert (102, 103) in got1  # within-batch dup
    whole = minhash_near_dup_pairs(both, "doc_id", "text")
    incr = {(r.id_a, r.id_b) for r in p0.collect()} | got1
    assert incr == {(r.id_a, r.id_b) for r in whole.collect()}
    assert minhash_index_batches(spark, path) == ["b0", "b1"]
    assert minhash_index_meta(spark, path) == {
        "num_hashes": 32, "bands": 4, "shingle_n": 3, "seed": 42,
        "bgroups": 16, "payload_cols": [],
    }


def test_index_rejects_param_drift_and_redelivery(spark, tmp_path):
    base, new, _ = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0")
    with pytest.raises(ValueError, match="built with"):
        minhash_index_append(new, "doc_id", "text", path, batch_id="b1", seed=7)
    with pytest.raises(ValueError, match="already appended"):
        minhash_index_append(new, "doc_id", "text", path, batch_id="b0")
    with pytest.raises(ValueError, match="no index"):
        minhash_index_pairs_vs_batch(spark, str(tmp_path / "nope"), "b0")
    with pytest.raises(ValueError, match="no index"):
        minhash_index_dedup_batch(new, "doc_id", "text", str(tmp_path / "nope"),
                                  batch_id="b1")


def test_compaction_preserves_index_sidecars_and_pairs(spark, tmp_path):
    """Index maintenance (SCALING.md): appends create one file-set per
    batch; compact_small_files must keep the hive band_idx layout AND
    carry the _graft_meta/_graft_batches sidecars through the staging
    swap — before the round-7 sidecar fix, the swap silently destroyed
    the index meta. Pairs before == pairs after."""
    from etl_apache_kafka_python_doker_aws_spark.sources.layout import (
        compact_small_files,
    )

    base, new, _ = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0")
    minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
    before = {(r.id_a, r.id_b) for r in
              minhash_index_pairs_vs_batch(spark, path, "b1").collect()}
    compact_small_files(spark, path)
    assert minhash_index_meta(spark, path) is not None
    assert minhash_index_batches(spark, path) == ["b0", "b1"]
    after = {(r.id_a, r.id_b) for r in
             minhash_index_pairs_vs_batch(spark, path, "b1").collect()}
    assert after == before and (1, 101) in after


def test_index_meta_params_flow_into_dedup_batch(spark, tmp_path):
    """minhash_index_dedup_batch signs the new batch with the INDEX'S
    pinned params, not the defaults — a non-default index still joins."""
    base, new, both = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(
        base, "doc_id", "text", path, batch_id="b0", num_hashes=16, bands=8, seed=9
    )
    p1 = minhash_index_dedup_batch(new, "doc_id", "text", path, batch_id="b1")
    got = {(r.id_a, r.id_b) for r in p1.collect()}
    assert (1, 101) in got and (102, 103) in got


def test_incomplete_counts_sidecar_falls_back(spark, tmp_path):
    """Migration/crash guard (r8 review): a _graft_counts sidecar that
    is missing counts for any MARKED batch (pre-r8 index appended with
    current code) must NOT be trusted — summing it would under-count
    bucket totals and re-open the m² blowup the skew cap exists to
    bound. The query falls back to the one-scan recompute."""
    import shutil

    txt = "bright vixens jump dozy fowl quack together loudly"
    b0 = spark.createDataFrame([(i, txt) for i in range(3)],
                               "doc_id long, text string")
    b1 = spark.createDataFrame([(10, txt)], "doc_id long, text string")
    path = str(tmp_path / "idx")
    minhash_index_append(b0, "doc_id", "text", path, batch_id="b0")
    shutil.rmtree(f"{path}/_graft_counts")  # simulate a pre-r8 append:
    _strip_counted_flags(path)  # ...whose markers predate the r9 flag
    minhash_index_append(b1, "doc_id", "text", path, batch_id="b1")
    # bucket holds 4 identical docs > cap 3: with trusted-but-incomplete
    # counts (b1 alone sums to 1) pairs would leak; the fallback sees 4
    assert minhash_index_pairs_vs_batch(
        spark, path, "b1", max_bucket_size=3
    ).count() == 0
    # and with the cap not binding the pairs are still produced
    assert minhash_index_pairs_vs_batch(
        spark, path, "b1", max_bucket_size=10
    ).count() == 3


def test_bucketed_table_form_matches_path_form(spark, tmp_path):
    """The bucketed-table tier shares _pairs_for_batch with the path
    form — this pins the STORAGE layer: same pair set, same guards
    (param/bucket drift + redelivery rejected)."""
    import pytest

    base, new, _ = _frames(spark)
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_table_append,
        minhash_table_batches,
        minhash_table_pairs_vs_batch,
    )

    tbl = "t_mh_bucketed_eq"
    drop_minhash_table(spark, tbl)
    try:

        minhash_table_append(base, "doc_id", "text", tbl, batch_id="b0", buckets=4)
        minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1", buckets=4)
        assert minhash_table_batches(spark, tbl) == ["b0", "b1"]
        with pytest.raises(ValueError, match="already appended"):
            minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1",
                                 buckets=4)
        with pytest.raises(ValueError, match="was built with"):
            minhash_table_append(new, "doc_id", "text", tbl, batch_id="b2",
                                 buckets=8)
        got_b = {(r.id_a, r.id_b) for r in
                 minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        path = str(tmp_path / "idx_eq")
        minhash_index_append(base, "doc_id", "text", path, batch_id="b0")
        minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
        got_p = {(r.id_a, r.id_b) for r in
                 minhash_index_pairs_vs_batch(spark, path, "b1").collect()}
        assert got_b == got_p and (1, 101) in got_b
    finally:
        drop_minhash_table(spark, tbl)


def test_bucketed_dedup_batch_convenience(spark, tmp_path):
    """minhash_table_dedup_batch = append (pinned params) + pairs query,
    params read from the table meta — and a fresh table name raises."""
    import pytest

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_table_append,
        minhash_table_dedup_batch,
    )

    base, new, _ = _frames(spark)
    tbl = "t_mh_bucketed_conv"
    drop_minhash_table(spark, tbl)
    try:
        with pytest.raises(ValueError, match="no index table"):
            minhash_table_dedup_batch(new, "doc_id", "text", tbl, batch_id="b1")
        minhash_table_append(base, "doc_id", "text", tbl, batch_id="b0", buckets=4)
        got = {(r.id_a, r.id_b) for r in
               minhash_table_dedup_batch(new, "doc_id", "text", tbl,
                                         batch_id="b1").collect()}
        assert (1, 101) in got and (102, 103) in got
    finally:
        drop_minhash_table(spark, tbl)


def test_delete_removes_pairs_and_keeps_guards(spark, tmp_path):
    """minhash_index_delete (r8): deleted docs vanish from every
    subsequent pairs query, guard counts stay exact (recomputed from
    survivors), and batch markers survive — a fully-deleted batch still
    rejects redelivery under its batch_id."""
    import pytest

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_delete,
    )

    base, new, _ = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0")
    minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
    assert (1, 101) in {(r.id_a, r.id_b) for r in
                        minhash_index_pairs_vs_batch(spark, path, "b1").collect()}
    removed = minhash_index_delete(spark, path, [101])
    assert removed > 0
    got = {(r.id_a, r.id_b) for r in
           minhash_index_pairs_vs_batch(spark, path, "b1").collect()}
    assert all(101 not in p for p in got)
    assert (102, 103) in got  # untouched within-batch pair survives
    # markers retained: redelivery still rejected after full delete of b1
    minhash_index_delete(spark, path, [r.doc_id for r in new.collect()])
    with pytest.raises(ValueError, match="already appended"):
        minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
    # deleting everything is refused, loudly, with the index intact
    with pytest.raises(ValueError, match="EMPTY"):
        minhash_index_delete(
            spark, path, [r.doc_id for r in base.collect()] + [101, 102, 103, 104]
        )
    assert minhash_index_meta(spark, path) is not None


def test_append_after_delete(spark, tmp_path):
    """VERDICT r8 #5: the recomputed counts sidecar + zero-count
    sentinel rows written by minhash_index_delete must compose with a
    SUBSEQUENT append — pairs queries for both an old and the new batch
    stay correct (the only index state transition that had zero test
    coverage)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_delete,
    )

    base, new, _ = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0")
    minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
    assert minhash_index_delete(spark, path, [104]) > 0
    b2 = spark.createDataFrame(
        [(201, "the quick brown fox jumps over the lazy dog"),
         (202, "two driven jocks help fax my big quiz")],
        "doc_id long, text string",
    )
    minhash_index_append(b2, "doc_id", "text", path, batch_id="b2")
    got_new = {(r.id_a, r.id_b) for r in
               minhash_index_pairs_vs_batch(spark, path, "b2").collect()}
    # 201 pairs with BOTH prior copies of the fox doc; 202's twin (104)
    # was deleted, so no pair resurrects it
    assert (1, 201) in got_new and (101, 201) in got_new
    assert all(104 not in p for p in got_new)
    # old-batch query still green after delete + append
    got_old = {(r.id_a, r.id_b) for r in
               minhash_index_pairs_vs_batch(spark, path, "b1").collect()}
    assert (102, 103) in got_old and all(104 not in p for p in got_old)
    assert minhash_index_batches(spark, path) == ["b0", "b1", "b2"]


def test_crashed_append_is_contained(spark, tmp_path):
    """VERDICT r8 #4: a crashed append (band rows written, counts +
    marker absent) must not leave UNDER-GUARDED candidates — its rows
    are invisible to pairs queries for other batches, and a pairs query
    for the unmarked batch_id raises instead of returning empty."""
    base, new, _ = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0")
    meta = minhash_index_meta(spark, path)
    # simulate the crash window: write b1's DATA rows directly (the
    # same banded form the real append writes), no counts, no marker
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup import (
        banded_minhash_signatures,
    )

    banded_minhash_signatures(
        new, "doc_id", "text", meta["num_hashes"], meta["bands"],
        meta["shingle_n"], meta["seed"],
    ).withColumn("_batch", F.lit("b1_crashed")).withColumn(
        "_bgroup",
        F.pmod(F.col("band_hash"), F.lit(meta["bgroups"])).cast("int"),
    ).write.mode("append").partitionBy("band_idx", "_bgroup").parquet(path)
    # unmarked batch_id: loud, not silently-empty
    with pytest.raises(ValueError, match="not a MARKED batch"):
        minhash_index_pairs_vs_batch(spark, path, "b1_crashed")
    # leftovers invisible: b0's pairs see nothing from the crashed batch
    b0_pairs = minhash_index_pairs_vs_batch(spark, path, "b0").collect()
    assert all(r.id_a < 100 and r.id_b < 100 for r in b0_pairs)
    # re-append under a NEW id works and finds the dups (the leftover
    # rows' _batch value never matches a marker, so they stay invisible)
    minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
    got = {(r.id_a, r.id_b) for r in
           minhash_index_pairs_vs_batch(spark, path, "b1").collect()}
    assert (1, 101) in got and (102, 103) in got


def test_compact_bucketed_table(spark, tmp_path):
    """VERDICT r8 #8: compact_bucketed_table rewrites a bucketed index
    through a same-spec CTAS — fewer files, identical pair set, and the
    zero-Exchange band join still plans (co-location survived)."""
    import glob
    import re

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_table_append,
        minhash_table_pairs_vs_batch,
    )
    from etl_apache_kafka_python_doker_aws_spark.sources.layout import (
        compact_bucketed_table,
    )

    base, new, _ = _frames(spark)
    tbl = "t_mh_compact"
    drop_minhash_table(spark, tbl)
    try:
        minhash_table_append(base, "doc_id", "text", tbl, batch_id="b0",
                             buckets=4)
        minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1",
                             buckets=4)
        before_pairs = {(r.id_a, r.id_b) for r in
                        minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        n_before = len(glob.glob(f"{wh}/{tbl}/*.parquet"))
        assert compact_bucketed_table(spark, tbl) == 4
        n_after = len(glob.glob(f"{wh}/{tbl}/*.parquet"))
        assert n_after < n_before, (n_before, n_after)
        after_pairs = {(r.id_a, r.id_b) for r in
                       minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        assert after_pairs == before_pairs and (1, 101) in after_pairs
        # co-location survived: no band-key Exchange in the pairs plan
        plan = (
            minhash_table_pairs_vs_batch(spark, tbl, "b1")
            ._jdf.queryExecution().executedPlan().toString()
        )
        exchanges = re.findall(
            r"Exchange (?:hash|range)partitioning\(([^)]*)\)", plan)
        assert not [e for e in exchanges if "band_" in e], plan
        # and a path-backed dir is refused
        with pytest.raises(ValueError, match="not a bucketed table"):
            compact_bucketed_table(spark, f"{tbl}_meta")
    finally:
        drop_minhash_table(spark, tbl)
        spark.sql("DROP TABLE IF EXISTS t_mh_compact_compacting")


def _dir_snapshot(root):
    """(relpath -> (size, mtime_ns)) for every file under root."""
    import os

    snap = {}
    for r, _, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            st = os.stat(p)
            snap[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return snap


def test_delete_is_localized_untouched_dirs_byte_identical(spark, tmp_path):
    """VERDICT r9 #2/#3: the r10 _bgroup layout makes minhash deletes
    LOCALIZED — only the band_idx=*/_bgroup=* directories the deleted
    ids hash into are rewritten; every other partition directory keeps
    its exact files (size + mtime pinned), and pair results match a
    from-scratch index built without the deleted docs."""
    import os

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup import (
        banded_minhash_signatures,
    )
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_delete,
    )

    base, new, _ = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0")
    minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
    meta = minhash_index_meta(spark, path)
    # which dirs SHOULD the delete touch? the deleted id's band rows
    hit = {
        (int(r.band_idx), int(r.band_hash) % meta["bgroups"])
        for r in banded_minhash_signatures(
            new.filter("doc_id = 104"), "doc_id", "text",
            meta["num_hashes"], meta["bands"], meta["shingle_n"],
            meta["seed"],
        ).collect()
    }
    pre = _dir_snapshot(path)
    assert minhash_index_delete(spark, path, [104]) > 0
    post = _dir_snapshot(path)
    touched_rels = {f"band_idx={bi}/_bgroup={bg}" for bi, bg in hit}

    def owner(rel):
        parts = rel.split(os.sep)
        return "/".join(parts[:2]) if parts[0].startswith("band_idx=") else None

    for rel, stat in pre.items():
        o = owner(rel)
        if o is not None and o not in touched_rels:
            assert post.get(rel) == stat, f"untouched file rewritten: {rel}"
    # every touched dir was actually rewritten (or emptied)
    for rel in touched_rels:
        old_files = {r for r in pre if owner(r) == rel}
        assert all(post.get(r) != pre[r] for r in old_files), rel
    # counts sidecar rewritten but consistent: pairs for b1 still exact
    got = {(r.id_a, r.id_b) for r in
           minhash_index_pairs_vs_batch(spark, path, "b1").collect()}
    assert (102, 103) in got and all(104 not in p for p in got)


def test_legacy_flat_index_delete_falls_back_to_full_rewrite(spark, tmp_path):
    """A pre-r10 index (bgroups=None → flat band_idx layout) still
    deletes correctly through the full staging rewrite, and its meta
    keeps reading bgroups=None (appends never secretly migrate the
    layout)."""
    import os

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_delete,
    )

    base, new, _ = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0",
                         bgroups=None)
    assert minhash_index_meta(spark, path)["bgroups"] is None
    # flat layout on disk: band_idx dirs with files directly inside
    band_dirs = [d for d in os.listdir(path) if d.startswith("band_idx=")]
    assert band_dirs
    assert not any(
        sub.startswith("_bgroup=")
        for d in band_dirs
        for sub in os.listdir(os.path.join(path, d))
    )
    # appends follow the pinned flat layout
    minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
    assert minhash_index_meta(spark, path)["bgroups"] is None
    assert minhash_index_delete(spark, path, [104]) > 0
    got = {(r.id_a, r.id_b) for r in
           minhash_index_pairs_vs_batch(spark, path, "b1").collect()}
    assert (1, 101) in got and all(104 not in p for p in got)


def test_relayout_migrates_flat_index_to_localized_deletes(spark, tmp_path):
    """minhash_index_relayout (r10): the pre-r10 migration path — a flat
    index re-partitions into band_idx/_bgroup at a fresh path with NO
    retraining (stored signatures move verbatim), markers + counts
    carried (redelivery rejected, guard still metadata-complete), pair
    results identical, and the migrated index deletes LOCALIZED."""
    import os

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_delete,
        minhash_index_relayout,
    )

    base, new, _ = _frames(spark)
    path = str(tmp_path / "flat")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0",
                         bgroups=None)
    minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
    before = {(r.id_a, r.id_b) for r in
              minhash_index_pairs_vs_batch(spark, path, "b1").collect()}

    migrated = str(tmp_path / "grouped")
    minhash_index_relayout(spark, path, migrated, bgroups=8)
    assert minhash_index_meta(spark, migrated)["bgroups"] == 8
    assert any(
        sub.startswith("_bgroup=")
        for d in os.listdir(migrated) if d.startswith("band_idx=")
        for sub in os.listdir(os.path.join(migrated, d))
    )
    after = {(r.id_a, r.id_b) for r in
             minhash_index_pairs_vs_batch(spark, migrated, "b1").collect()}
    assert after == before and (1, 101) in after
    assert minhash_index_batches(spark, migrated) == ["b0", "b1"]
    with pytest.raises(ValueError, match="already appended"):
        minhash_index_append(new, "doc_id", "text", migrated, batch_id="b1")
    # localized delete works on the migrated layout
    pre = _dir_snapshot(migrated)
    assert minhash_index_delete(spark, migrated, [104]) > 0
    post = _dir_snapshot(migrated)
    assert any(post.get(r) == s for r, s in pre.items()
               if r.startswith("band_idx="))  # some dirs untouched
    got = {(r.id_a, r.id_b) for r in
           minhash_index_pairs_vs_batch(spark, migrated, "b1").collect()}
    assert (102, 103) in got and all(104 not in p for p in got)
    # a non-empty target is refused
    with pytest.raises(ValueError, match="FRESH path"):
        minhash_index_relayout(spark, path, migrated)


def test_table_delete_removes_pairs_keeps_colocation(spark, tmp_path):
    """minhash_table_delete (r10): the bucketed tier's retraction —
    deleted docs vanish from pairs, markers keep rejecting redelivery,
    guard counts recomputed, deleting everything refused, and the
    zero-Exchange band join still plans after the CTAS swap
    (co-location survived)."""
    import re

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_table_append,
        minhash_table_delete,
        minhash_table_pairs_vs_batch,
    )

    base, new, _ = _frames(spark)
    tbl = "t_mh_delete"
    drop_minhash_table(spark, tbl)
    try:
        minhash_table_append(base, "doc_id", "text", tbl, batch_id="b0",
                             buckets=4)
        minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1",
                             buckets=4)
        assert (1, 101) in {(r.id_a, r.id_b) for r in
                            minhash_table_pairs_vs_batch(spark, tbl, "b1")
                            .collect()}
        assert minhash_table_delete(spark, tbl, [101]) > 0
        got = {(r.id_a, r.id_b) for r in
               minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        assert all(101 not in p for p in got) and (102, 103) in got
        # no-op delete returns 0
        assert minhash_table_delete(spark, tbl, [999999]) == 0
        # co-location: no band-key shuffle after the CTAS swap, and the
        # scan is still bucketed (the r8 zero-Exchange pin's assertions)
        plan = (
            minhash_table_pairs_vs_batch(spark, tbl, "b1")
            ._jdf.queryExecution().executedPlan().toString()
        )
        exchanges = re.findall(
            r"Exchange (?:hash|range)partitioning\(([^)]*)\)", plan
        )
        assert not [e for e in exchanges if "band_" in e], exchanges
        assert "SelectedBucketsCount" in plan, "bucketed scan not used"
        # markers survive: redelivery still rejected after delete
        with pytest.raises(ValueError, match="already appended"):
            minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1",
                                 buckets=4)
        # deleting everything is refused with the table intact
        with pytest.raises(ValueError, match="EMPTY"):
            minhash_table_delete(
                spark, tbl,
                [r.doc_id for r in base.collect()] + [101, 102, 103, 104],
            )
        assert spark.table(tbl).count() > 0
    finally:
        drop_minhash_table(spark, tbl)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_deleting")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_counts_deleting")


def test_delete_rejects_null_ids_loudly(spark, tmp_path):
    """_retraction_forms (review r10): a NULL in the delete request
    never matches anything (In predicates and anti-joins both skip
    NULL) — silently deleting nothing is the keyed-merge trap, so both
    input forms reject loudly; and a NULL-_id index row is never
    swept up by a list-form delete of other ids."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup import (
        banded_minhash_signatures,
    )
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_delete,
    )

    base, new, _ = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0")
    with pytest.raises(ValueError, match="None"):
        minhash_index_delete(spark, path, [None, 3])
    null_ids = spark.createDataFrame([(None,)], "doc_id long")
    with pytest.raises(ValueError, match="NULL"):
        minhash_index_delete(spark, path, null_ids)
    # a NULL-_id row in the index (a doc with a null business key)
    # survives a delete that never named it
    meta = minhash_index_meta(spark, path)
    nulldoc = spark.createDataFrame(
        [(None, "sphinx of black quartz judge my vow")],
        "doc_id long, text string",
    )
    banded_minhash_signatures(
        nulldoc, "doc_id", "text", meta["num_hashes"], meta["bands"],
        meta["shingle_n"], meta["seed"],
    ).withColumn("_batch", F.lit("b0")).withColumn(
        "_bgroup",
        F.pmod(F.col("band_hash"), F.lit(meta["bgroups"])).cast("int"),
    ).write.mode("append").partitionBy("band_idx", "_bgroup").parquet(path)
    n_null = spark.read.parquet(path).filter(F.col("_id").isNull()).count()
    assert n_null > 0
    assert minhash_index_delete(spark, path, [3]) > 0
    assert spark.read.parquet(path).filter(
        F.col("_id").isNull()
    ).count() == n_null


def test_relayout_heals_crashed_delete_leftovers(spark, tmp_path):
    """ADVICE r10: a localized delete killed between _dir_swap's paired
    renames can leave a `_bgroup=N.old` dir NEXT TO the rewritten live
    dir (swap done, cleanup not). Its name contains '=', so Spark would
    discover it as a partition value and relayout would silently
    migrate the PRE-delete rows — including GDPR-retracted ids — into
    the new index. minhash_index_relayout now runs the same healing as
    the delete entry points before reading the source."""
    import os
    import shutil

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_delete,
        minhash_index_relayout,
    )

    base, new, _ = _frames(spark)
    path = str(tmp_path / "idx")
    minhash_index_append(base, "doc_id", "text", path, batch_id="b0",
                         bgroups=8)
    minhash_index_append(new, "doc_id", "text", path, batch_id="b1")
    # snapshot the pre-delete tree, delete 101, then resurrect every
    # rewritten dir's pre-delete copy as `<dir>.old` — exactly the
    # swap-completed-cleanup-skipped crash state
    pre_copy = str(tmp_path / "pre")
    shutil.copytree(path, pre_copy)
    assert minhash_index_delete(spark, path, [101]) > 0
    planted = 0
    for b in os.listdir(pre_copy):
        if not b.startswith("band_idx="):
            continue
        for g in os.listdir(os.path.join(pre_copy, b)):
            if not g.startswith("_bgroup="):
                continue
            old_files = sorted(os.listdir(os.path.join(pre_copy, b, g)))
            live = os.path.join(path, b, g)
            now_files = sorted(os.listdir(live)) if os.path.isdir(live) else []
            if old_files != now_files:  # this dir was rewritten
                shutil.copytree(os.path.join(pre_copy, b, g), live + ".old")
                planted += 1
    assert planted > 0
    migrated = str(tmp_path / "migrated")
    minhash_index_relayout(spark, path, migrated, bgroups=4)
    moved = spark.read.parquet(migrated)
    assert moved.filter(F.col("_id") == 101).count() == 0
    # healing restored the source: leftovers gone, retracted id stays out
    assert not any(d.endswith(".old")
                   for b in os.listdir(path) if os.path.isdir(os.path.join(path, b))
                   for d in os.listdir(os.path.join(path, b)))
    assert spark.read.parquet(path).filter(F.col("_id") == 101).count() == 0


def test_table_delete_swap_recovery(spark, tmp_path):
    """ADVICE r10: minhash_table_delete's DROP→RENAME swap is healed
    after a mid-swap kill — both staging tables exist before any swap
    starts, so a missing live table with a `_deleting` twin is renamed
    back into place by every entry point, and the delete is simply
    re-runnable."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        _table_exists,
        drop_minhash_table,
        minhash_table_append,
        minhash_table_delete,
        minhash_table_pairs_vs_batch,
    )

    base, new, _ = _frames(spark)
    tbl = "t_mh_swap_recover"
    drop_minhash_table(spark, tbl)
    try:
        minhash_table_append(base, "doc_id", "text", tbl, batch_id="b0",
                             buckets=4)
        minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1",
                             buckets=4)
        before = {(r.id_a, r.id_b) for r in
                  minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        assert (1, 101) in before
        # fabricate the crash state the swap loop can produce: both
        # staging tables fully CTAS'd, then killed between `DROP TABLE
        # {tbl}` and the RENAME — live data table gone, twins stranded
        for name in (tbl, f"{tbl}_counts"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_deleting")
            spark.table(name).repartition(
                4, F.col("band_idx"), F.col("band_hash")
            ).write.bucketBy(4, "band_idx", "band_hash").format(
                "parquet"
            ).saveAsTable(f"{name}_deleting")
        spark.sql(f"DROP TABLE {tbl}")
        assert not _table_exists(spark, tbl)
        # any entry point heals: pairs works again and sees the staged data
        after = {(r.id_a, r.id_b) for r in
                 minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        assert after == before
        assert _table_exists(spark, tbl)
        assert not _table_exists(spark, f"{tbl}_deleting")
        assert not _table_exists(spark, f"{tbl}_counts_deleting")
        # and the interrupted delete is re-runnable end-to-end
        assert minhash_table_delete(spark, tbl, [101]) > 0
        got = {(r.id_a, r.id_b) for r in
               minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        assert all(101 not in p for p in got) and (102, 103) in got
    finally:
        for name in (tbl, f"{tbl}_counts"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_deleting")
        drop_minhash_table(spark, tbl)


def test_table_delete_tombstones_are_request_proportional(spark, tmp_path):
    """r11 (VERDICT r10 #2): minhash_table_delete no longer CTAS-rewrites
    the table per delete — it appends a request-sized tombstone sidecar
    that pairs queries anti-join out. Pinned here: (1) the data table's
    files are BYTE-UNTOUCHED by a delete (per-delete cost proportional
    to the request); (2) retracted history stays dead while a
    RE-APPENDED id lives (seq-scoped tombstones — an id-only sidecar
    would either resurrect GDPR rows or permanently kill re-ingests);
    (3) compaction folds tombstones in, drops the sidecar, and pairs
    results are unchanged."""
    import os

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        _table_exists,
        drop_minhash_table,
        minhash_table_append,
        minhash_table_compact,
        minhash_table_delete,
        minhash_table_pairs_vs_batch,
    )

    def files_of(tbl):
        wh = spark.conf.get("spark.sql.warehouse.dir")
        root = wh[len("file:"):] if wh.startswith("file:") else wh
        loc = os.path.join(root, tbl.lower())
        out = {}
        for dp, _, fs in os.walk(loc):
            for f in fs:
                p = os.path.join(dp, f)
                st = os.stat(p)
                out[os.path.relpath(p, loc)] = (st.st_mtime_ns, st.st_size)
        return out

    base, new, _ = _frames(spark)
    tbl = "t_mh_tombstones"
    drop_minhash_table(spark, tbl)
    try:
        minhash_table_append(base, "doc_id", "text", tbl, batch_id="b0",
                             buckets=4)
        minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1",
                             buckets=4)
        pre_files = files_of(tbl)
        pre_counts = files_of(f"{tbl}_counts")
        assert minhash_table_delete(spark, tbl, [101]) > 0
        # (1) request-proportional: data + counts tables byte-untouched
        assert files_of(tbl) == pre_files
        assert files_of(f"{tbl}_counts") == pre_counts
        assert _table_exists(spark, f"{tbl}_tombstones")
        got = {(r.id_a, r.id_b) for r in
               minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        assert all(101 not in p for p in got) and (102, 103) in got
        # the tombstone anti-join must BROADCAST its request-sized
        # build side — an _id-key SortMergeJoin would shuffle the whole
        # index per snapshot, exactly the cost this tier exists to
        # avoid (review r11: the zero-Exchange pin above never ran with
        # tombstones present, so the regression would pass CI)
        import re as _re
        plan = (
            minhash_table_pairs_vs_batch(spark, tbl, "b1")
            ._jdf.queryExecution().executedPlan().toString()
        )
        id_ex = [e for e in _re.findall(
            r"Exchange (?:hash|range)partitioning\(([^)]*)\)", plan
        ) if "_id" in e or "_t_id" in e]
        assert not id_ex, f"tombstone anti-join shuffled the index: {id_ex}"
        # idempotent re-delete of a dead id is a no-op
        assert minhash_table_delete(spark, tbl, [101]) == 0
        # (2) re-append the retracted id: the NEW observation lives,
        # the retracted history stays dead
        again = spark.createDataFrame(
            [(101, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string")
        minhash_table_append(again, "doc_id", "text", tbl, batch_id="b2",
                             buckets=4)
        b2 = {(r.id_a, r.id_b) for r in
              minhash_table_pairs_vs_batch(spark, tbl, "b2").collect()}
        assert (1, 101) in b2
        b1 = {(r.id_a, r.id_b) for r in
              minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        assert all(101 not in p for p in b1)
        # (3) compaction folds the tombstones in and drops the sidecar
        removed = minhash_table_compact(spark, tbl)
        assert removed > 0
        assert not _table_exists(spark, f"{tbl}_tombstones")
        assert {(r.id_a, r.id_b) for r in
                minhash_table_pairs_vs_batch(spark, tbl, "b2").collect()} == b2
        assert {(r.id_a, r.id_b) for r in
                minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()} == b1
        # compact with nothing pending is a cheap no-op
        assert minhash_table_compact(spark, tbl) == 0
        # forced auto-compaction (threshold 0) takes the CTAS path
        assert minhash_table_delete(spark, tbl, [104],
                                    compact_threshold=0) > 0
        assert not _table_exists(spark, f"{tbl}_tombstones")
        got = {(r.id_a, r.id_b) for r in
               minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        assert all(104 not in p for p in got) and (102, 103) in got
    finally:
        for name in (tbl, f"{tbl}_counts"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_deleting")
        drop_minhash_table(spark, tbl)


def test_compact_heals_stranded_counts_swap(spark, tmp_path):
    """review r11: a compact killed BETWEEN the data swap and the counts
    swap leaves post-delete data with PRE-delete counts and the
    recomputed counts stranded in `_counts_deleting`. A re-run lands in
    the nothing-to-rewrite early exit (tombstones re-kill nothing) —
    which must complete the stranded counts swap instead of silently
    abandoning it, or the guard would over-count the deleted rows
    forever."""
    from pyspark.sql import functions as F

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        _apply_tombstones,
        _table_exists,
        _table_marker_rows,
        _tombstones,
        drop_minhash_table,
        minhash_table_append,
        minhash_table_compact,
        minhash_table_delete,
        minhash_table_pairs_vs_batch,
    )

    base, new, _ = _frames(spark)
    tbl = "t_mh_counts_strand"
    drop_minhash_table(spark, tbl)
    try:
        minhash_table_append(base, "doc_id", "text", tbl, batch_id="b0",
                             buckets=4)
        minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1",
                             buckets=4)
        assert minhash_table_delete(spark, tbl, [101]) > 0
        # fabricate the crash state: stage survivors + recomputed
        # counts exactly as compact does, swap ONLY the data table
        markers = _table_marker_rows(spark, tbl)
        survivors = _apply_tombstones(
            spark.table(tbl), _tombstones(spark, tbl), markers)
        counts = (
            survivors.groupBy("band_idx", "band_hash", "_batch")
            .agg(F.count("*").alias("cnt"))
            .select("band_idx", "band_hash", "cnt", "_batch")
            .unionByName(spark.createDataFrame(
                [(-1, 0, 0, r.batch_id) for r in markers],
                "band_idx int, band_hash long, cnt long, _batch string"))
        )
        for name, df in ((tbl, survivors), (f"{tbl}_counts", counts)):
            spark.sql(f"DROP TABLE IF EXISTS {name}_deleting")
            df.repartition(4, F.col("band_idx"), F.col("band_hash")) \
              .write.bucketBy(4, "band_idx", "band_hash") \
              .format("parquet").saveAsTable(f"{name}_deleting")
        spark.sql(f"DROP TABLE {tbl}")
        spark.sql(f"ALTER TABLE {tbl}_deleting RENAME TO {tbl}")
        stale_total = spark.table(f"{tbl}_counts").agg(
            F.sum("cnt")).first()[0]
        # WORST interleaving (second review r11): an APPEND arrives
        # before any compact re-run. Entry-point recovery must complete
        # the counts swap FIRST — otherwise b2's counts land in the
        # stale table and a later early-exit compact renames the
        # pre-b2 staged counts over them, silently dropping b2-only
        # buckets from the guard whitelist (pairs lost).
        b2 = spark.createDataFrame(
            [(601, "novel sphinx wafts quick jolts of zesty vim"),
             (602, "novel sphinx wafts quick jolts of zesty vim")],
            "doc_id long, text string")
        minhash_table_append(b2, "doc_id", "text", tbl, batch_id="b2",
                             buckets=4)
        assert not _table_exists(spark, f"{tbl}_counts_deleting")
        fresh_total = spark.table(f"{tbl}_counts").agg(
            F.sum("cnt")).first()[0]
        assert fresh_total < stale_total + 8  # deleted rows left the guard
        # b2's within-batch dup pairs — its bucket exists ONLY in b2,
        # so this fails if b2's counts were stranded or overwritten
        got2 = {(r.id_a, r.id_b) for r in
                minhash_table_pairs_vs_batch(spark, tbl, "b2").collect()}
        assert (601, 602) in got2
        # compact's early exit just drops the (no-op) tombstones now
        assert minhash_table_compact(spark, tbl) == 0
        assert not _table_exists(spark, f"{tbl}_tombstones")
        got = {(r.id_a, r.id_b) for r in
               minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        assert all(101 not in p for p in got) and (102, 103) in got
        assert {(r.id_a, r.id_b) for r in
                minhash_table_pairs_vs_batch(spark, tbl, "b2").collect()} == got2
    finally:
        for name in (tbl, f"{tbl}_counts"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_deleting")
        drop_minhash_table(spark, tbl)


def test_drop_table_clears_staging_twins(spark, tmp_path):
    """review r11: drop_minhash_table must also remove the `_deleting`
    staging twins — a twin left by a compact killed mid-swap would be
    renamed back into place by _table_swap_recover when a NEW index is
    later created under the same name, resurrecting GDPR-purged rows
    into the fresh index."""
    from pyspark.sql import functions as F

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        _table_exists,
        drop_minhash_table,
        minhash_table_append,
        minhash_table_pairs_vs_batch,
    )

    base, new, _ = _frames(spark)
    tbl = "t_mh_drop_twins"
    drop_minhash_table(spark, tbl)
    minhash_table_append(base, "doc_id", "text", tbl, batch_id="b0",
                         buckets=4)
    # stage a twin as a crashed compact would, then kill between the
    # DROP and the RENAME
    spark.sql(f"DROP TABLE IF EXISTS {tbl}_deleting")
    spark.table(tbl).repartition(4, F.col("band_idx"), F.col("band_hash")) \
        .write.bucketBy(4, "band_idx", "band_hash").format("parquet") \
        .saveAsTable(f"{tbl}_deleting")
    drop_minhash_table(spark, tbl)
    assert not _table_exists(spark, f"{tbl}_deleting")
    # a NEW index under the same name starts EMPTY — nothing resurrected
    minhash_table_append(new, "doc_id", "text", tbl, batch_id="fresh",
                         buckets=4)
    try:
        assert spark.table(tbl).filter(F.col("_id") < 100).count() == 0
        got = {(r.id_a, r.id_b) for r in
               minhash_table_pairs_vs_batch(spark, tbl, "fresh").collect()}
        assert (102, 103) in got and all(a >= 100 for a, _ in got)
    finally:
        drop_minhash_table(spark, tbl)


def test_compact_sweeps_unmarked_rows_without_tombstones(spark, tmp_path):
    """second review r11: a GDPR id whose band rows exist ONLY in an
    UNMARKED (crashed-append) batch gets no tombstone — delete returns
    0 — so minhash_table_compact must run its physical sweep even with
    no tombstones pending, or those rows would sit in the warehouse
    forever with both entry points reporting success."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup import (
        banded_minhash_signatures,
    )
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        _table_exists,
        drop_minhash_table,
        minhash_table_append,
        minhash_table_compact,
        minhash_table_delete,
        minhash_table_meta,
    )

    base, _, _ = _frames(spark)
    tbl = "t_mh_unmarked_sweep"
    drop_minhash_table(spark, tbl)
    try:
        minhash_table_append(base, "doc_id", "text", tbl, batch_id="b0",
                             buckets=4)
        # simulate an append crash: band rows written, marker never was
        meta = minhash_table_meta(spark, tbl)
        orphan = spark.createDataFrame(
            [(9001, "stranded crash append document about zebras")],
            "doc_id long, text string")
        banded_minhash_signatures(
            orphan, "doc_id", "text", meta["num_hashes"], meta["bands"],
            meta["shingle_n"], meta["seed"],
        ).withColumn("_batch", F.lit("crashed")).write.mode(
            "append"
        ).bucketBy(4, "band_idx", "band_hash").format("parquet").saveAsTable(tbl)
        assert spark.table(tbl).filter(F.col("_id") == 9001).count() > 0
        # the GDPR request for the stranded id: no live rows match
        assert minhash_table_delete(spark, tbl, [9001]) == 0
        assert not _table_exists(spark, f"{tbl}_tombstones")
        # compact alone performs the physical sweep
        assert minhash_table_compact(spark, tbl) > 0
        assert spark.table(tbl).filter(F.col("_id") == 9001).count() == 0
        # idempotent afterwards
        assert minhash_table_compact(spark, tbl) == 0
    finally:
        for name in (tbl, f"{tbl}_counts"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_deleting")
        drop_minhash_table(spark, tbl)


def test_tombstone_sidecar_id_type_is_order_independent(spark, tmp_path):
    """second review r11: the tombstone sidecar's _id type is pinned to
    the INDEX's id type, not to whichever request form ran first — a
    first delete with an INT-typed id frame must not brick a later
    BIGINT list delete on the sidecar append."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_table_append,
        minhash_table_delete,
        minhash_table_pairs_vs_batch,
    )

    base, new, _ = _frames(spark)
    tbl = "t_mh_tomb_types"
    drop_minhash_table(spark, tbl)
    try:
        minhash_table_append(base, "doc_id", "text", tbl, batch_id="b0",
                             buckets=4)
        minhash_table_append(new, "doc_id", "text", tbl, batch_id="b1",
                             buckets=4)
        narrow = spark.createDataFrame([(101,)], "doc_id int")  # INT, not BIGINT
        assert minhash_table_delete(spark, tbl, narrow) > 0
        assert spark.table(f"{tbl}_tombstones").schema["_id"].simpleString() \
            == "_id:bigint"
        # the list form (BIGINT) appends into the same sidecar cleanly
        assert minhash_table_delete(spark, tbl, [104]) > 0
        got = {(r.id_a, r.id_b) for r in
               minhash_table_pairs_vs_batch(spark, tbl, "b1").collect()}
        assert all(101 not in p and 104 not in p for p in got)
        assert (102, 103) in got
    finally:
        for name in (tbl, f"{tbl}_counts"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_deleting")
        drop_minhash_table(spark, tbl)


def test_apply_tombstones_bounds_the_marker_map(spark):
    """VERDICT r11 #4 / ADVICE r11 #2: past _MARKER_MAP_MAX batch
    markers the batch→seq translation must plan a (broadcast) JOIN
    against the marker frame, not a thousands-of-literals create_map —
    driver-side plan bloat on the hot pairs path; small marker lists
    keep the zero-extra-plan-nodes literal map."""
    from collections import namedtuple

    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        _MARKER_MAP_MAX,
        _apply_tombstones,
    )

    M = namedtuple("M", ["batch_id", "seq"])
    full = spark.createDataFrame(
        [(1, "b0"), (2, "b1"), (3, f"b{_MARKER_MAP_MAX + 50}")],
        "_id long, _batch string",
    )
    tomb = spark.createDataFrame([(2, 2)], "_id long, del_seq int")

    few = [M(f"b{i}", i) for i in range(5)]
    small = _apply_tombstones(full, tomb, few)
    small_plan = small._jdf.queryExecution().analyzed().toString()
    assert "map(" in small_plan and small_plan.count("Join") == 1, \
        "small marker lists must keep the literal map (one anti-join only)"
    assert {r._id for r in small.collect()} == {1, 3}

    many = [M(f"b{i}", i) for i in range(_MARKER_MAP_MAX + 100)]
    big = _apply_tombstones(full, tomb, many)
    big_plan = big._jdf.queryExecution().analyzed().toString()
    assert "map(" not in big_plan and big_plan.count("Join") == 2, \
        "past _MARKER_MAP_MAX the translation must be a join"
    # identical semantics either way: id 2 (seq 1 < del_seq 2) dies;
    # id 3's batch is unmarked under the small list (NULL seq → lives)
    # and marked with seq 1050 under the big one (≥ del_seq → lives)
    assert {r._id for r in big.collect()} == {1, 3}


def test_filtered_pairs_both_tiers(spark, tmp_path):
    """r14 `allowed=` (VERDICT r13 #3): both pair SIDES must be allowed,
    per-filtered-corpus semantics on the path AND bucketed tiers (shared
    _pairs_for_batch), NULL ids match nothing."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_table_append,
        minhash_table_pairs_vs_batch,
    )

    b0, b1, full = _frames(spark)
    path = str(tmp_path / "mh_filtered")
    minhash_index_append(full, "doc_id", "text", path, batch_id="b0")
    # unfiltered reference: the verbatim pairs (1,101) and (102,103)
    ref = minhash_index_pairs_vs_batch(spark, path, "b0")
    assert {(r.id_a, r.id_b) for r in ref.collect()} >= {(1, 101), (102, 103)}
    allowed = spark.createDataFrame(
        [(1,), (101,), (104,), (None,)], "doc_id long"
    )
    got = minhash_index_pairs_vs_batch(
        spark, path, "b0", allowed=allowed
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 101)}, got
    # only ONE side of (102,103) allowed → the pair is filtered out
    half = spark.createDataFrame([(102,), (1,)], "doc_id long")
    got2 = minhash_index_pairs_vs_batch(
        spark, path, "b0", allowed=half
    ).collect()
    assert got2 == [], got2
    # bucketed tier shares the semantics
    tbl = "t_mh_filtered_pairs"
    drop_minhash_table(spark, tbl)
    minhash_table_append(full, "doc_id", "text", tbl, batch_id="b0", buckets=4)
    got3 = minhash_table_pairs_vs_batch(
        spark, tbl, "b0", allowed=allowed
    ).collect()
    drop_minhash_table(spark, tbl)
    assert {(r.id_a, r.id_b) for r in got3} == {(1, 101)}, got3


def test_filtered_pairs_skew_guard_uses_unfiltered_counts(spark, tmp_path):
    """review r14: the skew-guard statistic must not drift between the
    counts-sidecar path and the per_batch=None recompute fallback when
    `allowed=` narrows the corpus — a bucket over the cap UNFILTERED
    must stay dropped even if the filtered bucket would fit, on BOTH
    paths (identical query, identical pair set)."""
    import shutil as _sh

    # three verbatim copies share EVERY band bucket (count 3); cap 2
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "mh_guard_drift")
    minhash_index_append(docs, "doc_id", "text", path, batch_id="b0")
    allowed = spark.createDataFrame([(1,), (2,)], "doc_id long")
    # sidecar path: unfiltered count 3 > 2 → bucket dropped → no pairs
    got = minhash_index_pairs_vs_batch(
        spark, path, "b0", max_bucket_size=2, allowed=allowed
    ).collect()
    assert got == [], got
    # pre-r9 fallback (no counted flags, no counts sidecar): the
    # recompute must count the UNFILTERED corpus too
    _strip_counted_flags(path)
    _sh.rmtree(f"{path}/_graft_counts")
    got2 = minhash_index_pairs_vs_batch(
        spark, path, "b0", max_bucket_size=2, allowed=allowed
    ).collect()
    assert got2 == [], got2
    # sanity: without the filter and a non-binding cap the pairs exist
    ref = minhash_index_pairs_vs_batch(
        spark, path, "b0", max_bucket_size=10
    ).collect()
    assert {(r.id_a, r.id_b) for r in ref} == {(1, 2), (1, 3), (2, 3)}


def _with_lang(df):
    # id-derived payload: 'en' iff even — pure function of the id, so
    # assertions never need a lookup table
    return df.withColumn(
        "lang",
        F.when(F.pmod(F.col("doc_id"), F.lit(2)) == 0, F.lit("en")).otherwise(
            F.lit("de")
        ),
    )


def test_payload_where_both_tiers(spark, tmp_path):
    """r15 payload columns + where= (the l3_payload_ann rule on the band
    tier): predicate filters BOTH pair sides on stored attributes, on
    the path AND bucketed tiers (shared _pairs_for_batch); composes
    with allowed= (AND); a broad predicate drops nothing."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_index_meta,
        minhash_table_append,
        minhash_table_meta,
        minhash_table_pairs_vs_batch,
    )

    _, _, full = _frames(spark)
    path = str(tmp_path / "mh_payload")
    minhash_index_append(
        _with_lang(full), "doc_id", "text", path, batch_id="b0",
        payload_cols=["lang"],
    )
    assert minhash_index_meta(spark, path)["payload_cols"] == ["lang"]
    # verbatim pairs: (1,101) mixed lang (odd/odd -> de/de actually:
    # 1 odd, 101 odd -> both 'de'); (102,103) = en/de mixed
    ref = minhash_index_pairs_vs_batch(spark, path, "b0")
    assert {(r.id_a, r.id_b) for r in ref.collect()} >= {(1, 101), (102, 103)}
    got_de = minhash_index_pairs_vs_batch(
        spark, path, "b0", where="lang = 'de'"
    ).collect()
    assert {(r.id_a, r.id_b) for r in got_de} == {(1, 101)}, got_de
    # (102,103) has one side each -> filtered out under either predicate
    got_en = minhash_index_pairs_vs_batch(
        spark, path, "b0", where="lang = 'en'"
    ).collect()
    assert (102, 103) not in {(r.id_a, r.id_b) for r in got_en}
    # broad predicate == unfiltered pair set
    got_all = minhash_index_pairs_vs_batch(
        spark, path, "b0", where="lang IN ('en', 'de')"
    )
    assert {(r.id_a, r.id_b) for r in got_all.collect()} == {
        (r.id_a, r.id_b) for r in ref.collect()
    }
    # composes with allowed= (AND): allowed covers (1,101) but where
    # excludes 'de' -> empty
    allowed = spark.createDataFrame([(1,), (101,)], "doc_id long")
    got_and = minhash_index_pairs_vs_batch(
        spark, path, "b0", where="lang = 'en'", allowed=allowed
    ).collect()
    assert got_and == [], got_and
    # bucketed tier shares semantics + pins payloads in its meta table
    tbl = "t_mh_payload_pairs"
    drop_minhash_table(spark, tbl)
    minhash_table_append(
        _with_lang(full), "doc_id", "text", tbl, batch_id="b0", buckets=4,
        payload_cols=["lang"],
    )
    assert minhash_table_meta(spark, tbl)["payload_cols"] == ["lang"]
    got_t = minhash_table_pairs_vs_batch(
        spark, tbl, "b0", where="lang = 'de'"
    ).collect()
    drop_minhash_table(spark, tbl)
    assert {(r.id_a, r.id_b) for r in got_t} == {(1, 101)}, got_t


def test_payload_append_guards(spark, tmp_path):
    """r15: the payload schema is a creation-time layout property —
    missing columns, conflicting explicit lists, reserved names and
    duplicates all fail loudly (a silent NULL payload would corrupt
    where= filtering downstream)."""
    b0, b1, full = _frames(spark)
    path = str(tmp_path / "mh_payload_guards")
    with pytest.raises(ValueError, match="shadow"):
        minhash_index_append(
            b0.withColumn("_sig", F.lit("x")), "doc_id", "text", path,
            batch_id="b0", payload_cols=["_sig"],
        )
    with pytest.raises(ValueError, match="duplicate"):
        minhash_index_append(
            _with_lang(b0), "doc_id", "text", path, batch_id="b0",
            payload_cols=["lang", "lang"],
        )
    with pytest.raises(ValueError, match="not in the input frame"):
        minhash_index_append(
            b0, "doc_id", "text", path, batch_id="b0", payload_cols=["lang"]
        )
    minhash_index_append(
        _with_lang(b0), "doc_id", "text", path, batch_id="b0",
        payload_cols=["lang"],
    )
    # later appends must carry the pinned column...
    with pytest.raises(ValueError, match="lacks"):
        minhash_index_append(b1, "doc_id", "text", path, batch_id="b1")
    # ...and may not request a different schema
    with pytest.raises(ValueError, match="pins payload_cols"):
        minhash_index_append(
            _with_lang(b1).withColumn("lic", F.lit("mit")), "doc_id", "text",
            path, batch_id="b1", payload_cols=["lic"],
        )
    # carrying the pinned column works, and where= sees both batches
    minhash_index_append(_with_lang(b1), "doc_id", "text", path, batch_id="b1")
    got = minhash_index_pairs_vs_batch(
        spark, path, "b1", where="lang = 'de'"
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 101)}, got


def test_payload_survives_lifecycle(spark, tmp_path):
    """r15: payload values and the meta pin survive relayout, localized
    delete, and bucketed-table compact (whole-row rewrites — this pins
    the contract, not the mechanism)."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_index_delete,
        minhash_index_meta,
        minhash_index_relayout,
        minhash_table_append,
        minhash_table_compact,
        minhash_table_delete,
        minhash_table_pairs_vs_batch,
    )

    _, _, full = _frames(spark)
    path = str(tmp_path / "mh_payload_life")
    minhash_index_append(
        _with_lang(full), "doc_id", "text", path, batch_id="b0",
        payload_cols=["lang"], bgroups=4,
    )
    new = str(tmp_path / "mh_payload_life_v2")
    minhash_index_relayout(spark, path, new, bgroups=2)
    assert minhash_index_meta(spark, new)["payload_cols"] == ["lang"]
    assert minhash_index_delete(spark, new, [102]) > 0
    got = minhash_index_pairs_vs_batch(
        spark, new, "b0", where="lang = 'de'"
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 101)}, got
    # stored values (not recomputed): every surviving row's lang matches
    # the id-derived rule
    rows = spark.read.parquet(new).select("_id", "lang").collect()
    assert rows and all(
        r.lang == ("en" if r._id % 2 == 0 else "de") for r in rows
    )
    # bucketed tier: tombstone delete + compact keep payloads + where=
    tbl = "t_mh_payload_life"
    drop_minhash_table(spark, tbl)
    minhash_table_append(
        _with_lang(full), "doc_id", "text", tbl, batch_id="b0", buckets=4,
        payload_cols=["lang"],
    )
    assert minhash_table_delete(spark, tbl, [102], compact_threshold=2.0) > 0
    assert minhash_table_compact(spark, tbl) > 0
    got_t = minhash_table_pairs_vs_batch(
        spark, tbl, "b0", where="lang = 'de'"
    ).collect()
    rows_t = spark.table(tbl).select("_id", "lang").collect()
    drop_minhash_table(spark, tbl)
    assert {(r.id_a, r.id_b) for r in got_t} == {(1, 101)}, got_t
    assert rows_t and all(
        r.lang == ("en" if r._id % 2 == 0 else "de") for r in rows_t
    )


def test_dedup_batch_resume_both_tiers(spark, tmp_path):
    """r15 resume contract on the band tier (the ann_index_dedup_batch
    rule): a rerun of the SAME delivery after the append committed
    skips the append and returns the IDENTICAL pair set; a same-
    batch_id rerun with different rows raises; without resume the
    redelivery guard still fires; resume over a crashed (unmarked)
    append falls through to the mid-append contract."""
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_table_append,
        minhash_table_dedup_batch,
    )

    b0, b1, full = _frames(spark)
    path = str(tmp_path / "mh_resume")
    minhash_index_append(b0, "doc_id", "text", path, batch_id="b0")
    p1 = minhash_index_dedup_batch(
        b1, "doc_id", "text", path, batch_id="b1"
    ).collect()
    assert {(r.id_a, r.id_b) for r in p1} == {(1, 101), (102, 103)}
    # crash-after-append rerun
    p1b = minhash_index_dedup_batch(
        b1, "doc_id", "text", path, batch_id="b1", resume=True
    ).collect()
    assert sorted((r.id_a, r.id_b) for r in p1b) == sorted(
        (r.id_a, r.id_b) for r in p1
    )
    # different rows under the same batch_id — a redelivery bug
    with pytest.raises(ValueError, match="not the same delivery"):
        minhash_index_dedup_batch(
            b1.limit(2), "doc_id", "text", path, batch_id="b1", resume=True
        )
    # without resume the duplicate-batch_id guard still fires
    with pytest.raises(ValueError, match="already appended"):
        minhash_index_dedup_batch(b1, "doc_id", "text", path, batch_id="b1")
    # bucketed tier mirrors the contract
    tbl = "t_mh_resume"
    drop_minhash_table(spark, tbl)
    minhash_table_append(b0, "doc_id", "text", tbl, batch_id="b0", buckets=4)
    t1 = minhash_table_dedup_batch(
        b1, "doc_id", "text", tbl, batch_id="b1"
    ).collect()
    t1b = minhash_table_dedup_batch(
        b1, "doc_id", "text", tbl, batch_id="b1", resume=True
    ).collect()
    assert sorted((r.id_a, r.id_b) for r in t1b) == sorted(
        (r.id_a, r.id_b) for r in t1
    )
    with pytest.raises(ValueError, match="not the same delivery"):
        minhash_table_dedup_batch(
            b1.limit(1), "doc_id", "text", tbl, batch_id="b1", resume=True
        )
    drop_minhash_table(spark, tbl)


def test_resume_rejects_pre_r15_marker(spark, tmp_path):
    """A pre-r15 marker (no n_rows field) cannot prove "same delivery"
    — resume must raise rather than silently skip the append on
    unprovable evidence."""
    import glob
    import json

    b0, b1, full = _frames(spark)
    path = str(tmp_path / "mh_resume_legacy")
    minhash_index_append(b0, "doc_id", "text", path, batch_id="b0")
    minhash_index_append(b1, "doc_id", "text", path, batch_id="b1")
    # strip n_rows from the markers — the genuine pre-r15 shape (with
    # the .crc sidecar removal the in-place edit requires)
    import os

    for f in glob.glob(f"{path}/_graft_batches/*.json"):
        rows = []
        with open(f) as fh:
            for line in fh:
                if line.strip():
                    row = json.loads(line)
                    row.pop("n_rows", None)
                    rows.append(row)
        with open(f, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row) + "\n")
        crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
    with pytest.raises(ValueError, match="n_rows=None"):
        minhash_index_dedup_batch(
            b1, "doc_id", "text", path, batch_id="b1", resume=True
        )
