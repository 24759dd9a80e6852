#!/usr/bin/env python
"""Round-11 probe (VERDICT r10 #1/#2/#4/#6): one JSON line, recorded in
SCALING.md.

(a) Prune crossover ABOVE the auto gate: the r10 `_PRUNE_MIN_ROWS=2M`
    choice was measured at parity (join 9.64 s / pruned 10.09 s at 2M)
    and extrapolated beyond; this probe builds a REAL 10M-vector
    persisted index (~5 GB refine tier) and times both refine shapes so
    the "past 2M pruning only gains" claim has a data point on the
    winning side.
(b) Re-rank broadcast gate A/B: the r11 size gate keeps the explicit
    broadcast hint only below `_BCAST_MAX_CELLS` of measured candidate
    mass. Measured here: a serving-sized batch with the hint vs with
    the gate forced shut (AQE fallback), and a just-past-the-gate batch
    with the gate open vs forced open (hinted) — pinning that the gate
    costs ~nothing where it bites and the AQE form is at parity near
    the bound.
(c) Bucketed band-table tombstone delete at 1M docs: per-delete cost
    must be proportional to the REQUEST (tombstone append + two
    counts), with the corpus-proportional CTAS demoted to compaction —
    timed against the forced-compaction (r10 full-rewrite) cost, plus
    the pairs-query overhead of the tombstone anti-join.

Usage: python probe_r11.py           # full run (~20-40 min quiet host)
       SPARK_GRAFT_PROBE_ANN_VECS=2000000 python probe_r11.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _median3(fn) -> float:
    fn()  # warm
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(sorted(runs)[1], 2)


def main() -> None:
    from pyspark.sql import functions as F

    from etl_apache_kafka_python_doker_aws_spark import get_spark
    from etl_apache_kafka_python_doker_aws_spark.functions import ann_index
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_build,
        ann_index_search,
    )

    n_vecs = int(os.environ.get("SPARK_GRAFT_PROBE_ANN_VECS", "10000000"))
    n_docs = int(os.environ.get("SPARK_GRAFT_PROBE_DOCS", "1000000"))
    probe_dir = os.environ.get(
        "SPARK_GRAFT_PROBE_DIR", "/tmp/spark_graft_probe_r11"
    )
    os.makedirs(probe_dir, exist_ok=True)
    spark = get_spark(app_name="probe-r11")
    out: dict = {"probe": "r11", "n_vecs": n_vecs, "n_docs": n_docs}

    # ---- (a) 10M-vector index, both refine shapes -------------------
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 1000.0
            ).cast("double"),
        ).alias("embedding"),
    )
    emb_path = os.path.join(probe_dir, "emb.parquet")
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        emb.write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    apath = os.path.join(probe_dir, f"ann_{n_vecs}")
    t0 = time.time()
    if not os.path.exists(os.path.join(apath, "_graft_meta")):
        shutil.rmtree(apath, ignore_errors=True)
        ann_index_build(
            emb, "vec_id", "embedding", apath, dim=64, n_cells=64,
            n_subspaces=8, n_centroids=32, train_fraction=0.002,
            vec_buckets=64,
        )
    out["ann_build_sec"] = round(time.time() - t0, 1)
    q10 = emb.filter(F.col("vec_id") < 10)
    drain = lambda df: df.write.mode("overwrite").format("noop").save()  # noqa: E731
    for tag, prune in (("pruned", True), ("join", False)):
        out[f"{tag}_search_sec"] = _median3(
            lambda: drain(
                ann_index_search(
                    q10, apath, k=5, n_probe=8, shortlist=1000, prune=prune
                )
            )
        )
        print(json.dumps(out), flush=True)
    # TRUE point lookup: ≤ _MAX_PUSHED_IDS candidates (2 × 1000 = 2k),
    # so the refine scan gets the `_id IN` parquet predicate and
    # row-group skipping — the shape the pruned path exists for. The
    # 10-query leg above lands in the bucket-whitelist branch where 10k
    # random ids hit ALL 64 _vbucket dirs (no directory pruning left),
    # so it pays the fixed jobs without the read win.
    q2 = emb.filter(F.col("vec_id") < 2)
    for tag, prune in (("point_pruned", True), ("point_join", False)):
        out[f"{tag}_search_sec"] = _median3(
            lambda: drain(
                ann_index_search(
                    q2, apath, k=5, n_probe=8, shortlist=1000, prune=prune
                )
            )
        )
        print(json.dumps(out), flush=True)

    # ---- (b) broadcast-gate A/B -------------------------------------
    # serving shape: 10 queries x 1000 shortlist = 10k candidates,
    # far below the gate -> hinted by default; force the gate shut to
    # time the AQE fallback
    out["serve_hinted_sec"] = out["pruned_search_sec"]
    bound = ann_index._BCAST_MAX_CELLS
    try:
        ann_index._BCAST_MAX_CELLS = 0
        out["serve_unhinted_sec"] = _median3(
            lambda: drain(
                ann_index_search(
                    q10, apath, k=5, n_probe=8, shortlist=1000, prune=True
                )
            )
        )
    finally:
        ann_index._BCAST_MAX_CELLS = bound
    print(json.dumps(out), flush=True)
    # just past the gate: 200 queries x 2000 shortlist ≈ 400k candidates
    # x (dim+2)=66 cells ≈ 26M cells > 24M -> gate drops the hint by
    # default; force it back open to time the hinted form at the bound
    # (n_probe 4 keeps the scored-row mass manageable at 10M vectors —
    # the leg times the RE-RANK join shapes, not the probe fan-out)
    qbig = emb.filter(F.col("vec_id") < 200)
    out["batch_past_gate_unhinted_sec"] = _median3(
        lambda: drain(
            ann_index_search(
                qbig, apath, k=5, n_probe=4, shortlist=2000, prune=True
            )
        )
    )
    try:
        ann_index._BCAST_MAX_CELLS = 10**15
        out["batch_past_gate_hinted_sec"] = _median3(
            lambda: drain(
                ann_index_search(
                    qbig, apath, k=5, n_probe=4, shortlist=2000, prune=True
                )
            )
        )
    finally:
        ann_index._BCAST_MAX_CELLS = bound
    print(json.dumps(out), flush=True)

    # ---- (c) bucketed band-table tombstone delete at 1M docs --------
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        drop_minhash_table,
        minhash_table_append,
        minhash_table_compact,
        minhash_table_delete,
        minhash_table_pairs_vs_batch,
    )
    from scale_probe import build_probe_dir

    build_probe_dir(spark, "/root/testdata/sf0.1", probe_dir, n_docs)
    docs = spark.read.parquet(os.path.join(probe_dir, "documents.parquet"))
    tbl = "probe_r11_band_tbl"
    drop_minhash_table(spark, tbl)
    split = int(n_docs * 0.99)
    t0 = time.time()
    minhash_table_append(
        docs.filter(F.col("doc_id") < split), "doc_id", "text", tbl,
        batch_id="base", buckets=64,
    )
    out["table_build_sec"] = round(time.time() - t0, 1)
    minhash_table_append(
        docs.filter(F.col("doc_id") >= split), "doc_id", "text", tbl,
        batch_id="b1", buckets=64,
    )
    pairs = lambda: drain(  # noqa: E731
        minhash_table_pairs_vs_batch(spark, tbl, "b1")
    )
    out["pairs_pre_delete_sec"] = _median3(pairs)
    t0 = time.time()
    out["tomb_removed"] = minhash_table_delete(
        spark, tbl, list(range(100, 200))
    )
    out["tombstone_delete_sec"] = round(time.time() - t0, 2)
    out["pairs_post_delete_sec"] = _median3(pairs)
    t0 = time.time()
    out["compact_removed"] = minhash_table_compact(spark, tbl)
    out["compact_sec"] = round(time.time() - t0, 1)
    drop_minhash_table(spark, tbl)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
