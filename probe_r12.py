#!/usr/bin/env python
"""Round-12 probe (VERDICT r11 #1/#2): one JSON line per leg, recorded
in SCALING.md.

(a) ANN tombstone delete is REQUEST-proportional (VERDICT r11 #1 Done
    criterion): at 200k- and 2M-vector r12 indexes, time a 25-id
    `ann_index_delete` (tombstone sidecar append + one pushed-filter
    accounting scan), the search overhead of the pending-tombstone
    anti-join, one `ann_index_compact` fold-in, and — for the
    comparison the verdict asks for — the legacy r9-r11 localized
    dir-rewrite (`_ann_delete_rewrite`) on the same index. Expected:
    tombstone delete ~flat across the 10× corpus gap; the dir rewrite
    grows with the per-dir row mass.

(b) 10M-vector index with the corpus-scaled vec_buckets default
    (VERDICT r11 #2): auto → 10M/50k = 200 buckets (vs the r11 probe's
    fixed 64). Times the point-lookup shape (2 q × 1000 shortlist =
    2k candidates ≤ _MAX_PUSHED_IDS → `_id IN` row-group skip; r11 @64
    buckets: 15.2 s pruned vs 24.1 join) and the serving shape (10 q ×
    1000 = 10k candidates; r11 @64: 49.0 vs 53.0). Honest math note:
    whitelist directory pruning CANNOT bite at 10k candidates under
    any clamped bucket count — expected hit-buckets is
    B·(1−e^(−C/B)) ≈ B for C ≫ B (10k candidates hit all 200 of 200
    and ~91% of 4096) — so the scaled default's win is the POINT tier:
    each bucket dir stays ~50k rows as the corpus grows, keeping the
    read mass of ≤4096-candidate lookups flat instead of
    corpus-proportional.

Usage: python probe_r12.py              # full run, quiet host only
       SPARK_GRAFT_PROBE_SKIP_10M=1 python probe_r12.py   # leg (a) only
"""

from __future__ import annotations

import json
import os
import shutil
import time

import_dir = os.path.dirname(os.path.abspath(__file__))
import sys  # noqa: E402

sys.path.insert(0, import_dir)

PROBE_DIR = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/spark_graft_probe_r12")


def _median3(fn) -> float:
    fn()  # warm
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(sorted(runs)[1], 2)


def _emb(spark, n):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 1000.0
            ).cast("double"),
        ).alias("embedding"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from etl_apache_kafka_python_doker_aws_spark import get_spark
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        _ann_delete_rewrite,
        ann_index_build,
        ann_index_compact,
        ann_index_delete,
        ann_index_meta,
        ann_index_search,
    )

    os.makedirs(PROBE_DIR, exist_ok=True)
    spark = get_spark(app_name="probe-r12")
    drain = lambda df: df.write.mode("overwrite").format("noop").save()  # noqa: E731

    # ---- (a) tombstone delete request-proportionality ----------------
    for n, tf in ((200_000, 0.05), (2_000_000, 0.01)):
        out = {"probe": "r12a", "n_vecs": n}
        emb_path = os.path.join(PROBE_DIR, f"emb_{n}.parquet")
        if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
            _emb(spark, n).write.mode("overwrite").parquet(emb_path)
        emb = spark.read.parquet(emb_path)
        apath = os.path.join(PROBE_DIR, f"ann_{n}")
        shutil.rmtree(apath, ignore_errors=True)  # (a) mutates: fresh build
        t0 = time.time()
        ann_index_build(
            emb, "vec_id", "embedding", apath, dim=64, n_cells=64,
            n_subspaces=8, n_centroids=32, train_fraction=tf,
        )
        out["build_sec"] = round(time.time() - t0, 1)
        out["vec_buckets"] = ann_index_meta(spark, apath)["vec_buckets"]
        q5 = emb.filter(F.col("vec_id") < 5)
        search = lambda: drain(  # noqa: E731
            ann_index_search(q5, apath, k=5, n_probe=8, shortlist=500)
        )
        out["search_pre_delete_sec"] = _median3(search)
        t0 = time.time()
        out["tomb_removed"] = ann_index_delete(
            spark, apath, list(range(1000, 1025)), compact_threshold=2.0
        )
        out["tombstone_delete_sec"] = round(time.time() - t0, 2)
        t0 = time.time()  # second request: steady-state append cost
        ann_index_delete(
            spark, apath, list(range(2000, 2025)), compact_threshold=2.0
        )
        out["tombstone_delete2_sec"] = round(time.time() - t0, 2)
        out["search_post_delete_sec"] = _median3(search)
        t0 = time.time()
        out["compact_removed"] = ann_index_compact(spark, apath)
        out["compact_sec"] = round(time.time() - t0, 1)
        t0 = time.time()  # the demoted r9-r11 shape, for the comparison
        _ann_delete_rewrite(
            spark, apath, list(range(3000, 3025)), ann_index_meta(spark, apath)
        )
        out["legacy_rewrite_delete_sec"] = round(time.time() - t0, 2)
        print(json.dumps(out), flush=True)

    if os.environ.get("SPARK_GRAFT_PROBE_SKIP_10M"):
        return

    # ---- (b) 10M index with the corpus-scaled bucket default ---------
    n = 10_000_000
    out = {"probe": "r12b", "n_vecs": n}
    emb_path = os.path.join(PROBE_DIR, f"emb_{n}.parquet")
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        _emb(spark, n).write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    apath = os.path.join(PROBE_DIR, f"ann_{n}_auto")
    t0 = time.time()
    if not os.path.exists(os.path.join(apath, "_graft_meta")):
        shutil.rmtree(apath, ignore_errors=True)
        ann_index_build(
            emb, "vec_id", "embedding", apath, dim=64, n_cells=64,
            n_subspaces=8, n_centroids=32, train_fraction=0.002,
        )
        out["build_sec"] = round(time.time() - t0, 1)
    out["vec_buckets"] = ann_index_meta(spark, apath)["vec_buckets"]
    q2 = emb.filter(F.col("vec_id") < 2)
    q10 = emb.filter(F.col("vec_id") < 10)
    for tag, q, prune in (
        ("point_pruned", q2, True),
        ("point_join", q2, False),
        ("serve_pruned", q10, True),
        ("serve_join", q10, False),
    ):
        out[f"{tag}_sec"] = _median3(
            lambda: drain(
                ann_index_search(
                    q, apath, k=5, n_probe=8, shortlist=1000, prune=prune
                )
            )
        )
        print(json.dumps(out), flush=True)
    # tombstone delete at 10M: the request-proportional claim's top end
    t0 = time.time()
    out["tomb_removed"] = ann_index_delete(
        spark, apath, list(range(5000, 5025)), compact_threshold=2.0
    )
    out["tombstone_delete_sec"] = round(time.time() - t0, 2)
    out["serve_post_delete_sec"] = _median3(
        lambda: drain(
            ann_index_search(q10, apath, k=5, n_probe=8, shortlist=1000)
        )
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
