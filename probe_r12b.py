#!/usr/bin/env python
"""Round-12 follow-up probe: (1) fresh-process re-time of the 2M search
(the main probe's pre-delete leg read 49 s vs 5.4 s post-delete in the
same process right after the 392 s build — JIT/GC suspicion, needs a
clean process to attribute); (2) the 10M legacy dir-rewrite delete, the
comparison point the request-proportional claim needs at the top end
(the r9-r11 shape rewrites ~n/64 codes rows and ~n/64 refine rows per
directory hit — at 10M that is ~156k codes + ~156k×264B refine bytes
per dir × up to 25 dirs for a 25-id request).

Run AFTER probe_r12.py completes, on a quiet host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PROBE_DIR = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/spark_graft_probe_r12")


def _median3(fn) -> float:
    fn()
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(sorted(runs)[1], 2)


def main() -> None:
    from pyspark.sql import functions as F

    from etl_apache_kafka_python_doker_aws_spark import get_spark
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        _ann_delete_rewrite,
        ann_index_delete,
        ann_index_meta,
        ann_index_search,
    )

    spark = get_spark(app_name="probe-r12b")
    drain = lambda df: df.write.mode("overwrite").format("noop").save()  # noqa: E731
    out = {"probe": "r12b-followup"}

    # (1) 2M search in a fresh process (index as the main probe left it:
    # compacted, zero tombstones)
    apath2m = os.path.join(PROBE_DIR, "ann_2000000")
    emb2m = spark.read.parquet(os.path.join(PROBE_DIR, "emb_2000000.parquet"))
    q5 = emb2m.filter(F.col("vec_id") < 5)
    out["search_2m_fresh_sec"] = _median3(
        lambda: drain(ann_index_search(q5, apath2m, k=5, n_probe=8, shortlist=500))
    )
    print(json.dumps(out), flush=True)

    # (1b) 10M point/serve shapes in a fresh process: the main probe's
    # in-process numbers ran right after the 861 s build and show a
    # systematic 3-5x slowdown vs identical later searches (2M pre/post
    # 49.0/5.4, 10M serve 50.9 vs post-delete 9.7) — these are the
    # attribution runs. NOTE the index carries 25 pending tombstones
    # from the main probe's last leg (the steady-state serving shape).
    apath10m = os.path.join(PROBE_DIR, "ann_10000000_auto")
    emb10m = spark.read.parquet(os.path.join(PROBE_DIR, "emb_10000000.parquet"))
    q2 = emb10m.filter(F.col("vec_id") < 2)
    q10 = emb10m.filter(F.col("vec_id") < 10)
    for tag, q, prune in (
        ("point_pruned_10m", q2, True),
        ("point_join_10m", q2, False),
        ("serve_pruned_10m", q10, True),
        ("serve_join_10m", q10, False),
    ):
        out[f"{tag}_fresh_sec"] = _median3(
            lambda: drain(
                ann_index_search(
                    q, apath10m, k=5, n_probe=8, shortlist=1000, prune=prune
                )
            )
        )
        print(json.dumps(out), flush=True)

    # (2) 10M legacy dir-rewrite vs the (already-measured) tombstone
    # path. Delete legs MUTATE the index, so a rerun would silently
    # time a no-op (removed==0 after one scan) — assert loudly instead
    # (the CLAUDE.md r11 probe rule; review r12): rerun with fresh id
    # ranges via SPARK_GRAFT_PROBE_ID_BASE.
    base = int(os.environ.get("SPARK_GRAFT_PROBE_ID_BASE", "7000"))
    meta = ann_index_meta(spark, apath10m)
    t0 = time.time()
    n = _ann_delete_rewrite(spark, apath10m, list(range(base, base + 25)), meta)
    out["legacy_rewrite_delete_10m_sec"] = round(time.time() - t0, 2)
    if n != 25:
        raise RuntimeError(
            f"legacy leg removed {n}/25 — ids already deleted by a prior "
            "run; rerun with SPARK_GRAFT_PROBE_ID_BASE past the used range"
        )
    print(json.dumps(out), flush=True)

    # (3) steady-state tombstone delete at 10M, fresh process
    t0 = time.time()
    n = ann_index_delete(spark, apath10m, list(range(base + 1000, base + 1025)),
                         compact_threshold=2.0)
    out["tombstone_delete_10m_fresh_sec"] = round(time.time() - t0, 2)
    if n != 25:
        raise RuntimeError(
            f"tombstone leg removed {n}/25 — stale ids; rerun with "
            "SPARK_GRAFT_PROBE_ID_BASE past the used range"
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
