"""Round-13 probe: ANN serving latency vs many small deletes
(VERDICT r12 #6 'Done =' — flat search latency after 1k small deletes
WITHOUT compaction, now that the `_graft_dead` tally folds to one row
past `_DEAD_FOLD_FILES`).

Legs (each prints one JSON line; artifacts cached under OUT so a rerun
only re-times — the r11 probe discipline):

  build   — 20k-vector index at /tmp/r13_probe/ann (+ a fold-disabled
            twin at ann_nofold), then 1000 single-id deletes into each
            (compact_threshold=2.0: never compact).
  serve   — FRESH-PROCESS search timing (the r12 lesson: same-process-
            after-build timings are 3-7x inflated): run
              python probe_r13.py serve ann
              python probe_r13.py serve ann_nofold
              python probe_r13.py serve ann_base   (no deletes control)
            in separate processes, quiet host.

Run: python probe_r13.py build   (once, ~20-40 min)
     python probe_r13.py serve <name>   (fresh process per leg)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = "/tmp/r13_probe"
N = 20_000
DIM = 32
DELETES = 1000          # fold leg (the VERDICT r12 #6 claim)
DELETES_CONTROL = 300   # fold-disabled control: enough to show the trend


def get_spark():
    # the ENGINE's session (Arrow local-relation conf included) — a bare
    # builder session lacks spark.sql.execution.arrow.pyspark.enabled,
    # so every tiny_rows_df metadata write in the delete path degrades
    # to the Python-RDD local-frame path (the r12 26× tax; measured
    # here: ~17 s/delete without the conf vs ~2 s with)
    from etl_apache_kafka_python_doker_aws_spark import get_spark as gs

    return gs(app_name="probe_r13")


def corpus(spark, n=N, dim=DIM, seed=13):
    rng = np.random.RandomState(seed)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": rng.randn(n, dim).astype(np.float64).tolist(),
        }
    )
    return spark.createDataFrame(pdf, "vec_id long, embedding array<double>")


def build():
    from etl_apache_kafka_python_doker_aws_spark.functions import ann_index

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    c = corpus(spark)
    for name, fold in [("ann_base", True), ("ann", True), ("ann_nofold", False)]:
        path = f"{OUT}/{name}"
        done = f"{OUT}/{name}.done"
        if os.path.exists(done):
            print(json.dumps({"leg": name, "cached": True}))
            continue
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        ann_index.ann_index_build(
            c, "vec_id", "embedding", path, dim=DIM,
            n_cells=64, n_subspaces=8, n_centroids=32, vec_buckets=64,
        )
        t0 = time.time()
        n_del = DELETES if fold else DELETES_CONTROL
        if name != "ann_base":
            ann_index._DEAD_FOLD_FILES = 32 if fold else 10**9
            for i in range(n_del):
                ann_index.ann_index_delete(
                    spark, path, [int(i)], compact_threshold=2.0
                )
                if (i + 1) % 200 == 0:
                    print(
                        json.dumps(
                            {
                                "leg": name,
                                "deletes": i + 1,
                                "elapsed": round(time.time() - t0, 1),
                            }
                        ),
                        flush=True,
                    )
        dead_dir = os.path.join(path, "_graft_dead")
        n_files = (
            len([e for e in os.listdir(dead_dir) if not e.startswith(("_", "."))])
            if os.path.isdir(dead_dir)
            else 0
        )
        open(done, "w").write("ok")
        print(
            json.dumps(
                {
                    "leg": name,
                    "deletes": n_del if name != "ann_base" else 0,
                    "tally_files": n_files,
                    "delete_wall_s": round(time.time() - t0, 1),
                }
            ),
            flush=True,
        )


def serve(name):
    from pyspark.sql import functions as F  # noqa: F401

    from etl_apache_kafka_python_doker_aws_spark.functions import ann_index

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    path = f"{OUT}/{name}"
    q = corpus(spark, n=64, seed=99)
    # one warm-up (JVM/codegen), then median of 3 — auto shortlist reads
    # the dead tally per call, which is the statistic under test
    ts = []
    for i in range(4):
        t0 = time.time()
        n = ann_index.ann_index_search(
            q, path, k=5, n_probe=8, shortlist="auto"
        ).count()
        ts.append(time.time() - t0)
    ts_run = sorted(ts[1:])
    print(
        json.dumps(
            {
                "leg": f"serve_{name}",
                "rows": n,
                "warm": round(ts[0], 2),
                "median3": round(ts_run[1], 2),
                "all": [round(t, 2) for t in ts],
            }
        )
    )


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    if sys.argv[1] == "build":
        build()
    else:
        serve(sys.argv[2])
