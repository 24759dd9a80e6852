#!/usr/bin/env python
"""Round-14 scale probe: index-backed multi-vector retrieval
(`similarity.ann_grouped_topk`) vs the exact grouped scan
(`l3_grouped_maxsim` shape) at 1M chunks / 100k docs.

The claim under test (VERDICT r13 #1): the exact form scans the WHOLE
chunk tier per query batch, so its cost is corpus-proportional; the
index form touches probed cells + a bounded shortlist, so it is
query-batch-proportional. At 100 TB only the second shape serves.

Discipline (the r11/r12 probe rules): each leg runs in a FRESH process
(same-process-after-build serving timings read 3-7× inflated), legs are
timed SERIALLY on a quiet machine, partial JSON prints per leg, and the
expensive artifacts (the 1M-vector corpus parquet + the built index)
are cached behind done-markers so a rerun only re-times.

Usage:
  python probe_r14.py corpus   # phase 1: synthesize corpus parquet
  python probe_r14.py build    # phase 2: build the index (fresh proc)
  python probe_r14.py grouped  # phase 3: time index-backed retrieval
  python probe_r14.py exact    # phase 4: time the exact grouped scan
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE = "/tmp/probe_r14"
CORPUS = f"{BASE}/chunks.parquet"
INDEX = f"{BASE}/ann_idx"
N = 1_000_000
DIM = 64
DOCS = 100_000  # doc_id = vec_id % DOCS → 10 chunks/doc
N_Q = 100
K = 5
CHUNK_K = 20


def _spark():
    from etl_apache_kafka_python_doker_aws_spark import get_spark

    return get_spark(app_name="probe-r14")


def phase_corpus():
    if os.path.exists(f"{BASE}/.corpus_done"):
        print(json.dumps({"phase": "corpus", "cached": True}))
        return
    from pyspark.sql import functions as F

    spark = _spark()
    os.makedirs(BASE, exist_ok=True)
    # deterministic per-component values from xxhash64 (the make_sf1
    # noise recipe) — no RNG, reproducible across reruns
    df = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (
                F.xxhash64(F.col("id"), i).cast("double") / F.lit(2.0**63)
            ),
        ).alias("embedding"),
    )
    df.repartition(32).write.mode("overwrite").parquet(CORPUS)
    open(f"{BASE}/.corpus_done", "w").write("ok")
    print(json.dumps({"phase": "corpus", "rows": N}))


def phase_build():
    if os.path.exists(f"{BASE}/.build_done"):
        print(json.dumps({"phase": "build", "cached": True}))
        return
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_build,
    )

    spark = _spark()
    e = spark.read.parquet(CORPUS)
    t0 = time.time()
    ann_index_build(
        e, "vec_id", "embedding", INDEX, dim=DIM, n_cells=64,
        n_subspaces=8, n_centroids=32, train_fraction=0.05,
    )
    open(f"{BASE}/.build_done", "w").write("ok")
    print(json.dumps({"phase": "build", "sec": round(time.time() - t0, 2)}))


def _queries(spark):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(CORPUS)
        .filter(F.col("vec_id") < N_Q)
        .select("vec_id", "embedding")
    )


def _doc_map(spark):
    from pyspark.sql import functions as F

    return spark.read.parquet(CORPUS).select(
        F.col("vec_id").alias("chunk_id"),
        F.pmod(F.col("vec_id"), F.lit(DOCS)).alias("doc_id"),
    )


def phase_grouped():
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        ann_grouped_topk,
    )

    spark = _spark()
    q, dm = _queries(spark), _doc_map(spark)
    samples = []
    for _ in range(3):
        t0 = time.time()
        out = ann_grouped_topk(
            q, INDEX, dm, k=K, chunk_k=CHUNK_K, n_probe=8, shortlist="auto"
        )
        n = out.count()
        samples.append(round(time.time() - t0, 2))
        print(json.dumps({"phase": "grouped", "pass_sec": samples[-1],
                          "rows": n}), flush=True)
    samples.sort()
    print(json.dumps({"phase": "grouped", "median_sec": samples[1],
                      "samples": samples}))


def phase_exact():
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = _spark()
    e = spark.read.parquet(CORPUS)
    qn = _queries(spark).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_q")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("_q"), F.col("embedding"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("doc_id").asc()
    )
    samples = []
    for _ in range(3):
        t0 = time.time()
        out = (
            e.join(F.broadcast(qn), F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.pmod(F.col("vec_id"), F.lit(DOCS)).alias("doc_id"),
                d2.alias("dist"),
            )
            .groupBy("query_id", "doc_id")
            .agg(F.min("dist").alias("dist"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= K)
        )
        n = out.count()
        samples.append(round(time.time() - t0, 2))
        print(json.dumps({"phase": "exact", "pass_sec": samples[-1],
                          "rows": n}), flush=True)
    samples.sort()
    print(json.dumps({"phase": "exact", "median_sec": samples[1],
                      "samples": samples}))


if __name__ == "__main__":
    {"corpus": phase_corpus, "build": phase_build,
     "grouped": phase_grouped, "exact": phase_exact}[sys.argv[1]]()
