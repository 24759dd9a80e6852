#!/usr/bin/env python
"""Round-15 scale probe: band-tier stored-payload predicate filtering
(`minhash_index_pairs_vs_batch(where=...)`) vs the r14 `allowed=`
id-set API for the SAME broad filter, at 1M indexed docs.

The claim under test (VERDICT r14 #2, closed this round on both index
families): a broad attribute filter ("lang = 'de'", half the corpus — the batch ids are all odd/'de', so the filtered pair set is non-empty)
through the id-set API forces a corpus-sized allowed frame and an
`_id` semi-join — the index shuffles once per call. Through the
payload predicate it is a PUSHED parquet scan filter — no extra frame,
no join, no shuffle, so the filtered query should cost ≈ the
unfiltered one at any selectivity.

Corpus: the scale_probe.py deterministic 1M-doc shape (id-derived
tokens, 10-near-copy families) + `lang` = 'en'/'de' by doc parity as
the stored payload. Batch = last 1% of ids (the incremental-snapshot
shape), appended second so batch-vs-index pairs exist.

Discipline (r11/r12 probe rules): build cached behind a done-marker;
each timed leg runs in a FRESH process, serially, quiet machine;
partial JSON per leg.

Usage:
  python probe_r15.py build      # synthesize + index 1M docs (cached)
  python probe_r15.py plain      # unfiltered pairs (baseline)
  python probe_r15.py where      # broad predicate via where=
  python probe_r15.py allowed    # same filter via the id-set API

ANN-side legs (the same claim on the L3 tier — 1M × 64d vectors,
IVF-PQ index with a `lang` payload, 100-query batch):
  python probe_r15.py abuild         # synthesize + build (cached)
  python probe_r15.py asearch        # unfiltered top-5 (baseline)
  python probe_r15.py awhere         # broad predicate, retarget on
  python probe_r15.py awhere_nort    # broad predicate, retarget off
  python probe_r15.py aallowed       # same filter via the id-set API
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE = "/tmp/probe_r15"
DOCS_PARQUET = f"{BASE}/docs.parquet"
INDEX = f"{BASE}/band_idx"
DONE = f"{BASE}/.build_done"
N = int(os.environ.get("PROBE_R15_DOCS", "1000000"))
BATCH_FRAC = 100  # batch = ids with id % BATCH_FRAC == 7 (1%)


def _spark():
    from etl_apache_kafka_python_doker_aws_spark import get_spark

    return get_spark(app_name="probe-r15")


def _docs(spark):
    from pyspark.sql import functions as F

    # the scale_probe corpus recipe: 60 tokens/doc from a 30k vocab via
    # xxhash64(content_id, pos); 10-near-copy families per 50 ids
    content = (
        F.when((F.col("id") % 50) < 10, F.col("id") - F.col("id") % 50)
        .otherwise(F.col("id"))
    )
    tok = lambda i: F.concat(
        F.lit("w"),
        F.pmod(F.xxhash64(content, F.lit(i)), F.lit(30000)).cast("string"),
    )
    text = F.concat_ws(" ", *[tok(i) for i in range(60)])
    return (
        spark.range(N)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.when(F.col("id") % 2 == 0, F.lit("en"))
            .otherwise(F.lit("de"))
            .alias("lang"),
        )
        .repartition(64)
    )


def phase_build():
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_append,
    )

    if os.path.exists(DONE):
        print(json.dumps({"leg": "build", "cached": True}))
        return
    spark = _spark()
    os.makedirs(BASE, exist_ok=True)
    t0 = time.time()
    d = _docs(spark)
    d.write.mode("overwrite").parquet(DOCS_PARQUET)
    docs = spark.read.parquet(DOCS_PARQUET)
    base = docs.filter("doc_id % 100 <> 7")
    batch = docs.filter("doc_id % 100 = 7")
    minhash_index_append(
        base, "doc_id", "text", INDEX, batch_id="base",
        payload_cols=["lang"],
    )
    minhash_index_append(batch, "doc_id", "text", INDEX, batch_id="b1")
    open(DONE, "w").write("ok")
    print(json.dumps({"leg": "build", "sec": round(time.time() - t0, 1),
                      "n": N}))


def _time_pairs(tag: str, **kw):
    from etl_apache_kafka_python_doker_aws_spark.functions.dedup_index import (
        minhash_index_pairs_vs_batch,
    )

    spark = _spark()
    t0 = time.time()
    n = minhash_index_pairs_vs_batch(
        spark, INDEX, "b1", threshold=0.5, **kw
    ).count()
    print(json.dumps({"leg": tag, "sec": round(time.time() - t0, 2),
                      "pairs": n}))


VEC_PARQUET = f"{BASE}/vecs.parquet"
ANN_INDEX = f"{BASE}/ann_idx"
ANN_DONE = f"{BASE}/.abuild_done"
NV = int(os.environ.get("PROBE_R15_VECS", "1000000"))
DIM = 64


def phase_abuild():
    from pyspark.sql import functions as F

    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_build,
    )

    if os.path.exists(ANN_DONE):
        print(json.dumps({"leg": "abuild", "cached": True}))
        return
    spark = _spark()
    os.makedirs(BASE, exist_ok=True)
    t0 = time.time()
    comp = lambda i: (
        F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(10000)).cast("double")
        / 5000.0 - 1.0
    )
    spark.range(NV).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(i) for i in range(DIM)]).alias("embedding"),
        F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit("de"))
        .alias("lang"),
    ).repartition(64).write.mode("overwrite").parquet(VEC_PARQUET)
    vecs = spark.read.parquet(VEC_PARQUET)
    ann_index_build(
        vecs, "vec_id", "embedding", ANN_INDEX, dim=DIM, n_cells=64,
        n_subspaces=8, n_centroids=64, payload_cols=["lang"],
    )
    open(ANN_DONE, "w").write("ok")
    print(json.dumps({"leg": "abuild", "sec": round(time.time() - t0, 1),
                      "n": NV}))


def _time_search(tag: str, **kw):
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_search,
    )

    spark = _spark()
    q = spark.read.parquet(VEC_PARQUET).filter("vec_id < 100").select(
        "vec_id", "embedding"
    )
    t0 = time.time()
    n = ann_index_search(
        q, ANN_INDEX, k=5, n_probe=8, shortlist=2000, **kw
    ).count()
    print(json.dumps({"leg": tag, "sec": round(time.time() - t0, 2),
                      "hits": n}))


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else ""
    if phase == "build":
        phase_build()
    elif phase == "abuild":
        phase_abuild()
    elif phase == "asearch":
        _time_search("ann_plain")
    elif phase == "awhere":
        _time_search("ann_where_broad", where="lang = 'de'")
    elif phase == "awhere_nort":
        _time_search("ann_where_broad_nort", where="lang = 'de'",
                     retarget_probes=False)
    elif phase == "aallowed":
        spark = _spark()
        allowed = (
            spark.read.parquet(VEC_PARQUET)
            .filter("lang = 'de'")
            .select("vec_id")
        )
        _time_search("ann_allowed_broad", allowed=allowed)
    elif phase == "plain":
        _time_pairs("plain")
    elif phase == "where":
        _time_pairs("where_broad", where="lang = 'de'")
    elif phase == "allowed":
        spark = _spark()
        allowed = (
            spark.read.parquet(DOCS_PARQUET)
            .filter("lang = 'de'")
            .select("doc_id")
        )
        _time_pairs("allowed_broad", allowed=allowed)
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main()
