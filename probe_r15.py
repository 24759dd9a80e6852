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


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else ""
    if phase == "build":
        phase_build()
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
