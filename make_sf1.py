#!/usr/bin/env python
"""Synthesize an sf1-class fixture set for the registry-wide sweep
(VERDICT r6 #6 / r7 #3): the driver ships sf{0.001,0.01,0.1} only, so
this derives a 10× corpus from sf0.1 by KEY-OFFSET REPLICATION — the
cheapest honest proof that no oracle contract is fixture-size-dependent
(documents/embeddings don't scale linearly below sf0.1, so sf0.1-only
green leaves size-coupling invisible).

Construction (replica 0 is byte-identical to sf0.1; k = 1..9):
  * region/nation: copied as-is (fixed dimensions — replicating them
    would break the 5-region/25-nation star semantics).
  * customer/supplier/part/orders/lineitem/events: every key column
    (+1e7 × k) so intra-replica joins land exactly and replicas never
    collide; measures/dates/flags untouched, so per-replica aggregates
    equal the sf0.1 ones and the 10× totals stress shuffle width, not
    value ranges.
  * documents: doc_id += 1e4·k (NOT the 1e7 used for business keys —
    see DOC_OFF below: several contracts detect in-query planted copies
    by `id >= 100000`, so every replica id must stay BELOW the plant
    space), and every TOKEN of replica k>0 is prefixed `r{k}x` —
    replicas share zero shingles, so the near-dup pair structure per
    replica matches sf0.1 instead of exploding into 10-cliques of
    verbatim copies (which would break the enumerated planted-pair
    oracles); n_chars recomputed from the tagged text.
  * embeddings: vec_id += 1e4·k (same plant-space rule), and replica
    k>0 vectors get deterministic per-component noise in [-0.5, 0.5)
    from xxhash64(vec_id, k, i) — decorrelates replicas (near-uniform
    base ⇒ cross-replica cosine ≈ random) so planted-twin / SemDeDup
    contracts keep their exact enumerations.

Each table lands as ONE parquet FILE named <t>.parquet (the harness and
DuckDB read single files, matching the driver fixtures).

Usage: python make_sf1.py [outdir]   # default /tmp/sf1_synth
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
OFF = 10_000_000
# documents/embeddings use a SMALL offset: several registered contracts
# plant in-query copies at id+100000 and identify them by `id >= 100000`
# (documented shared-id-space rule, e.g. l2_dedup_pipeline) — replica
# ids must stay BELOW the plant space or every replica doc reads as a
# surviving planted copy. sf0.1 has 5000 docs / 2000 vectors, so 1e4
# per replica keeps all real ids < 1e5 with zero collisions.
DOC_OFF = 10_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _single_file(df, out_dir: str, name: str) -> None:
    tmp = os.path.join(out_dir, f"_stage_{name}")
    # repartition (shuffle barrier), NOT coalesce: coalesce(1) would
    # collapse the whole generation pipeline into one task — the
    # replicas' regexp/noise work must run wide, only the write narrows
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(out_dir, f"{name}.parquet"))
    shutil.rmtree(tmp)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    os.makedirs(out, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from etl_apache_kafka_python_doker_aws_spark import get_spark

    spark = get_spark(app_name="make_sf1")
    for t in ["region", "nation"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t, keys in KEY_COLS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        reps = []
        off = DOC_OFF if t in ("documents", "embeddings") else OFF
        for k in range(REPLICAS):
            r = base
            for c in keys:
                r = r.withColumn(c, F.col(c) + F.lit(k * off))
            if k > 0 and t == "documents":
                r = r.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", rf"r{k}x$1")
                ).withColumn("n_chars", F.length("text").cast("int"))
            if k > 0 and t == "embeddings":
                noise = lambda i, kk=k: (
                    F.pmod(
                        F.xxhash64(F.col("vec_id"), F.lit(kk), i), F.lit(1000)
                    ).cast("double")
                    / 1000.0
                    - 0.5
                )
                r = r.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, i: (x.cast("double") + noise(i)).cast("float"),
                    ),
                )
            reps.append(r)
        full = reps[0]
        for r in reps[1:]:
            full = full.unionByName(r)
        _single_file(full, out, t)
        print(t, "rows:", spark.read.parquet(f"{out}/{t}.parquet").count(), flush=True)
    print("done:", out)


if __name__ == "__main__":
    main()
