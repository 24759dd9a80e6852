#!/usr/bin/env python
"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is a full-plan action via the noop sink (no driver-side collect
bottleneck — rows are produced and discarded executor-side), matching how
a cluster job would drain results to a sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family, weighted toward the plans whose
# shape matters at scale (fact-fact join, window shuffle, LSH dedup,
# similarity search, streaming parity, full ETL pipeline).
HEADLINE = [
    "a1_pricing_summary",
    "a3_count_distinct",
    "a5_cube",
    "j1_inner_join",
    "j2_broadcast_join",
    "j7_asof_join",
    "w1_ranking",
    "w4_running_sum",
    "o3_topk_per_group",
    "l1_exact_dedup",
    "l2_minhash_near_dup",
    "l3_cosine_topk",
    "l4_word_topk",
    "t2_tumbling_window",
    "etl_reference_pipeline",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_apache_kafka_python_doker_aws_spark import get_spark
    from etl_apache_kafka_python_doker_aws_spark.workloads import QUERIES

    spark = get_spark(app_name="etl_apache_kafka_python_doker_aws_spark-bench")

    # Warm the JVM/session so the first measured query doesn't pay
    # startup, codegen-compiler, or page-cache costs.
    spark.range(1000).selectExpr("sum(id)").collect()
    QUERIES[HEADLINE[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Warm the Structured Streaming machinery too: the first streaming
    # query in a session pays ~3 s of one-time setup (state-store/
    # checkpoint/micro-batch engine init) that is not a data-path cost —
    # measured 4.6 s first vs 1.6 s second identical query in-session
    # (VERDICT r1 bench note on t2). A trivial rate-source query absorbs it.
    import tempfile

    _wd = tempfile.mkdtemp(prefix="bench_stream_warmup_")
    (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(_wd, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
