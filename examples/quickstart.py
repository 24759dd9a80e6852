#!/usr/bin/env python
"""Quickstart: the engine as a user-facing library.

Run:  python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark import get_spark, load_tables
from etl_apache_kafka_python_doker_aws_spark.functions.dedup import minhash_near_dup_pairs
from etl_apache_kafka_python_doker_aws_spark.functions.similarity import cosine_topk
from etl_apache_kafka_python_doker_aws_spark.operators.joins import asof_join
from etl_apache_kafka_python_doker_aws_spark.operators.windows import top_k_per_group


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")
    t = load_tables(spark, sf_dir)

    print("== relational: revenue by priority (join + agg) ==")
    (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("o_orderpriority")
        .show()
    )

    print("== operator library: top-3 orders per segment ==")
    joined = t["orders"].join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
    top_k_per_group(
        joined.select("c_mktsegment", "o_orderkey", "o_totalprice"),
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).show()

    print("== as-of join: latest click before each purchase ==")
    e = t["events"]
    asof_join(
        e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts"),
        e.filter(F.col("event_type") == "click").select("user_id", "ts", "value"),
        key="user_id", left_ts="ts", right_ts="ts", payload_cols=["value"],
    ).show(5)

    print("== LLM ops: near-duplicate documents (MinHash LSH) ==")
    minhash_near_dup_pairs(t["documents"], "doc_id", "text", threshold=0.8).show(5)

    print("== LLM ops: top-3 similar embeddings for 3 queries ==")
    cosine_topk(t["embeddings"], t["embeddings"].filter(F.col("vec_id") < 3), k=3).show()

    spark.stop()


if __name__ == "__main__":
    main()
