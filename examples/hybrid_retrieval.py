#!/usr/bin/env python
"""Hybrid retrieval walkthrough: BM25 (sparse) + exact cosine (dense)
fused with Reciprocal Rank Fusion — the round-6 retrieval tier over the
documents/embeddings fixtures.

Run:  python examples/hybrid_retrieval.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark import get_spark
from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
    cosine_topk,
    pq_topk,
    rrf_fuse,
)
from etl_apache_kafka_python_doker_aws_spark.functions.text import bm25_topk


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    spark.sparkContext.setLogLevel("WARN")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. sparse leg: BM25 over a literal term query
    lex = bm25_topk(docs, ["spark", "vector", "merge"], k=10)
    print("-- BM25 top-10 (sparse) --")
    lex.show(10, truncate=False)

    # 2. dense leg: exact cosine neighbors of query vector 0
    dense = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=10).select(
        F.col("neighbor_id").alias("doc_id"), "rk"
    )

    # 3. fuse with RRF (calibration-free)
    fused = rrf_fuse([lex.select("doc_id", "rk"), dense], top=10)
    print("-- RRF fusion of BM25 + cosine --")
    fused.show(10, truncate=False)

    # 4. the same dense leg at memory scale: PQ codes + ADC shortlist +
    #    exact re-rank (32x less scan memory than raw vectors)
    approx = pq_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=10,
        dim=64, n_subspaces=8, n_centroids=32, shortlist=50,
    )
    print("-- PQ ADC + exact re-rank top-10 (compressed dense) --")
    approx.show(10, truncate=False)


if __name__ == "__main__":
    main()
