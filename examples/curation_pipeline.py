#!/usr/bin/env python
"""Training-data curation walkthrough: the L6-L13 operator family as a
user-facing library — quality rules, dedup at three granularities,
decontamination, clustering, domain mixing, splitting, and packing.

Run:  python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark import get_spark
from etl_apache_kafka_python_doker_aws_spark.catalog import load_table
from etl_apache_kafka_python_doker_aws_spark.functions.curation import (
    cluster_stats,
    contamination_stats,
    domain_mix,
    pack_bins,
)
from etl_apache_kafka_python_doker_aws_spark.functions.dedup import dedup_corpus_near


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    print(f"corpus: {docs.count()} documents")

    # 1. held-out benchmark slice + decontamination stats
    benchmark = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    contam = contamination_stats(corpus, benchmark, n=5)
    n_contaminated = contam.filter(F.col("contamination_rate") > 0.5).count()
    print(f"decontamination: {n_contaminated} docs share >50% of 5-grams with the benchmark")

    # 2. near-dedup (MinHash-LSH → connected components)
    deduped = dedup_corpus_near(corpus, threshold=0.9)
    print(f"near-dedup: {corpus.count()} -> {deduped.count()} docs")

    # 3. domain mixing and a stable train/val/test split
    mix = domain_mix(deduped, {"src0": 50, "src1": 25}, default_pct=10)
    mix.orderBy("source").show(5)

    # 4. embedding-space clusters (topic balance diagnostics)
    emb = load_table(spark, sf_dir, "embeddings")
    cluster_stats(emb, k=8, seed=42).orderBy("cluster_id").show()

    # 5. pack survivors into fixed-token training bins
    bins = pack_bins(deduped, budget=512, shards=8)
    summary = bins.agg(
        F.count("*").alias("n_bins"), F.sum("bin_tokens").alias("total_tokens")
    )
    summary.show()

    # 6. incremental ingestion: Bloom-gate a "new crawl" against the
    #    curated corpus (no false negatives; probes broadcast the bitmap)
    from etl_apache_kafka_python_doker_aws_spark.functions.sketches import (
        bloom_build,
        bloom_might_contain,
        heavy_hitters,
    )

    bitmap = bloom_build(deduped.select("text"), "text")
    new_batch = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    gated = bloom_might_contain(
        new_batch, "text", bitmap, result_col="already_seen"
    )
    n_new = gated.filter(~F.col("already_seen")).count()
    print(f"incremental ingest: {new_batch.count()} crawled, {n_new} genuinely new")

    # 7. dominant sources sanity check (exact heavy hitters, bounded
    #    memory; the fixture is a uniform 20-source mix at 5% each)
    heavy_hitters(docs, "source", min_freq_ratio=0.05).orderBy("source").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
