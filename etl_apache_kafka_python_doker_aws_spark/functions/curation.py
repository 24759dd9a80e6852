"""Training-data curation operators — round-2 additions to the
LLM-pipeline family (SURVEY.md §2.11): benchmark-contamination checks,
embedding-space clustering, domain-mixture sampling, and sequence
packing. All are declarative DataFrame compositions (no Python in the
hot path) so they inherit Catalyst's pushdown/pruning and scale by
shuffle on well-chosen keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped — the shared
    tokenization for n-gram contamination (DuckDB mirror:
    ``list_filter(regexp_split_to_array(lower(trim(x)), '\\s+'), t -> t <> '')``).
    """
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    return F.filter(toks, lambda t: t != "")


def word_ngrams(text: Column | str, n: int) -> Column:
    """All word n-grams of a document as an array of space-joined
    strings, built JVM-side with slice/sequence HOFs (no explode+window
    shuffle, no Python). Documents shorter than ``n`` tokens yield an
    empty array (Spark's ``sequence(1, 0)`` would count DOWN — the
    ``when`` guard is load-bearing)."""
    toks = word_tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark-contamination check: for every corpus document, how many
    of its distinct word n-grams also occur in the benchmark set.

    Shape at 100 TB: both sides explode to (doc, gram), the benchmark
    side is reduced to DISTINCT grams (typically ≪ corpus — eval sets are
    small), and the hit count is a semi-join-style equi-join on the gram
    string followed by a per-doc count — all hash-partitioned by gram,
    no all-pairs comparison. For very large benchmarks, swap the gram
    string for ``xxhash64(gram)`` on both sides to shrink shuffle width
    (not done here so the DuckDB oracle can mirror the join key exactly).
    """
    # per-doc dedup happens JVM-side in the projection (array_distinct),
    # so the exploded (doc, gram) stream is already distinct-per-doc and
    # the full-corpus-width DISTINCT shuffle disappears — measured 41.7 s →
    # 9.3 s at 200k worst-case docs (steady-state, local[32]). Only the benchmark side still runs a
    # global distinct (eval sets are small by construction).
    #
    # r15 (guide §2.4 — one pass, not three): the pre-r15 shape
    # evaluated the CORPUS LINEAGE three times in one plan — a totals
    # aggregate, a hits join+aggregate, and a corpus.select(id) spine
    # joined back for zero-gram docs (Catalyst does not CSE across join
    # branches, and when `corpus` is itself an expensive frame — l11
    # feeds the near-dedup survivor lineage here — each evaluation
    # re-ran it). explode_OUTER keeps a NULL-gram row per gram-less
    # doc, so every doc survives the single pass: one LEFT join against
    # the distinct benchmark grams (≤1 match per gram — bench_g is
    # distinct — so no fan-out) and ONE groupBy computes n_grams
    # (count(gram): NULL-excluded) and n_hit (count of matches)
    # together. A/B at sf0.1 (interleaved, identical outputs): raw
    # corpus (the l6_contamination shape) 4.88 → 4.36 s (−11%); inside
    # l11 the delta is parity (7.79 vs 7.80 — near-dedup's CC
    # checkpoint already truncates the lineage there and
    # ReusedExchange absorbed part of the old triple evaluation).
    grams_c = corpus.select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(word_ngrams(text_col, n))).alias("gram"),
    )
    bench_g = (
        benchmark.select(
            F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("gram")
        ).distinct()
    )
    per_doc = (
        grams_c.join(bench_g.withColumn("_hit", F.lit(1)), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("n_grams"),
            F.count("_hit").alias("n_hit"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("n_hit"),
        (F.col("n_hit") / F.nullif(F.col("n_grams"), F.lit(0))).alias(
            "contamination_rate"
        ),
    )


def cluster_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 42,
    train_fraction: float | None = None,
) -> DataFrame:
    """Embedding-space clustering for corpus topic/domain balancing:
    seeded KMeans (MLlib) → per-cluster size and mean squared distance
    to the centroid. The centroid model is O(k·dim) and broadcasts; the
    assignment pass is one map over the corpus and the stats are a
    two-phase hash aggregate on cluster_id. ``train_fraction`` samples
    the KMeans training set (at 100 TB train on ~1e-4 of the corpus;
    assignment still covers every vector)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    dense = ensure_parallelism(embeddings).select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features"),
    )
    train = dense.select("features")
    if train_fraction is not None and train_fraction < 1.0:
        train = train.sample(withReplacement=False, fraction=train_fraction, seed=seed)
    model = KMeans(k=k, seed=seed, maxIter=10).fit(train)
    assigned = model.transform(dense).withColumnRenamed("prediction", "cluster_id")

    centers = model.clusterCenters()
    # Index into the centroid MATRIX first, then one zip_with against the
    # row's OWN centroid: 1×dim work per row. The earlier form built an
    # array of k per-centroid distance aggregates and element_at-picked
    # one — k×dim multiply-adds per row to keep a single value.
    # one-py4j-call nested literal (r10, similarity._model_lit): the
    # per-scalar F.lit form built k × dim Columns of driver time per call
    from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
        _model_lit,
    )

    centroid_matrix = _model_lit([list(map(float, c)) for c in centers])
    own_center = F.element_at(centroid_matrix, F.col("cluster_id") + 1)
    sq_dist = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            own_center,
            lambda x, cc: (x.cast("double") - cc) * (x.cast("double") - cc),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # vec_col rides through transform(), so no re-join with the source —
    # one scan, zero extra shuffles (review finding r2)
    with_dist = assigned.select(id_col, vec_col, "cluster_id").withColumn(
        "_sqd", sq_dist
    )
    return with_dist.groupBy("cluster_id").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("_sqd"), 4).alias("mean_sq_dist"),
    )


def domain_mix(
    documents: DataFrame,
    targets: dict[str, int],
    id_col: str = "doc_id",
    domain_col: str = "source",
    default_pct: int = 10,
) -> DataFrame:
    """Deterministic domain-mixture sampling: keep ``doc_id % 100 <
    pct(domain)`` so every engine/run selects the identical subset (the
    sampler is a pure projection — no shuffle, no RNG state). Returns
    per-domain totals, sampled counts, and the achieved rate. At scale
    the mod-filter pushes down to the scan and the summary is a
    two-phase aggregate; swap ``pmod(doc_id, 100)`` for
    ``pmod(xxhash64(doc_id), 100)`` when ids are not uniformly
    distributed (documented, not default, to keep the oracle mirror
    trivial)."""
    pct = F.lit(default_pct)
    for dom, p in sorted(targets.items()):
        pct = F.when(F.col(domain_col) == dom, F.lit(p)).otherwise(pct)
    sampled = (F.pmod(F.col(id_col), F.lit(100)) < pct).cast("int")
    return (
        documents.select(F.col(domain_col), pct.alias("target_pct"), sampled.alias("_s"))
        .groupBy(domain_col, "target_pct")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_s").alias("n_sampled"),
        )
        .withColumn("achieved_rate", F.col("n_sampled") / F.col("n_docs"))
    )


def pack_bins(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    shards: int = 8,
) -> DataFrame:
    """Sequence packing for training batches: assign documents to
    fixed-token-budget bins with the contiguous-fill approximation —
    shard by ``doc_id % shards``, order within the shard, running token
    cumsum, ``bin = (cumsum - tokens) div budget``.

    Exact first-fit packing is inherently sequential; contiguous fill is
    the standard distributed approximation (each bin may overflow by at
    most one document and underfill by less than one). The window
    partitions by shard, so parallelism = ``shards`` — at 100 TB set
    shards ≈ executor-cores and the per-shard sort is the only cost.
    Integer ``div`` keeps the bin id exact (no float rounding drift).
    """
    from pyspark.sql.window import Window

    # shared tokenizer (count is lowercase-invariant) + coalesce: a NULL
    # text would otherwise propagate NULL through the cumsum and create
    # a NULL bin_id group with NULL bin_tokens
    toks = F.coalesce(F.size(word_tokens(text_col)), F.lit(0))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = documents.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(shards)).alias("shard"),
        toks.alias("n_tokens"),
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    binned = staged.withColumn(
        "bin_id", F.expr(f"(cum_tokens - n_tokens) div {budget}")
    )
    return binned.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )
