"""Similarity search over embedding columns (SURVEY.md §2.11 L3/L5).

Two tiers, same API:
  * `cosine_topk` — exact brute force: broadcast the (small) query set,
    JVM HOF dot products, per-query top-k via window. The correctness
    baseline and the right choice when |queries| is small.
  * `lsh_topk` — random-hyperplane (sign) LSH: bucket corpus + queries by
    signature bands, search only colliding buckets. The 100 TB path —
    candidate generation is an equi-join, never a cross join.

Vectors are `array<float>`; all arithmetic is cast to double so results
are stable and DuckDB-comparable.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns via zip_with + aggregate (JVM)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) ⋈ corpus (no shuffle of the corpus),
    then one window shuffle on query_id for the top-k — the optimal exact
    plan when queries fit in a broadcast (≤ ~10 MB of vectors).
    Excludes self-matches. Ties break on corpus id for determinism.
    """
    from pyspark.sql.window import Window

    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qvec"), F.col("_cvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_signature(vec: Column, planes: list[list[float]], band_bits: int = 4) -> Column:
    """Sign-LSH signature: bit i = (vec · plane_i) >= 0, grouped into
    bands of `band_bits` bits. Returns an array<int> of band hashes.

    Band width tunes selectivity: for vectors at angle θ a bit agrees with
    prob 1-θ/π, a band collides at that prob^band_bits. Weakly-similar
    corpora (near-orthogonal embeddings) need narrow bands (4) + more
    bands for recall; tight near-dup search can afford 8-16."""
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(w)) for w in plane]),
                    lambda x, wgt: x.cast("double") * wgt,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0
        ).cast("int")
        for plane in planes
    ]
    bands = []
    for b in range(0, len(bits), band_bits):
        chunk = bits[b : b + band_bits]
        acc = F.lit(0)
        for bit in chunk:
            acc = acc * 2 + bit
        bands.append((F.lit(b // band_bits) * 100000 + acc).alias(f"band{b // band_bits}"))
    return F.array(*bands)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 32,
    band_bits: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via sign-LSH band collision.

    corpus and queries are bucketed by band signature; candidates are
    pairs colliding in ≥1 band (equi-join on band value), then exact
    cosine + window top-k on candidates only. Recall is tunable via
    n_planes/bands; at 100 TB the band join replaces the full scan per
    query that brute force would need.
    """
    from pyspark.sql.window import Window

    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.explode(lsh_signature(F.col(vec_col), planes, band_bits)).alias("band"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.explode(lsh_signature(F.col(vec_col), planes, band_bits)).alias("band"),
    )
    cand = (
        c.join(q, "band")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_qvec"), F.col("_cvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )
