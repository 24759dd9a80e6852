"""Persisted IVF-PQ ANN index (round 7): train once, encode + append
forever, search without retraining — the SERVING shape of
``similarity.ivf_pq_topk`` (which retrains its models per call; right
for one-shot analytics, wrong for an index that outlives the batch that
built it). Mirrors ``dedup_index.py``: tiny pinned models in a meta
subdir, encoded rows in partitioned parquet, loud guards on drift and
redelivery.

Index layout at ``path``:
  * data rows, ``partitionBy("cell")`` parquet:
      (_id, _codes array<int>, _batch string, cell)
    — the SCAN tier: n_subspaces small ints per vector (8 B at 8×32 vs
    512 B raw — the 64× RAM/IO reduction that lets a billion-vector
    index fit a cluster's memory).
  * ``_graft_vectors/`` raw (id, vec) parquet — the REFINE tier, read
    only by the shortlist re-rank's broadcast point-lookup join
    (|queries|·shortlist ids per search), never scanned. This is the
    standard two-tier layout: codes hot, raw vectors cold.
  * ``_graft_meta/`` — one JSON row: dims/params AND the trained models
    (IVF centroids n_cells×dim + PQ codebooks
    n_subspaces×n_centroids×sub ≈ a few thousand doubles — broadcast as
    literal expressions at search time, like ivf_pq_topk).
    Appends NEVER retrain: new vectors are encoded with the pinned
    models, so old codes stay comparable to new ones (retraining would
    silently invalidate every stored code; the drift guard makes that a
    rebuild, not an append). Meta is written LAST in the build (VERDICT
    r7 #5): a crash mid-build leaves data-without-meta, which search
    rejects loudly ("no index") instead of serving silently-empty
    results, and a retry build refuses the leftovers instead of
    append-doubling them.
  * ``_graft_batches/`` — append markers; duplicate batch_id rejected.
  * ``residual=True`` (VERDICT r7 #6) trains the PQ codebooks on
    per-cell residuals (vec − centroid[cell]) — classic FAISS IVFPQ,
    finer quantization when cells are tight. The flag is pinned in meta
    like every other model parameter: appends and searches derive the
    encode/LUT shape from it, so an index can never mix residual and
    global codes.

Scale notes: search is one cell equi-join (codes ⋈ exploded query
probes) + one window + one broadcast refine join — no corpus crossJoin,
no shuffle of the index (the probe side is the small one; AQE
broadcasts it). Cell partitioning gives the scan locality; when the
query set is known driver-side, pass ``probe_cells`` to turn the join
into a partition-pruned scan of just those directories. Model staleness
under heavy appends is the documented operational limit: centroids
drift from the true distribution as the corpus grows — monitor recall
and rebuild when it decays (same playbook as FAISS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_apache_kafka_python_doker_aws_spark.functions.similarity import (
    _kmeans_cells,
    _pq_assign,
    _pq_train,
    _query_probe_luts,
    _residual,
    _subspace_dists,
)

_META_DIR = "_graft_meta"
_BATCH_DIR = "_graft_batches"
_VEC_DIR = "_graft_vectors"


def ann_index_meta(spark: SparkSession, path: str) -> dict | None:
    """Read params + trained models, or None if no index at ``path``."""
    try:
        row = spark.read.json(f"{path}/{_META_DIR}").first()
    except Exception:
        return None
    if row is None:
        return None
    return {
        "dim": int(row.dim),
        "n_cells": int(row.n_cells),
        "n_subspaces": int(row.n_subspaces),
        "n_centroids": int(row.n_centroids),
        "seed": int(row.seed),
        # pre-r8 indexes lack the flag; they were built global-codebook
        "residual": bool(row.residual) if "residual" in row.__fields__ else False,
        "centroids": [list(map(float, c)) for c in row.centroids],
        "codebooks": [
            [list(map(float, c)) for c in book] for book in row.codebooks
        ],
    }


def _fs_nonempty(spark: SparkSession, path: str) -> bool:
    """True if ``path`` exists and holds anything — Hadoop FS API, so it
    works on whatever filesystem the index targets."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs.exists(hpath) and len(fs.listStatus(hpath)) > 0


def ann_index_batches(spark: SparkSession, path: str) -> list[str]:
    try:
        rows = spark.read.json(f"{path}/{_BATCH_DIR}").collect()
    except Exception:
        return []
    return [r.batch_id for r in sorted(rows, key=lambda r: r.seq)]


def _dim_guarded(vec: "F.Column", dim: int, who: str) -> "F.Column":
    """Lazy raise_error guard (ADVICE r7, the cdc_apply pattern — zero
    extra jobs): a wrong-dimension vector would zip_with into NULL
    distance sums and land unsearchable in the default partition —
    silent data loss. Fail loudly at encode/search time instead."""
    return F.when(F.size(vec) == dim, vec).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{who}: vector dim "),
                F.size(vec).cast("string"),
                F.lit(f" != index dim {dim}"),
            )
        )
    )


def _encode_with_models(
    df: DataFrame, id_col: str, vec_col: str, meta: dict, batch_id: str
) -> DataFrame:
    """Assign cells + PQ codes using the index's PINNED models (pure
    JVM expressions over broadcast literals — no training pass).
    Honors ``meta['residual']``: codes are computed over
    (vec − centroid[cell]) when the index was built residual."""
    sub = meta["dim"] // meta["n_subspaces"]
    dense = df.select(
        F.col(id_col).alias("_id"),
        _dim_guarded(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            meta["dim"],
            "ann_index encode",
        ).alias("_v"),
    )
    assigned = dense.select(
        "_id",
        "_v",
        _subspace_dists(F.col("_v"), meta["centroids"]).alias("_d"),
    ).select(
        "_id",
        "_v",
        (F.array_position(F.col("_d"), F.array_min(F.col("_d"))) - 1)
        .cast("int")
        .alias("cell"),
    )
    if meta.get("residual"):
        assigned = assigned.withColumn(
            "_v", _residual(F.col("_v"), F.col("cell"), meta["centroids"])
        )
    coded = _pq_assign(assigned, meta["codebooks"], sub)
    return coded.select(
        "_id",
        F.array(
            *[F.col(f"_c{s}") for s in range(meta["n_subspaces"])]
        ).alias("_codes"),
        F.lit(batch_id).alias("_batch"),
        "cell",
    )


def ann_index_build(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    *,
    dim: int,
    n_cells: int = 16,
    n_subspaces: int = 8,
    n_centroids: int = 32,
    seed: int = 42,
    train_fraction: float | None = None,
    batch_id: str = "base",
    residual: bool = False,
) -> None:
    """Train IVF centroids + PQ codebooks on ``corpus`` (seeded KMeans;
    ``train_fraction`` samples the training passes at scale), persist
    the models, and index the corpus as the first batch. Sink helper —
    runs training + write jobs. Raises if an index already exists
    (rebuild = new path or explicit cleanup; never silent retrain) or
    if the path holds leftovers from a crashed build (meta is written
    LAST, so leftovers read as "no index" to search — a retry build
    onto them would append-double the corpus; VERDICT r7 #5).
    ``residual=True`` trains PQ codebooks on (vec − centroid[cell])
    residuals — the flag is pinned in meta with the models."""
    from etl_apache_kafka_python_doker_aws_spark.util import ensure_parallelism

    spark = corpus.sparkSession
    if ann_index_meta(spark, path) is not None:
        raise ValueError(
            f"ann_index_build: index already exists at {path} — appends "
            "must use ann_index_append (models are pinned at build time); "
            "rebuild into a fresh path"
        )
    if _fs_nonempty(spark, path):
        raise ValueError(
            f"ann_index_build: {path} holds leftover files without index "
            "meta — a crashed build; remove the path and rebuild"
        )
    if dim % n_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    assigned, centroids = _kmeans_cells(
        ensure_parallelism(corpus), id_col, vec_col, n_cells, seed, train_fraction
    )
    train_in = assigned
    if residual:
        train_in = assigned.select(
            "_id",
            _residual(F.col("_v"), F.col("_cell"), centroids).alias("_v"),
            "_cell",
        )
    codebooks = _pq_train(train_in, sub, n_subspaces, n_centroids, seed, train_fraction)
    meta = {
        "dim": dim,
        "n_cells": n_cells,
        "n_subspaces": n_subspaces,
        "n_centroids": n_centroids,
        "seed": seed,
        "residual": residual,
        "centroids": centroids,
        "codebooks": codebooks,
    }
    _write_batch(corpus, id_col, vec_col, path, meta, batch_id, seq=0)
    # meta LAST: its presence is the build's commit marker — search and
    # retry-build treat meta-less leftovers as a failed build, loudly
    spark.createDataFrame([meta]).coalesce(1).write.mode("overwrite").json(
        f"{path}/{_META_DIR}"
    )


def ann_index_append(
    new_df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    *,
    batch_id: str,
) -> None:
    """Encode ``new_df`` with the index's PINNED models and append —
    no retraining, so existing codes stay comparable. Duplicate
    batch_id rejected loudly (the dedup_index redelivery rule)."""
    spark = new_df.sparkSession
    meta = ann_index_meta(spark, path)
    if meta is None:
        raise ValueError(f"ann_index_append: no index at {path} — build first")
    existing = ann_index_batches(spark, path)
    if batch_id in existing:
        raise ValueError(
            f"ann_index_append: batch_id {batch_id!r} already appended to "
            f"{path} — use a fresh batch_id per delivery"
        )
    _write_batch(new_df, id_col, vec_col, path, meta, batch_id, seq=len(existing))


def _write_batch(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    meta: dict,
    batch_id: str,
    seq: int,
) -> None:
    spark = df.sparkSession
    _encode_with_models(df, id_col, vec_col, meta, batch_id).write.mode(
        "append"
    ).partitionBy("cell").parquet(path)
    df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).write.mode("append").parquet(f"{path}/{_VEC_DIR}")
    spark.createDataFrame([{"batch_id": batch_id, "seq": seq}]).coalesce(
        1
    ).write.mode("append").json(f"{path}/{_BATCH_DIR}")


def ann_index_search(
    queries: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    *,
    n_probe: int = 4,
    shortlist: int | None = 50,
    probe_cells: list[int] | None = None,
) -> DataFrame:
    """Top-k squared-L2 neighbors from the persisted index — the
    ivf_pq_topk plan over stored codes and pinned models: per-query ADC
    lookup tables + n_probe nearest cells (broadcast literal models),
    one cell equi-join against the codes scan, window shortlist, exact
    re-rank via a broadcast point-lookup join on the refine tier.

    ``probe_cells``: optional driver-known cell whitelist; when given,
    the codes scan is FILTERED on the partition column first, so only
    those cell directories are read (partition pruning — the option to
    use when the query workload's probes are precomputed). The centroid
    RANKING is restricted to the whitelist before taking the top
    n_probe (ADVICE r7): a query whose globally-nearest cells fall
    outside the whitelist still probes its nearest whitelisted cells
    instead of silently getting fewer (or zero) candidates.

    Returns (query_id, neighbor_id, dist, rk); self-matches excluded by
    id (shared-id-space rule, see pq_topk)."""
    from pyspark.sql.window import Window

    spark = queries.sparkSession
    meta = ann_index_meta(spark, path)
    if meta is None:
        raise ValueError(f"ann_index_search: no index at {path}")
    sub = meta["dim"] // meta["n_subspaces"]
    centroids, codebooks = meta["centroids"], meta["codebooks"]
    coded = spark.read.parquet(path).select(
        F.col("_id").alias("neighbor_id"), "_codes", "cell"
    )
    if probe_cells is not None:
        coded = coded.filter(F.col("cell").isin([int(c) for c in probe_cells]))
    q_base = queries.select(
        F.col(id_col).alias("query_id"),
        _dim_guarded(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            meta["dim"],
            "ann_index_search",
        ).alias("_qvec"),
    )
    # rank/probe/LUT shared verbatim with ivf_pq_topk (drift guard) —
    # whitelist ranking and the residual per-cell LUTs live there
    q_cells = _query_probe_luts(
        q_base,
        centroids,
        codebooks,
        sub,
        n_probe,
        meta.get("residual", False),
        allowed_cells=probe_cells,
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("_codes"),
            F.col("_lut"),
            lambda code, lut_row: F.element_at(lut_row, code + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        coded.join(q_cells, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "_qvec", "neighbor_id", adc.alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    if shortlist is None:
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "dist", "rk")
        )
    if shortlist < k:
        raise ValueError(f"shortlist {shortlist} must be >= k {k}")
    cand = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= shortlist)
        .select("query_id", "_qvec", "neighbor_id")
    )
    exact_d = F.aggregate(
        F.zip_with(F.col("_qvec"), F.col("_v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    reranked = (
        spark.read.parquet(f"{path}/{_VEC_DIR}")
        .select(F.col("_id").alias("neighbor_id"), "_v")
        .join(F.broadcast(cand), "neighbor_id")
        .select("query_id", "neighbor_id", exact_d.alias("dist"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        reranked.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dist", "rk")
    )


def ann_index_delete(spark: SparkSession, path: str, ids) -> int:
    """Delete vectors from the persisted index — retraction /
    right-to-be-forgotten for a serving ANN index (r8; the dedup
    index's delete sibling). ``ids`` is a Python list or a DataFrame
    whose FIRST column holds the ids.

    Full rewrite of BOTH tiers via staging + atomic swap (plans/merge
    machinery — a crash mid-delete leaves the original index readable):
    surviving codes re-partitioned by cell, surviving raw vectors into
    the refine sidecar, meta (pinned models — deletion never retrains)
    and batch markers copied through, so a fully-deleted batch still
    rejects redelivery under its batch_id. Returns the number of
    vectors removed. Deleting every vector is refused (an empty parquet
    dir cannot be read back — remove the path instead)."""
    import glob
    import os
    import shutil

    from etl_apache_kafka_python_doker_aws_spark.plans.merge import (
        _recover,
        _swap_in,
    )

    if ann_index_meta(spark, path) is None:
        raise ValueError(f"ann_index_delete: no index at {path}")
    _recover(path)
    codes = spark.read.parquet(path)
    vecs = spark.read.parquet(f"{path}/{_VEC_DIR}")
    if isinstance(ids, DataFrame):
        key = ids.columns[0]
        gone = ids.select(F.col(key).alias("_id")).distinct()
        keep_codes = codes.join(gone, "_id", "left_anti")
        keep_vecs = vecs.join(gone, "_id", "left_anti")
    else:
        ids = list(ids)
        keep_codes = codes.filter(~F.col("_id").isin(ids))
        keep_vecs = vecs.filter(~F.col("_id").isin(ids))
    before = codes.count()
    staging = path.rstrip("/") + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    keep_codes.write.partitionBy("cell").parquet(staging)
    if not glob.glob(os.path.join(staging, "**", "*.parquet"), recursive=True):
        shutil.rmtree(staging, ignore_errors=True)
        raise ValueError(
            f"ann_index_delete: deleting these ids would EMPTY the index "
            f"at {path} — remove the path instead (live index untouched)"
        )
    keep_vecs.write.parquet(f"{staging}/{_VEC_DIR}")
    for side in (_META_DIR, _BATCH_DIR):
        shutil.copytree(f"{path}/{side}", f"{staging}/{side}")
    after = spark.read.parquet(staging).count()
    _swap_in(staging, path)
    return before - after
