#!/usr/bin/env python
"""Residual-vs-global IVFPQ recall probe on a CLUSTERED corpus
(VERDICT r8 next-round #6): the r8 measurement (global 0.808 vs
residual 0.780 at sf0.1) only exercised the near-uniform fixture —
the one regime where residual encoding CANNOT win, because wide cells
make residuals ≈ the vectors re-centered by similar offsets. The
advertised benefit (functions/ann_index.py docstring: "finer
quantization when cells are tight") needs a corpus with tight cells.

Two synthetic corpora, same size/dim, seeded numpy:
  * clustered — 50 tight KMeans-recoverable clusters: centers uniform
    in [0,1]^64, points = center + N(0, 0.02) noise. Between-center
    distance ~3.3, within-cluster spread ~0.16: the FAISS residual
    regime (IVF cells lock onto the clusters; residuals live in the
    tiny noise ball, so the same 32-centroid/subspace code budget
    quantizes the noise scale instead of the unit cube).
  * uniform — Uniform(0,1)^64, the sf-fixture regime, as the control.

For each corpus × {global, residual} the probe builds a REAL persisted
index (ann_index_build → parquet tiers + pinned models) and measures
recall-of-exact-top-5 for 100 member queries two ways:
  * adc-only (shortlist=None): ranks straight off the quantized codes —
    the purest codebook-quality signal, nothing repairs quantization
    error;
  * re-rank (shortlist=200): the production search shape — codebook
    quality decides whether the true neighbors make the shortlist.

Prints one JSON line; numbers land in SCALING.md.

Usage: python probe_residual.py          # ~3 min on local[32]
       SPARK_GRAFT_PROBE_N=50000 python probe_residual.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DIM = 64
N_CLUSTERS = 50
N_QUERIES = 100
N_CELLS = 32
N_SUBSPACES = 8
N_CENTROIDS = 32
N_PROBE = 8
SHORTLIST = 200
K = 5


def make_corpora(n: int, seed: int = 7) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0.0, 1.0, size=(N_CLUSTERS, DIM))
    labels = rng.integers(0, N_CLUSTERS, size=n)
    clustered = centers[labels] + rng.normal(0.0, 0.02, size=(n, DIM))
    uniform = rng.uniform(0.0, 1.0, size=(n, DIM))
    return {"clustered": clustered, "uniform": uniform}


def exact_topk(vecs: np.ndarray, q_ids: list[int], k: int) -> dict[int, set[int]]:
    out = {}
    for qi in q_ids:
        d = ((vecs - vecs[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf  # self excluded, matching the search's id rule
        out[qi] = set(np.argpartition(d, k)[:k].tolist())
    return out


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_PROBE_N", "20000"))
    work = os.environ.get(
        "SPARK_GRAFT_RESIDUAL_PROBE_DIR", "/tmp/spark_graft_residual_probe"
    )
    from etl_apache_kafka_python_doker_aws_spark.functions.ann_index import (
        ann_index_build,
        ann_index_search,
    )
    from etl_apache_kafka_python_doker_aws_spark.session import get_spark

    spark = get_spark()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    corpora = make_corpora(n)
    q_ids = list(range(N_QUERIES))
    results: dict[str, dict] = {}
    try:
        for cname, vecs in corpora.items():
            df = spark.createDataFrame(
                [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
                "vec_id long, embedding array<double>",
            )
            truth = exact_topk(vecs, q_ids, K)
            queries = df.filter(f"vec_id < {N_QUERIES}")
            results[cname] = {}
            for residual in (False, True):
                tag = "residual" if residual else "global"
                path = os.path.join(work, f"{cname}_{tag}")
                t0 = time.time()
                ann_index_build(
                    df, "vec_id", "embedding", path,
                    dim=DIM, n_cells=N_CELLS, n_subspaces=N_SUBSPACES,
                    n_centroids=N_CENTROIDS, vec_buckets=16, residual=residual,
                )
                build_sec = round(time.time() - t0, 1)
                recalls = {}
                # adc_only = purest codebook signal; rerank-200 = the r8
                # comparison point; rerank_auto = the production default
                # (max(200, n/10) → 2000 here)
                for mode, sl in (
                    ("adc_only", None),
                    ("rerank", SHORTLIST),
                    ("rerank_auto", "auto"),
                ):
                    got = ann_index_search(
                        queries, path, k=K, n_probe=N_PROBE, shortlist=sl
                    ).collect()
                    by_q: dict[int, set[int]] = {}
                    for r in got:
                        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
                    hits = sum(
                        len(truth[qi] & by_q.get(qi, set())) for qi in q_ids
                    )
                    recalls[mode] = round(hits / (K * len(q_ids)), 3)
                results[cname][tag] = {"build_sec": build_sec, **recalls}
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "probe": "residual_ivfpq",
        "n": n, "dim": DIM, "n_clusters": N_CLUSTERS,
        "n_cells": N_CELLS, "n_subspaces": N_SUBSPACES,
        "n_centroids": N_CENTROIDS, "n_probe": N_PROBE,
        "shortlist": SHORTLIST, "k": K,
        "recall": results,
    }))


if __name__ == "__main__":
    main()
