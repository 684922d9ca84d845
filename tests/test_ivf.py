"""IVF approximate k-NN: recall vs brute force on clustered data (the
two_means / data-adaptive regime, annoylib.h:363-403) + hot-cell skew."""

from __future__ import annotations

import numpy as np
import pytest

from annoy_spark.operators.ivf import knn_ivf
from annoy_spark.operators.knn import knn_bruteforce


@pytest.mark.parametrize("metric", ["angular", "euclidean"])
def test_ivf_recall_on_clustered_data(spark, metric):
    rng = np.random.default_rng(17)
    n, dim, k = 400, 16, 5
    centers = rng.standard_normal((20, dim)) * 4
    vecs = centers[np.arange(n) % 20] + rng.standard_normal((n, dim)) * 0.3
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    exact = knn_bruteforce(df, df, k=k, metric=metric).collect()
    approx = knn_ivf(df, k=k, n_centroids=20, nprobe=3, seed=9,
                     metric=metric, sample_fraction=1.0).collect()
    truth, found = {}, {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.nid)
    for r in approx:
        found.setdefault(r.qid, set()).add(r.nid)
    hits = sum(len(truth[q] & found.get(q, set())) for q in truth)
    recall = hits / (len(truth) * k)
    assert recall >= 0.9, f"IVF {metric} recall {recall:.3f}"


def test_ivf_hot_cell_replicated_join(spark):
    """A mega-cell (thousands of near-identical vectors) must be split into
    sub-cells: every member still finds k neighbors (probes replicate, so
    no pair is lost to salting on the query side)."""
    n_dup, n_rest = 2000, 50
    rng = np.random.default_rng(3)
    rows = [(i, [1.0 + 1e-6 * float(rng.standard_normal()), 2.0, 3.0, 4.0])
            for i in range(n_dup)]
    rows += [(n_dup + i, [float(x) for x in rng.standard_normal(4) * 5])
             for i in range(n_rest)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_ivf(df, k=3, n_centroids=8, nprobe=2, seed=1,
                  cell_cap=200, sample_fraction=1.0)
    got = {r["qid"]: r["count"]
           for r in out.groupBy("qid").count().collect()}
    assert sum(1 for q in range(n_dup) if got.get(q, 0) == 3) == n_dup
