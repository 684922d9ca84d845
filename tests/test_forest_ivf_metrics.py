"""Manhattan and hamming tree/IVF kinds — metric parity with annoy's
tree builder (/root/reference/src/annoylib.h:849-891 Minkowski offset
planes shared by Euclidean AND Manhattan; :758-792 axis-aligned Hamming
bit splits), beyond the LSH kind that already covered all 5 metrics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from annoy_spark.operators.forest import knn_forest
from annoy_spark.operators.ivf import knn_ivf
from annoy_spark.operators.knn import knn_bruteforce
from annoy_spark.sources.ann_index import (
    AnnIndexConfig,
    build_index,
    load_index,
)


@pytest.fixture(scope="module")
def float_corpus(spark):
    rng = np.random.default_rng(7)
    n, dim = 400, 16
    centers = rng.standard_normal((20, dim)) * 3
    vecs = centers[np.arange(n) % 20] + rng.standard_normal((n, dim)) * 0.3
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()


@pytest.fixture(scope="module")
def ham_corpus(spark):
    """Clustered packed 128-bit signatures: 16 base patterns, members
    flip a handful of random bits."""
    rng = np.random.default_rng(5)
    n, words = 320, 2
    bases = rng.integers(-(2**62), 2**62, (16, words), dtype=np.int64)
    rows = []
    for i in range(n):
        sig = bases[i % 16].copy()
        for _ in range(int(rng.integers(1, 5))):
            w = int(rng.integers(words))
            sig[w] ^= np.int64(1) << np.int64(int(rng.integers(63)))
        rows.append((i, [int(x) for x in sig]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<long>"
    ).cache()


def _recall(exact_rows, approx_rows, k):
    truth, found = {}, {}
    for r in exact_rows:
        truth.setdefault(r.qid, set()).add(r.nid)
    for r in approx_rows:
        found.setdefault(r.qid, set()).add(r.nid)
    return sum(len(truth[q] & found.get(q, set())) for q in truth) / (
        len(truth) * k
    )


def test_forest_manhattan_recall(spark, float_corpus):
    k = 10
    exact = knn_bruteforce(
        float_corpus, float_corpus, k=k, metric="manhattan"
    ).collect()
    approx = knn_forest(
        float_corpus, k=k, n_trees=16, seed=42, metric="manhattan",
        sample_fraction=1.0, spill_eps=0.3,
    ).collect()
    r = _recall(exact, approx, k)
    assert r >= 0.9, f"forest manhattan recall {r:.3f}"


def test_forest_hamming_recall(spark, ham_corpus):
    k = 10
    exact = knn_bruteforce(
        ham_corpus, ham_corpus, k=k, metric="hamming"
    ).collect()
    approx = knn_forest(
        ham_corpus, k=k, n_trees=16, leaf_cap=32, seed=42,
        metric="hamming", sample_fraction=1.0,
    ).collect()
    r = _recall(exact, approx, k)
    assert r >= 0.9, f"forest hamming recall {r:.3f}"


def test_ivf_manhattan_recall(spark, float_corpus):
    k = 10
    exact = knn_bruteforce(
        float_corpus, float_corpus, k=k, metric="manhattan"
    ).collect()
    approx = knn_ivf(
        float_corpus, k=k, n_centroids=20, nprobe=5, seed=42,
        metric="manhattan", sample_fraction=1.0,
    ).collect()
    r = _recall(exact, approx, k)
    assert r >= 0.85, f"ivf manhattan recall {r:.3f}"


def test_ivf_hamming_recall(spark, ham_corpus):
    k = 10
    exact = knn_bruteforce(
        ham_corpus, ham_corpus, k=k, metric="hamming"
    ).collect()
    approx = knn_ivf(
        ham_corpus, k=k, n_centroids=16, nprobe=4, seed=42,
        metric="hamming", sample_fraction=1.0,
    ).collect()
    r = _recall(exact, approx, k)
    assert r >= 0.85, f"ivf hamming recall {r:.3f}"


def test_persisted_manhattan_forest_round_trip(spark, float_corpus,
                                               tmp_path):
    """Manhattan forest kind through the full persisted lifecycle."""
    qs = float_corpus.where(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + 0.01).alias("embedding"),
    )
    cfg = AnnIndexConfig(
        kind="forest", metric="manhattan", n_trees=16, seed=42,
        sample_fraction=1.0,
    )
    root = str(tmp_path / "man")
    live = build_index(spark, float_corpus, root, cfg)
    a = sorted(
        live.query(qs, k=10, spill_eps=0.3).collect(),
        key=lambda r: (r.qid, r.rank),
    )
    b = sorted(
        load_index(spark, root, expected=cfg)
        .query(qs, k=10, spill_eps=0.3).collect(),
        key=lambda r: (r.qid, r.rank),
    )
    assert len(a) > 0
    assert [(r.qid, r.nid, r.rank, r.distance) for r in a] == [
        (r.qid, r.nid, r.rank, r.distance) for r in b
    ]
    exact = knn_bruteforce(float_corpus, qs, k=10,
                           metric="manhattan").collect()
    r = _recall(exact, a, 10)
    assert r >= 0.9, f"persisted manhattan forest recall {r:.3f}"


def test_persisted_hamming_forest_round_trip(spark, ham_corpus, tmp_path):
    """Hamming forest kind (bit-split trees) through the persisted
    lifecycle, including an append."""
    qs = ham_corpus.where(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    cfg = AnnIndexConfig(
        kind="forest", metric="hamming", n_trees=16, seed=42,
        sample_fraction=1.0,
    )
    root = str(tmp_path / "ham")
    live = build_index(
        spark, ham_corpus.where(F.col("vec_id") < 240), root, cfg
    )
    live.append(ham_corpus.where(F.col("vec_id") >= 240))
    idx = load_index(spark, root, expected=cfg)
    assert idx.n_items() == 320
    a = idx.query(qs, k=10).collect()
    exact = knn_bruteforce(ham_corpus, qs, k=10, metric="hamming").collect()
    r = _recall(exact, a, 10)
    assert r >= 0.85, f"persisted hamming forest recall {r:.3f}"
    # a query signature identical to a stored item finds it at distance 0
    best = {x.qid: (x.nid, x.distance) for x in a if x.rank == 1}
    assert all(d == 0.0 for (_, d) in best.values())


def test_persisted_hamming_ivf_round_trip(spark, ham_corpus, tmp_path):
    cfg = AnnIndexConfig(
        kind="ivf", metric="hamming", n_centroids=16, nprobe=4, seed=42,
        sample_fraction=1.0,
    )
    qs = ham_corpus.where(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    root = str(tmp_path / "hivf")
    build_index(spark, ham_corpus, root, cfg)
    idx = load_index(spark, root, expected=cfg)
    a = idx.query(qs, k=10).collect()
    exact = knn_bruteforce(ham_corpus, qs, k=10, metric="hamming").collect()
    r = _recall(exact, a, 10)
    assert r >= 0.85, f"persisted hamming ivf recall {r:.3f}"
