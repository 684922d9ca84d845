"""Committed golden accuracy numbers — the reference's frozen-expectation
contract (/root/reference/test/accuracy_test.py:89-105 asserts measured
precision within 1% of a committed table). Every approximate family's
recall at its DRIVER GATE budget is pinned here at the sf0.001 gate corpus:
a silent recall regression (changed sampling, plane drift, bucket-cap bug)
fails THIS test even while it stays above the loose contract floors of the
CORRECTNESS gates.

All paths are fully deterministic (seeded hash-top-k samples, seeded
plane/two_means streams), so the measured value should reproduce exactly;
the +/-0.02 tolerance only absorbs float-order noise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from annoy_spark.gates import queries as G
from annoy_spark.operators.forest import knn_forest
from annoy_spark.operators.ivf import knn_ivf
from annoy_spark.operators.knn import knn_bruteforce, knn_lsh

SF_DIR = "/root/testdata/sf0.001"
K = 10
TOL = 0.02

# (name, golden recall at the gate budget) — regenerate with the probe in
# the docstring of test_golden_recalls if a budget deliberately changes.
GOLDEN = {
    "lsh_angular_32x4": 0.9856,
    "forest_angular_32t": 0.9920,
    "forest_euclid_32t": 0.9886,
    "ivf_32c16p": 0.8560,
    "mips_32x4": 0.9878,
    "pstable_euclid_16x4": 0.9996,
    "pstable_manhattan_16x4_w64": 0.9890,
    "hamming_lsh_32x4": 0.9997,
    "forest_manhattan_32t": 0.9810,
    "forest_hamming_32t": 0.9101,
    "ivf_manhattan_32c16p": 0.8164,
    "ivf_hamming_16c8p": 0.8154,
    "forest_dot_32t": 0.9996,
    "ivf_dot_32c16p": 0.8560,
}


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact(emb):
    return {
        "angular": knn_bruteforce(emb, emb, k=K).collect(),
        "dot": knn_bruteforce(emb, emb, k=K, metric="dot").collect(),
        "euclidean": knn_bruteforce(
            emb, emb, k=K, metric="euclidean"
        ).collect(),
    }


def _recall(exact_rows, approx_rows):
    t, f = {}, {}
    for r in exact_rows:
        t.setdefault(r.qid, set()).add(r.nid)
    for r in approx_rows:
        f.setdefault(r.qid, set()).add(r.nid)
    return sum(len(t[q] & f.get(q, set())) for q in t) / (len(t) * K)


def _check(name, got):
    assert abs(got - GOLDEN[name]) <= TOL, (
        f"{name}: recall {got:.4f} drifted from committed golden "
        f"{GOLDEN[name]:.4f} (tol {TOL})"
    )


def test_golden_lsh_angular(emb, exact):
    ap = knn_lsh(emb, k=K, n_tables=32, n_bits=4, seed=42).collect()
    _check("lsh_angular_32x4", _recall(exact["angular"], ap))


def test_golden_forest_angular(emb, exact):
    ap = knn_forest(
        emb, k=K, n_trees=32, leaf_cap=32, seed=42, sample_fraction=1.0
    ).collect()
    _check("forest_angular_32t", _recall(exact["angular"], ap))


def test_golden_forest_euclid(emb, exact):
    ap = knn_forest(
        emb, k=K, n_trees=32, leaf_cap=32, seed=42, metric="euclidean",
        sample_fraction=1.0,
    ).collect()
    _check("forest_euclid_32t", _recall(exact["euclidean"], ap))


def test_golden_ivf(emb, exact):
    ap = knn_ivf(
        emb, k=K, n_centroids=32, nprobe=16, seed=42, sample_fraction=1.0
    ).collect()
    _check("ivf_32c16p", _recall(exact["angular"], ap))


def test_golden_mips(emb, exact):
    ap = knn_lsh(
        emb, k=K, n_tables=32, n_bits=4, seed=42, metric="dot"
    ).collect()
    _check("mips_32x4", _recall(exact["dot"], ap))


def test_golden_pstable_euclid(emb, exact):
    ap = knn_lsh(
        emb, k=K, n_tables=16, n_bits=4, seed=42, metric="euclidean",
        bucket_width=4.0,
    ).collect()
    _check("pstable_euclid_16x4", _recall(exact["euclidean"], ap))


def test_golden_pstable_manhattan(emb):
    # Cauchy projections have heavy tails, so L1 cells need ~16x the L2
    # width for the same recall (w=4 -> 0.01, w=64 -> 0.989 on this corpus)
    ex = knn_bruteforce(emb, emb, k=K, metric="manhattan").collect()
    ap = knn_lsh(
        emb, k=K, n_tables=16, n_bits=4, seed=42, metric="manhattan",
        bucket_width=64.0,
    ).collect()
    _check("pstable_manhattan_16x4_w64", _recall(ex, ap))


@pytest.fixture(scope="module")
def sim(spark):
    spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(G.simhash_signatures_sql_spark()).select(
        "doc_id", F.array("sig").alias("sig")
    ).cache()


@pytest.fixture(scope="module")
def exact_hamming(sim):
    return knn_bruteforce(
        sim, sim, k=K, metric="hamming", id_col="doc_id", vec_col="sig"
    ).collect()


def test_golden_hamming_lsh(sim, exact_hamming):
    ap = knn_lsh(
        sim, k=K, n_tables=32, n_bits=4, seed=42, metric="hamming",
        id_col="doc_id", vec_col="sig",
    ).collect()
    _check("hamming_lsh_32x4", _recall(exact_hamming, ap))


def test_golden_forest_manhattan(emb):
    ex = knn_bruteforce(emb, emb, k=K, metric="manhattan").collect()
    ap = knn_forest(
        emb, k=K, n_trees=32, leaf_cap=32, seed=42, metric="manhattan",
        sample_fraction=1.0,
    ).collect()
    _check("forest_manhattan_32t", _recall(ex, ap))


def test_golden_ivf_manhattan(emb):
    ex = knn_bruteforce(emb, emb, k=K, metric="manhattan").collect()
    ap = knn_ivf(
        emb, k=K, n_centroids=32, nprobe=16, seed=42, metric="manhattan",
        sample_fraction=1.0,
    ).collect()
    _check("ivf_manhattan_32c16p", _recall(ex, ap))


def test_golden_forest_hamming(sim, exact_hamming):
    ap = knn_forest(
        sim, k=K, n_trees=32, leaf_cap=16, seed=42, metric="hamming",
        id_col="doc_id", vec_col="sig", sample_fraction=1.0,
    ).collect()
    _check("forest_hamming_32t", _recall(exact_hamming, ap))


def test_golden_forest_dot(emb, exact):
    # DotProduct trees (annoylib.h:605-703): angular forest over the
    # MIPS-augmented space, exact -<q,n> re-rank
    ap = knn_forest(
        emb, k=K, n_trees=32, leaf_cap=32, seed=42, metric="dot",
        sample_fraction=1.0, spill_eps=0.05,
    ).collect()
    _check("forest_dot_32t", _recall(exact["dot"], ap))


def test_golden_ivf_dot(emb, exact):
    ap = knn_ivf(
        emb, k=K, n_centroids=32, nprobe=16, seed=42, metric="dot",
        sample_fraction=1.0,
    ).collect()
    _check("ivf_dot_32c16p", _recall(exact["dot"], ap))


def test_golden_ivf_hamming(sim, exact_hamming):
    ap = knn_ivf(
        sim, k=K, n_centroids=16, nprobe=8, seed=42, metric="hamming",
        id_col="doc_id", vec_col="sig", sample_fraction=1.0,
    ).collect()
    _check("ivf_hamming_16c8p", _recall(exact_hamming, ap))
