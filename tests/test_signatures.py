"""Unit tests for signature kernels vs independent per-row reference
implementations (the method of /root/reference/test/angular_index_test.py:
tiny inputs, closed-form expectations)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from annoy_spark.config import DedupConfig
from annoy_spark.functions.signatures import (
    MERSENNE_P,
    minhash_batch,
    minhash_coeffs,
    simhash_batch,
)

CFG = DedupConfig()


def _naive_minhash(hashes: list[int], a: np.ndarray, b: np.ndarray) -> list[int]:
    out = []
    for p in range(len(a)):
        best = (1 << 63) - 1
        for h in hashes:
            hp = (np.uint64(h) & np.uint64(0x7FFFFFFF)) % MERSENNE_P
            v = int((a[p] * hp + b[p]) % MERSENNE_P)
            best = min(best, v)
        out.append(best)
    return out


@np.errstate(over="ignore")  # uint64 wraparound is the hash-mixing intent
def _naive_simhash(hashes: list[int], bits: int, seed: int) -> list[int]:
    rng = np.random.default_rng([seed, 0x51AA])
    words = bits // 64
    muls = rng.integers(1, 1 << 63, size=words, dtype=np.uint64) | np.uint64(1)
    adds = rng.integers(0, 1 << 63, size=words, dtype=np.uint64)
    out = []
    for w in range(words):
        counts = [0] * 64
        for h in hashes:
            hw = np.uint64(h) * muls[w] + adds[w]
            hw ^= hw >> np.uint64(33)
            hw *= np.uint64(0xFF51AFD7ED558CCD)
            hw ^= hw >> np.uint64(33)
            for j in range(64):
                counts[j] += (int(hw) >> j) & 1
        word = np.uint64(0)
        for j in range(64):
            if 2 * counts[j] > len(hashes):
                word |= np.uint64(1) << np.uint64(j)
        out.append(int(word))  # keep unsigned; view back to int64 once
    return [int(x) for x in np.array(out, dtype=np.uint64).view(np.int64)]


@pytest.fixture(scope="module")
def coeffs():
    return minhash_coeffs(CFG)


def test_minhash_matches_naive(coeffs):
    a, b = coeffs
    rng = np.random.default_rng(7)
    rows = [list(rng.integers(-(1 << 62), 1 << 62, size=n)) for n in (1, 3, 17, 200)]
    got = minhash_batch(pd.Series(rows), a, b)
    for row, g in zip(rows, got):
        assert list(g) == _naive_minhash(row, a, b)


def test_minhash_empty_row(coeffs):
    a, b = coeffs
    got = minhash_batch(pd.Series([[], [1, 2, 3]]), a, b)
    assert all(v == np.iinfo(np.int64).max for v in got.iloc[0])
    assert len(got.iloc[1]) == CFG.n_perm


def test_minhash_subset_property(coeffs):
    """min over a union is the elementwise min — the property LSH rests on."""
    a, b = coeffs
    x = list(range(100, 200))
    y = list(range(150, 260))
    u = sorted(set(x) | set(y))
    mx, my, mu = (list(v) for v in minhash_batch(pd.Series([x, y, u]), a, b))
    assert mu == [min(p, q) for p, q in zip(mx, my)]


def test_simhash_matches_naive():
    rng = np.random.default_rng(11)
    rows = [list(rng.integers(-(1 << 62), 1 << 62, size=n)) for n in (1, 2, 33)]
    got = simhash_batch(pd.Series(rows), 128, CFG.seed)
    for row, g in zip(rows, got):
        assert list(g) == _naive_simhash(row, 128, CFG.seed)


def test_simhash_identical_inputs_equal_and_near_inputs_close():
    rng = np.random.default_rng(13)
    base = list(rng.integers(0, 1 << 62, size=300))
    near = base[:-15] + list(rng.integers(0, 1 << 62, size=15))  # 5% churn
    far = list(rng.integers(0, 1 << 62, size=300))
    sigs = simhash_batch(pd.Series([base, base, near, far]), 128, CFG.seed)

    def ham(a, b):
        return sum(
            bin(int(np.uint64(np.int64(x)) ^ np.uint64(np.int64(y)))).count("1")
            for x, y in zip(a, b)
        )

    assert ham(sigs.iloc[0], sigs.iloc[1]) == 0
    assert ham(sigs.iloc[0], sigs.iloc[2]) <= 20
    assert ham(sigs.iloc[0], sigs.iloc[3]) >= 40


def test_signatures_deterministic_across_batch_split():
    """Row order / batch boundaries must not affect signatures."""
    a, b = minhash_coeffs(CFG)
    rng = np.random.default_rng(17)
    rows = [list(rng.integers(0, 1 << 62, size=50)) for _ in range(6)]
    whole = minhash_batch(pd.Series(rows), a, b)
    parts = pd.concat(
        [minhash_batch(pd.Series(rows[:2]), a, b),
         minhash_batch(pd.Series(rows[2:]), a, b)],
        ignore_index=True,
    )
    for w, p in zip(whole, parts):
        assert list(w) == list(p)


def test_minhash_mersenne_fold_boundary(coeffs):
    """Round-6 kernel: the shift+mask Mersenne fold must agree with true
    modular arithmetic on boundary values — h that reduce to 0, P-1, and
    dense rows large enough to cross the cache-blocking chunk limit."""
    a, b = coeffs
    boundary = [0, 1, int(MERSENNE_P) - 1, int(MERSENNE_P),
                0x7FFFFFFF, -1, -(1 << 62), (1 << 62) - 1]
    rng = np.random.default_rng(23)
    big = list(rng.integers(-(1 << 62), 1 << 62, size=40_000))  # > _CHUNK
    rows = [boundary, big]
    got = minhash_batch(pd.Series(rows), a, b)
    for row, g in zip(rows, got):
        assert list(g) == _naive_minhash(row, a, b)
