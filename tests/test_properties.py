"""Property-based kernel tests (hypothesis) — no Spark session needed.

The invariants LSH correctness rests on, checked over random inputs:
minhash union-min law, jaccard-udf equivalence to python sets, winnowing's
shared-fingerprint guarantee, rolling-hash locality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from annoy_spark.config import DedupConfig
from annoy_spark.functions.signatures import (
    minhash_batch,
    minhash_coeffs,
    shingle_hash_batch,
)
from annoy_spark.operators.substring import (
    fingerprint_positions,
    rolling_gram_hashes,
)

CFG = DedupConfig()
A, B = minhash_coeffs(CFG)

ints = st.integers(min_value=-(1 << 62), max_value=(1 << 62) - 1)


@settings(max_examples=25, deadline=None)
@given(st.lists(ints, min_size=1, max_size=60),
       st.lists(ints, min_size=1, max_size=60))
def test_minhash_union_law(x, y):
    """minhash(x ∪ y) == elementwise min(minhash(x), minhash(y))."""
    u = sorted(set(x) | set(y))
    mx, my, mu = (list(v) for v in
                  minhash_batch(pd.Series([x, y, u]), A, B))
    assert mu == [min(p, q) for p, q in zip(mx, my)]


@settings(max_examples=25, deadline=None)
@given(st.lists(ints, min_size=0, max_size=80))
def test_minhash_invariant_to_order_and_duplication(xs):
    shuffled = list(reversed(xs)) + xs  # duplicates + reorder
    a, b = minhash_batch(pd.Series([xs, shuffled]), A, B)
    assert list(a) == list(b)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=12),
                min_size=0, max_size=30))
def test_shingle_hashes_match_string_shingles(tokens):
    """Hash-window shingle identity == string shingle identity."""
    from annoy_spark.oracle import shingle_set

    toks = [t for t in "".join(tokens).split() if t]
    text = " ".join(toks)
    # engine side: hash each token like token_hashes_col would (any
    # injective-enough map works for the identity property — use a dict)
    vocab = {t: i * 2654435761 % (1 << 61) for i, t in enumerate(sorted(set(toks)))}
    h = [vocab[t] for t in toks]
    got, _ = shingle_hash_batch(pd.Series([h]), CFG.shingle_k, CFG.seed)
    want = shingle_set(text, CFG.shingle_k)
    if not toks:
        assert len(got[0]) == 0
    else:
        assert len(got[0]) == len(want)  # distinct window-count identity


@settings(max_examples=15, deadline=None)
@given(st.binary(min_size=0, max_size=400), st.integers(4, 32))
def test_rolling_hash_count_and_locality(data, c):
    arr = np.frombuffer(data, dtype=np.uint8)
    h = rolling_gram_hashes(arr, c)
    assert len(h) == max(len(arr) - c + 1, 0)
    # identical grams at different positions hash identically
    for i in range(len(h)):
        for j in range(i + 1, min(i + 4, len(h))):
            if data[i : i + c] == data[j : j + c]:
                assert h[i] == h[j]


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_winnow_guarantee_random_blocks(seed):
    """A shared block of length w + c - 1 always yields a shared
    fingerprint, wherever it sits in either file."""
    rng = np.random.default_rng(seed)
    c, w = 8, 57  # guarantee length 64
    block = bytes(rng.integers(32, 127, size=80, dtype=np.uint8))
    pre = bytes(rng.integers(32, 127, size=int(rng.integers(0, 120)), dtype=np.uint8))
    post = bytes(rng.integers(32, 127, size=int(rng.integers(0, 120)), dtype=np.uint8))
    a = (pre + block).decode("latin1")
    b = (block + post).decode("latin1")
    ha, _ = fingerprint_positions(a, c, w)
    hb, _ = fingerprint_positions(b, c, w)
    assert set(ha) & set(hb)
