"""Substring pass: kernel unit tests + end-to-end planted-block detection."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from annoy_spark.config import DedupConfig
from annoy_spark.operators.substring import (
    adaptive_slice_margin,
    fingerprint_positions,
    rolling_gram_hashes,
    substring_edges,
    winnow,
)

CFG = DedupConfig()


def _naive_gram_hashes(data: bytes, c: int) -> list[int]:
    B = 0x100000001B3
    out = []
    for i in range(len(data) - c + 1):
        h = 0
        for j in range(c):
            h = (h * B + data[i + j]) % (1 << 64)
        out.append(h)
    return out


def test_rolling_hash_matches_naive():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=200, dtype=np.uint8)
    got = rolling_gram_hashes(data, 16)
    want = _naive_gram_hashes(bytes(data), 16)
    assert [int(x) for x in got] == want


def test_rolling_hash_position_independent():
    """Equal grams hash equally wherever they occur."""
    data = np.frombuffer(b"xyz_ABCDEFGH_pq_ABCDEFGH_end", dtype=np.uint8)
    h = rolling_gram_hashes(data, 8)
    i1, i2 = 4, 16  # both 'ABCDEFGH'
    assert h[i1] == h[i2]


def test_winnow_guarantee():
    """Any window of w grams contributes its min -> shared block of length
    >= w + c - 1 yields a shared fingerprint, regardless of alignment."""
    rng = np.random.default_rng(7)
    block = bytes(rng.integers(97, 123, size=500, dtype=np.uint8))
    a = bytes(rng.integers(97, 123, size=300, dtype=np.uint8)) + block
    b = block + bytes(rng.integers(97, 123, size=400, dtype=np.uint8))
    c, w = 16, 485  # guarantee length = w + c - 1 = 500
    ha, pa = fingerprint_positions(a.decode("latin1"), c, w)
    hb, pb = fingerprint_positions(b.decode("latin1"), c, w)
    assert len(set(ha) & set(hb)) >= 1


def test_winnow_density():
    rng = np.random.default_rng(9)
    h = rng.integers(0, 1 << 63, size=20_000, dtype=np.uint64)
    sel = winnow(h, 1000)
    assert 10 <= len(sel) <= 200  # ~2n/w expected


@pytest.fixture(scope="module")
def sub_corpus(spark):
    rng = np.random.default_rng(11)

    def text(n):
        toks = [f"tk{v}" for v in rng.integers(0, 3000, size=n)]
        return " ".join(toks)

    base = text(900)       # ~5 KB
    block = base[:2600]    # verbatim block > min_substring_len
    rows = [
        (1, base),
        (2, text(700)[:1500] + " " + block + " " + text(300)),  # shares block
        (3, text(800)),                                          # unrelated
        (4, "short doc"),
        (5, text(200)[:400] + base[:800] + text(100)),           # only 800 chars
    ]
    return spark.createDataFrame(rows, "file_id long, content string")


def test_substring_edges_end_to_end(spark, sub_corpus):
    edges = substring_edges(sub_corpus, CFG).collect()
    pairs = {(r.u, r.v): r.match_len for r in edges}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] >= CFG.min_substring_len
    # the 800-char overlap must NOT qualify (below threshold)
    assert (1, 5) not in pairs
    assert all({u, v} == {1, 2} for (u, v) in pairs), pairs


@pytest.fixture(scope="module")
def long_corpus(spark):
    """Matches both inside and beyond the default slice margin, so the
    sliced verifier's capped-pair escalation path actually fires."""
    rng = np.random.default_rng(23)

    def text(n):
        return " ".join(f"tk{v}" for v in rng.integers(0, 3000, size=n))

    base = text(2000)  # ~11 KB
    rows = [
        (1, base),
        (2, text(100) + " " + base[:9000] + " " + text(400)),   # LONG match
        (3, text(300) + " " + base[4000:6600] + " " + text(200)),  # ~2.6 KB
        (4, text(900)),                                          # unrelated
        (5, text(80) + base[:900] + text(60)),                   # sub-threshold
    ]
    return spark.createDataFrame(rows, "file_id long, content string")


def test_sliced_equals_full_content(spark, long_corpus):
    """The anchor-window sliced path (the default margin AND a margin far
    below every true match, forcing escalation of every pair) is
    bit-identical to whole-file extension."""
    full = {(r.u, r.v, r.match_len)
            for r in substring_edges(long_corpus, CFG, slice_margin=0).collect()}
    assert any(ml >= 8500 for (_, _, ml) in full), full
    assert any(CFG.min_substring_len <= ml < 4000 for (_, _, ml) in full), full
    for margin in (2 * CFG.min_substring_len, 500):
        sliced = {
            (r.u, r.v, r.match_len)
            for r in substring_edges(
                long_corpus, CFG, slice_margin=margin
            ).collect()
        }
        assert sliced == full, (margin, sliced ^ full)


def test_adaptive_slice_margin(spark, long_corpus):
    """Small-file corpora take the full-content path (slicing's extra scan
    is pure overhead when merged windows cover the whole file); corpora of
    genuinely large files get the anchor-window margin."""
    assert adaptive_slice_margin(long_corpus, CFG) == 0  # ~11 KB files
    big = long_corpus.select(
        "file_id",
        F.concat_ws(" ", F.array_repeat("content", 8)).alias("content"),
    )  # ~90 KB >> break-even (~32 KB)
    assert adaptive_slice_margin(big, CFG) == 2 * CFG.min_substring_len


def test_substring_deterministic_across_partitioning(spark, sub_corpus):
    a = {(r.u, r.v, r.match_len)
         for r in substring_edges(sub_corpus.repartition(1), CFG).collect()}
    b = {(r.u, r.v, r.match_len)
         for r in substring_edges(sub_corpus.repartition(5), CFG).collect()}
    assert a == b
