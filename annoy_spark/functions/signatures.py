"""Signature computation: JVM-side shingling + Arrow-vectorized MinHash/SimHash.

Division of labor (the 100 TB posture):
- tokenize / shingle / shingle-hash run as built-in expressions
  (split/transform/xxhash64) inside whole-stage codegen — no Python;
- the per-row signature *reductions* (128-perm min, 128-bit majority vote)
  run in pandas UDFs over Arrow batches of compact int64 arrays (the raw
  content never crosses the JVM->Python boundary).

SimHash here IS Annoy's angular random-hyperplane LSH specialized to sparse
0/1 shingle vectors: bit j of xxhash64(shingle, j-salt) is the sign of a
random hyperplane coordinate, and the majority vote across shingles is the
side() decision of /root/reference/src/annoylib.h:491-501. MinHash banding
plays the role of the tree forest's OR-of-leaves candidate generation
(/root/reference/src/annoylib.h:1447-1480, n_trees <-> bands).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, LongType

from annoy_spark.config import DedupConfig

# Mersenne prime 2^31-1. The modulus must sit just above the reduced hash
# domain so a*h wraps ~2^31 times — (a*h+b) mod P is then a well-mixing
# permutation of the domain. (With a huge modulus like 2^61-1 the map is
# monotonic in h and every "permutation" picks the same minimum element —
# minhash agreement saturates at 1.0 regardless of Jaccard.)
MERSENNE_P = np.uint64((1 << 31) - 1)


# --------------------------------------------------------------------------
# hash-family coefficients (seed-derived, like annoy's per-thread RNG seeds)
# --------------------------------------------------------------------------

def minhash_coeffs(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng([cfg.seed, 0x31A5])
    p = int(MERSENNE_P)
    a = rng.integers(1, p, size=cfg.n_perm, dtype=np.uint64)
    b = rng.integers(0, p, size=cfg.n_perm, dtype=np.uint64)
    return a, b


# --------------------------------------------------------------------------
# JVM-side columns (codegen; no Python)
# --------------------------------------------------------------------------

def tokens_col(content: Column | str) -> Column:
    """Lowercase word tokens (same semantics as the gate layer)."""
    c = F.col(content) if isinstance(content, str) else content
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != F.lit(""))


def shingles_col(toks: Column, k: int) -> Column:
    """Distinct k-token shingles; short docs collapse to one shingle."""
    whole = F.array(F.concat_ws(" ", toks))
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(F.when(F.size(toks) >= k, windows).otherwise(whole))


def shingle_hashes_col(shingles: Column) -> Column:
    """xxhash64 per shingle (JVM, codegen) -> array<long>."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def band_keys_col(minhash: Column, cfg: DedupConfig) -> Column:
    """Band key per band: xxhash64 over the band's minhash rows + band idx.
    Computed JVM-side from the UDF-produced minhash array."""
    keys = []
    for b in range(cfg.bands):
        elems = [
            F.element_at(minhash, b * cfg.rows_per_band + r + 1)
            for r in range(cfg.rows_per_band)
        ]
        keys.append(F.xxhash64(F.lit(b), *elems))
    return F.array(*keys)


# --------------------------------------------------------------------------
# Arrow-vectorized signature reductions
# --------------------------------------------------------------------------

def _flatten(series: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ragged array<long> series -> (flat uint64, row offsets, row lengths)."""
    lens = np.fromiter((len(v) for v in series), dtype=np.int64, count=len(series))
    flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in series]) \
        if lens.sum() else np.empty(0, dtype=np.int64)
    offsets = np.zeros(len(series), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    return flat.view(np.uint64), offsets, lens


def minhash_batch(hashes: pd.Series, a: np.ndarray, b: np.ndarray) -> pd.Series:
    """MinHash signatures for a batch: min_i((a_p * h_i + b_p) mod P) per perm.

    One vectorized pass per permutation over the *flattened* batch with
    np.minimum.reduceat — no per-row Python loop.
    """
    flat, offsets, lens = _flatten(hashes)
    n_rows, n_perm = len(hashes), len(a)
    out = np.full((n_rows, n_perm), np.int64(np.iinfo(np.int64).max), dtype=np.int64)
    if len(flat):
        # reduce into [0, P): a*h < 2^62 fits uint64 exactly
        hp = (flat & np.uint64(0x7FFFFFFF)) % MERSENNE_P
        nonzero = lens > 0
        for p in range(n_perm):
            v = (a[p] * hp + b[p]) % MERSENNE_P
            mins = np.minimum.reduceat(v, offsets[nonzero])
            out[nonzero, p] = mins.astype(np.int64)
    return pd.Series(list(out))


def simhash_batch(hashes: pd.Series, bits: int, seed: int) -> pd.Series:
    """SimHash signatures (bits/64 packed int64 words) for a batch.

    Each shingle contributes `bits` pseudo-random sign bits derived by
    remixing its 64-bit hash with a per-word odd multiplier (splitmix-style);
    signature bit = majority vote. Vectorized: unpack to (n, bits) uint8,
    np.add.reduceat per row.
    """
    flat, offsets, lens = _flatten(hashes)
    n_rows = len(hashes)
    words = bits // 64
    out = np.zeros((n_rows, words), dtype=np.uint64)
    if len(flat):
        rng = np.random.default_rng([seed, 0x51AA])
        muls = rng.integers(1, 1 << 63, size=words, dtype=np.uint64) | np.uint64(1)
        adds = rng.integers(0, 1 << 63, size=words, dtype=np.uint64)
        nonzero = lens > 0
        nz_lens = lens[nonzero]
        for w in range(words):
            hw = flat * muls[w] + adds[w]          # uint64 wraparound mix
            hw ^= hw >> np.uint64(33)
            hw *= np.uint64(0xFF51AFD7ED558CCD)
            hw ^= hw >> np.uint64(33)
            bits_mat = np.unpackbits(
                hw.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )                                       # (n_shingles, 64) of 0/1
            sums = np.add.reduceat(bits_mat, offsets[nonzero], axis=0)
            majority = (2 * sums) > nz_lens[:, None]
            packed = np.packbits(
                majority.astype(np.uint8), axis=1, bitorder="little"
            ).view(np.uint64)                       # (n_nonzero, 1)
            out[nonzero, w] = packed[:, 0]
    return pd.Series(list(out.view(np.int64)))


def make_signature_udfs(cfg: DedupConfig):
    """Build the two pandas UDFs bound to this config."""
    a, b = minhash_coeffs(cfg)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(hashes: pd.Series) -> pd.Series:
        return minhash_batch(hashes, a, b)

    @F.pandas_udf(ArrayType(LongType()))
    def simhash_udf(hashes: pd.Series) -> pd.Series:
        return simhash_batch(hashes, cfg.simhash_bits, cfg.seed)

    return minhash_udf, simhash_udf
