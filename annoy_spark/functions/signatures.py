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


def token_hashes_col(toks: Column) -> Column:
    """xxhash64 per token -> array<long>. The only higher-order lambda in
    the hot path (HOFs are interpreted, not codegen'd — string shingle
    construction in the JVM was ~100x slower; shingling happens on these
    int64s inside the Arrow UDF instead)."""
    return F.transform(toks, lambda t: F.xxhash64(t))


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
# Arrow-vectorized shingling + signature reductions
# --------------------------------------------------------------------------

# position-mixing constants for rolling shingle hashes (odd => invertible)
def _shingle_coeffs(k: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng([seed, 0x5817])
    return rng.integers(1, 1 << 63, size=k, dtype=np.uint64) | np.uint64(1)


def _mix64(x: np.ndarray) -> np.ndarray:
    """murmur3 finalizer — decorrelates the linear combination."""
    x = x.copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


@np.errstate(over="ignore")  # uint64 wraparound is the hash-mixing intent
def shingle_hash_batch(
    tok_hashes: pd.Series, k: int, seed: int
) -> tuple[list[np.ndarray], np.ndarray]:
    """Per row: distinct hashes of k-token windows (order-sensitive mix).

    Shingle identity = the token-hash window, so two documents produce the
    same shingle hash iff their k-token windows match (64-bit collisions
    aside) — identical semantics to distinct string shingles. Vectorized:
    the whole batch is flattened once; window hashes come from k shifted
    multiplies; per-row windows are cut from the flat array by offsets.
    Rows shorter than k collapse to ONE shingle over their tokens.
    """
    flat, offsets, lens = _flatten(tok_hashes)
    coeffs = _shingle_coeffs(k, seed)
    n = len(tok_hashes)
    out: list[np.ndarray] = [None] * n  # type: ignore[list-item]
    if len(flat):
        acc = np.zeros(len(flat), dtype=np.uint64)
        # j capped by len(flat): a negative stop in acc[:len-j] would wrap
        # (crashes/corrupts when the whole flattened batch is shorter than k)
        for j in range(min(k, len(flat))):
            # acc[i] += h[i+j] * c[j]  (uint64 wraparound)
            acc[: len(flat) - j] += flat[j:] * coeffs[j]
        mixed = _mix64(acc)
    ends = offsets + lens
    for i in range(n):
        ln = lens[i]
        if ln == 0:
            out[i] = np.empty(0, dtype=np.int64)
        elif ln < k:
            # one shingle over all tokens: same linear form, shorter window
            v = np.uint64(0)
            for j in range(ln):
                v += flat[offsets[i] + j] * coeffs[j]
            out[i] = np.unique(_mix64(np.array([v], dtype=np.uint64))).view(np.int64)
        else:
            w = mixed[offsets[i] : ends[i] - (k - 1)]
            out[i] = np.unique(w).view(np.int64)
    return out, lens


def _flatten(series: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ragged array<long> series -> (flat uint64, row offsets, row lengths)."""
    lens = np.fromiter((len(v) for v in series), dtype=np.int64, count=len(series))
    flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in series]) \
        if lens.sum() else np.empty(0, dtype=np.int64)
    offsets = np.zeros(len(series), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    return flat.view(np.uint64), offsets, lens


# shingles per cache block: 32k * 8B = 256KB working set (L2-resident)
_CHUNK = 32768


def _row_chunks(offsets: np.ndarray, lens: np.ndarray, nz: np.ndarray):
    """Yield (row_start, row_end, flat_lo, flat_hi) over nonzero rows such
    that each chunk covers whole rows and ~<= _CHUNK flat elements."""
    i, n = 0, len(nz)
    while i < n:
        lo = offsets[nz[i]]
        j = i
        hi = lo
        while j < n and (hi - lo) < _CHUNK:
            hi = offsets[nz[j]] + lens[nz[j]]
            j += 1
        yield i, j, int(lo), int(hi)
        i = j


def minhash_batch(hashes: pd.Series, a: np.ndarray, b: np.ndarray) -> pd.Series:
    """MinHash signatures for a batch: min_i((a_p * h_i + b_p) mod P) per perm.

    One vectorized pass per permutation over the *flattened* batch with
    np.minimum.reduceat — no per-row Python loop. All passes reuse ONE
    scratch buffer (out=) — ephemeral 100MB-scale allocations across 32
    concurrent workers turn into kernel-side mmap/TLB storms (measured:
    96% sys time, 3x anti-scaling).
    """
    flat, offsets, lens = _flatten(hashes)
    n_rows, n_perm = len(hashes), len(a)
    out = np.full((n_rows, n_perm), np.int64(np.iinfo(np.int64).max), dtype=np.int64)
    if len(flat):
        # reduce into [0, P): a*h < 2^62 fits uint64 exactly
        hp = flat & np.uint64(0x7FFFFFFF)
        np.mod(hp, MERSENNE_P, out=hp)
        nz = np.flatnonzero(lens)
        buf = np.empty(_CHUNK + 1, dtype=np.uint64)
        tb = np.empty(_CHUNK + 1, dtype=np.uint64)
        sh31 = np.uint64(31)
        # cache blocking: the 128-perm loop runs over an L2-resident slice —
        # streaming the whole batch per perm is DRAM-bandwidth-bound and
        # stops scaling past ~8 cores (measured)
        for rs, re_, lo, hi in _row_chunks(offsets, lens, nz):
            seg = hp[lo:hi]
            if len(seg) > len(buf):  # one oversized row can exceed _CHUNK
                buf = np.empty(len(seg), dtype=np.uint64)
                tb = np.empty(len(seg), dtype=np.uint64)
            sbuf, stb = buf[: len(seg)], tb[: len(seg)]
            soff = offsets[nz[rs:re_]] - lo
            rows_idx = nz[rs:re_]
            for p in range(n_perm):
                np.multiply(seg, a[p], out=sbuf)
                np.add(sbuf, b[p], out=sbuf)
                # x mod (2^31-1) WITHOUT the uint64 division (np.mod was
                # the hot loop's dominant op — hardware integer division):
                # 2^31 ≡ 1 (mod P), so fold x = q·2^31 + r -> q + r twice
                # (x < 2^62 -> < 2^32 -> <= P+1), then one conditional
                # subtract via unsigned-wrap minimum. Bit-identical result.
                np.right_shift(sbuf, sh31, out=stb)
                np.bitwise_and(sbuf, MERSENNE_P, out=sbuf)
                np.add(sbuf, stb, out=sbuf)          # < 2^32
                np.right_shift(sbuf, sh31, out=stb)
                np.bitwise_and(sbuf, MERSENNE_P, out=sbuf)
                np.add(sbuf, stb, out=sbuf)          # <= P + 1
                np.subtract(sbuf, MERSENNE_P, out=stb)  # wraps when < P
                np.minimum(sbuf, stb, out=sbuf)
                out[rows_idx, p] = np.minimum.reduceat(sbuf, soff)
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
        nz = np.flatnonzero(lens)
        one = np.uint64(1)
        hw = np.empty(_CHUNK + 1, dtype=np.uint64)
        tmp = np.empty(_CHUNK + 1, dtype=np.uint64)
        # scratch buffers reused + cache blocking — see minhash_batch
        for rs, re_, lo, hi in _row_chunks(offsets, lens, nz):
            seg = flat[lo:hi]
            if len(seg) > len(hw):
                hw = np.empty(len(seg), dtype=np.uint64)
                tmp = np.empty(len(seg), dtype=np.uint64)
            shw, stmp = hw[: len(seg)], tmp[: len(seg)]
            rows_idx = nz[rs:re_]
            soff = offsets[rows_idx] - lo
            slens = lens[rows_idx]
            for w in range(words):
                np.multiply(seg, muls[w], out=shw)  # uint64 wraparound mix
                np.add(shw, adds[w], out=shw)
                np.right_shift(shw, np.uint64(33), out=stmp)
                np.bitwise_xor(shw, stmp, out=shw)
                np.multiply(shw, np.uint64(0xFF51AFD7ED558CCD), out=shw)
                np.right_shift(shw, np.uint64(33), out=stmp)
                np.bitwise_xor(shw, stmp, out=shw)
                # per-bit shift/mask/reduceat over the L2-resident chunk.
                # (A measured dead end: transposing to a (n, 64) uint8 bit
                # matrix via unpackbits + one axis-0 reduceat was 2.2x
                # SLOWER — the 64x-wider intermediate trades cache-resident
                # passes for DRAM traffic. Kept the loop.)
                word = np.zeros(len(rows_idx), dtype=np.uint64)
                for j in range(64):
                    np.right_shift(shw, np.uint64(j), out=stmp)
                    np.bitwise_and(stmp, one, out=stmp)
                    sums = np.add.reduceat(stmp, soff)
                    word |= (2 * sums > slens).astype(np.uint64) << np.uint64(j)
                out[rows_idx, w] = word
    return pd.Series(list(out.view(np.int64)))


def make_sign_udf(cfg: DedupConfig):
    """One combined pandas UDF: token hashes -> (n_shingles, shingle_hashes,
    minhash, simhash). A single Arrow transfer per batch; all shingling and
    both signature reductions happen in numpy."""
    from pyspark.sql.types import StructField, StructType

    a, b = minhash_coeffs(cfg)
    schema = StructType(
        [
            StructField("n_shingles", LongType()),
            StructField("shingle_hashes", ArrayType(LongType())),
            StructField("minhash", ArrayType(LongType())),
            StructField("simhash", ArrayType(LongType())),
        ]
    )

    @F.pandas_udf(schema)
    def sign_udf(tok_hashes: pd.Series) -> pd.DataFrame:
        shingles, _ = shingle_hash_batch(tok_hashes, cfg.shingle_k, cfg.seed)
        sh_series = pd.Series(shingles)
        mh = minhash_batch(sh_series, a, b)
        sim = simhash_batch(sh_series, cfg.simhash_bits, cfg.seed)
        return pd.DataFrame(
            {
                "n_shingles": [len(s) for s in shingles],
                "shingle_hashes": shingles,
                "minhash": mh,
                "simhash": sim,
            }
        )

    return sign_udf
