"""SUBSTRING pass: exact long verbatim-substring duplicate pairs.

Finds file pairs sharing a verbatim block >= cfg.min_substring_len chars
even when whole-file Jaccard is far below threshold (SURVEY.md §2.4) — the
capability Annoy's whole-vector metrics cannot express.

Distributed design (replaces a monolithic suffix array, which cannot be
built across executors without an all-to-all of the corpus):

1. WINNOWING fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
   algorithm): rolling 64-bit polynomial hash of every `chunk`-byte gram,
   then the minimum hash of every `window` consecutive grams is selected.
   Deterministic guarantee: any common substring of length
   >= window + chunk - 1 (= min_substring_len) shares a selected
   fingerprint, regardless of alignment. Fully vectorized (prefix-product
   rolling hash + block prefix/suffix minima), ~2·len/window fingerprints
   per file.
2. Fingerprint groupBy -> anchor pairs through the SAME three-tier skew
   ladder as banding (full pairs / star / salted two-level star, nothing
   dropped; huge fingerprint families additionally accounted).
3. DIAGONAL VOTING anchor selection: a shared block aligns the two files at
   one offset delta = pos_u - pos_v, and every shared fingerprint inside
   the block votes for that delta (the seed-and-extend diagonal trick).
   Repeated content can winnow DIFFERENT occurrences of the same gram in
   the two files (a misaligned anchor under-extends), so each fingerprint
   keeps up to 8 positions and anchors are taken from the top-2 voted
   diagonals — the dominant diagonal is the true alignment.
4. EXACT verification: join the pair's contents, extend the anchor left and
   right byte-by-byte (vectorized mismatch scan); pass iff the real match
   length >= min_substring_len. Anchors are real text matches, so hash
   collisions only cost a failed verification — never a false positive
   (Annoy's exact re-rank contract, annoylib.h:1492-1494).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, LongType, StructField, StructType,
)

from annoy_spark.config import DedupConfig

_B = np.uint64(0x100000001B3)  # odd => invertible mod 2^64
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return x


_POW_CACHE: dict[str, np.ndarray] = {}


def _powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(B^j, B^-j) for j < n — grown geometrically, cached per worker
    (recomputing two cumprods per FILE doubled the kernel's memory traffic)."""
    cur = _POW_CACHE.get("b")
    if cur is None or len(cur) < n:
        size = max(n, 2 * len(cur) if cur is not None else 4096)
        b = np.full(size, _B, dtype=np.uint64)
        b[0] = np.uint64(1)
        np.cumprod(b, out=b)
        binv = np.full(size, _BINV, dtype=np.uint64)
        binv[0] = np.uint64(1)
        np.cumprod(binv, out=binv)
        _POW_CACHE["b"], _POW_CACHE["binv"] = b, binv
    return _POW_CACHE["b"], _POW_CACHE["binv"]


def rolling_gram_hashes(data: np.ndarray, c: int) -> np.ndarray:
    """64-bit polynomial hashes of every c-byte gram (len(data)-c+1 values).

    h(i) = sum_j data[i+j] * B^(c-1-j) mod 2^64, computed via prefix sums of
    data[j]*B^(-j) — one pass, no per-gram loop."""
    n = len(data)
    if n < c:
        return np.empty(0, dtype=np.uint64)
    b_pow, binv_pow = _powers(n)
    v = data.astype(np.uint64) * binv_pow[:n]
    t = np.concatenate(([np.uint64(0)], np.cumsum(v, dtype=np.uint64)))
    # window sum * B^(i+c-1)
    return (t[c:] - t[: n - c + 1]) * b_pow[c - 1 : n]


def _sliding(arr: np.ndarray, w: int, ufunc, fill) -> np.ndarray:
    """ext[i] = ufunc over arr[i:i+w], i in [0, len-w] — O(n) block trick:
    window extremum = ufunc(suffix-acc of left block, prefix-acc of right)."""
    n = len(arr)
    pad = (-n) % w
    hp = np.concatenate([arr, np.full(pad, fill, dtype=arr.dtype)])
    blocks = hp.reshape(-1, w)
    pref = ufunc.accumulate(blocks, axis=1).ravel()[:n]
    suff = ufunc.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()[:n]
    starts = np.arange(0, n - w + 1)
    return ufunc(suff[starts], pref[starts + w - 1])


def winnow(hashes: np.ndarray, w: int) -> np.ndarray:
    """Positions whose hash is the minimum of at least one w-gram window
    (superset of classic winnowing's canonical choice — same guarantee:
    every w-window contributes its min, so any common substring covering a
    full window yields a shared selected gram in both files; O(n)).
    """
    n = len(hashes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n <= w:
        return np.flatnonzero(hashes == hashes.min())
    top = np.uint64(0xFFFFFFFFFFFFFFFF)
    wmin = _sliding(hashes, w, np.minimum, top)          # len n-w+1
    # selected[i] <=> h[i] == min of SOME window covering i
    #            <=> h[i] == max over wmin[i-w+1 .. i]   (window mins <= h[i])
    zero = np.uint64(0)
    padded = np.concatenate(
        [np.full(w - 1, zero), wmin, np.full(w - 1, zero)]
    )
    cover_max = _sliding(padded, w, np.maximum, zero)     # len n
    return np.flatnonzero(hashes == cover_max)


MAX_POS_PER_HASH = 8


def fingerprint_positions(
    text: str, chunk: int, window: int, max_pos: int = MAX_POS_PER_HASH
) -> tuple[np.ndarray, list[np.ndarray]]:
    """(distinct_hashes, positions_per_hash) of winnowed fingerprints.

    ALL selected occurrences of a hash are kept (capped at max_pos: first
    and last max_pos/2 — repeats beyond that add no new diagonals worth
    voting on), because winnowing may select occurrence #k of a repeated
    gram in one file and occurrence #j in the other; single-position
    anchors would then under-extend (or miss) the true match."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    grams = rolling_gram_hashes(data, chunk)
    if len(grams) == 0:
        return np.empty(0, dtype=np.int64), []
    mixed = _mix64(grams)
    pos = winnow(mixed, window)
    h = mixed[pos].view(np.int64)
    order = np.lexsort((pos, h))
    hs, ps = h[order], pos[order].astype(np.int64)
    uniq, start, counts = np.unique(hs, return_index=True, return_counts=True)
    idx = np.arange(len(hs)) - np.repeat(start, counts)
    size = np.repeat(counts, counts)
    half = max_pos // 2
    keep = (idx < half) | (idx >= size - half)
    kept_counts = np.minimum(counts, 2 * half)
    splits = np.cumsum(kept_counts)[:-1]
    return uniq, np.split(ps[keep], splits)


def make_fingerprint_udf(cfg: DedupConfig):
    window = max(cfg.min_substring_len - cfg.substring_chunk + 1, 16)
    schema = StructType(
        [
            StructField("fp", ArrayType(LongType())),
            StructField("fp_pos", ArrayType(ArrayType(LongType()))),
        ]
    )

    @F.pandas_udf(schema)
    def fp_udf(texts: pd.Series) -> pd.DataFrame:
        hs, ps = [], []
        for t in texts:
            h, p = fingerprint_positions(
                t or "", cfg.substring_chunk, window
            )
            hs.append(h)
            ps.append([x for x in p])
        return pd.DataFrame({"fp": hs, "fp_pos": ps})

    return fp_udf


_EXTEND_SCHEMA = "u long, v long, match_len long"
_SLICED_SCHEMA = "u long, v long, match_len long, capped boolean"

# Window schedule: most anchors mismatch within a few bytes (failed
# candidates), so the FIRST window is tiny — the per-anchor cost is
# ~2*match_len + W0 gathered bytes, vs scanning the full remaining file
# per anchor. The cap bounds the int64 index matrices the 2-D gather
# builds (16 B per compared byte), trading a linear tail on
# multi-megabyte matches for bounded memory.
_SCAN_W0 = 64            # first comparison-window width per round
_SCAN_WMAX = 1 << 18     # window growth cap (256 KiB per anchor per round)


def _batch_extend(
    ca: np.ndarray,
    cb: np.ndarray,
    base_u: np.ndarray,
    base_v: np.ndarray,
    avail: np.ndarray,
    backwards: bool,
) -> np.ndarray:
    """Per-anchor maximal match length in one direction, vectorized over
    ALL anchors of the batch at once: each round gathers a (active, W)
    2-D slice from the two concatenated byte buffers, one != + argmax per
    round finds the first mismatch; anchors that matched their whole
    window survive to the next (doubled) window. Rounds are O(log of the
    longest match), every comparison is a flat numpy kernel — no per-pair
    (or per-anchor) Python loop.

    base_*: flat index of the first byte to compare (for backwards, the
    byte just LEFT of the anchor); avail: max comparable bytes (min of
    both sides' remaining lengths). Returns matched byte counts."""
    n = len(base_u)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    cur = np.zeros(n, dtype=np.int64)
    active = np.flatnonzero(avail > 0)
    w = _SCAN_W0
    sign = -1 if backwards else 1
    while len(active):
        width = np.minimum(w, (avail - cur)[active])
        wmax = int(width.max())
        steps = np.arange(wmax, dtype=np.int64)
        iu = base_u[active, None] + sign * (cur[active, None] + steps)
        iv = base_v[active, None] + sign * (cur[active, None] + steps)
        # positions past this anchor's width: force "mismatch" so argmax
        # stops exactly at the boundary (clip keeps the gather in-bounds)
        pad = steps[None, :] >= width[:, None]
        neq = (
            ca[np.clip(iu, 0, len(ca) - 1)]
            != cb[np.clip(iv, 0, len(cb) - 1)]
        ) | pad
        first = np.where(neq.any(axis=1), neq.argmax(axis=1), wmax)
        matched = np.minimum(first, width)
        cur[active] += matched
        # survivors matched their FULL window and still have bytes left
        alive = (matched == width) & ((avail - cur)[active] > 0) & (
            first >= width
        )
        active = active[alive]
        w = min(w * 2, _SCAN_WMAX)
    out[:] = cur
    return out


def make_extend_verifier(cfg: DedupConfig):
    min_len = cfg.min_substring_len

    def verify_batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=["u", "v", "match_len"])
                continue
            # one encode per row (single C call each), concatenated into
            # two flat buffers so every anchor scan is a numpy gather
            abufs = [
                np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                for s in pdf["content_u"]
            ]
            bbufs = [
                np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                for s in pdf["content_v"]
            ]
            la = np.fromiter((len(x) for x in abufs), np.int64, len(abufs))
            lb = np.fromiter((len(x) for x in bbufs), np.int64, len(bbufs))
            oa = np.concatenate(([0], np.cumsum(la)[:-1]))
            ob = np.concatenate(([0], np.cumsum(lb)[:-1]))
            ca = np.concatenate(abufs) if la.sum() else np.zeros(1, np.uint8)
            cb = np.concatenate(bbufs) if lb.sum() else np.zeros(1, np.uint8)

            # flatten (row, anchor) pairs; drop anchors past either string
            n_anc = np.fromiter(
                (len(x) for x in pdf["pos_u"]), np.int64, len(pdf)
            )
            row = np.repeat(np.arange(len(pdf), dtype=np.int64), n_anc)
            pu = (
                np.concatenate(list(pdf["pos_u"])).astype(np.int64)
                if n_anc.sum() else np.empty(0, np.int64)
            )
            pv = (
                np.concatenate(list(pdf["pos_v"])).astype(np.int64)
                if n_anc.sum() else np.empty(0, np.int64)
            )
            ok = (pu < la[row]) & (pv < lb[row])
            row, pu, pv = row[ok], pu[ok], pv[ok]

            # right extension (includes the anchor gram) + left extension;
            # no early stop at min_len: match_len reports the TRUE maximal
            # extension and only the best-aligned anchor reaches it
            right = _batch_extend(
                ca, cb, oa[row] + pu, ob[row] + pv,
                np.minimum(la[row] - pu, lb[row] - pv), backwards=False,
            )
            left = _batch_extend(
                ca, cb, oa[row] + pu - 1, ob[row] + pv - 1,
                np.minimum(pu, pv), backwards=True,
            )
            total = left + right
            best = np.zeros(len(pdf), dtype=np.int64)
            np.maximum.at(best, row, total)
            keep = best >= min_len
            yield pd.DataFrame(
                {
                    "u": pdf["u"].to_numpy()[keep],
                    "v": pdf["v"].to_numpy()[keep],
                    "match_len": best[keep],
                }
            )

    return verify_batch


# Content slicing: the extension verifier only ever compares bytes near an
# anchor, so the pair join ships merged [pos - margin, pos + chunk + margin)
# byte windows instead of whole files — shuffled/Arrow bytes then scale with
# anchor count, not file size. A match longer than the window is detected
# (the scan runs into a slice edge that is not a file edge), flagged
# `capped`, and re-verified on full content, so match_len stays the TRUE
# maximal length. Margin defaults to 2*min_substring_len: a capped anchor
# then implies a real match >= ~2x the report threshold, which is rare, so
# the escalation pass touches only genuinely-long-match pairs.
_SLICE_FULL_FILE_FRAC = 0.8  # merged windows >= this fraction -> whole file


def make_slicer_udf(margin: int, chunk: int):
    """(file_id, content, ps) -> (file_id, flen, slices) where slices are
    merged disjoint byte windows around the file's anchor positions, each
    (start, bytes) over the utf-8 buffer (anchor positions are byte
    offsets into that buffer, matching fingerprint_positions)."""
    schema = StructType(
        [
            StructField("file_id", LongType()),
            StructField("flen", LongType()),
            StructField(
                "slices",
                ArrayType(
                    StructType(
                        [
                            StructField("start", LongType()),
                            StructField("bytes", BinaryType()),
                        ]
                    )
                ),
            ),
        ]
    )

    def slice_batches(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            ids, flens, slices = [], [], []
            for fid, content, ps in zip(
                pdf["file_id"], pdf["content"], pdf["ps"]
            ):
                data = (content or "").encode("utf-8")
                fl = len(data)
                p = np.unique(np.asarray(list(ps), dtype=np.int64))
                p = p[(p >= 0) & (p < fl)]
                lo = np.maximum(p - margin, 0)
                hi = np.minimum(p + chunk + margin, fl)
                # merge overlapping windows (lo sorted): a new interval
                # starts where lo exceeds the running max of hi
                if len(p):
                    runhi = np.maximum.accumulate(hi)
                    brk = np.flatnonzero(lo[1:] > runhi[:-1]) + 1
                    starts = lo[np.concatenate(([0], brk))]
                    ends = runhi[np.concatenate((brk - 1, [len(p) - 1]))]
                else:
                    starts = ends = np.empty(0, dtype=np.int64)
                if int((ends - starts).sum()) >= _SLICE_FULL_FILE_FRAC * fl:
                    out = [{"start": 0, "bytes": data}]
                else:
                    out = [
                        {"start": int(s), "bytes": data[int(s) : int(e)]}
                        for s, e in zip(starts, ends)
                    ]
                ids.append(fid)
                flens.append(fl)
                slices.append(out)
            yield pd.DataFrame(
                {"file_id": ids, "flen": flens, "slices": slices}
            )

    return slice_batches, schema


def _flatten_slices(col: pd.Series):
    """Concatenate a batch's slice arrays into one flat byte buffer.

    Returns (keys, starts, slens, offs, flat): `keys` is the per-slice
    row-qualified start (row * 2^41 + start) so ONE searchsorted maps any
    (row, pos) anchor to its slice; starts[j]/slens[j] are slice j's byte
    range in its file; offs[j] is slice j's offset in `flat`."""
    n_slices = np.fromiter((len(x) for x in col), np.int64, len(col))
    bufs = [np.frombuffer(s["bytes"], dtype=np.uint8) for x in col for s in x]
    total = int(n_slices.sum())
    if total:
        starts = np.fromiter(
            (s["start"] for x in col for s in x), np.int64, total
        )
        slens = np.fromiter((len(b) for b in bufs), np.int64, total)
        flat = np.concatenate(bufs) if slens.sum() else np.zeros(1, np.uint8)
        offs = np.concatenate(([0], np.cumsum(slens)[:-1]))
    else:
        starts = slens = offs = np.empty(0, np.int64)
        flat = np.zeros(1, np.uint8)
    row_of_slice = np.repeat(np.arange(len(col), dtype=np.int64), n_slices)
    keys = row_of_slice * _ROW_KEY + starts
    return keys, starts, slens, offs, flat


_ROW_KEY = np.int64(1) << np.int64(41)  # > any byte offset in one file


def make_sliced_verifier(cfg: DedupConfig):
    """Sparse-buffer twin of make_extend_verifier: anchors resolve into the
    pair's pruned slice windows; an extension that exhausts a slice edge
    short of the file edge marks the pair `capped` for full-content
    re-verification (exactness contract, annoylib.h:1492-1494)."""
    min_len = cfg.min_substring_len

    def verify_batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    columns=["u", "v", "match_len", "capped"]
                )
                continue
            ka, sa, la, oa, ca = _flatten_slices(pdf["slices_u"])
            kb, sb, lb, ob, cb = _flatten_slices(pdf["slices_v"])
            fla = pdf["flen_u"].to_numpy(np.int64)
            flb = pdf["flen_v"].to_numpy(np.int64)

            n_anc = np.fromiter(
                (len(x) for x in pdf["pos_u"]), np.int64, len(pdf)
            )
            row = np.repeat(np.arange(len(pdf), dtype=np.int64), n_anc)
            pu = (
                np.concatenate(list(pdf["pos_u"])).astype(np.int64)
                if n_anc.sum() else np.empty(0, np.int64)
            )
            pv = (
                np.concatenate(list(pdf["pos_v"])).astype(np.int64)
                if n_anc.sum() else np.empty(0, np.int64)
            )
            ok = (pu < fla[row]) & (pv < flb[row])
            row, pu, pv = row[ok], pu[ok], pv[ok]

            # anchor -> containing slice via the row-qualified start keys
            ja = np.searchsorted(ka, row * _ROW_KEY + pu, side="right") - 1
            jb = np.searchsorted(kb, row * _ROW_KEY + pv, side="right") - 1
            ok = (
                (ja >= 0) & (jb >= 0)
                & (pu < sa[ja.clip(0)] + la[ja.clip(0)])
                & (pu >= sa[ja.clip(0)])
                & (pv < sb[jb.clip(0)] + lb[jb.clip(0)])
                & (pv >= sb[jb.clip(0)])
            )
            row, pu, pv, ja, jb = row[ok], pu[ok], pv[ok], ja[ok], jb[ok]

            rs_u = sa[ja] + la[ja] - pu          # bytes right of anchor, slice
            rs_v = sb[jb] + lb[jb] - pv
            rf = np.minimum(fla[row] - pu, flb[row] - pv)   # ... file
            avail_r = np.minimum(rs_u, rs_v)
            ls_u = pu - sa[ja]
            ls_v = pv - sb[jb]
            lf = np.minimum(pu, pv)
            avail_l = np.minimum(ls_u, ls_v)

            right = _batch_extend(
                ca, cb, oa[ja] + ls_u, ob[jb] + ls_v, avail_r,
                backwards=False,
            )
            left = _batch_extend(
                ca, cb, oa[ja] + ls_u - 1, ob[jb] + ls_v - 1, avail_l,
                backwards=True,
            )
            capped = ((right == avail_r) & (avail_r < rf)) | (
                (left == avail_l) & (avail_l < lf)
            )
            total = left + right
            best = np.zeros(len(pdf), dtype=np.int64)
            np.maximum.at(best, row, total)
            cap_any = np.zeros(len(pdf), dtype=bool)
            np.logical_or.at(cap_any, row, capped)
            keep = cap_any | (best >= min_len)
            yield pd.DataFrame(
                {
                    "u": pdf["u"].to_numpy()[keep],
                    "v": pdf["v"].to_numpy()[keep],
                    "match_len": best[keep],
                    "capped": cap_any[keep],
                }
            )

    return verify_batch


# broadcast the anchored pair set only while it stays comfortably in
# memory: rows are (u, v, <=8+8 positions) ~ 150 B -> 500k ~ 75 MB
PAIR_BROADCAST_CAP = 500_000


def substring_edges(
    corpus_with_ids: DataFrame,
    cfg: DedupConfig,
    broadcast_pairs: bool | None = None,
    return_skipped: bool = False,
    slice_margin: int | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """(u, v, match_len) pairs sharing a verbatim block >= min_substring_len.

    corpus_with_ids: (file_id, content) — pass sha-collapsed representatives
    to keep fingerprint groups free of exact-duplicate blowup.

    broadcast_pairs=None (default) decides adaptively from the materialized
    anchored-pair count. Content is NEVER broadcast: the pair-id set
    broadcast-semi-filters the corpus, then two bounded sides shuffle-join —
    worst case is a shuffle of candidate contents, not an executor OOM.

    return_skipped=True additionally returns the huge-fingerprint-family
    accounting DataFrame (fp, n_members) — families above band_group_cap
    go through the salted star (nothing dropped) but are surfaced for skew
    observability, exactly like banding's skipped_groups.
    """
    fp_udf = make_fingerprint_udf(cfg)

    # one UDF pass, one row per (file, distinct fingerprint hash) with the
    # capped position list; window-annotated group stats; persisted because
    # three tiers consume it (without persist the content-scanning UDF
    # would re-run per consumer)
    w = Window.partitionBy("fp")
    fps = (
        corpus_with_ids.select(
            "file_id", fp_udf(F.col("content")).alias("f")
        )
        .select("file_id", F.arrays_zip("f.fp", "f.fp_pos").alias("z"))
        .select("file_id", F.explode("z").alias("e"))
        .select(
            "file_id",
            F.col("e.fp").alias("fp"),
            F.col("e.fp_pos").alias("poss"),
        )
        .select(
            "*",
            # ONE window pass: min over (file_id, poss) structs orders by
            # file_id first (unique within a group), so the struct min IS
            # (gmin, gmin's position list) — the old two-pass form (min
            # then max(when(file_id == gmin))) cost a second sort+window
            # over the largest intermediate of the stage
            F.min(F.struct("file_id", "poss")).over(w).alias("gm"),
            F.count(F.lit(1)).over(w).alias("gsize"),
        )
        .select(
            "file_id", "fp", "poss", "gsize",
            F.col("gm.file_id").alias("gmin"),
            F.col("gm.poss").alias("gmin_poss"),
        )
        .persist()
    )

    # tier 1: full pairs in small groups (self-join reuses fp partitioning)
    in_small = fps.where(
        (F.col("gsize") > 1) & (F.col("gsize") <= cfg.pair_enum_cap)
    ).select("fp", "file_id", "poss")
    full_pairs = (
        in_small.alias("a")
        .join(in_small.alias("b"), "fp")
        .where(F.col("a.file_id") < F.col("b.file_id"))
        .select(
            F.col("a.file_id").alias("u"),
            F.col("b.file_id").alias("v"),
            F.col("a.poss").alias("pu_list"),
            F.col("b.poss").alias("pv_list"),
        )
    )
    # tier 2: star edges to the group min — anchor positions directly from
    # the window columns, zero extra shuffles
    star_pairs = fps.where(
        (F.col("gsize") > cfg.pair_enum_cap)
        & (F.col("gsize") <= cfg.band_group_cap)
        & (F.col("file_id") != F.col("gmin"))
    ).select(
        F.col("gmin").alias("u"),
        F.col("file_id").alias("v"),
        F.col("gmin_poss").alias("pu_list"),
        F.col("poss").alias("pv_list"),
    )
    # tier 3: salted two-level star for huge fingerprint families
    # (boilerplate/license blocks) — members point at a per-salt-bucket
    # minimum, bucket minima at the family minimum; no reducer sees the
    # whole family and nothing is dropped (band.py's ladder, same shape)
    huge = fps.where(F.col("gsize") > cfg.band_group_cap).select(
        "fp", "file_id", "poss", "gmin", "gmin_poss",
        F.pmod(F.xxhash64("file_id"), F.lit(cfg.salt_buckets)).alias("salt"),
    )
    ws = Window.partitionBy("fp", "salt")
    # same single-pass struct-min trick as the fps window above
    sub = huge.select(
        "*", F.min(F.struct("file_id", "poss")).over(ws).alias("sm")
    ).select(
        F.col("fp"), F.col("file_id"), F.col("poss"), F.col("gmin"),
        F.col("gmin_poss"), F.col("salt"),
        F.col("sm.file_id").alias("smin"),
        F.col("sm.poss").alias("smin_poss"),
    )
    salted_pairs = (
        sub.where(F.col("file_id") != F.col("smin"))
        .select(
            F.col("smin").alias("u"), F.col("file_id").alias("v"),
            F.col("smin_poss").alias("pu_list"), F.col("poss").alias("pv_list"),
        )
        .unionByName(
            sub.where(
                (F.col("file_id") == F.col("smin"))
                & (F.col("smin") != F.col("gmin"))
            ).select(
                F.col("gmin").alias("u"), F.col("smin").alias("v"),
                F.col("gmin_poss").alias("pu_list"),
                F.col("poss").alias("pv_list"),
            )
        )
    )
    skipped = (
        fps.where(F.col("gsize") > cfg.band_group_cap)
        .groupBy("fp")
        .agg(F.first("gsize").alias("n_members"))
    )
    pairs = full_pairs.unionByName(star_pairs).unionByName(salted_pairs)

    # DIAGONAL VOTING: every shared fingerprint occurrence pair votes for
    # an alignment delta = pu - pv; the true shared block's diagonal gets
    # one vote per in-block fingerprint, stray/misaligned combinations get
    # few. Keep the boundary anchors of the top-2 diagonals — misaligned
    # anchors under-extend, so anchoring on the winning diagonal is what
    # makes match_len the TRUE maximal length.
    combos = (
        pairs.select("u", "v", F.explode("pu_list").alias("pu"), "pv_list")
        .select("u", "v", "pu", F.explode("pv_list").alias("pv"))
        .withColumn("delta", F.col("pu") - F.col("pv"))
    )
    # one SMALL shuffle: vote count + two boundary anchors per diagonal,
    # all map-side-combinable aggregates (count/min/max) — no combo array
    # ever crosses the wire. ONE anchor on the true diagonal is enough:
    # the byte extension recovers the full match from any in-block anchor.
    diag = combos.groupBy("u", "v", "delta").agg(
        F.count(F.lit(1)).alias("votes"),
        F.min(F.struct("pu", "pv")).alias("a1"),
        F.max(F.struct("pu", "pv")).alias("a2"),
    ).withColumn("anchors", F.array("a1", "a2"))
    # per-diagonal quota over the top-2 diagonals: ties between the true
    # diagonal and its period-shifted twin are common on repetitive
    # content — BOTH kept diagonals must contribute anchors, or the wrong
    # one can claim every slot and the extension under-reports the match.
    # The (votes desc, delta) order is TOTAL within a (u, v) group (delta
    # is the grouping key one level down), so dense_rank <= 2 selects
    # exactly the first two rows of that order — expressed here as ONE
    # aggregation with slice(array_sort(...), 1, 2) instead of a window
    # (the window re-sorted the whole diag relation and, with its
    # partitioning narrower than diag's (u, v, delta) grouping, cost an
    # extra exchange; guide §2.4). Per-group state is bounded: distinct
    # deltas per pair are capped by the anchors-per-fingerprint cap.
    anchored = (
        diag.groupBy("u", "v")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("votes")).alias("neg_votes"),
                            F.col("delta"),
                            F.col("anchors"),
                        )
                    )
                ),
                1, 2,
            ).alias("top2")
        )
        .select(
            "u", "v",
            F.flatten(
                F.transform("top2", lambda s: s["anchors"])
            ).alias("anc"),
        )
        .select(
            "u", "v",
            F.transform("anc", lambda x: x.pu).alias("pos_u"),
            F.transform("anc", lambda x: x.pv).alias("pos_v"),
        )
    )
    # materialize the (small) anchored set once: cuts the UDF lineage so
    # fps can be unpersisted, and gives an exact count for the adaptive
    # broadcast decision. Lazy when the count follows immediately — the
    # count then materializes the checkpoint in the same job (one pass,
    # not two); eager when the caller pinned broadcast_pairs, because the
    # checkpoint MUST exist before fps.unpersist() below.
    if broadcast_pairs is None:
        anchored = anchored.localCheckpoint(eager=False)
        broadcast_pairs = anchored.count() <= PAIR_BROADCAST_CAP
    else:
        anchored = anchored.localCheckpoint(eager=True)
    if return_skipped:
        # consumed after fps is unpersisted -> cut its lineage now
        skipped = skipped.localCheckpoint(eager=True)
    fps.unpersist()

    content = corpus_with_ids.select("file_id", "content")
    if slice_margin is None:
        slice_margin = adaptive_slice_margin(content, cfg)
    if slice_margin <= 0:
        edges = _full_content_verify(anchored, content, cfg, broadcast_pairs)
    else:
        edges = _sliced_verify(
            anchored, content, cfg, broadcast_pairs, slice_margin
        )
    return (edges, skipped) if return_skipped else edges


def adaptive_slice_margin(content: DataFrame, cfg: DedupConfig) -> int:
    """Default slicing decision: slicing trades ONE extra content scan (the
    slicer) for pair-join bytes bounded by anchor windows (~2*margin each
    side). That only pays when files are much larger than the windows; for
    small-file corpora the merged windows ARE the whole file and the extra
    scan is pure overhead. A bounded sample of file lengths decides (one
    small job; `limit` stops the scan after the first partitions). Two
    documented approximations: the limit samples a PARTITION PREFIX, so an
    input laid out by size can misrepresent the corpus mean, and that only
    misprices the verify path — results are identical either way; pass
    slice_margin explicitly to pin the choice for such layouts. Lengths
    are measured in BYTES (octet_length) because every window/margin in
    the slicer is utf-8 byte arithmetic."""
    margin = 2 * cfg.min_substring_len
    break_even = 4 * (2 * margin + cfg.substring_chunk)
    avg_len = (
        content.select(F.octet_length("content").alias("n"))
        .limit(20_000)
        .agg(F.avg("n"))
        .collect()[0][0]
    )
    return margin if (avg_len or 0) > break_even else 0


def _full_content_verify(
    anchored: DataFrame,
    content: DataFrame,
    cfg: DedupConfig,
    broadcast_pairs: bool,
) -> DataFrame:
    """Exact anchored extension over whole-file contents — the escalation
    path for slice-capped pairs (and the slicing-off fallback)."""
    if broadcast_pairs:
        # u side: broadcast the anchored pair set (ids + positions only)
        # into a streamed content scan — no shuffle, no content broadcast.
        # v side: broadcast-semi-filter content down to candidate files,
        # then shuffle-join the two bounded sides; the only shuffled
        # content belongs to candidate pairs.
        v_ids = anchored.select(F.col("v").alias("file_id")).distinct()
        content_v = content.join(F.broadcast(v_ids), "file_id").select(
            F.col("file_id").alias("v"), F.col("content").alias("content_v")
        )
        j1 = content.select(
            F.col("file_id").alias("u"), F.col("content").alias("content_u")
        ).join(F.broadcast(anchored), "u")
        joined = content_v.join(j1, "v")
    else:
        j1 = content.select(
            F.col("file_id").alias("u"), F.col("content").alias("content_u")
        ).join(anchored, "u")
        joined = content.select(
            F.col("file_id").alias("v"), F.col("content").alias("content_v")
        ).join(j1, "v")
    return joined.mapInPandas(make_extend_verifier(cfg), schema=_EXTEND_SCHEMA)


def _prune_slices(slices_col: str, pos_col: str):
    """Keep only the slices containing THIS pair's anchors (JVM-side, no
    Python): a file in many pairs carries the union of all its anchors'
    windows; per pair only its own windows matter."""
    return F.filter(
        F.col(slices_col),
        lambda s: F.exists(
            F.col(pos_col),
            lambda p: (p >= s["start"])
            & (p < s["start"] + F.length(s["bytes"])),
        ),
    )


def _sliced_verify(
    anchored: DataFrame,
    content: DataFrame,
    cfg: DedupConfig,
    broadcast_pairs: bool,
    margin: int,
) -> DataFrame:
    """Anchored extension over per-file anchor-window slices.

    One content scan builds merged byte windows around every anchor of every
    candidate file (both pair roles); the pair join then ships slices, so
    exchanged bytes scale with anchors (O(pairs * margin)) instead of file
    sizes — at 100 TB the difference between shuffling the corpus subset
    and shuffling a few KB per candidate pair. Pairs whose extension hits a
    window edge short of the file edge (true match >= ~2x min_substring_len)
    are re-verified on full content, so results are bit-identical to the
    full-content path."""
    per_file = (
        anchored.select(F.col("u").alias("file_id"), F.col("pos_u").alias("ps"))
        .unionByName(
            anchored.select(
                F.col("v").alias("file_id"), F.col("pos_v").alias("ps")
            )
        )
        .select("file_id", F.explode("ps").alias("p"))
        .groupBy("file_id")
        .agg(F.collect_set("p").alias("ps"))
    )
    slicer, slice_schema = make_slicer_udf(margin, cfg.substring_chunk)
    if broadcast_pairs:
        sl_in = content.join(F.broadcast(per_file), "file_id")
    else:
        sl_in = content.join(per_file, "file_id")
    # one content scan; both pair roles consume the (much smaller) result
    slices_df = sl_in.mapInPandas(slicer, schema=slice_schema).persist()

    ju = slices_df.select(
        F.col("file_id").alias("u"),
        F.col("flen").alias("flen_u"),
        F.col("slices").alias("slices_u"),
    )
    jv = slices_df.select(
        F.col("file_id").alias("v"),
        F.col("flen").alias("flen_v"),
        F.col("slices").alias("slices_v"),
    )
    pair_side = F.broadcast(anchored) if broadcast_pairs else anchored
    joined = (
        ju.join(pair_side, "u")
        # prune BEFORE the v-side shuffle so exchanged u-bytes are this
        # pair's windows only; v slices shuffle per-file (pre-join), so
        # pruning them after the join only trims the Arrow transfer
        .withColumn("slices_u", _prune_slices("slices_u", "pos_u"))
        .join(jv, "v")
        .withColumn("slices_v", _prune_slices("slices_v", "pos_v"))
    )
    # cache(), not localCheckpoint: narrow (u, v, match_len, capped) rows;
    # executor loss recomputes through recoverable lineage instead of
    # killing the job (cluster localCheckpoint blocks die with their
    # executor — same rationale as the ANN serving plan, ADVICE r3). The
    # count materializes the cache in one pass AND sizes the escalation.
    sliced = joined.mapInPandas(
        make_sliced_verifier(cfg), schema=_SLICED_SCHEMA
    ).persist()
    n_esc = sliced.where("capped").count()
    slices_df.unpersist()

    final = sliced.where(
        (~F.col("capped")) & (F.col("match_len") >= cfg.min_substring_len)
    ).select("u", "v", "match_len")
    if n_esc == 0:
        # materialize the narrow edge rows from the cached verifier output,
        # then release the cache — the old code returned a lazy filter over
        # `sliced` and the persisted partitions leaked for the session
        # lifetime (ADVICE r5; guide §5 "unpersist when done")
        final = final.localCheckpoint(eager=True)
        sliced.unpersist()
        return final
    esc = sliced.where("capped").select("u", "v")
    # the escalated pair set obeys the same broadcast cap as every other
    # pair join: long-verbatim-heavy corpora can cap MILLIONS of pairs,
    # and a forced broadcast there would override AQE into a driver OOM
    esc_bcast = n_esc <= PAIR_BROADCAST_CAP
    esc_anchored = anchored.join(
        F.broadcast(esc) if esc_bcast else esc, ["u", "v"]
    )
    esc_edges = _full_content_verify(
        esc_anchored, content, cfg, broadcast_pairs=esc_bcast
    )
    out = final.unionByName(esc_edges).localCheckpoint(eager=True)
    sliced.unpersist()
    return out
