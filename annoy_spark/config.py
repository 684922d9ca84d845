"""Frozen pipeline configuration.

One dataclass of every knob, hashable so checkpoints can be validated against
the config that produced them — the analog of Annoy's fixed (f, metric) schema
validated at load time (/root/reference/src/annoylib.h:1185-1188) and its
set_seed determinism contract (/root/reference/test/seed_test.py:20-38).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    """All knobs for the dedup pipeline. Defaults follow FIXTURES.md F5."""

    seed: int = 42

    # tokenization / shingling
    shingle_k: int = 5            # tokens per shingle
    lowercase: bool = True

    # MinHash (banded LSH = Annoy's forest: n_trees <-> bands,
    # leaf selectivity <-> rows per band; src/annoylib.h:1447-1504)
    n_perm: int = 128
    bands: int = 32
    rows_per_band: int = 4

    # SimHash (random-hyperplane angular LSH; src/annoylib.h:467-510)
    simhash_bits: int = 128       # packed into simhash_bits/64 int64 words
    hamming_t: int = 8            # max Hamming distance (of simhash_bits)

    # verification thresholds (exact re-rank; src/annoylib.h:1492-1494)
    jaccard_s: float = 0.80
    # the hamming path needs enough shingles for the majority vote to be
    # meaningful (estimator variance ~ 1/n_shingles)
    simhash_min_shingles: int = 16

    # exact-substring pass (winnowing fingerprints + exact extension)
    enable_substring: bool = True
    min_substring_len: int = 2000  # chars
    substring_chunk: int = 64      # fingerprint chunk length (chars)

    # skew defense (Annoy imbalance fallback analog; src/annoylib.h:1337-1425)
    pair_enum_cap: int = 64        # full O(g^2) pair enumeration up to here
    band_group_cap: int = 1000     # star enumeration up to here; beyond:
    salt_buckets: int = 16         # skipped + accounted in lineage
    # star-failure rescue: pairs among failed star members are enumerated in
    # full up to this many failures per center (star-to-min-failed beyond);
    # 0 disables the rescue pass entirely
    star_rescue_cap: int = 64

    # connected components
    cc_max_iters: int = 50

    def __post_init__(self) -> None:
        if self.n_perm != self.bands * self.rows_per_band:
            raise ValueError(
                f"n_perm ({self.n_perm}) must equal bands*rows_per_band "
                f"({self.bands}*{self.rows_per_band})"
            )
        if self.simhash_bits % 64 != 0:
            raise ValueError("simhash_bits must be a multiple of 64")

    @property
    def simhash_words(self) -> int:
        return self.simhash_bits // 64

    def config_hash(self) -> str:
        """Stable hash of every semantic knob; stamped on checkpoints."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "DedupConfig":
        return cls(**json.loads(s))
