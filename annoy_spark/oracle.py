"""Brute-force O(n^2) oracle in plain pandas/python — the accuracy referee.

Plays the role of ann-benchmarks' precomputed `neighbors`
(/root/reference/test/accuracy_test.py:76): an exact, independent
implementation (python sets, no numpy hashing shared with the engine) that
the pipeline's output is measured against. Only usable at test scale.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import pandas as pd

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def shingle_set(text: str, k: int) -> frozenset[str]:
    toks = tokens(text)
    if not toks:
        return frozenset()
    if len(toks) < k:
        return frozenset([" ".join(toks)])
    return frozenset(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))


def jaccard(a: frozenset, b: frozenset) -> float:
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


@dataclass
class OracleResult:
    edges: pd.DataFrame      # u, v, kind ('exact'|'near'), jaccard
    clusters: dict[int, int]  # file_id -> min file_id of component


class _DSU:
    def __init__(self) -> None:
        self.p: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def compute_oracle(
    corpus: pd.DataFrame,
    ids: dict[tuple[str, str, str], int],
    shingle_k: int,
    jaccard_s: float,
) -> OracleResult:
    """corpus: pandas (repo,path,commit,content). ids: key -> file_id map
    (from Spark's xxhash64 so both sides use identical ids)."""
    rows = []
    for r in corpus.itertuples(index=False):
        fid = ids[(r.repo, r.path, r.commit)]
        sha = hashlib.sha256(r.content.encode()).hexdigest()
        rows.append((fid, sha, shingle_set(r.content, shingle_k)))

    edges = []
    n = len(rows)
    for i in range(n):
        fi, shai, si = rows[i]
        for j in range(i + 1, n):
            fj, shaj, sj = rows[j]
            u, v = min(fi, fj), max(fi, fj)
            if shai == shaj:
                edges.append((u, v, "exact", 1.0))
            else:
                jac = jaccard(si, sj)
                if jac >= jaccard_s:
                    edges.append((u, v, "near", jac))

    dsu = _DSU()
    for fid, _, _ in rows:
        dsu.find(fid)
    for u, v, _, _ in edges:
        dsu.union(u, v)
    clusters = {fid: dsu.find(fid) for fid, _, _ in rows}
    return OracleResult(
        edges=pd.DataFrame(edges, columns=["u", "v", "kind", "jaccard"]),
        clusters=clusters,
    )


def pair_recall(
    oracle_edges: pd.DataFrame, clusters: dict[int, int]
) -> tuple[float, int, int]:
    """Fraction of oracle duplicate pairs co-clustered by the pipeline."""
    if len(oracle_edges) == 0:
        return 1.0, 0, 0
    hit = sum(
        1
        for u, v in zip(oracle_edges["u"], oracle_edges["v"])
        if clusters.get(u) is not None and clusters.get(u) == clusters.get(v)
    )
    return hit / len(oracle_edges), hit, len(oracle_edges)


def cluster_precision(
    clusters: dict[int, int], oracle_clusters: dict[int, int]
) -> tuple[float, int, int]:
    """Fraction of pipeline co-clustered pairs that the oracle co-clusters.

    Computed per cluster group (quadratic only in cluster sizes)."""
    from collections import defaultdict

    groups: dict[int, list[int]] = defaultdict(list)
    for fid, cid in clusters.items():
        groups[cid].append(fid)
    total = hit = 0
    for members in groups.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                total += 1
                if oracle_clusters.get(members[i]) == oracle_clusters.get(
                    members[j]
                ):
                    hit += 1
    return (hit / total if total else 1.0), hit, total
