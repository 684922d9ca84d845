"""Deterministic synthetic source-code corpus with planted duplicate classes.

Schema per BASELINE.json input_hint: (repo, path, commit, lang, content).
Mirrors FIXTURES.md F1: unique 50%, exact 15%, near 20%, substring 10%,
boilerplate 5%.

Scale-first construction: every row is a pure function of (seed, row_id), so
generation distributes over executors with ``spark.range(n).mapInPandas`` and
never depends on partition count or row order (the determinism contract of
/root/reference/test/seed_test.py:20-38). Duplicate rows *re-generate* their
base row's content locally from the base id — no joins, no driver state.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["python", "java", "cpp", "go", "js"]
_EXT = {"python": "py", "java": "java", "cpp": "cc", "go": "go", "js": "js"}

# class layout over id space (hash-assigned, proportions from FIXTURES.md F1)
CLASS_UNIQUE = "unique"
CLASS_EXACT = "exact"
CLASS_NEAR = "near"
CLASS_SUBSTRING = "substring"
CLASS_BOILERPLATE = "boilerplate"

_BOILERPLATE = (
    "// Copyright (c) 2024 Example Corp. Licensed under the Apache License, "
    "Version 2.0 (the License); you may not use this file except in "
    "compliance with the License. See LICENSE in the project root.\n"
)

_VOCAB_SIZE = 4096


def _rng(seed: int, *streams: int) -> np.random.Generator:
    return np.random.default_rng([seed, *streams])


def _vocab(seed: int) -> np.ndarray:
    """Synthetic identifier vocabulary; one array reused for every row."""
    rng = _rng(seed, 0xB0CA)
    stems = np.array(
        ["get", "set", "run", "calc", "load", "save", "node", "item", "buf",
         "ctx", "cfg", "idx", "tmp", "val", "ptr", "obj", "str", "num", "arr",
         "map", "key", "row", "col", "sum", "min", "max", "len", "pos", "err",
         "ret", "fn", "util", "data", "hash", "pack", "read", "write", "scan"]
    )
    nums = rng.integers(0, 999, size=_VOCAB_SIZE)
    a = stems[rng.integers(0, len(stems), size=_VOCAB_SIZE)]
    b = stems[rng.integers(0, len(stems), size=_VOCAB_SIZE)]
    return np.char.add(np.char.add(a, np.char.add("_", b)), nums.astype(str))


def _class_of(seed: int, i: int) -> str:
    r = _rng(seed, 0xC1A5, i).integers(0, 100)
    if r < 50:
        return CLASS_UNIQUE
    if r < 65:
        return CLASS_EXACT
    if r < 85:
        return CLASS_NEAR
    if r < 95:
        return CLASS_SUBSTRING
    return CLASS_BOILERPLATE


def _base_tokens(seed: int, base_id: int, vocab: np.ndarray) -> np.ndarray:
    """Token stream of a base (unique-class) document."""
    rng = _rng(seed, 0xBA5E, base_id)
    n = int(np.exp(rng.normal(5.0, 0.8)))  # log-normal, median ~150 tokens
    n = max(8, min(n, 4000))
    return vocab[rng.integers(0, len(vocab), size=n)]


def _render(tokens: np.ndarray, lang: str) -> str:
    """Token stream -> code-ish text (lines of ~8 tokens)."""
    parts = []
    for i in range(0, len(tokens), 8):
        parts.append(" ".join(tokens[i : i + 8]))
    sep = ";\n" if lang in ("java", "cpp", "js") else "\n"
    return sep.join(parts)


def _row(seed: int, i: int, n_total: int, vocab: np.ndarray) -> dict:
    cls = _class_of(seed, i)
    rng = _rng(seed, 0x20B5, i)
    base = int(_rng(seed, 0xBA5EBA11, i).integers(0, max(n_total // 2, 1)))

    if cls == CLASS_UNIQUE:
        toks = _base_tokens(seed, i, vocab)
        base = i
    elif cls == CLASS_EXACT:
        toks = _base_tokens(seed, base, vocab)
    elif cls == CLASS_NEAR:
        toks = _base_tokens(seed, base, vocab).copy()
        # contiguous block replacement, 1-8% of tokens (localized edit —
        # the shape of a real code change; keeps true Jaccard >= ~0.8)
        frac = 0.01 + 0.07 * rng.random()
        span = max(1, int(len(toks) * frac))
        start = int(rng.integers(0, max(len(toks) - span, 1)))
        toks[start : start + span] = vocab[
            rng.integers(0, len(vocab), size=min(span, len(toks) - start))
        ]
    elif cls == CLASS_SUBSTRING:
        toks = _base_tokens(seed, i + n_total, vocab)  # own unique stream
    else:  # boilerplate: shared header on otherwise-unique content
        toks = _base_tokens(seed, i + 2 * n_total, vocab)
        base = i

    lang = LANGS[int(_rng(seed, 0x1A46, base).integers(0, len(LANGS)))]
    content = _render(toks, lang)
    if cls == CLASS_SUBSTRING:
        # splice a verbatim CHAR-level block of the base's rendered text
        # (token-level splicing would re-wrap lines and break verbatimness);
        # block length ~2.2-4x min_substring_len chars
        base_text = _render(_base_tokens(seed, base, vocab), lang)
        blk_len = int(2200 + 1800 * rng.random())
        blk = (base_text * (blk_len // max(len(base_text), 1) + 1))[:blk_len] \
            if len(base_text) < blk_len else base_text[:blk_len]
        cut = int(rng.integers(0, len(content) + 1))
        content = content[:cut] + "\n" + blk + "\n" + content[cut:]
    if cls == CLASS_BOILERPLATE:
        content = _BOILERPLATE + content

    repo_n = int(_rng(seed, 0x4E90, i).integers(0, 20))
    commit = _rng(seed, 0xC0017, i).bytes(20).hex()
    return {
        "repo": f"org{repo_n % 5}/repo{repo_n}",
        "path": f"src/pkg{i % 97}/file{i}.{_EXT[lang]}",
        "commit": commit,
        "lang": lang,
        "content": content,
        "dup_class": cls,
        "base_id": base,
        "row_id": i,
    }


CORPUS_COLS = ["repo", "path", "commit", "lang", "content"]
LABEL_COLS = ["repo", "path", "commit", "dup_class", "base_id", "row_id"]


def generate_corpus_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation for tests (n <= ~10k)."""
    vocab = _vocab(seed)
    return pd.DataFrame([_row(seed, i, n, vocab) for i in range(n)])


def generate_corpus(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Distributed generation: (corpus_df, labels_df)."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab = _vocab(seed)
        for pdf in batches:
            rows = [_row(seed, int(i), n, vocab) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    schema = (
        "repo string, path string, commit string, lang string, content string,"
        " dup_class string, base_id long, row_id long"
    )
    full = spark.range(0, n, numPartitions=parts).mapInPandas(gen, schema=schema)
    return full.select(*CORPUS_COLS), full.select(*LABEL_COLS)
