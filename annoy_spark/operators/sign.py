"""SIGN stage: corpus -> per-file signatures.

The analog of Annoy's build() over all items (/root/reference/src/
annoylib.h:1037-1078): one pass computing identity, invariant, and both LSH
signatures. All string work happens JVM-side in whole-stage codegen; only
compact int64 hash arrays cross Arrow into the vectorized signature UDFs.

Output schema:
  file_id      long        xxhash64(repo, path, commit) — sparse ids are fine,
                           Annoy tolerates id holes (test/holes_test.py:22-38)
  content_sha  string      sha256 invariant vs the source table (input_hint)
  n_shingles   long        0 for empty-after-normalization docs (the
                           zero-vector case, test/angular_index_test.py:78-84)
  shingle_hashes array<long>  distinct shingle xxhash64s (verification input)
  minhash      array<long> n_perm minimum permutation values
  simhash      array<long> simhash_bits/64 packed words
  band_keys    array<long> one xxhash64 key per band
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from annoy_spark.config import DedupConfig
from annoy_spark.functions.signatures import (
    band_keys_col,
    make_signature_udfs,
    shingle_hashes_col,
    shingles_col,
    tokens_col,
)


def file_id_col() -> F.Column:
    return F.xxhash64("repo", "path", "commit")


def sign(corpus: DataFrame, cfg: DedupConfig) -> DataFrame:
    minhash_udf, simhash_udf = make_signature_udfs(cfg)

    toks = tokens_col("content")
    base = corpus.select(
        file_id_col().alias("file_id"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
        F.when(F.size(toks) >= 1, shingles_col(toks, cfg.shingle_k))
        .otherwise(F.array().cast("array<string>"))
        .alias("shingles"),
    )
    hashed = base.select(
        "file_id",
        "content_sha",
        F.size("shingles").cast("long").alias("n_shingles"),
        shingle_hashes_col(F.col("shingles")).alias("shingle_hashes"),
    )
    signed = hashed.select(
        "*",
        minhash_udf("shingle_hashes").alias("minhash"),
        simhash_udf("shingle_hashes").alias("simhash"),
    )
    return signed.select(
        "*", band_keys_col(F.col("minhash"), cfg).alias("band_keys")
    )
