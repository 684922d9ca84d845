"""SIGN stage: corpus -> per-file signatures.

The analog of Annoy's build() over all items (/root/reference/src/
annoylib.h:1037-1078): one pass computing identity, invariant, and both LSH
signatures.

Execution split (measured, not guessed): split/lower/sha2/xxhash64 are
codegen'd JVM expressions; per-token xxhash64 is the single (interpreted)
higher-order lambda; everything ragged — shingling, distinct, minhash,
simhash — runs in ONE Arrow-vectorized pandas UDF over compact int64
arrays. Content strings never cross into Python. (The naive all-JVM
string-shingle plan was ~100x slower because higher-order lambdas are
interpreted per element.)

Output schema:
  file_id      long        xxhash64(repo, path, commit) — sparse ids are fine,
                           Annoy tolerates id holes (test/holes_test.py:22-38)
  content_sha  string      sha256 invariant vs the source table (input_hint)
  n_shingles   long        0 for empty-after-normalization docs (the
                           zero-vector case, test/angular_index_test.py:78-84)
  shingle_hashes array<long>  distinct shingle hashes (verification input)
  minhash      array<long> n_perm minimum permutation values
  simhash      array<long> simhash_bits/64 packed words
  band_keys    array<long> one xxhash64 key per band
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from annoy_spark.config import DedupConfig
from annoy_spark.functions.signatures import (
    band_keys_col,
    make_sign_udf,
    token_hashes_col,
    tokens_col,
)


def file_id_col() -> F.Column:
    return F.xxhash64("repo", "path", "commit")


def sign(corpus: DataFrame, cfg: DedupConfig) -> DataFrame:
    sign_udf = make_sign_udf(cfg)

    base = corpus.select(
        file_id_col().alias("file_id"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
        token_hashes_col(tokens_col("content")).alias("tok_hashes"),
    )
    signed = base.select(
        "file_id",
        "content_sha",
        sign_udf("tok_hashes").alias("sig"),
    ).select("file_id", "content_sha", "sig.*")
    return signed.select(
        "*", band_keys_col(F.col("minhash"), cfg).alias("band_keys")
    )
