"""Golden-signature compatibility (FIXTURES.md F4): the committed parquet
fixture must be reproduced bit-for-bit by today's code — the analog of
annoy's committed test.tree + frozen neighbor list
(/root/reference/test/index_test.py:29-34)."""

from __future__ import annotations

from pathlib import Path

from annoy_spark.config import DedupConfig
from annoy_spark.corpus import generate_corpus
from annoy_spark.operators.sign import sign

FIXTURE = str(Path(__file__).parent / "fixtures" / "golden_signatures.parquet")
GOLDEN_CONFIG_HASH = "c74bc8b622e8bb63"  # round 2: +star_rescue_cap


def test_config_hash_frozen():
    assert DedupConfig().config_hash() == GOLDEN_CONFIG_HASH, (
        "default config changed — if intentional, regenerate the golden "
        "fixture and update GOLDEN_CONFIG_HASH"
    )


def test_signatures_reproduce_golden(spark):
    golden = {
        r.file_id: r
        for r in spark.read.parquet(FIXTURE).collect()
    }
    corpus, _ = generate_corpus(spark, 100, seed=42, partitions=2)
    now = {r.file_id: r for r in sign(corpus, DedupConfig()).collect()}
    assert set(now) == set(golden)
    for fid, g in golden.items():
        n = now[fid]
        assert n.content_sha == g.content_sha, fid
        assert n.n_shingles == g.n_shingles, fid
        assert sorted(n.shingle_hashes) == sorted(g.shingle_hashes), fid
        assert list(n.minhash) == list(g.minhash), fid
        assert list(n.simhash) == list(g.simhash), fid
        assert list(n.band_keys) == list(g.band_keys), fid
