"""Corpus generator contracts: determinism, partition independence,
planted-class structure (FIXTURES.md F1)."""

from __future__ import annotations

import pandas as pd

from annoy_spark.corpus import generate_corpus, generate_corpus_pdf


def test_driver_generation_deterministic():
    a = generate_corpus_pdf(200, seed=42)
    b = generate_corpus_pdf(200, seed=42)
    pd.testing.assert_frame_equal(a, b)
    c = generate_corpus_pdf(200, seed=43)
    assert not a["content"].equals(c["content"])


def test_distributed_matches_driver_and_partition_count(spark):
    pdf = generate_corpus_pdf(120, seed=42)
    d4, _ = generate_corpus(spark, 120, seed=42, partitions=4)
    d1, _ = generate_corpus(spark, 120, seed=42, partitions=1)
    got4 = d4.toPandas().sort_values("path", ignore_index=True)
    got1 = d1.toPandas().sort_values("path", ignore_index=True)
    want = pdf[["repo", "path", "commit", "lang", "content"]].sort_values(
        "path", ignore_index=True
    )
    pd.testing.assert_frame_equal(got4, want)
    pd.testing.assert_frame_equal(got1, want)


def test_planted_classes_present():
    pdf = generate_corpus_pdf(600, seed=42)
    counts = pdf["dup_class"].value_counts(normalize=True)
    assert 0.35 < counts["unique"] < 0.65
    assert counts["exact"] > 0.05
    assert counts["near"] > 0.10
    assert counts["substring"] > 0.04
    assert counts["boilerplate"] > 0.02
    # exact rows really duplicate their base's bytes when base is unique-class
    base_content = {
        r.row_id: r.content for r in pdf.itertuples() if r.dup_class == "unique"
    }
    checked = hits = 0
    for r in pdf.itertuples():
        if r.dup_class == "exact" and r.base_id in base_content:
            checked += 1
            hits += r.content == base_content[r.base_id]
    assert checked > 0 and hits == checked
