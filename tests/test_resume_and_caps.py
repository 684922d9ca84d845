"""Mid-pipeline resume (kill/rerun) and skew-cap accounting."""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from annoy_spark.config import DedupConfig
from annoy_spark.corpus import generate_corpus
from annoy_spark.operators.band import all_candidate_edges
from annoy_spark.operators.sign import sign
from annoy_spark.plans.pipeline import run_pipeline

CFG = DedupConfig(enable_substring=False)


def test_kill_after_stage_then_resume(spark, tmp_path):
    """Annoy's load-and-continue contract, pipeline form: run fully, delete
    every checkpoint AFTER signatures (simulating a crash mid-pipeline),
    rerun with resume — signatures stage must be skipped, later stages
    recomputed, final clusters identical."""
    corpus, _ = generate_corpus(spark, 300, seed=42, partitions=4)
    out = tmp_path / "ck"
    r1 = run_pipeline(spark, corpus, CFG, str(out), resume=True)
    want = {r.file_id: r.cluster_id for r in r1.clusters.collect()}

    for stage in ("candidate_edges", "skipped_groups", "verified_edges",
                  "clusters"):
        shutil.rmtree(out / stage, ignore_errors=True)

    r2 = run_pipeline(spark, corpus, CFG, str(out), resume=True)
    assert r2.metrics["signatures"]["resumed"] is True
    assert r2.metrics["candidate_edges"]["resumed"] is False
    got = {r.file_id: r.cluster_id for r in r2.clusters.collect()}
    assert got == want


def test_invalidate_forces_recompute(spark, tmp_path):
    """unbuild/unload analog (annoylib.h:1080-1165): invalidate() drops a
    stage's validity stamp, so resume recomputes it (and its dependents are
    rebuilt from the fresh DataFrame), while untouched stages still skip."""
    from annoy_spark.sources.checkpoint import CheckpointStore

    corpus, _ = generate_corpus(spark, 200, seed=7, partitions=4)
    out = tmp_path / "ck"
    r1 = run_pipeline(spark, corpus, CFG, str(out), resume=True)
    want = {r.file_id: r.cluster_id for r in r1.clusters.collect()}

    store = CheckpointStore(str(out), CFG)
    assert store.exists("verified_edges")
    store.invalidate("verified_edges")
    assert not store.exists("verified_edges")
    store.invalidate("clusters")

    r2 = run_pipeline(spark, corpus, CFG, str(out), resume=True)
    assert r2.metrics["signatures"]["resumed"] is True
    assert r2.metrics["verified_edges"]["resumed"] is False
    got = {r.file_id: r.cluster_id for r in r2.clusters.collect()}
    assert got == want


def test_band_group_cap_accounts_skipped(spark):
    """Groups above band_group_cap switch to salted two-level star
    enumeration (bounded edges, no recall cliff) and are accounted in the
    skipped_groups checkpoint (SURVEY §7.4)."""
    # 30 distinct near-identical docs (differ by one trailing token) so the
    # sha collapse does NOT merge them, but bands do
    base = " ".join(f"w{i % 9} common token stream" for i in range(80))
    rows = [(f"r{i}", f"p{i}", "c", "python", base + f" tail{i}")
            for i in range(30)]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    tiny_cap = DedupConfig(
        enable_substring=False, pair_enum_cap=2, band_group_cap=5
    )
    sigs = sign(corpus, tiny_cap)
    edges, skipped = all_candidate_edges(sigs, tiny_cap)
    sk = skipped.collect()
    assert len(sk) > 0, "oversized groups must be accounted"
    assert all(r.n_members > 5 for r in sk)
    # salted star keeps edge count linear-ish, far below full enumeration
    lsh = edges.where(F.col("kind") == "lsh")
    assert lsh.count() < 30 * 29 / 2
    # and nothing is dropped: every member still reaches the group min via
    # CC over the salted star edges
    from annoy_spark.operators.cluster import connected_components

    labels = connected_components(lsh.select("u", "v"))
    clusters = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert len(set(clusters.values())) == 1, "salted star must stay connected"
    assert len(clusters) == 30


def test_submit_cli(spark, tmp_path):
    """The spark-submit entry point runs end-to-end via its main()."""
    from annoy_spark.submit import main

    corpus, _ = generate_corpus(spark, 120, seed=42, partitions=2)
    inp = str(tmp_path / "in.parquet")
    corpus.write.parquet(inp)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(CFG.to_json())
    rc = main(["--input", inp, "--output", str(tmp_path / "out"),
               "--config", str(cfg_path), "--report"])
    assert rc == 0
    assert (tmp_path / "out" / "clusters" / "_SUCCESS").exists()
