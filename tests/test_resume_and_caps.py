"""Mid-pipeline resume (kill/rerun) and skew-cap accounting."""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import functions as F

from annoy_spark.config import DedupConfig
from annoy_spark.corpus import generate_corpus
from annoy_spark.operators.band import all_candidate_edges
from annoy_spark.operators.sign import file_id_col, sign
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
    lsh = edges.where(F.col("kind") != "exact")
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


def test_star_rescue_candidates_ladder(spark):
    """Full pairs among <= cap failed members; star-to-min-failed beyond."""
    from annoy_spark.operators.verify import star_rescue_candidates

    failed = spark.createDataFrame(
        [(1, v) for v in range(2, 12)], "u long, v long"  # 10 failures
    )
    full = star_rescue_candidates(failed, cap=100).collect()
    assert len(full) == 45  # C(10,2)
    assert all(r.kind == "lsh_rescue" for r in full)
    star = star_rescue_candidates(failed, cap=4).collect()
    assert sorted((r.u, r.v) for r in star) == [(2, v) for v in range(3, 12)]


def test_star_rescue_connects_split_members(spark):
    """Two star members that are near-dups of each other but NOT of the
    star center must be re-connected by the rescue pass (the silent
    cluster-split failure of pure star enumeration)."""
    from annoy_spark.operators.verify import verify_with_rescue

    text_ab = " ".join(f"shared token t{i % 23} body" for i in range(300))
    rows = [
        ("r", "center", "c", "python",
         " ".join(f"totally different d{i % 17} words" for i in range(300))),
        ("r", "a", "c", "python", text_ab + " trailing alpha"),
        ("r", "b", "c", "python", text_ab + " trailing beta"),
    ]
    corpus = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string",
    )
    cfg = DedupConfig(enable_substring=False)
    sigs = sign(corpus, cfg)
    ids = {
        r.path: r.file_id
        for r in corpus.select(
            "path", file_id_col().alias("file_id")
        ).collect()
    }
    cand = spark.createDataFrame(
        [
            (ids["center"], ids["a"], "lsh_star"),
            (ids["center"], ids["b"], "lsh_star"),
        ],
        "u long, v long, kind string",
    )
    out = verify_with_rescue(cand, sigs, cfg, small_candidates=True).collect()
    pairs = {(r.u, r.v): r.kind for r in out}
    ab = tuple(sorted((ids["a"], ids["b"])))
    assert ab in pairs, f"rescue must recover the a-b edge, got {pairs}"
    assert pairs[ab] == "lsh_rescue"

    # the min-collapse case: (center, a) was ALSO fully enumerated in some
    # small band group, so its kind was downgraded to 'lsh' — but its
    # from_star provenance must keep it rescue-eligible, or the a-b edge
    # is silently lost through exactly the path the rescue pass exists for
    cand2 = spark.createDataFrame(
        [
            (ids["center"], ids["a"], "lsh", 1),
            (ids["center"], ids["b"], "lsh_star", 1),
        ],
        "u long, v long, kind string, from_star int",
    )
    out2 = verify_with_rescue(cand2, sigs, cfg, small_candidates=True).collect()
    pairs2 = {(r.u, r.v): r.kind for r in out2}
    assert ab in pairs2, (
        f"downgraded-kind star edge must stay rescue-eligible, got {pairs2}"
    )
    assert pairs2[ab] == "lsh_rescue"
    # and the center edges correctly stay failed
    assert (ids["center"], ids["a"]) not in pairs

    # rescue disabled -> the edge is lost (documents the approximation)
    cfg_off = DedupConfig(enable_substring=False, star_rescue_cap=0)
    out_off = verify_with_rescue(
        cand, sign(corpus, cfg_off), cfg_off, small_candidates=True
    ).collect()
    assert ab not in {(r.u, r.v) for r in out_off}
