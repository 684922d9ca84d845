"""End-to-end dedup pipeline: sign -> band -> verify -> cluster.

One DAG, checkpointed per stage (SURVEY.md §3.4), resumable mid-pipeline:
each stage is skipped when a checkpoint with the current config hash exists.
Every stage appends a lineage row (counts + durations) — the introspection
surface replacing annoy's get_n_items/get_n_trees (annoylib.h:1238-1254).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from annoy_spark.config import DedupConfig
from annoy_spark.operators.band import all_candidate_edges
from annoy_spark.operators.cluster import connected_components
from annoy_spark.operators.sign import file_id_col, sign
from annoy_spark.operators.substring import substring_edges
from annoy_spark.operators.verify import verify_with_rescue
from annoy_spark.sources.checkpoint import CheckpointStore

STAGES = ("signatures", "candidate_edges", "skipped_groups",
          "verified_edges", "substring_edges", "substring_skipped",
          "clusters")


@dataclass
class PipelineResult:
    clusters: DataFrame
    signatures: DataFrame
    verified_edges: DataFrame
    substring_edges: DataFrame | None
    skipped_groups: DataFrame
    metrics: dict = field(default_factory=dict)


def _stage(store: CheckpointStore, spark: SparkSession, name: str,
           build, metrics: dict, resume: bool) -> DataFrame:
    t0 = time.time()
    if resume and store.exists(name):
        df = store.read(spark, name)
        metrics[name] = {"resumed": True, "duration_s": time.time() - t0}
        return df
    df = build()
    store.write(name, df)
    out = store.read(spark, name)
    n = out.count()
    dur = time.time() - t0
    metrics[name] = {"resumed": False, "duration_s": dur, "n_rows": n}
    store.log_lineage(spark, {"stage": name, "n_rows": n, "duration_s": dur})
    return out


def run_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    cfg: DedupConfig,
    out_dir: str,
    resume: bool = True,
) -> PipelineResult:
    store = CheckpointStore(out_dir, cfg)
    metrics: dict = {}

    signatures = _stage(
        store, spark, "signatures", lambda: sign(corpus, cfg), metrics, resume
    )

    def build_candidates() -> DataFrame:
        cand, skipped = all_candidate_edges(signatures, cfg)
        store.write("skipped_groups", skipped)
        return cand

    def run_band_verify() -> DataFrame:
        cand = _stage(
            store, spark, "candidate_edges", build_candidates, metrics,
            resume,
        )
        # broadcast the edge set through the verification joins while it's
        # small (parquet count is metadata-only); at scale AQE handles
        # strategy + skew
        n_cand = metrics["candidate_edges"].get("n_rows") or cand.count()
        return _stage(
            store, spark, "verified_edges",
            lambda: verify_with_rescue(
                cand, signatures, cfg, small_candidates=n_cand < 2_000_000
            ),
            metrics, resume,
        )

    sub_edges = None
    if cfg.enable_substring:
        def build_substring() -> DataFrame:
            # sha-collapsed representatives only: exact-dup members are
            # already connected via 'exact' edges
            reps = (
                signatures.groupBy("content_sha")
                .agg(F.min("file_id").alias("file_id"))
            )
            # materialize the rep-content relation ONCE (lazy; the fp-UDF
            # pass triggers it): the substring operator consumes content in
            # up to four places (fingerprint scan, adaptive-margin probe,
            # both verify sides) and each reference re-ran this scan+join.
            # Block loss just fails the stage, which the per-stage
            # checkpoint protocol re-runs from `signatures`.
            corpus_reps = (
                corpus.select(file_id_col().alias("file_id"), "content")
                .join(reps, "file_id")
                .localCheckpoint(eager=False)
            )
            edges, skipped = substring_edges(
                corpus_reps, cfg, return_skipped=True
            )
            store.write("substring_skipped", skipped)
            return edges

        # the band->verify chain and the substring pass are INDEPENDENT
        # once `signatures` is checkpointed (substring reads only the
        # signatures checkpoint + corpus) — run them as two concurrent
        # driver-thread jobs so one side's stragglers and driver-side gaps
        # are backfilled by the other's tasks (guide §2.6). FIFO
        # scheduling gives the first-submitted chain priority and the
        # second back-fills, which is exactly the wanted shape. Stage
        # checkpoints, metrics keys, and lineage files are disjoint, so
        # the resume protocol is unchanged.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            fut_v = pool.submit(run_band_verify)
            fut_s = pool.submit(
                _stage, store, spark, "substring_edges", build_substring,
                metrics, resume,
            )
            verified = fut_v.result()
            sub_edges = fut_s.result()
    else:
        verified = run_band_verify()
    skipped = store.read(spark, "skipped_groups")

    def build_clusters() -> DataFrame:
        edges = verified.select("u", "v")
        if sub_edges is not None:
            edges = edges.unionByName(sub_edges.select("u", "v"))
        nodes = signatures.select(F.col("file_id").alias("doc_id"))
        return connected_components(
            edges, nodes, max_iters=cfg.cc_max_iters
        ).withColumnRenamed("doc_id", "file_id")

    clusters = _stage(
        store, spark, "clusters", build_clusters, metrics, resume
    )

    return PipelineResult(
        clusters=clusters,
        signatures=signatures,
        verified_edges=verified,
        substring_edges=sub_edges,
        skipped_groups=skipped,
        metrics=metrics,
    )


def assert_sha_invariant(corpus: DataFrame, signatures: DataFrame) -> None:
    """Per-row invariant (input_hint): signature rows carry exactly the
    sha256 of the source content — zero mismatches, zero missing."""
    from annoy_spark.operators.sign import file_id_col

    src = corpus.select(
        file_id_col().alias("file_id"),
        F.sha2(F.col("content"), 256).alias("src_sha"),
    )
    joined = src.join(signatures.select("file_id", "content_sha"), "file_id", "full")
    bad = joined.where(
        F.col("src_sha").isNull()
        | F.col("content_sha").isNull()
        | (F.col("src_sha") != F.col("content_sha"))
    ).count()
    if bad:
        raise AssertionError(f"sha256 invariant violated for {bad} rows")
