"""Benchmark harness (driver contract): one JSON line on stdout.

Headline queries:
- dedup_pipeline: full sign->band->verify->cluster over a deterministic
  synthetic source-code corpus (N scales with sf; generation time excluded);
- four heavyweight gate queries over the sf documents table;
- LSH k-NN over the sf embeddings table.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from annoy_spark.config import DedupConfig
from annoy_spark.corpus import generate_corpus
from annoy_spark.gates import queries as G
from annoy_spark.operators.knn import knn_lsh
from annoy_spark.plans.pipeline import run_pipeline
from annoy_spark.session import get_spark

GATE_QUERIES = (
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_hamming_pairs",
    "duplicate_clusters",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.1
    n_files = max(int(200_000 * sf), 1_000)

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="annoy_spark_bench_")
    timings: dict[str, float] = {}
    try:
        # --- dedup pipeline over synthetic corpus (generation excluded) ---
        corpus_path = f"{tmp}/corpus"
        cdf, _ = generate_corpus(spark, n_files, seed=42, partitions=cpus)
        cdf.write.mode("overwrite").parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)

        # warmup (same methodology as tools/bench_scaling.py): spawning
        # python workers + JIT-compiling codegen is fixed per-JVM overhead,
        # not per-byte cost — excluded from the steady-state measurement
        wdf, _ = generate_corpus(spark, 1000, seed=1, partitions=8)
        run_pipeline(spark, wdf, DedupConfig(), f"{tmp}/warm", resume=False)

        # min of 3 rounds: this VM shows 5-20% steal time with MULTI-MINUTE
        # spikes (same-code bench totals swung 48.6 -> 68.5 s across one
        # day, documented in BENCH/BASELINE.md); back-to-back rounds can
        # all land inside one spike, so 3 rounds, min approximates the
        # uncontended machine
        best = None
        for rnd in range(3):
            t0 = time.time()
            res = run_pipeline(
                spark, corpus, DedupConfig(), f"{tmp}/ckpt{rnd}", resume=False
            )
            res.clusters.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings["dedup_pipeline"] = best
        files_per_sec = n_files / timings["dedup_pipeline"]

        # --- gate queries over the sf documents table ---
        for name in ("documents", "embeddings"):
            spark.read.parquet(f"{sf_dir}/{name}.parquet") \
                .createOrReplaceTempView(name)
        # min-of-3 per gate query (same steal-noise methodology as the
        # pipeline timing; duplicate_clusters swung 11-14 s across rounds
        # on single runs)
        for name in GATE_QUERIES:
            rounds = 3
            best = None
            for _ in range(rounds):
                t0 = time.time()
                if name == "duplicate_clusters":
                    from annoy_spark.operators.cluster import (
                        connected_components,
                    )

                    edges = spark.sql(G.duplicate_clusters_edges_sql_spark())
                    nodes = spark.sql(G.duplicate_clusters_nodes_sql_spark())
                    connected_components(edges, nodes).count()
                else:
                    spark.sql(G.spark_sql_for(name)).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = best

        # --- scale-safe all-pairs Hamming: pigeonhole multi-index vs the
        # --- O(n^2) theta-join it replaces, in PRODUCT shape (the
        # --- pipeline's 128-bit simhash signatures, t=8 -> 9 x ~14-bit
        # --- blocks; both produce the identical pair set)
        from pyspark.sql import functions as F

        from annoy_spark.operators.hamming_pairs import (
            _popcount_xor,
            hamming_pairs,
        )

        cfg = DedupConfig()
        sigs = res.signatures.select(
            F.col("file_id").alias("doc_id"), F.col("simhash").alias("sig")
        ).cache()
        sigs.count()
        best = None
        for _ in range(2):
            t0 = time.time()
            hamming_pairs(
                sigs, t=cfg.hamming_t, n_bits=cfg.simhash_bits
            ).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings["hamming_pairs_pigeonhole"] = best
        a = sigs.select(F.col("doc_id").alias("u"), F.col("sig").alias("sa"))
        b = sigs.select(F.col("doc_id").alias("v"), F.col("sig").alias("sb"))
        t0 = time.time()
        (
            a.join(b, F.col("u") < F.col("v"))
            .where(_popcount_xor("sa", "sb") <= cfg.hamming_t)
            .count()
        )
        # reference point only (the operator the pigeonhole REPLACES) —
        # reported separately so the headline total stays a consistent
        # basket across rounds
        theta_ref_sec = time.time() - t0
        sigs.unpersist()

        # --- ANN over embeddings ---
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        best = None
        for _ in range(2):
            t0 = time.time()
            knn_lsh(emb, k=10, n_tables=12, n_bits=8, seed=42).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings["knn_lsh"] = best

        total = sum(timings.values())
        print(json.dumps({
            "metric": "dedup_pipeline+gates total",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": sf,
            "pipeline_files": n_files,
            "pipeline_files_per_sec": round(files_per_sec, 1),
            "hamming_theta_join_ref_sec": round(theta_ref_sec, 3),
            "cpus": cpus,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
