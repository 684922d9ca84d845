"""Round-6 measurement harness (bench.py stays FROZEN — guide §1).

Per-query isolation for the 7 bench.py paths:
- same data, same session settings, same action shape (.count()) as bench.py;
- per-STAGE breakdown of run_pipeline (metrics dict durations);
- optional .explain("formatted") capture into plans/r06/.

Usage:
  python bench_extra.py [--queries q1,q2,...] [--plans] [--rounds N]
"""

from __future__ import annotations

import argparse
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

ALL = ("dedup_pipeline", "jaccard_pairs", "minhash_lsh_pairs",
       "simhash_hamming_pairs", "duplicate_clusters",
       "hamming_pairs_pigeonhole", "knn_lsh")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(ALL))
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()
    wanted = args.queries.split(",")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.1
    n_files = max(int(200_000 * sf), 1_000)

    spark = get_spark("bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    for name in ("documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet") \
            .createOrReplaceTempView(name)

    tmp = tempfile.mkdtemp(prefix="annoy_spark_bx_")
    out: dict = {"sf": sf, "cpus": cpus, "tag": args.tag,
                 "queries": {}, "stages": {}}
    try:
        if "dedup_pipeline" in wanted:
            corpus_path = f"{tmp}/corpus"
            cdf, _ = generate_corpus(spark, n_files, seed=42, partitions=cpus)
            cdf.write.mode("overwrite").parquet(corpus_path)
            corpus = spark.read.parquet(corpus_path)
            wdf, _ = generate_corpus(spark, 1000, seed=1, partitions=8)
            run_pipeline(spark, wdf, DedupConfig(), f"{tmp}/warm",
                         resume=False)
            best, best_stages = None, None
            for rnd in range(args.rounds + 1):
                sc.setJobDescription(f"pipeline round {rnd}")
                t0 = time.time()
                res = run_pipeline(spark, corpus, DedupConfig(),
                                   f"{tmp}/ckpt{rnd}", resume=False)
                res.clusters.count()
                dt = time.time() - t0
                stages = {k: round(v.get("duration_s", 0.0), 3)
                          for k, v in res.metrics.items()}
                if best is None or dt < best:
                    best, best_stages = dt, stages
                print(f"  pipeline round {rnd}: {dt:.2f}s {stages}",
                      file=sys.stderr)
            out["queries"]["dedup_pipeline"] = round(best, 3)
            out["stages"] = best_stages
        else:
            res = None

        def timeit(name, fn, rounds=None):
            best = None
            for i in range(rounds or args.rounds):
                sc.setJobDescription(f"{name} round {i}")
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                print(f"  {name} round {i}: {dt:.2f}s", file=sys.stderr)
            out["queries"][name] = round(best, 3)

        for name in ("jaccard_pairs", "minhash_lsh_pairs",
                     "simhash_hamming_pairs"):
            if name not in wanted:
                continue
            sql = G.spark_sql_for(name)
            if args.plans:
                with open(f"{plans_dir}/{name}_{args.tag or 'now'}.txt",
                          "w") as f:
                    f.write(spark.sql(sql)._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution
                        .ExplainMode.fromString("formatted")))
            timeit(name, lambda s=sql: spark.sql(s).count())

        if "duplicate_clusters" in wanted:
            from annoy_spark.operators.cluster import connected_components

            def run_cc():
                edges = spark.sql(G.duplicate_clusters_edges_sql_spark())
                nodes = spark.sql(G.duplicate_clusters_nodes_sql_spark())
                connected_components(edges, nodes).count()
            timeit("duplicate_clusters", run_cc)

        if "hamming_pairs_pigeonhole" in wanted:
            from pyspark.sql import functions as F

            from annoy_spark.operators.hamming_pairs import hamming_pairs

            cfg = DedupConfig()
            if res is None:
                corpus_path = f"{tmp}/corpus"
                if not os.path.exists(corpus_path):
                    cdf, _ = generate_corpus(spark, n_files, seed=42,
                                             partitions=cpus)
                    cdf.write.mode("overwrite").parquet(corpus_path)
                corpus = spark.read.parquet(corpus_path)
                res = run_pipeline(spark, corpus, DedupConfig(),
                                   f"{tmp}/ckpt_hp", resume=False)
            sigs = res.signatures.select(
                F.col("file_id").alias("doc_id"),
                F.col("simhash").alias("sig")).cache()
            sigs.count()
            timeit("hamming_pairs_pigeonhole", lambda: hamming_pairs(
                sigs, t=cfg.hamming_t, n_bits=cfg.simhash_bits).count())
            sigs.unpersist()

        if "knn_lsh" in wanted:
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            timeit("knn_lsh", lambda: knn_lsh(
                emb, k=10, n_tables=12, n_bits=8, seed=42).count())

        out["total_of_run"] = round(sum(out["queries"].values()), 3)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
