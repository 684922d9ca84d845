"""ANN index lifecycle benchmark at two parallelism levels.

The north rule's two-cluster-size criterion applied to the persisted-index
serving path: build the forest index over a synthetic embedding corpus and
answer by-vector query batches from the stored artifacts at local[N] and
local[4N] (taskset-pinned, fresh JVM each), reporting build throughput,
query throughput, and N->4N scaling efficiency.

Usage: python tools/bench_ann_index.py [n_items] [n_queries] [rounds]
Writes BENCH/ann_index_bench.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, shutil, sys, time
sys.path.insert(0, "{repo}")
from pyspark.sql import functions as F
from annoy_spark.session import get_spark
from annoy_spark.sources.ann_index import AnnIndexConfig, build_index, load_index

cores, items_path, queries_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_spark("annbench", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores, 8),
                  extra_conf={{"spark.local.dir": "/dev/shm/spark_annbench"}})
spark.sparkContext.setLogLevel("ERROR")
items = spark.read.parquet(items_path)
queries = spark.read.parquet(queries_path)
n_items, n_queries = items.count(), queries.count()

cfg = AnnIndexConfig(kind="forest", metric="angular", n_trees=16,
                     leaf_cap=64, seed=42, sample_fraction=1.0,
                     max_sample=20_000)
root = f"/dev/shm/annbench_idx_{{cores}}"
shutil.rmtree(root, ignore_errors=True)

# warmup: tiny build spins up python workers + JIT
build_index(spark, items.limit(2000), root + "_warm",
            AnnIndexConfig(kind="forest", n_trees=2, max_sample=1000))
shutil.rmtree(root + "_warm", ignore_errors=True)

t0 = time.time()
build_index(spark, items, root, cfg)
build_sec = time.time() - t0

idx = load_index(spark, root)
qsec = None
for _ in range(2):  # min of 2 (VM steal)
    t0 = time.time()
    n_out = idx.query(queries, k=10, spill_eps=0.05).count()
    dt = time.time() - t0
    qsec = dt if qsec is None else min(qsec, dt)

print(json.dumps({{
    "cores": cores, "n_items": n_items, "n_queries": n_queries,
    "build_sec": round(build_sec, 2),
    "build_items_per_sec": round(n_items / build_sec),
    "query_sec": round(qsec, 2),
    "queries_per_sec": round(n_queries / qsec, 1),
    "result_rows": n_out,
}}))
"""


def run_level(cores: int, items: str, queries: str) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
         CHILD.format(repo=str(REPO)), str(cores), items, queries],
        capture_output=True, text=True, timeout=3600, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    items = f"/tmp/annbench_items_{n_items}"
    queries = f"/tmp/annbench_queries_{n_queries}"
    gen = f"""
import sys; sys.path.insert(0, "{REPO}")
from pyspark.sql import functions as F
from annoy_spark.session import get_spark
spark = get_spark("gen", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
def vecs(n, seed, id_off):
    return (spark.range(n).select(
        (F.col("id") + id_off).alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(64)),
                    lambda i: F.randn(seed) ).alias("embedding")))
vecs({n_items}, 42, 0).repartition(64).write.mode("overwrite").parquet("{items}")
vecs({n_queries}, 7, 10_000_000).coalesce(1).write.mode("overwrite").parquet("{queries}")
"""
    subprocess.run([sys.executable, "-c", gen], check=True,
                   capture_output=True, text=True, timeout=1800)

    best: dict[int, dict] = {}
    for _ in range(rounds):
        for cores in (8, 32):
            r = run_level(cores, items, queries)
            print(json.dumps(r))
            if (cores not in best
                    or r["build_sec"] + r["query_sec"]
                    < best[cores]["build_sec"] + best[cores]["query_sec"]):
                best[cores] = r

    b8, b32 = best[8], best[32]
    eff_build = b8["build_sec"] / (4 * b32["build_sec"])
    eff_query = b8["query_sec"] / (4 * b32["query_sec"])
    md = f"""# ANN index lifecycle benchmark (N vs 4N parallelism)

Forest index (16 two_means trees, leaf_cap 64) over {b8['n_items']:,}
synthetic 64-dim vectors; by-vector batch of {b8['n_queries']:,} queries
(k=10, spill_eps=0.05) answered from the PERSISTED artifacts. Each level
taskset-pinned, fresh JVM, tmpfs, warmup excluded, min of {rounds}
round(s) (the host VM shows 5-20% steal).

| cores | build sec | build items/s | query sec | queries/s |
|---|---|---|---|---|
| 8 | {b8['build_sec']} | {b8['build_items_per_sec']:,} | {b8['query_sec']} | {b8['queries_per_sec']:,} |
| 32 | {b32['build_sec']} | {b32['build_items_per_sec']:,} | {b32['query_sec']} | {b32['queries_per_sec']:,} |

N=8 -> 4N=32 scaling efficiency: build **{eff_build:.2f}**, query
**{eff_query:.2f}** (same single-box DRAM-ceiling caveat as
BENCH/BASELINE.md — the 32-core level shares one memory controller).

Reproduce: `python tools/bench_ann_index.py {n_items} {n_queries} {rounds}`
"""
    (REPO / "BENCH" / "ann_index_bench.md").write_text(md)
    print("wrote BENCH/ann_index_bench.md")


if __name__ == "__main__":
    main()
