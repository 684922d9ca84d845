"""Driver-heap A/B on the verified_edges stage variance.

Open question from the round-4/5 ladders: the verified_edges stage of the
full pipeline swings wildly on identical inputs at 32 cores (11.4 -> 65.1 s
at 400k in BENCH/ladder_r5_run.log; 15.1 -> 51.1 s at 1M). Hypothesis: in
local mode the driver JVM hosts every executor thread, so the default 16g
heap may put the stage's build-side hash relations and Arrow buffers into
GC churn whose cost depends on allocation history, not the plan. If true,
a 48g heap should collapse the variance; if the swings persist at 48g the
cause is host steal, not memory pressure.

Protocol: interleaved A/B rounds (16g, 48g, 16g, 48g, ...) of the full
pipeline over one pre-generated corpus, taskset-pinned to 32 cores, tmpfs
spark.local.dir, fresh JVM + warmup per round — identical to the ladder
protocol so numbers are comparable. Appends raw JSON lines to
BENCH/mem_ab_run.log and prints a per-arm summary.

Usage: python tools/bench_mem_ab.py [n_files] [rounds_per_arm]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, shutil, sys, time
sys.path.insert(0, "{repo}")
from annoy_spark.session import get_spark
from annoy_spark.config import DedupConfig
from annoy_spark.corpus import generate_corpus
from annoy_spark.plans.pipeline import run_pipeline

corpus_path, ckpt = sys.argv[1], sys.argv[2]
spark = get_spark("mem_ab", master="local[32]", shuffle_partitions=64,
                  extra_conf={{"spark.local.dir": "/dev/shm/spark_mem_ab"}})
spark.sparkContext.setLogLevel("ERROR")
wdf, _ = generate_corpus(spark, 2000, seed=1, partitions=32)
run_pipeline(spark, wdf, DedupConfig(), ckpt + "_warm", resume=False)
shutil.rmtree(ckpt + "_warm", ignore_errors=True)

corpus = spark.read.parquet(corpus_path)
n = corpus.count()
shutil.rmtree(ckpt, ignore_errors=True)
t0 = time.time()
res = run_pipeline(spark, corpus, DedupConfig(), ckpt, resume=False)
res.clusters.count()
dt = time.time() - t0
print(json.dumps({{"files": n, "sec": round(dt, 1),
    "stages": {{k: round(v.get("duration_s", 0), 1)
               for k, v in res.metrics.items()}}}}))
"""


def run_arm(mem: str, corpus_path: str) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM=mem)
    out = subprocess.run(
        ["taskset", "-c", "0-31", sys.executable, "-c",
         CHILD.format(repo=str(REPO)), corpus_path, "/dev/shm/mem_ab_ckpt"],
        capture_output=True, text=True, timeout=3600, check=True, env=env,
    )
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["driver_mem"] = mem
    return rec


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    corpus_path = f"/tmp/scaling_corpus_{n_files}"
    if not Path(corpus_path).exists():
        gen = f"""
import sys; sys.path.insert(0, "{REPO}")
from annoy_spark.session import get_spark
from annoy_spark.corpus import generate_corpus
spark = get_spark("gen", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
df, _ = generate_corpus(spark, {n_files}, seed=42, partitions=64)
df.write.mode("overwrite").parquet("{corpus_path}")
"""
        subprocess.run([sys.executable, "-c", gen], check=True,
                       capture_output=True, text=True, timeout=1800)

    log = REPO / "BENCH" / "mem_ab_run.log"
    arms: dict[str, list[dict]] = {"16g": [], "48g": []}
    for _ in range(rounds):
        for mem in ("16g", "48g"):  # interleaved so steal spikes can't bias one arm
            rec = run_arm(mem, corpus_path)
            arms[mem].append(rec)
            with log.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)

    for mem, recs in arms.items():
        ve = sorted(r["stages"].get("verified_edges", 0.0) for r in recs)
        tot = sorted(r["sec"] for r in recs)
        summary = {
            "driver_mem": mem,
            "verified_edges_min": ve[0], "verified_edges_max": ve[-1],
            "total_min": tot[0], "total_max": tot[-1],
            "rounds": len(recs),
        }
        with log.open("a") as f:
            f.write(json.dumps(summary) + "\n")
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
