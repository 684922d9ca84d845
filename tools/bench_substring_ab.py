"""Interleaved A/B of the substring verify path: anchor-window slices vs
whole-file contents (slice_margin=0 = the full-content code path).

Relative comparison inside one process, rounds interleaved A,B,A,B,... so
host-noise windows hit both arms equally. Also asserts the two arms
produce the IDENTICAL edge set every round (the equivalence contract).

`repeat` inflates each file by concatenating its content N times — the
large-file regime (e.g. repeat=32 -> ~40 KB mean) is where slicing pays;
at repeat=1 (~1.3 KB mean) the adaptive default rightly picks the full
path, and this tool's explicit-margin arm measures what that avoids.

Usage: python tools/bench_substring_ab.py [n_files] [rounds] [cores] [repeat]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from annoy_spark.config import DedupConfig
from annoy_spark.corpus import generate_corpus
from annoy_spark.operators.sign import file_id_col
from annoy_spark.operators.substring import (
    adaptive_slice_margin,
    substring_edges,
)
from annoy_spark.session import get_spark


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    repeat = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    cfg = DedupConfig()
    spark = get_spark(
        "sub_ab", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.local.dir": "/dev/shm/spark_sub_ab"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus, _ = generate_corpus(spark, n_files, seed=42, partitions=64)
    if repeat > 1:
        corpus = corpus.withColumn(
            "content", F.concat_ws(" ", F.array_repeat("content", repeat))
        )
    reps = (
        corpus.select(
            file_id_col().alias("file_id"),
            F.sha2("content", 256).alias("content_sha"),
            "content",
        )
        .groupBy("content_sha")
        .agg(
            F.min("file_id").alias("file_id"),
            F.min_by("content", "file_id").alias("content"),
        )
        .select("file_id", "content")
        .persist()
    )
    reps.count()  # materialize once; both arms read the same cached input
    stats = reps.agg(
        F.avg(F.length("content")).alias("avg"),
    ).collect()[0]
    adaptive = adaptive_slice_margin(reps, cfg)
    print(json.dumps({"n_files": n_files, "repeat": repeat,
                      "avg_len": round(stats.avg, 1),
                      "adaptive_margin": adaptive}), flush=True)

    def run(margin: int) -> tuple[float, int, int]:
        t0 = time.time()
        edges = substring_edges(reps, cfg, slice_margin=margin)
        rows = edges.count()
        chk = edges.select(
            F.bit_xor(F.xxhash64("u", "v", "match_len")).alias("x")
        ).collect()[0].x
        return time.time() - t0, rows, chk

    run(0)  # warmup (JIT + python workers), excluded

    sliced_margin = 2 * cfg.min_substring_len
    res = {"sliced": [], "full": []}
    for r in range(rounds):
        for name, margin in (("sliced", sliced_margin), ("full", 0)):
            dt, rows, chk = run(margin)
            res[name].append({"sec": round(dt, 1), "rows": rows, "chk": chk})
            print(json.dumps({"round": r, "arm": name, "sec": round(dt, 1),
                              "rows": rows, "chk": chk}), flush=True)
    chks = {x["chk"] for v in res.values() for x in v}
    rowss = {x["rows"] for v in res.values() for x in v}
    assert len(chks) == 1 and len(rowss) == 1, (chks, rowss)
    best = {k: min(x["sec"] for x in v) for k, v in res.items()}
    print(json.dumps({"n_files": n_files, "cores": cores, "repeat": repeat,
                      "adaptive_margin": adaptive, "min": best,
                      "speedup": round(best["full"] / best["sliced"], 3),
                      "rows": rowss.pop()}))


if __name__ == "__main__":
    main()
