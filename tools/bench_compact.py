"""Compaction bench: the small-file tax of a month of daily appends, and
what compact_index buys back.

Builds a forest index on a seeded synthetic corpus, grows it with N
append batches (the daily-ingest shape streaming/ann_item_stream.py
produces), then measures COLD serving latency (fresh load + one 500-query
batch, catalog caches cleared) and data-file counts before and after
compact_index. Appends one JSON line to BENCH/compact_bench.jsonl and
prints it.

At 100 TB the effect is much larger than this box shows: every parquet
footer read is an object-store round trip, and the counts delta history
grows by one file set PER append, so load-time listing + footer traffic
scales with append count until a compact resets it to O(target files).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from annoy_spark.session import get_spark  # noqa: E402
from annoy_spark.sources.ann_index import (  # noqa: E402
    AnnIndexConfig,
    build_index,
    compact_index,
    load_index,
)

N_BASE = 40_000
BATCH = 2_000
N_APPENDS = 30  # override: python tools/bench_compact.py [n_appends [batch]]
DIM = 32
N_QUERIES = 500
K = 10

if len(sys.argv) > 1:
    N_APPENDS = int(sys.argv[1])
if len(sys.argv) > 2:
    BATCH = int(sys.argv[2])


def _vecs(spark, lo: int, hi: int, seed_salt: int):
    rng = np.random.default_rng([7, seed_salt])
    v = rng.standard_normal((hi - lo, DIM))
    return spark.createDataFrame(
        [(lo + i, [float(x) for x in v[i]]) for i in range(hi - lo)],
        "vec_id long, embedding array<double>",
    )


def _data_files(root: str) -> dict[str, int]:
    return {
        s: sum(
            1
            for f in (Path(root) / s).iterdir()
            if f.name.endswith(".parquet")
        )
        for s in ("vectors", "buckets", "counts")
    }


def _cold_serve_s(spark, root: str, queries) -> float:
    """Fresh load + one query batch, caches dropped first (the cold path
    a new executor / new job sees)."""
    spark.catalog.clearCache()
    for s in ("vectors", "buckets", "counts"):
        spark.catalog.refreshByPath(str(Path(root) / s))
    t0 = time.time()
    idx = load_index(spark, root)
    idx.query(queries, k=K, spill_eps=0.05).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.time() - t0
    idx.unload()
    return round(wall, 2)


def main() -> None:
    spark = get_spark("bench_compact")
    root = tempfile.mkdtemp(prefix="bench_compact_idx_")
    cfg = AnnIndexConfig(
        kind="forest", metric="angular", n_trees=16, leaf_cap=64, seed=42,
    )
    t0 = time.time()
    idx = build_index(spark, _vecs(spark, 0, N_BASE, 0), root, cfg)
    build_s = round(time.time() - t0, 2)
    t0 = time.time()
    for b in range(N_APPENDS):
        lo = N_BASE + b * BATCH
        idx = idx.append(_vecs(spark, lo, lo + BATCH, b + 1))
    appends_s = round(time.time() - t0, 2)
    idx.unload()

    queries = _vecs(spark, 10_000_000, 10_000_000 + N_QUERIES, 999).cache()
    queries.count()

    files_before = _data_files(root)
    serve_before = min(_cold_serve_s(spark, root, queries) for _ in range(3))
    t0 = time.time()
    compact_index(spark, root).unload()
    compact_s = round(time.time() - t0, 2)
    files_after = _data_files(root)
    serve_after = min(_cold_serve_s(spark, root, queries) for _ in range(3))

    row = {
        "n_items": N_BASE + N_APPENDS * BATCH,
        "dim": DIM,
        "n_appends": N_APPENDS,
        "batch": BATCH,
        "n_queries": N_QUERIES,
        "k": K,
        "build_s": build_s,
        "appends_s": appends_s,
        "compact_s": compact_s,
        "data_files_before": files_before,
        "data_files_after": files_after,
        "cold_load_query_s_before": serve_before,
        "cold_load_query_s_after": serve_after,
        "ts": time.time(),
    }
    out = Path(__file__).resolve().parent.parent / "BENCH" / "compact_bench.jsonl"
    with out.open("a") as fh:
        fh.write(json.dumps(row, sort_keys=True) + "\n")
    print(json.dumps(row, sort_keys=True))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
