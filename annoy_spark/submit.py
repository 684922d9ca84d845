"""spark-submit entry point for the dedup pipeline.

    spark-submit --py-files annoy_spark.zip annoy_spark/submit.py \
        --input  <parquet/iceberg table of (repo,path,commit,lang,content)> \
        --output <checkpoint root> \
        [--config config.json] [--no-resume] [--report]

On a cluster, --input may be an Iceberg table name (catalog.db.table) —
anything spark.read.table/parquet accepts. Exit code 0 iff the pipeline
completes and the sha256 invariant holds.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--config", default=None, help="DedupConfig JSON file")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--report", action="store_true",
                   help="print per-stage metrics JSON to stdout")
    args = p.parse_args(argv)

    from annoy_spark.config import DedupConfig
    from annoy_spark.plans.pipeline import assert_sha_invariant, run_pipeline
    from annoy_spark.session import get_spark

    cfg = DedupConfig()
    if args.config:
        with open(args.config) as fh:
            cfg = DedupConfig.from_json(fh.read())

    spark = get_spark("annoy_spark_dedup")
    t0 = time.time()
    if args.input.endswith(".parquet") or "/" in args.input:
        corpus = spark.read.parquet(args.input)
    else:
        corpus = spark.read.table(args.input)

    result = run_pipeline(
        spark, corpus, cfg, args.output, resume=not args.no_resume
    )
    n = result.clusters.count()
    assert_sha_invariant(corpus, result.signatures)

    if args.report:
        print(json.dumps({
            "files": n,
            "wall_sec": round(time.time() - t0, 2),
            "config_hash": cfg.config_hash(),
            "stages": {k: {kk: round(vv, 2) if isinstance(vv, float) else vv
                           for kk, vv in m.items()}
                       for k, m in result.metrics.items()},
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
