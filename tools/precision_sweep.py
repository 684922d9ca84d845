"""Accuracy-per-budget sweep for the approximate k-NN path.

The analog of the reference's examples/precision_test.py:11-46 (precision
vs search_k) and test/accuracy_test.py thresholds: for a grid of
(n_tables x n_bits) LSH budgets, measure recall@10 of knn_lsh against the
exact angular top-10, plus the candidate-pair count (the cost knob — what
search_k buys in Annoy, bucket width buys here). Writes
BENCH/precision_sweep.{json,md} so later rounds can catch regressions in
the approximate path.

Usage: python tools/precision_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

K = 10
GRID = [
    (8, 8), (16, 8), (32, 8),
    (8, 6), (16, 6), (32, 6),
    (8, 4), (16, 4), (32, 4),
]
# forest budget grid: n_trees x leaf_cap (annoy's n_trees x _K), plus one
# spill point (the search_k analog)
FOREST_GRID = [
    (4, 32, 0.0), (8, 32, 0.0), (16, 32, 0.0), (32, 32, 0.0),
    (8, 64, 0.0), (8, 32, 0.1),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from annoy_spark.operators.knn import knn_bruteforce, knn_lsh
    from annoy_spark.session import get_spark

    spark = get_spark("sweep", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_items = emb.count()

    exact = {
        (r.qid, r.nid)
        for r in knn_bruteforce(emb, emb, k=K).select("qid", "nid").collect()
    }
    rows = []
    for n_tables, n_bits in GRID:
        t0 = time.time()
        approx = knn_lsh(
            emb, k=K, n_tables=n_tables, n_bits=n_bits, seed=42
        ).select("qid", "nid").collect()
        dt = time.time() - t0
        got = {(r.qid, r.nid) for r in approx}
        recall = len(exact & got) / len(exact)
        rows.append({
            "n_tables": n_tables, "n_bits": n_bits,
            "recall_at_10": round(recall, 4),
            "result_pairs": len(got), "sec": round(dt, 2),
        })
        print(rows[-1])

    # MIPS (dot) budget sweep — the Bachrach-reduction path, measured
    # against the exact dot top-k (every approximate family gets a budget
    # curve, the examples/precision_test.py model)
    exact_dot = {
        (r.qid, r.nid)
        for r in knn_bruteforce(emb, emb, k=K, metric="dot")
        .select("qid", "nid").collect()
    }
    mips_rows = []
    for n_tables, n_bits in [(8, 4), (16, 4), (32, 4), (32, 6)]:
        t0 = time.time()
        approx = knn_lsh(
            emb, k=K, n_tables=n_tables, n_bits=n_bits, seed=42, metric="dot"
        ).select("qid", "nid").collect()
        dt = time.time() - t0
        got = {(r.qid, r.nid) for r in approx}
        recall = len(exact_dot & got) / len(exact_dot)
        mips_rows.append({
            "n_tables": n_tables, "n_bits": n_bits,
            "recall_at_10": round(recall, 4),
            "result_pairs": len(got), "sec": round(dt, 2),
        })
        print("mips", mips_rows[-1])

    # p-stable E2LSH euclidean sweep — budget axes are tables x bits x
    # quantization width (the width is the search_k-like cost knob:
    # wider cells = more candidates = higher recall)
    exact_euc = {
        (r.qid, r.nid)
        for r in knn_bruteforce(emb, emb, k=K, metric="euclidean")
        .select("qid", "nid").collect()
    }
    pstable_rows = []
    for n_tables, n_bits, width in [
        (8, 4, 2.0), (16, 4, 2.0), (16, 4, 4.0), (32, 4, 4.0),
    ]:
        t0 = time.time()
        approx = knn_lsh(
            emb, k=K, n_tables=n_tables, n_bits=n_bits, seed=42,
            metric="euclidean", bucket_width=width,
        ).select("qid", "nid").collect()
        dt = time.time() - t0
        got = {(r.qid, r.nid) for r in approx}
        recall = len(exact_euc & got) / len(exact_euc)
        pstable_rows.append({
            "n_tables": n_tables, "n_bits": n_bits, "width": width,
            "recall_at_10": round(recall, 4),
            "result_pairs": len(got), "sec": round(dt, 2),
        })
        print("pstable", pstable_rows[-1])

    from annoy_spark.operators.forest import knn_forest
    from annoy_spark.operators.ivf import knn_ivf

    ivf_rows = []
    for n_centroids, nprobe in [(32, 4), (32, 8), (32, 16), (64, 8)]:
        t0 = time.time()
        approx = knn_ivf(
            emb, k=K, n_centroids=n_centroids, nprobe=nprobe, seed=42,
            sample_fraction=1.0,
        ).select("qid", "nid").collect()
        dt = time.time() - t0
        got = {(r.qid, r.nid) for r in approx}
        recall = len(exact & got) / len(exact)
        ivf_rows.append({
            "n_centroids": n_centroids, "nprobe": nprobe,
            "recall_at_10": round(recall, 4),
            "result_pairs": len(got), "sec": round(dt, 2),
        })
        print(ivf_rows[-1])

    forest_rows = []
    for n_trees, leaf_cap, eps in FOREST_GRID:
        t0 = time.time()
        approx = knn_forest(
            emb, k=K, n_trees=n_trees, leaf_cap=leaf_cap, seed=42,
            spill_eps=eps, sample_fraction=1.0,
        ).select("qid", "nid").collect()
        dt = time.time() - t0
        got = {(r.qid, r.nid) for r in approx}
        recall = len(exact & got) / len(exact)
        forest_rows.append({
            "n_trees": n_trees, "leaf_cap": leaf_cap, "spill_eps": eps,
            "recall_at_10": round(recall, 4),
            "result_pairs": len(got), "sec": round(dt, 2),
        })
        print(forest_rows[-1])

    out = {"sf_dir": sf_dir, "n_items": n_items, "k": K, "sweep": rows,
           "forest_sweep": forest_rows, "ivf_sweep": ivf_rows,
           "mips_sweep": mips_rows, "pstable_sweep": pstable_rows}
    (REPO / "BENCH" / "precision_sweep.json").write_text(
        json.dumps(out, indent=1)
    )
    md = [
        "# Approximate k-NN accuracy-per-budget sweep",
        "",
        f"recall@{K} of `knn_lsh` vs exact angular top-{K} over "
        f"`{sf_dir}/embeddings.parquet` ({n_items} UNSTRUCTURED random "
        "vectors — LSH's worst case; structured corpora need far smaller "
        "budgets, see tests/test_knn.py::test_lsh_recall_vs_bruteforce).",
        "",
        "The budget knobs mirror Annoy's: n_tables <-> n_trees, bucket "
        "width (2^-n_bits) <-> search_k (examples/precision_test.py:11-46).",
        "",
        "| n_tables | n_bits | recall@10 | sec |",
        "|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r['n_tables']} | {r['n_bits']} | {r['recall_at_10']:.3f} "
            f"| {r['sec']} |"
        )
    md += [
        "",
        "## MIPS via Bachrach reduction (dot metric)",
        "",
        "recall@10 of `knn_lsh(metric='dot')` vs the exact dot top-10 "
        "(items augmented with sqrt(M²-|x|²), queries with 0 — "
        "annoylib.h:605-703).",
        "",
        "| n_tables | n_bits | recall@10 | sec |",
        "|---|---|---|---|",
    ]
    for r in mips_rows:
        md.append(
            f"| {r['n_tables']} | {r['n_bits']} | {r['recall_at_10']:.3f} "
            f"| {r['sec']} |"
        )
    md += [
        "",
        "## p-stable E2LSH euclidean (width = the cost knob)",
        "",
        "recall@10 of `knn_lsh(metric='euclidean')` vs the exact L2 "
        "top-10 (Datar et al. '04 Gaussian projections; annoy's "
        "two-means euclidean splits re-expressed data-independent).",
        "",
        "| n_tables | n_bits | width | recall@10 | sec |",
        "|---|---|---|---|---|",
    ]
    for r in pstable_rows:
        md.append(
            f"| {r['n_tables']} | {r['n_bits']} | {r['width']} "
            f"| {r['recall_at_10']:.3f} | {r['sec']} |"
        )
    md += [
        "",
        "## IVF coarse quantizer (nprobe budget axis)",
        "",
        "| n_centroids | nprobe | recall@10 | sec |",
        "|---|---|---|---|",
    ]
    for r in ivf_rows:
        md.append(
            f"| {r['n_centroids']} | {r['nprobe']} "
            f"| {r['recall_at_10']:.3f} | {r['sec']} |"
        )
    md += [
        "",
        "## two_means RP-forest (annoy's own budget axes)",
        "",
        "recall@10 of `knn_forest` on the same vectors; n_trees x leaf_cap "
        "are literally annoy's n_trees x _K, spill_eps widens traversal "
        "like search_k.",
        "",
        "| n_trees | leaf_cap | spill_eps | recall@10 | sec |",
        "|---|---|---|---|---|",
    ]
    for r in forest_rows:
        md.append(
            f"| {r['n_trees']} | {r['leaf_cap']} | {r['spill_eps']} "
            f"| {r['recall_at_10']:.3f} | {r['sec']} |"
        )
    md += ["", "Reproduce: `python tools/precision_sweep.py`", ""]
    (REPO / "BENCH" / "precision_sweep.md").write_text("\n".join(md))
    print("wrote BENCH/precision_sweep.{json,md}")


if __name__ == "__main__":
    main()
