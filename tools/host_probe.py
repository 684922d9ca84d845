"""Code-independent host canary: separates 'the code got slower' from
'the box got slower' (shared VM: CPU steal shows in /proc/stat, DRAM
bandwidth stolen by co-tenants does NOT).

Measures:
- steal/idle over a 5 s window (/proc/stat)
- single-core integer loop (CPU frequency / scheduling canary)
- single-process STREAM-triad bandwidth over a 1.2 GB working set
- N-process aggregate triad bandwidth (the number Spark's shuffle-heavy
  stages are actually bound by on this box — BENCH/BASELINE.md shows
  scaling flattens at ~16 cores because of this ceiling)

Usage: python tools/host_probe.py [nprocs]   (default 16)
Appends one JSON line to BENCH/host_probe.jsonl so every bench run can
be read against the host state it ran under.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def cpu_window(seconds: float = 5.0) -> dict:
    def snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:]))

    a = snap()
    time.sleep(seconds)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    return {
        "steal_pct": round(100 * d[7] / tot, 2),
        "idle_pct": round(100 * d[3] / tot, 2),
    }


def single_core_loop() -> float:
    t0 = time.time()
    x = 0
    for i in range(10_000_000):
        x ^= i * 2654435761
    return round(time.time() - t0, 3)


def _triad(n_iters: int, q=None) -> float:
    n = 50_000_000  # 3 x 400 MB doubles
    b = np.ones(n)
    c = np.ones(n)
    a = np.empty(n)
    t0 = time.time()
    for _ in range(n_iters):
        np.multiply(b, 2.0, out=a)
        a += c
    dt = time.time() - t0
    # numpy cannot fuse the triad, so the two passes actually move FIVE
    # streams: multiply = read b + write a; += = read a + read c + write a.
    # Earlier probe rows (no probe_ver field) used 3 streams and read ~40%
    # low in absolute terms; relative window-to-window comparison — the
    # probe's purpose — was unaffected.
    gbs = n_iters * 5 * n * 8 / dt / 1e9
    if q is not None:
        q.put(gbs)
    return gbs


def parallel_triad(nproc: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_triad, args=(3, q)) for _ in range(nproc)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


def main() -> None:
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    row = {
        "ts": time.time(),
        "probe_ver": 2,
        **cpu_window(),
        "single_core_loop_s": single_core_loop(),
        "triad_1p_gbs": round(_triad(3), 2),
        f"triad_{nproc}p_gbs": round(parallel_triad(nproc), 2),
    }
    out = REPO / "BENCH" / "host_probe.jsonl"
    with out.open("a") as fh:
        fh.write(json.dumps(row, sort_keys=True) + "\n")
    print(json.dumps(row, sort_keys=True))


if __name__ == "__main__":
    main()
