"""Run bench.py once and merge-min into BENCH/SF01_SESSION_BEST.json.

Same discipline as tools/bench_1m.py: the committed record is the session
best (min) per query and for the total; a rerun in a noisy window can only
improve it. Each attempt is appended to the history with its in-band host
canary (the untouched-code hamming theta-join reference), so every number
can be read against the window it ran under.

Usage: python tools/bench_sf01_best.py [repeat]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
RECORD = REPO / "BENCH" / "SF01_SESSION_BEST.json"


def run_once() -> dict:
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def merge(record: dict | None, run: dict) -> dict:
    hist_entry = {
        "total": run["value"],
        "theta_ref": run.get("hamming_theta_join_ref_sec"),
        "ts": time.time(),
    }
    if record is None:
        record = {
            "value": run["value"],
            "queries": dict(run["queries"]),
            "unit": "sec",
            "sf": run["sf"],
            "theta_ref_at_best": run.get("hamming_theta_join_ref_sec"),
            "history": [],
        }
    else:
        if run["value"] < record["value"]:
            record["value"] = run["value"]
            record["theta_ref_at_best"] = run.get("hamming_theta_join_ref_sec")
        record["queries"] = {
            q: min(record["queries"].get(q, float("inf")), t)
            for q, t in run["queries"].items()
        }
    record["history"].append(hist_entry)
    return record


def main() -> None:
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    record = json.loads(RECORD.read_text()) if RECORD.exists() else None
    for i in range(repeat):
        run = run_once()
        prev = record["value"] if record else None
        record = merge(record, run)
        RECORD.write_text(json.dumps(record, indent=2, sort_keys=True))
        kept = "improved" if prev is None or record["value"] < prev else "kept"
        print(
            f"round {i + 1}/{repeat}: total {run['value']} s "
            f"(theta-ref {run.get('hamming_theta_join_ref_sec')}) — "
            f"record {record['value']} s ({kept})"
        )


if __name__ == "__main__":
    main()
