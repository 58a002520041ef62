"""Interleaved two-level scaling session: alternate local[low] /
local[high] bench runs in ONE window (robust to window drift — both
levels sample the same mixture of windows), bracketed by busy-worker
probes, logging every bench JSON line to a file that
tools/scaling_run.py consumes via SCALE_FROM_LOG to build
BENCH/BASELINE.md.

Usage: python tools/scaling_interleaved.py [low high rounds] [logfile]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_run import cpu_ceiling, run_bench  # noqa: E402


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 3 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 3 else 32
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    log = sys.argv[4] if len(sys.argv) > 4 else "/tmp/wi_scaling_log.jsonl"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    print(f"probe(before) {low}->{high}: {cpu_ceiling(low, high):.2f}x", flush=True)
    with open(log, "a") as f:
        for r in range(rounds):
            for cpus in (low, high):
                print(f"round {r + 1}/{rounds} local[{cpus}] ...", flush=True)
                res = run_bench(cpus, sf_dir)
                line = json.dumps(res)
                print(line, flush=True)
                f.write(line + "\n")
                f.flush()
    print(f"probe(after) {low}->{high}: {cpu_ceiling(low, high):.2f}x", flush=True)
    print(f"log: {log}", flush=True)
    print(
        f"next: SCALE_FROM_LOG={log} python tools/scaling_run.py {low} {high}",
        flush=True,
    )


if __name__ == "__main__":
    main()
