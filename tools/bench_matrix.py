"""Controlled scaling A/B matrix: {driver heap} x {parallelism} x repeats.

Round-2 recorded a scaling-efficiency collapse (0.816 -> 0.178) in which
local[8] stayed ~66s while local[32] went 21s -> 93s.  The two suspects
are (a) the round-2 driver-heap default change (8g -> 48g on this host,
session.py) and (b) a contended sandbox during the recorded run.  This
tool separates them: every (heap, cpus) cell runs in a fresh JVM
subprocess, sequentially (never two Spark jobs at once), with repeats,
and reports per-cell medians.

Usage:
    python tools/bench_matrix.py [n_convs] [supersteps] [repeats]
Writes BENCH/matrix.json (all raw points) and prints a summary table.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEAPS = os.environ.get("SPARK_GRAFT_MATRIX_HEAPS", "8g,48g").split(",")
CPUS = [int(c) for c in os.environ.get("SPARK_GRAFT_MATRIX_CPUS", "8,32").split(",")]


def run_point(heap: str, cpus: int, n_convs: int, supersteps: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_DRIVER_MEM=heap,
        SPARK_GRAFT_BENCH_CONVS=str(n_convs),
        SPARK_GRAFT_BENCH_SUPERSTEPS=str(supersteps),
        SPARK_GRAFT_BENCH_SUITE="0",
    )
    # fresh-JVM repeats are the outer loop; one timed run per process
    env.setdefault("SPARK_GRAFT_BENCH_REPEATS", "1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"error": out.stderr[-2000:], "heap": heap, "cpus": cpus}
    d = json.loads(lines[-1])
    d["heap"] = heap
    return d


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    supersteps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    points: list[dict] = []
    for rep in range(repeats):
        for heap in HEAPS:
            for cpus in CPUS:
                d = run_point(heap, cpus, n_convs, supersteps)
                d["rep"] = rep
                points.append(d)
                if "error" in d:
                    print(f"[rep{rep}] heap={heap} local[{cpus}] ERROR: {d['error'][:300]}", flush=True)
                else:
                    print(
                        f"[rep{rep}] heap={heap} local[{cpus}]: pagerank {d['pagerank_total_sec']}s "
                        f"({d['value']:,} edges/s), project {d['project_sec']}s",
                        flush=True,
                    )
                os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
                with open(os.path.join(REPO, "BENCH", "matrix.json"), "w") as f:
                    json.dump(points, f, indent=1)

    print("\n== medians ==")
    for heap in HEAPS:
        med = {}
        for cpus in CPUS:
            vals = [
                p["pagerank_total_sec"]
                for p in points
                if p.get("heap") == heap and p.get("cpus") == cpus and "pagerank_total_sec" in p
            ]
            if vals:
                med[cpus] = statistics.median(vals)
                print(f"heap={heap} local[{cpus}]: median pagerank {med[cpus]}s over {len(vals)} runs")
        if len(CPUS) == 2 and all(c in med for c in CPUS):
            lo, hi = min(CPUS), max(CPUS)
            eff = (med[lo] / med[hi]) / (hi / lo)
            print(f"heap={heap}: efficiency (T_{lo}/T_{hi})/{hi//lo} = {eff:.3f}")


if __name__ == "__main__":
    main()
