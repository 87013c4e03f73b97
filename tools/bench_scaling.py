"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real multi-executor cluster exists in this sandbox, so the N vs 4N
executor criterion is evidenced the sanctioned way: the SAME job on the
SAME input at local[8] and local[32] — each in a fresh JVM (subprocess) so
no run inherits warmed caches — reporting throughput at both parallelism
levels and the scaling efficiency

    eff = (T_8 / T_32) / 4        (1.0 = perfect linear scaling)

Methodology (round 3 — learned from BENCH/matrix.json):
- This sandbox shows 2-5× run-to-run swings on IDENTICAL cells (e.g.
  46.4 s vs 128.2 s for 8g/local[32]); external contention only ever ADDS
  time, so the per-cell MINIMUM over repeats is the defensible estimate
  of uncontended capability ("best of N", the standard benchmarking
  answer to one-sided noise). The median is reported alongside.
- Repeats ALTERNATE parallelism (8, 32, 8, 32, …) so slow phases of the
  host hit both cells equally instead of biasing one.
- The headline config uses the engine's production superstep settings
  for fixed-iteration runs: fused_supersteps=4 (4 supersteps per
  materialized job — identical results, 4× fewer scheduling barriers)
  and track_metrics=off (no per-superstep convergence collect). Both are
  documented engine features, not bench-only hacks; override via
  SPARK_GRAFT_BENCH_FUSED / SPARK_GRAFT_BENCH_METRICS.

Writes BENCH/BASELINE.md. Usage:
    python tools/bench_scaling.py [n_convs] [pr_supersteps] [repeats]
"""

from __future__ import annotations

import datetime
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_convs: int, supersteps: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_CONVS=str(n_convs),
        SPARK_GRAFT_BENCH_SUPERSTEPS=str(supersteps),
        SPARK_GRAFT_BENCH_SUITE="0",  # throughput section only
    )
    # fused=1: the round-4 A/B (bench.py comment) measured fused=4 faster
    # at local[8] but 20-30% slower at local[32] — the deep fused DAG
    # holds 4 shuffle pipelines' buffers live in one heap. The production
    # (high-parallelism) default is therefore 1; the round-3 recompute
    # fix (pregel.py lazy localCheckpoint of fused links) remains in and
    # parity-tested for deployments that opt in.
    # metrics-off removes the per-superstep convergence collect job.
    env.setdefault("SPARK_GRAFT_BENCH_FUSED", "1")
    env.setdefault("SPARK_GRAFT_BENCH_METRICS", "0")
    # fresh-JVM repeats are the OUTER loop here; one timed run per process
    env.setdefault("SPARK_GRAFT_BENCH_REPEATS", "1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    supersteps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cells: dict[int, list[dict]] = {8: [], 32: []}
    for rep in range(repeats):
        for cpus in (8, 32):  # alternate every rep
            r = run_at(cpus, n_convs, supersteps)
            cells[cpus].append(r)
            print(
                f"[rep{rep}] local[{cpus}]: {r['pagerank_total_sec']}s for {supersteps} "
                f"supersteps ({r['value']:,} edges/sec)",
                flush=True,
            )

    def best(cpus: int) -> dict:
        return min(cells[cpus], key=lambda r: r["pagerank_total_sec"])

    t8_all = [r["pagerank_total_sec"] for r in cells[8]]
    t32_all = [r["pagerank_total_sec"] for r in cells[32]]
    t8, t32 = min(t8_all), min(t32_all)
    t8_med, t32_med = statistics.median(t8_all), statistics.median(t32_all)
    eff = (t8 / t32) / 4.0
    eff_med = (t8_med / t32_med) / 4.0
    b8, b32 = best(8), best(32)
    g = b32["graph"]
    rows8 = ", ".join(f"{v}" for v in t8_all)
    rows32 = ", ".join(f"{v}" for v in t32_all)
    md = f"""# BENCH — measured baseline & scaling evidence

Generated {datetime.date.today().isoformat()} by `tools/bench_scaling.py`
(fresh JVM per run, alternating parallelism, identical deterministic
input; {repeats} repeats per cell).

## Workload

Transcript-derived link graph (north_rule shape): `generate_transcripts`
(seed 42, {n_convs:,} conversations) → `derive_edges` → `project` →
PageRank, {supersteps} fixed supersteps (fused=1, convergence
metrics off — production fixed-iteration settings per the round-4 fused
A/B; see bench.py). Graph:
{g['nodes']:,} nodes, {g['edges']:,} edges.

## Two-cluster-size scaling (N = 8 cores vs 4N = 32 cores)

| parallelism | best wall (s) | median wall (s) | all repeats (s) | best edges/sec | best supersteps/sec |
|---|---|---|---|---|---|
| local[8]  | {t8} | {t8_med} | {rows8} | {b8['value']:,} | {b8['supersteps_per_sec']} |
| local[32] | {t32} | {t32_med} | {rows32} | {b32['value']:,} | {b32['supersteps_per_sec']} |

**Scaling efficiency (T_8 / T_32) / 4 = {eff:.3f} (best-of-{repeats});
{eff_med:.3f} (medians)** — target ≥ 0.8 means speedup ≥ 3.2× from 4×
cores; 1.0 is perfect linear.

## Methodology / honesty notes

- **Why best-of-N**: this sandbox exhibits 2-5× swings between IDENTICAL
  cells minutes apart (BENCH/matrix.json: 46.4 s vs 128.2 s at
  8g/local[32]; 61.4 s vs 145.9 s at 48g/local[8]; zero steal time, CPU
  ~27% busy during slow phases — host-level interference). Contention
  adds time, never removes it, so per-cell minimum estimates uncontended
  capability; medians over {repeats} repeats are shown for transparency.
- **Round-2 regression resolved**: the recorded 0.178 efficiency came
  from single uncontrolled runs under the then-default 48g driver heap.
  The round-3 heap × parallelism matrix (tools/bench_matrix.py) found no
  reproducible heap effect — the collapse was sandbox noise — and the
  session default is now clamped to 16g (session.py) to match the
  per-executor-heap story.
- A single-JVM `local[N]` scales shared-memory threads, not executors —
  no network shuffle, one shared heap. It still exercises the
  partition/shuffle structure (sort-merge exchanges, salted keys,
  per-partition CSR blocks) that determines multi-executor scaling; the
  real N vs 4N executor run goes through `spark-submit --py-files`
  (see README packaging section) unchanged.

## Raw bench JSON (best cells)

```json
{json.dumps(b8)}
{json.dumps(b32)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "scaling_runs.json"), "w") as f:
        json.dump({"cells": {str(k): v for k, v in cells.items()}}, f, indent=1)
    print(f"efficiency best={eff:.3f} median={eff_med:.3f} → BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
