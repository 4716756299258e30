#!/usr/bin/env python
"""Two-parallelism scaling benchmark (BASELINE.md protocol).

No real cluster exists in the sandbox, so the north_rule's N -> 4N
executor scaling criterion is evidenced by running the SAME job at two
parallelism levels (local[8] vs local[32]) on the SAME input and
reporting throughput at both plus efficiency:

    eff = (docs_per_sec_32 / docs_per_sec_8) / 4

The sandbox VM shows substantial run-to-run CPU noise (~2x observed on
identical code+data), so runs are INTERLEAVED [8, 32, 8, 32] in fresh
JVMs and the per-level minimum wall time (= least-contended run) is
reported, with all raw values recorded. Results land in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 8, 32
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(repeats):
        runs[lo].append(run_at(lo, sf_dir))
        runs[hi].append(run_at(hi, sf_dir))

    def best(level: int) -> dict:
        return min(runs[level], key=lambda r: r["queries"]["tile_pipeline"])

    r_lo, r_hi = best(lo), best(hi)
    dps_lo = max(r["docs_per_sec"] for r in runs[lo])
    dps_hi = max(r["docs_per_sec"] for r in runs[hi])
    eff = (dps_hi / dps_lo) / (hi / lo)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — measured numbers

Protocol per BASELINE.md: same input ({sf_dir}), two parallelism levels
(local[{lo}] vs local[{hi}]) standing in for N vs 4N executors (driver
instruction — no real cluster in the sandbox). Fresh JVM per run,
{repeats}x interleaved repeats, best (least environment-noise) run per
level reported; raw values below show the observed VM noise.

| metric | local[{lo}] | local[{hi}] | scaling efficiency |
|---|---|---|---|
| tile pipeline docs/sec (best) | {dps_lo} | {dps_hi} | {eff:.3f} |
| tile pipeline sec ({r_lo['n_docs']} docs) | {r_lo['queries']['tile_pipeline']} | {r_hi['queries']['tile_pipeline']} | — |

Target: efficiency >= 0.8 (BASELINE.json). docs/sec efficiency
{'MEETS' if eff >= 0.8 else 'BELOW'} target at this sandbox scale.

All tile-pipeline runs (sec), showing VM noise:

| level | runs |
|---|---|
| local[{lo}] | {[r['queries']['tile_pipeline'] for r in runs[lo]]} |
| local[{hi}] | {[r['queries']['tile_pipeline'] for r in runs[hi]]} |

Per-query seconds (best runs):

| query | local[{lo}] | local[{hi}] |
|---|---|---|
"""
    for k in r_lo["queries"]:
        md += f"| {k} | {r_lo['queries'][k]} | {r_hi['queries'][k]} |\n"
    md += f"""
Raw JSON (best runs):

- local[{lo}]: `{json.dumps(r_lo)}`
- local[{hi}]: `{json.dumps(r_hi)}`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff_docs_per_sec": round(eff, 3), "lo": r_lo, "hi": r_hi}))


if __name__ == "__main__":
    main()
