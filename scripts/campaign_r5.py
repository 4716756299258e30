#!/usr/bin/env python
"""Round-5 measurement campaign: the full 3x2 (input size x parallelism)
flagship matrix in fresh JVMs, with the round-3/4 contention protocol —
two in-run probes per bench invocation plus interleaved plain-OS
hardware-ceiling soaks — so every cell is attributable to a window.

Artifacts: /tmp/f5_<tag>.json (one bench JSON line each) and
/tmp/campaign5_ceil.jsonl (ceiling soaks). curate_baseline_r5.py turns
them into BENCH/BASELINE.md.

Usage: python scripts/campaign_r5.py [tag ...]   # default: all six
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_bench import hardware_ceiling  # noqa: E402

CELLS = {
    # tag: (n_docs, cpus, tile_repeats)
    "50k_8": (50_000, 8, 2),
    "50k_32": (50_000, 32, 2),
    "200k_8": (200_000, 8, 1),
    "200k_32": (200_000, 32, 1),
    "500k_8": (500_000, 8, 1),
    "500k_32": (500_000, 32, 1),
}
ORDER = ["50k_8", "50k_32", "200k_8", "200k_32", "500k_8", "500k_32"]


def soak() -> dict:
    c = hardware_ceiling(8, 32)
    c["ts"] = time.strftime("%H:%M:%S")
    with open("/tmp/campaign5_ceil.jsonl", "a") as f:
        f.write(json.dumps(c) + "\n")
    print(f"[ceiling] {c['ts']} max_speedup={c['max_speedup']} "
          f"max_efficiency={c['max_efficiency']}", flush=True)
    return c


def run_cell(tag: str) -> None:
    n_docs, cpus, repeats = CELLS[tag]
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        SPARK_GRAFT_TILE_DOCS=str(n_docs),
        SPARK_GRAFT_TILE_REPEATS=str(repeats),
    )
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=5400,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"bench {tag} failed rc={out.returncode}")
    with open(f"/tmp/f5_{tag}.json", "w") as f:
        f.write(lines[-1] + "\n")
    d = json.loads(lines[-1])
    print(
        f"[cell {tag}] tile={d['queries']['tile_pipeline']}s "
        f"docs/s={d['docs_per_sec']} cpu_probe={d['cpu_probe_sec']}s "
        f"q1={d['queries']['q1_pricing_summary']}s "
        f"rounds={d.get('rounds_per_level')} wall={time.time() - t0:.0f}s",
        flush=True,
    )


def main() -> None:
    tags = sys.argv[1:] or ORDER
    soak()
    for tag in tags:
        run_cell(tag)
        soak()


if __name__ == "__main__":
    main()
