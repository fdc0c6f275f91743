"""Run bench.py over the BASELINE.json size range and print one row per size.

Uses the cached CPU baselines in BASELINE_local.json (measured uncontended);
run this alone on the box — no concurrent CPU or TPU work (see
docs/performance.md, "Timing on TPU correctly").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

SIZES = (4002, 12000, 33000, 65536, 102000, 131072)


def main():
    repo = Path(__file__).parent.parent
    cache = json.loads((repo / "BASELINE_local.json").read_text())
    rows = []
    for n in SIZES:
        env = dict(
            os.environ,
            BENCH_N=str(n),
            BENCH_SKIP_BASELINE="1",
            BENCH_CHILD="1",  # no watchdog: we want the raw failure if any
        )
        try:
            out = subprocess.run(
                [sys.executable, str(repo / "bench.py")],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            print(f"n={n}: TIMEOUT after 1800s, skipping", file=sys.stderr)
            continue
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            print(f"n={n}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        base = cache.get(f"torchpme_cpu_pme_mdstep_n{n}")
        speedup = base / rec["value"] if base else float("nan")
        rows.append((n, rec["value"], base, speedup))
        base_s = f"{base:.0f}" if base else "n/a"
        print(
            f"| {n:,} | {rec['value']:.1f} | {base_s} | {speedup:.1f}x |",
            flush=True,
        )
    print(json.dumps([list(r) for r in rows]))


if __name__ == "__main__":
    main()
