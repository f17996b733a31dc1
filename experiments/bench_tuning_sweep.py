"""On-device sweep of the fused-kernel tuning knobs (UNROLL, PREFETCH).

Each config re-imports chemprop_tpu in a fresh subprocess (the knobs are
module-load-time constants) and times the full train step via bench_jax.

Run: python experiments/bench_tuning_sweep.py
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from bench import build_batches, bench_jax, enable_compile_cache
enable_compile_cache()
batches, n_real = build_batches(4)
eps, step_ms = bench_jax(batches, n_real)
print(f"RESULT step_ms={{step_ms:.3f}} eps={{eps/1e6:.2f}}M")
"""


def main():
    configs = [(4, 2), (8, 2), (8, 4), (2, 2), (4, 4), (6, 3)]
    for unroll, prefetch in configs:
        env = dict(os.environ)
        env["CHEMPROP_TPU_UNROLL"] = str(unroll)
        env["CHEMPROP_TPU_PREFETCH"] = str(prefetch)
        env["BENCH_STEPS"] = "40"
        out = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=str(REPO))],
            env=env, capture_output=True, text=True, timeout=1500,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
        print(f"UNROLL={unroll} PREFETCH={prefetch}: {line[0] if line else 'FAIL: ' + out.stderr[-200:]}", file=sys.stderr)


if __name__ == "__main__":
    main()
