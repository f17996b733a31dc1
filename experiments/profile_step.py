"""Capture a jax.profiler trace of the benchmark train step on the real TPU
and print per-op aggregate times parsed from the chrome-trace JSON.

Run: python experiments/profile_step.py [outdir]
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import build_batches, enable_compile_cache  # noqa: E402


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from chemprop_tpu.models import MPNN
    from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN
    from chemprop_tpu.train import Trainer

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chemprop_tpu_profile"
    batches, n_real_edges = build_batches(10)
    model = MPNN(
        message_passing=BondMessagePassing(compute_dtype=jnp.bfloat16),
        agg=MeanAggregation(),
        predictor=RegressionFFN(),
        batch_norm=False,
    )
    trainer = Trainer(model, max_epochs=1)
    state = trainer.init_state(batches[0], steps_per_epoch=100)
    step = trainer._make_train_step()
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    stacked = jax.device_put(stacked)

    @jax.jit
    def run_all(state, xs):
        return jax.lax.scan(step, state, xs)

    state, losses = run_all(state, stacked)
    float(losses[-1])
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, losses = run_all(state, stacked)
        float(losses[-1])
    time.sleep(1)

    # parse the chrome trace: aggregate device-lane op durations
    traces = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("no trace found under", outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device-side process ids (TPU lanes)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    agg = defaultdict(lambda: [0.0, 0, ""])  # name -> [total_us, count, lane]
    lane_total = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname:
            continue
        tname = e.get("tid")
        dur = e.get("dur", 0)
        name = e.get("name", "?")
        key = (pname, tname, name)
        agg[key][0] += dur
        agg[key][1] += 1
        lane_total[(pname, tname)] += dur
    print("== lane totals (us, over 30 steps) ==")
    for (pn, tn), tot in sorted(lane_total.items(), key=lambda kv: -kv[1]):
        print(f"  {pn} tid={tn}: {tot:.0f} us  ({tot/30:.1f} us/step)")
    print("== top ops per lane (us/step over 30 steps) ==")
    bylane = defaultdict(list)
    for (pn, tn, name), (tot, cnt, _) in agg.items():
        bylane[(pn, tn)].append((tot, cnt, name))
    for lane, rows in sorted(bylane.items(), key=lambda kv: -sum(r[0] for r in kv[1])):
        print(f"-- {lane}")
        for tot, cnt, name in sorted(rows, reverse=True)[:25]:
            print(f"   {tot/30:9.1f} us/step x{cnt:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
