"""Capture a jax.profiler trace of the FORWARD-ONLY (inference) pass on the
real TPU and print per-op aggregate times parsed from the chrome-trace JSON —
the computation ``predict``/``fingerprint``/``serve`` dispatch per batch
(cf. reference forward ``chemprop/models/model.py:126-146``).

Run: python experiments/profile_forward.py [outdir]
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

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chemprop_tpu_profile_fwd"
    batches, n_real_edges = build_batches(10)
    model = MPNN(
        message_passing=BondMessagePassing(compute_dtype=jnp.bfloat16),
        agg=MeanAggregation(),
        predictor=RegressionFFN(),
        batch_norm=False,
    )
    variables = model.init(jax.random.PRNGKey(0), batches[0].bmg, None, None)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[b.bmg for b in batches])
    stacked = jax.device_put(stacked)

    @jax.jit
    def run_all(variables, xs):
        def body(acc, bmg):
            preds = model.apply(variables, bmg, None, None, is_training=False)
            return acc + preds.astype(jnp.float32).sum(), None

        return jax.lax.scan(body, jnp.float32(0), xs)

    acc, _ = run_all(variables, stacked)
    float(acc)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            acc, _ = run_all(variables, stacked)
        float(acc)
    time.sleep(1)

    traces = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("no trace found under", outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    agg = defaultdict(lambda: [0.0, 0])
    lane_total = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname:
            continue
        tname = e.get("tid")
        dur = e.get("dur", 0)
        key = (pname, tname, e.get("name", "?"))
        agg[key][0] += dur
        agg[key][1] += 1
        lane_total[(pname, tname)] += dur
    print("== lane totals (us, over 30 steps) ==")
    for (pn, tn), tot in sorted(lane_total.items(), key=lambda kv: -kv[1]):
        print(f"  {pn} tid={tn}: {tot:.0f} us  ({tot/30:.1f} us/step)")
    print("== top ops per lane (us/step over 30 steps) ==")
    bylane = defaultdict(list)
    for (pn, tn, name), (tot, cnt) in agg.items():
        bylane[(pn, tn)].append((tot, cnt, name))
    for lane, rows in sorted(bylane.items(), key=lambda kv: -sum(r[0] for r in kv[1])):
        print(f"-- {lane}")
        for tot, cnt, name in sorted(rows, reverse=True)[:25]:
            print(f"   {tot/30:9.1f} us/step x{cnt:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
