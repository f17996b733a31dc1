"""Train-step time breakdown by model surgery on the real TPU.

Times the full jitted train step at depth 0/1/3 (and with the FFN shrunk)
on the standard benchmark batch; the differences isolate the per-depth
iteration cost vs the fixed featurization/finalize/readout/optimizer cost.

Run: python experiments/bench_step_breakdown.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import TIMED_STEPS, build_batches, enable_compile_cache  # noqa: E402


def step_ms(batches, n_real_edges, *, depth=3, ffn_layers=1, d_h=300):
    import jax
    import jax.numpy as jnp

    from chemprop_tpu.models import MPNN
    from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN
    from chemprop_tpu.train import Trainer

    model = MPNN(
        message_passing=BondMessagePassing(depth=depth, d_h=d_h, compute_dtype=jnp.bfloat16),
        agg=MeanAggregation(),
        predictor=RegressionFFN(input_dim=d_h, hidden_dim=d_h, n_layers=ffn_layers),
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

    n_calls = max(1, TIMED_STEPS // len(batches))
    state, losses = run_all(state, stacked)
    float(losses[-1])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, losses = run_all(state, stacked)
        float(losses[-1])
        best = min(best, time.perf_counter() - t0)
    return best / (n_calls * len(batches)) * 1e3


def main():
    enable_compile_cache()
    batches, n_real_edges = build_batches(10)
    t3 = step_ms(batches, n_real_edges, depth=3)
    t1 = step_ms(batches, n_real_edges, depth=1)
    t0 = step_ms(batches, n_real_edges, depth=0)
    print(f"depth=3: {t3:.3f} ms", file=sys.stderr)
    print(f"depth=1: {t1:.3f} ms", file=sys.stderr)
    print(f"depth=0: {t0:.3f} ms", file=sys.stderr)
    per_iter = (t3 - t1) / 2
    print(f"per-depth iteration (fwd+bwd): {per_iter:.3f} ms", file=sys.stderr)
    print(f"fixed cost (featurize+finalize+agg+FFN+opt): {t0:.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
