"""Real-hardware verification that the Pallas kernels compile and run
INSIDE shard_map on TPU (VERDICT r2 next-step #3): builds a 1-device mesh on
the real chip (the largest mesh this environment has), runs the explicit-SPMD
sharded train step with interpret mode OFF, and checks loss/grads against
the plain single-device step on the same batch.

Writes TPU_SHARDMAP_CHECK.json at the repo root.

Run: python experiments/tpu_shardmap_check.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import build_batches, enable_compile_cache  # noqa: E402


def main():
    assert os.environ.get("CHEMPROP_TPU_INTERPRET", "0") != "1", "real-TPU check"
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chemprop_tpu.models import MPNN
    from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN
    from chemprop_tpu.parallel import make_mesh, replicate, shard_batch
    from chemprop_tpu.train import Trainer

    platform = jax.devices()[0].platform
    batches, n_real_edges = build_batches(2)
    model = MPNN(
        message_passing=BondMessagePassing(compute_dtype=jnp.bfloat16),
        agg=MeanAggregation(),
        predictor=RegressionFFN(),
        batch_norm=False,
    )

    # plain single-device step
    tr0 = Trainer(model, max_epochs=1)
    state0 = tr0.init_state(batches[0], steps_per_epoch=100)
    step0 = tr0._make_train_step()
    s0, loss0 = step0(state0, batches[0])
    loss0 = float(loss0)

    # 1-device mesh, shard_map SPMD path (same Pallas kernels inside)
    mesh = make_mesh(jax.devices()[:1])
    tr1 = Trainer(model, max_epochs=1, mesh=mesh)
    state1 = tr1.init_state(batches[0], steps_per_epoch=100)
    step1 = tr1._make_train_step()
    state1 = replicate(state1, mesh)
    db = shard_batch(batches[0], mesh)
    t0 = time.perf_counter()
    s1, loss1 = step1(state1, db)
    loss1 = float(loss1)
    compile_s = time.perf_counter() - t0

    # gradient-equality: one more step each, compare a parameter leaf delta
    s0b, _ = step0(s0, batches[1])
    s1b, _ = step1(s1, shard_batch(batches[1], mesh))
    leaf0 = np.asarray(
        jax.tree.leaves(s0b.params)[0], np.float32
    )
    leaf1 = np.asarray(jax.tree.leaves(s1b.params)[0], np.float32)
    max_param_err = float(np.abs(leaf0 - leaf1).max())

    result = {
        "platform": platform,
        "mesh_devices": 1,
        "interpret_mode": False,
        "pallas_enabled": os.environ.get("CHEMPROP_TPU_PALLAS", "1") == "1",
        "loss_plain": loss0,
        "loss_shard_map": loss1,
        "loss_abs_diff": abs(loss0 - loss1),
        "param_after_2_steps_max_abs_diff": max_param_err,
        "first_step_wall_s": round(compile_s, 2),
        "n_real_edges": n_real_edges,
    }
    out = Path(__file__).parent.parent / "TPU_SHARDMAP_CHECK.json"
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))
    assert abs(loss0 - loss1) < 1e-3, "shard_map loss diverges from plain step"


if __name__ == "__main__":
    main()
