"""Measured step-time comparison for the edge-partitioned halo exchange:
two-phase (sequential exchange) vs single-phase (overlapped) — VERDICT r4
next #3, SURVEY §5.7 (exchange overlapped with local scatter-add).

Runs the FULL partitioned train step (``parallel/partitioned_mp.py``) on a
synthetic giant molecule over an 8-way virtual CPU mesh, both exchange
structures, and checks one-step parameter equality between them (exactness)
before timing. CPU collectives are memcpys, so the CPU delta understates
the ICI win — the structural claim (2 sequential collective phases -> 1)
is visible in the compiled HLO either way.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python experiments/bench_partitioned_halo.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

N_DEV = 8
STEPS = int(os.environ.get("HALO_BENCH_STEPS", 30))


def giant_chain_smiles(n_units: int = 400) -> str:
    """A long branched polymer chain (~5 heavy atoms/unit)."""
    return "CC(C)" + "C(CO)" * n_units + "C"


def main():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={N_DEV}"
        ).strip()
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    jax.config.update("jax_platforms", "cpu")

    from chemprop_tpu.data import MoleculeDatapoint
    from chemprop_tpu.models import MPNN
    from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN
    from chemprop_tpu.parallel.partitioned_mp import (
        build_partitioned_graph,
        make_partitioned_train_step,
    )
    from chemprop_tpu.train.trainer import TrainState

    from chemprop_tpu.data import MoleculeDataset

    dp = MoleculeDatapoint.from_smi(giant_chain_smiles(), y=np.array([1.0]))
    ds = MoleculeDataset([dp])
    datum = ds[0]
    g, dims = build_partitioned_graph(datum.mg, N_DEV)
    assert dims.single_phase, "bench molecule must satisfy the single-phase guard"
    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("data",))
    model = MPNN(
        message_passing=BondMessagePassing(compute_dtype=jnp.float32),
        agg=MeanAggregation(), predictor=RegressionFFN(), batch_norm=False,
    )
    from chemprop_tpu.data.collate import collate_batch

    batch0 = collate_batch([datum])
    variables = model.init(jax.random.PRNGKey(0), batch0.bmg, None, None, is_training=False)
    tx = optax.adam(1e-3)

    y = jnp.asarray(np.array([[1.0]], np.float32))
    w = jnp.asarray(np.array([1.0], np.float32))

    results = {}
    states = {}
    for name, single in (("two_phase", False), ("single_phase", True)):
        d = dims._replace(single_phase=single)
        step = make_partitioned_train_step(model, tx, mesh, d)
        state = TrainState(
            params=jax.tree.map(jnp.copy, variables["params"]), batch_stats={},
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0),
        )
        state, loss = step(state, g, y, w)  # compile + 1 step
        jax.block_until_ready(loss)
        states[name] = jax.device_get(state.params)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, loss = step(state, g, y, w)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        results[name + "_step_ms"] = round(dt, 3)

    # exactness: one identical step under both structures moves params equally
    err = max(
        float(np.max(np.abs(a - b)))
        for a, b in zip(jax.tree.leaves(states["two_phase"]), jax.tree.leaves(states["single_phase"]))
    )
    results["one_step_param_max_err"] = err
    results["speedup"] = round(results["two_phase_step_ms"] / results["single_phase_step_ms"], 3)
    results["n_devices"] = N_DEV
    results["dims"] = {"P": dims.P, "N": dims.N, "HN": dims.HN, "HE": dims.HE}
    print(json.dumps(results))
    assert err < 1e-5, err


if __name__ == "__main__":
    main()
