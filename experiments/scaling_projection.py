"""Multi-host scaling projection for the DP training step (BASELINE.md
north star: >= 85% edges/s scaling efficiency at 2+ hosts).

Methodology (same move as the A100 bandwidth model in bench.py: a checkable
model built from the program itself plus public hardware rates):

1. Compile the PRODUCTION multi-chip program — the shard_map SPMD train
   step (``parallel/shard_train.py``) — on a virtual 8-device CPU mesh and
   sum the bytes of every collective instruction in the optimized HLO
   (tuple-fused all-reduces included). This measures what the program
   actually communicates per step, not a hand model: gradients + criterion
   states, ~1.5 MB f32 (batch-size independent — D-MPNN weights are tiny).
2. Model the per-step communication time for an H-host v5p slice with the
   public "How to Scale Your Model" rates: ICI ~9e10 B/s per link, DCN
   ~2.5e10 B/s per host. Hierarchical ring allreduce: intra-host
   reduce-scatter/all-gather over ICI, inter-host exchange of the full
   gradient block over DCN (2*(H-1)/H * bytes egress per host).
3. Efficiency = t_step / (t_step + t_comm), UNOVERLAPPED (conservative:
   XLA's latency-hiding scheduler overlaps the gradient all-reduce with
   the tail of the backward pass in practice).

Run standalone: ``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python experiments/scaling_projection.py [step_ms]`` — prints one JSON
line. bench.py invokes it in a CPU subprocess and merges the fields into
the benchmark artifact.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# public rates (jax-ml.github.io/scaling-book): bytes/s
ICI_BW = float(os.environ.get("CHEMPROP_TPU_ICI_BPS", 9e10))  # v5p per-link
DCN_BW = float(os.environ.get("CHEMPROP_TPU_DCN_BPS", 2.5e10))  # per host
CHIPS_PER_HOST = int(os.environ.get("CHEMPROP_TPU_CHIPS_PER_HOST", 4))

_DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8,
             "pred": 1, "u8": 1, "s8": 1, "s64": 8, "u64": 8}


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (handles tuples)."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt = _DT_BYTES.get(m.group(1))
        if dt is None:
            continue
        dims = [int(x) for x in m.group(2).split(",") if x]
        total += dt * (math.prod(dims) if dims else 1)
    return total


def collective_bytes_from_hlo(txt: str) -> dict[str, int]:
    """Sum bytes moved per collective kind in an optimized HLO dump."""
    out: Counter = Counter()
    for line in txt.splitlines():
        m = re.search(
            r"= *(\(.*?\)|\S+) (all-reduce-start|all-reduce|all-gather-start|"
            r"all-gather|reduce-scatter|collective-permute-start|"
            r"collective-permute|all-to-all)\(",
            line,
        )
        if m:
            out[m.group(2).removesuffix("-start")] += shape_bytes(m.group(1))
    return dict(out)


def compile_sharded_step_hlo(n_devices: int = 8) -> str:
    """Optimized HLO of the production shard_map DP train step on a virtual
    CPU mesh, on tiny shapes (collective bytes are gradient-tree bytes —
    batch-size independent)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ.setdefault("CHEMPROP_TPU_INTERPRET", "1")

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from chemprop_tpu.data import DataLoader, MoleculeDatapoint, MoleculeDataset, PadSpec
    from chemprop_tpu.models import MPNN
    from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN
    from chemprop_tpu.parallel import make_mesh, replicate
    from chemprop_tpu.parallel.shard_train import local_shard
    from chemprop_tpu.train import Trainer

    smis = ["CCO", "c1ccccc1", "CNC(C)Cc1ccccc1", "C1CCNCC1",
            "CC(=O)Nc1ccc(O)cc1", "c1ccncc1", "CCCCO", "ClCCl"] * 2
    dps = [MoleculeDatapoint.from_smi(s, y=np.array([float(i)])) for i, s in enumerate(smis)]
    ds = MoleculeDataset(dps)
    ds.normalize_targets()
    mesh = make_mesh(jax.devices()[:n_devices])
    pad = PadSpec(128, 512, -(-len(ds) // n_devices))
    loader = DataLoader(ds, batch_size=len(ds), pad_spec=pad, prefetch=0, n_shards=n_devices)
    model = MPNN(
        message_passing=BondMessagePassing(compute_dtype=jnp.bfloat16),
        agg=MeanAggregation(), predictor=RegressionFFN(), batch_norm=False,
    )
    trainer = Trainer(model, max_epochs=1, mesh=mesh, sharded=True, seed=0)
    batch = next(iter(loader))
    state = trainer.init_state(local_shard(batch), steps_per_epoch=100)
    step = trainer._make_train_step()
    state = replicate(state, mesh)
    import jax as _jax

    return _jax.jit(step).lower(state, _jax.device_put(batch)).compile().as_text()


def project(step_ms: float, coll_bytes: dict[str, int], n_hosts: int = 2) -> dict:
    """Scaling efficiency model for an ``n_hosts`` v5p DP slice."""
    sync_bytes = sum(coll_bytes.values())
    # hierarchical ring allreduce of the gradient block:
    #  - intra-host over ICI: 2*(c-1)/c * B per chip
    #  - inter-host over DCN: 2*(H-1)/H * B egress per host
    c = CHIPS_PER_HOST
    t_ici_ms = (2 * (c - 1) / c) * sync_bytes / ICI_BW * 1e3
    t_dcn_ms = (2 * (n_hosts - 1) / n_hosts) * sync_bytes / DCN_BW * 1e3
    t_comm_ms = t_ici_ms + t_dcn_ms
    eff = step_ms / (step_ms + t_comm_ms)
    return {
        "dp_sync_bytes_per_step": sync_bytes,
        "comm_ms_2host_v5p": round(t_comm_ms, 4),
        "projected_scaling_efficiency": round(eff, 4),
        "n_hosts": n_hosts,
    }


def main():
    step_ms = float(sys.argv[1]) if len(sys.argv) > 1 else 4.78
    txt = compile_sharded_step_hlo()
    coll = collective_bytes_from_hlo(txt)
    result = {"collective_bytes": coll, **project(step_ms, coll)}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
