"""True multi-process distributed test: 2 JAX processes x 4 virtual CPU
devices each, one 8-device global mesh, per-host local batch shards
assembled with ``host_local_batch_to_global`` — the multi-host path the
reference never exercises (its DDP tests run single-process; SURVEY.md §4).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[3]

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["CPT_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from chemprop_tpu.parallel import distributed, make_mesh
from chemprop_tpu.parallel.sharding import shard_batch

pid = int(os.environ["CPT_PROC_ID"])
distributed.initialize(
    coordinator_address=os.environ["CPT_COORD"], num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset, PadSpec, collate_batch
from chemprop_tpu.models import MPNN
from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN

SMIS = ["CCO", "c1ccccc1", "CC(=O)O", "CNC", "CCCC", "c1ccncc1", "CCN", "C1CCCCC1"]
dps = [MoleculeDatapoint.from_smi(s, y=np.array([float(i)])) for i, s in enumerate(SMIS)]
ds = MoleculeDataset(dps)
data = [ds[i] for i in range(len(ds))]
full = collate_batch(data, PadSpec(192, 192, 8))

# each process keeps only its half of every global row dimension
def local_half(x):
    if x is None or np.ndim(x) == 0:
        return x
    sh = distributed.process_shard(x.shape[0])
    return np.asarray(x)[sh]

import jax.tree
local = jax.tree.map(local_half, full, is_leaf=lambda v: v is None or isinstance(v, np.ndarray))

mesh = make_mesh()
gbatch = distributed.host_local_batch_to_global(local, mesh)
assert gbatch.bmg.V.shape[0] == 192  # global shape restored

model = MPNN(
    message_passing=BondMessagePassing(d_h=32, depth=2),
    agg=MeanAggregation(),
    predictor=RegressionFFN(input_dim=32, hidden_dim=32),
    batch_norm=False,
)
variables = model.init(jax.random.PRNGKey(0), full.bmg, is_training=False)

@jax.jit
def score(variables, bmg):
    preds = model.apply(variables, bmg, is_training=False)
    return (preds ** 2).mean()

val = float(score(variables, gbatch.bmg))
print(f"RESULT {pid} {val:.10f}", flush=True)
"""


@pytest.mark.integration
def test_two_process_global_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    procs = []
    for pid in range(2):
        env = {
            "PATH": os.environ.get("PATH", ""),
            "HOME": os.environ.get("HOME", "/root"),
            # no axon sitecustomize: PYTHONPATH carries only the repo
            "PYTHONPATH": str(REPO),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "CPT_REPO": str(REPO),
            "CPT_PROC_ID": str(pid),
            "CPT_COORD": f"127.0.0.1:{port}",
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )

    results = {}
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, val = line.split()
                results[int(pid)] = float(val)

    assert set(results) == {0, 1}
    # both processes computed the same global scalar
    assert results[0] == pytest.approx(results[1], abs=1e-9)

    # and it matches a single-process (8 local virtual devices) evaluation
    import jax

    from chemprop_tpu.data import (
        MoleculeDatapoint,
        MoleculeDataset,
        PadSpec,
        collate_batch,
    )
    from chemprop_tpu.models import MPNN
    from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN

    SMIS = ["CCO", "c1ccccc1", "CC(=O)O", "CNC", "CCCC", "c1ccncc1", "CCN", "C1CCCCC1"]
    dps = [
        MoleculeDatapoint.from_smi(s, y=np.array([float(i)])) for i, s in enumerate(SMIS)
    ]
    ds = MoleculeDataset(dps)
    data = [ds[i] for i in range(len(ds))]
    full = collate_batch(data, PadSpec(192, 192, 8))
    model = MPNN(
        message_passing=BondMessagePassing(d_h=32, depth=2),
        agg=MeanAggregation(),
        predictor=RegressionFFN(input_dim=32, hidden_dim=32),
        batch_norm=False,
    )
    variables = model.init(jax.random.PRNGKey(0), full.bmg, is_training=False)
    preds = model.apply(variables, full.bmg, is_training=False)
    expected = float((np.asarray(preds) ** 2).mean())
    assert results[0] == pytest.approx(expected, abs=1e-5)
