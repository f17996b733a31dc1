"""Device-mesh sharding for padded graph batches (GSPMD-first).

The reference's only distributed mode is Lightning DDP (per-rank whole
graphs, NCCL allreduce; ``cli/train.py:1943-1953``). Here distribution is
expressed the XLA way: the padded :class:`BatchMolGraph` arrays are sharded
over a device mesh and the jitted train step runs with global semantics —
XLA partitions the segment-sum/gather message passing and inserts the
all-reduces (gradient DP reduction and boundary-node accumulator exchange)
over ICI automatically.

Mesh axes:

* ``"data"`` — batches/graphs/nodes/edges sharded along their leading dim.
  Because node indices are global, this subsumes both classic DP *and*
  edge/graph partitioning: every chip owns a contiguous slice of the edge
  table, and cross-chip messages become XLA collectives on the node
  accumulator (SURVEY.md §2.3's "graph/edge partitioning" row).

Multi-host: initialize ``jax.distributed`` and pass the global device list;
the same specs then lay DP over DCN and edge partitioning over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chemprop_tpu.data.collate import TrainingBatch

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices).reshape(-1), (axis_name,))


def batch_shardings(mesh: Mesh, batch: TrainingBatch) -> TrainingBatch:
    """A TrainingBatch-shaped pytree of NamedShardings: leading dim of every
    array sharded over the data axis (None fields mirrored as None). Built
    with tree_map so static metadata (n_graphs, edges_sorted, fused_ok, ...)
    is carried verbatim and the treedefs always match."""
    row = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())

    def shard_like(x):
        if x is None:
            return None
        return row if x.shape[0] % mesh.devices.size == 0 else rep

    return jax.tree.map(
        shard_like,
        batch,
        is_leaf=lambda x: x is None or hasattr(x, "shape"),
    )


def shard_batch(batch: TrainingBatch, mesh: Mesh) -> TrainingBatch:
    """Device-put a host batch with data-axis sharding."""
    shardings = batch_shardings(mesh, batch)

    def put(x, s):
        if x is None:
            return None
        return jax.device_put(x, s)

    return jax.tree.map(
        put, batch, shardings, is_leaf=lambda x: x is None or isinstance(x, np.ndarray)
    )


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(tree, rep)
