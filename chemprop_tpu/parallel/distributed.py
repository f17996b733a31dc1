"""Multi-host (multi-process) training support.

The reference's multi-device path is Lightning DDP over torch.distributed
(NCCL), selected implicitly by ``--devices`` (reference ``cli/train.py:
1943-1953``). The TPU-native equivalent is ``jax.distributed`` + a global
mesh: every process (host) runs the same program, contributes its local
chips to one global device list, and the GSPMD-sharded train step from
:mod:`chemprop_tpu.parallel.sharding` runs with global semantics — gradient
all-reduce rides ICI within a slice and DCN across slices, inserted by XLA.

Usage (one process per host):

    from chemprop_tpu.parallel import distributed
    distributed.initialize()            # env-driven on TPU pods
    mesh = make_mesh()                  # global devices
    batch = distributed.host_local_batch_to_global(local_batch, mesh)

Each host feeds only its own rows (the DataLoader shards by
``process_index``); ``host_local_batch_to_global`` assembles the global
arrays without gathering data onto any single host.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chemprop_tpu.parallel.sharding import DATA_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Initialize ``jax.distributed``.

    On TPU pods all arguments are inferred from the environment; on CPU/GPU
    clusters pass them explicitly (or set ``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``)."""
    try:
        # NB: jax.process_count() would itself initialize the backend, which
        # must not happen before jax.distributed.initialize
        if jax._src.distributed.global_state.client is not None:
            return  # already initialized
    except AttributeError:  # private API moved
        pass
    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def process_shard(n: int) -> slice:
    """The [start, stop) row range this process owns out of ``n`` rows."""
    per = -(-n // jax.process_count())
    lo = jax.process_index() * per
    return slice(lo, min(lo + per, n))


def host_local_array_to_global(x: np.ndarray, mesh: Mesh, spec: P) -> jax.Array:
    """Assemble a global array from per-process local shards (each process
    passes only its own rows; no host ever holds the full array)."""
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(x, mesh, spec)


def host_local_batch_to_global(batch, mesh: Mesh):
    """Assemble a global :class:`TrainingBatch` from per-host local batches.

    Every leading dim is sharded over the data axis; each host's local batch
    supplies ``1/process_count`` of the global rows (shapes must match
    across hosts — use a shared :class:`PadSpec`)."""
    from jax.experimental import multihost_utils

    spec = P(DATA_AXIS)

    def to_global(x):
        if x is None or np.ndim(x) == 0:  # None fields / static ints stay host-side
            return x
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, spec
        )

    return jax.tree.map(
        to_global, batch, is_leaf=lambda v: v is None or isinstance(v, np.ndarray)
    )
