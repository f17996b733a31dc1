"""Explicit-SPMD training: the train/eval/predict steps under ``shard_map``.

This is the multi-chip path that keeps the Pallas kernels: ``pallas_call``
has no GSPMD partitioning rule, so instead of letting XLA partition a global
program (which would replicate or all-gather the fused message kernels), the
step itself is manually partitioned. Batches arrive as *stacked shards* —
every array carries a leading shard axis, chip ``k`` owns shard ``k``
(:func:`chemprop_tpu.data.collate.collate_sharded`). Each shard is a
self-contained padded graph batch (whole graphs only — the graph-granularity
guarantee means no edge block ever straddles a chip, so no boundary halo
exchange is needed for the D-MPNN message op; a giant graph inflates every
shard's PadSpec rather than straddling. For graphs too large for one chip,
:mod:`chemprop_tpu.ops.edge_partition` provides the halo-exchange message op
— contiguous edge slices per chip, ``ppermute`` boundary-accumulator and
reverse-edge exchange, validated against the single-device loop in
``tests/unit/parallel/test_edge_partition.py``). Inside
``shard_map`` each chip runs the *single-device* model code — including
``fused_message``/``fused_message_iter`` — on its local shard, and the only
cross-chip traffic is:

* ``psum`` of the criterion state (exact global-batch loss semantics,
  including nonlinear ``compute`` like RMSE),
* ``psum`` of gradients (the DP all-reduce, over ICI),
* ``psum`` of batch-norm moments (``MaskedBatchNorm.axis_name``), making
  sharded training numerically identical to single-device training.

Reference analog: Lightning DDP (``chemprop/cli/train.py:1943-1953``) — but
with exact global-loss gradients (DDP averages per-rank means, which differs
when per-rank mask counts differ) and deterministic fixed-order reductions.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map_impl

    def _shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_impl(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_impl

    def _shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_impl(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )

from chemprop_tpu.parallel.sharding import DATA_AXIS


def local_shard(batch):
    """Drop the leading shard axis of every array leaf (inside shard_map the
    local view is ``[1, ...]``); also the host-side 'shard 0' template."""
    return jax.tree.map(lambda x: x[0], batch)


def is_sharded_batch(batch) -> bool:
    bmg = batch.bmg[0] if isinstance(batch.bmg, tuple) else batch.bmg
    return getattr(bmg.V, "ndim", 2) == 3


def _tree_psum(tree, axis: str):
    return jax.tree.map(lambda x: jax.lax.psum(x, axis), tree)


def make_sharded_train_step(
    model, criterion, tx: optax.GradientTransformation, mesh: Mesh, axis: str = DATA_AXIS
) -> Callable:
    """Jitted shard_map train step: per-chip forward/backward on the local
    shard with the Pallas fast path, psum'd criterion state and gradients,
    replicated optimizer update. State pytree is donated."""

    def body(state, batch):
        bmg, V_d, X_d, Y, w, lt, gt = local_shard(batch)
        rng, dropout_rng = jax.random.split(state.rng)
        # distinct dropout masks per chip; everything else is replicated
        dropout_rng = jax.random.fold_in(dropout_rng, jax.lax.axis_index(axis))
        mask = jnp.isfinite(Y)
        targets = jnp.nan_to_num(Y)
        lt_ = jnp.zeros_like(mask) if lt is None else lt
        gt_ = jnp.zeros_like(mask) if gt is None else gt

        def local_state_fn(params):
            variables = {"params": params}
            mutable = False
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(
                variables,
                bmg,
                V_d,
                X_d,
                is_training=True,
                method="train_step_preds",
                rngs={"dropout": dropout_rng},
                mutable=mutable,
            )
            preds, new_model_state = out if mutable else (out, {})
            st = criterion.update_state(
                criterion.init_state(), preds, targets, mask, w[:, 0], lt_, gt_
            )
            return st, new_model_state

        # global-batch loss with exact gradients, for ANY differentiable
        # criterion.compute (incl. nonlinear RMSE/MCC): VJP through the LOCAL
        # accumulator state, then chain with d compute/d state evaluated at
        # the psum'd global state. Differentiating straight through
        # compute(psum(state)) would be wrong here: without replication
        # tracking (check_vma=False) psum transposes to psum, inflating every
        # gradient by the axis size.
        st_local, state_vjp, new_model_state = jax.vjp(
            local_state_fn, state.params, has_aux=True
        )
        st_global = _tree_psum(st_local, axis)
        loss, d_state = jax.value_and_grad(criterion.compute)(st_global)
        (grads,) = state_vjp(d_state)
        grads = _tree_psum(grads, axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, loss

    step = _shard_map(body, mesh, (P(), P(axis)), (P(), P()))
    return jax.jit(step, donate_argnums=(0,))


def make_sharded_eval_step(model, criterion, mesh: Mesh, axis: str = DATA_AXIS) -> Callable:
    """Jitted shard_map eval step -> (psum'd criterion state, stacked
    val-space predictions [S, B_shard, ...])."""

    def body(params, batch_stats, batch):
        bmg, V_d, X_d, Y, w, lt, gt = local_shard(batch)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        mask = jnp.isfinite(Y)
        targets = jnp.nan_to_num(Y)
        lt_ = jnp.zeros_like(mask) if lt is None else lt
        gt_ = jnp.zeros_like(mask) if gt is None else gt
        train_preds = model.apply(
            variables, bmg, V_d, X_d, is_training=False, method="train_step_preds"
        )
        loss_state = criterion.update_state(
            criterion.init_state(), train_preds, targets, mask, w[:, 0], lt_, gt_
        )
        loss_state = _tree_psum(loss_state, axis)
        preds = model.apply(
            variables, bmg, V_d, X_d, is_training=False, method="val_step_preds"
        )
        return loss_state, preds[None]

    step = _shard_map(body, mesh, (P(), P(), P(axis)), (P(), P(axis)))
    return jax.jit(step)


def make_sharded_apply(
    model, mesh: Mesh, method: str | None = None, axis: str = DATA_AXIS, **apply_kwargs: Any
) -> Callable:
    """Jitted shard_map inference: (variables, batch) -> stacked predictions
    ``[S, B_shard, ...]`` (multi-host safe: each host only materializes its
    own shards)."""

    def body(variables, batch):
        local = local_shard(batch)
        kwargs = dict(apply_kwargs)
        if method:
            kwargs["method"] = method
        preds = model.apply(
            variables, local.bmg, local.V_d, local.X_d, is_training=False, **kwargs
        )
        return preds[None]

    return jax.jit(_shard_map(body, mesh, (P(), P(axis)), P(axis)))


def unstack_preds(preds) -> jnp.ndarray:
    """[S, B_shard, ...] stacked predictions -> flat [S*B_shard, ...] rows
    aligned with the stacked batch's flattened pad_mask."""
    import numpy as np

    preds = np.asarray(preds)
    return preds.reshape((-1,) + preds.shape[2:])
