"""Edge-partitioned TRAINING and INFERENCE: one giant molecule sharded
across the device mesh.

The default multi-chip path places whole graphs per chip
(``parallel/shard_train.py``); a molecule too large for one chip's batch
slice would inflate every shard's PadSpec. This module turns the validated
halo-exchange message op (``ops/edge_partition.py``) into a *training
mode*: the molecule's dst-sorted edge table is cut into contiguous
per-chip slices, the FULL D-MPNN forward (W_i featurization GEMM, the
depth loop with the W_h GEMM, the M_v readout, W_o finalize, graph
readout, prediction head) runs under ``shard_map``, and backprop flows
through the ``ppermute`` halo exchanges (their transposes are the reverse
permutations — gradients are exact, tested against the single-device
model to f32 tolerance in ``tests/unit/parallel/test_partitioned_mp.py``).

Parameters are the STANDARD ``MPNN`` parameter pytree: a model trained in
this mode saves/loads through the normal checkpoint path and predicts on
the normal single-device path (and vice versa).

Scope (checked by :func:`check_partitionable`): Bond or Atom
MessagePassing (directed or ``--undirected``), mean/sum/norm
aggregation, no batch norm, single component. Extra atom descriptors (``V_d`` through ``W_d``) and
extra datapoint descriptors (``X_d`` concatenated to the psum'd
embedding) are supported. Dropout is supported in the train step
(per-shard masks from a folded rng, head masks replicated); inference
is deterministic. CLI: ``chemprop-tpu train --edge-partition [N]``.

Reference analog: none — the reference holds whole graphs per rank
(``chemprop/nn/message_passing/base.py:196-212`` on one device).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from chemprop_tpu.nn.utils import get_activation_function
from chemprop_tpu.ops.edge_partition import (
    EdgePartitionPlan,
    _shift,
    _tail,
    halo_message,
    halo_node_accumulators,
    partition_edges,
)
from chemprop_tpu.parallel.shard_train import _shard_map, _tree_psum
from chemprop_tpu.parallel.sharding import DATA_AXIS


class PartitionedGraph(NamedTuple):
    """One molecule, cut into per-shard slices (leading axis = shard)."""

    V_ext: Any  # [S, N + 2HN + 1, d_v] node features: [halo|owned|halo|sac]
    E: Any  # [S, P, d_e] edge features (dst-sorted slice)
    src_ext: Any  # [S, P] into the extended node layout
    dst_ext: Any
    rev_ext: Any  # [S, P] into [HE | P | HE]
    edge_mask: Any  # [S, P]
    n_owned: Any  # [S]
    n_edges: Any  # [S]
    V_d_own: Any = None  # [S, N, d_vd] extra atom descriptors (owned rows)


class PartitionDims(NamedTuple):
    n_shards: int
    P: int
    N: int
    HN: int
    HE: int
    # every shard owns >= 2*HN nodes: the halo exchange may run as ONE
    # concurrent ppermute phase (ops/edge_partition.py:halo_node_accumulators)
    single_phase: bool = False


def check_partitionable(model) -> None:
    """Raise with a precise reason when the model config is outside this
    mode's scope."""
    from chemprop_tpu.nn.agg import MeanAggregation, NormAggregation, SumAggregation
    from chemprop_tpu.nn.message_passing.base import (
        AtomMessagePassing,
        BondMessagePassing,
    )

    mp = model.message_passing
    if not isinstance(mp, (BondMessagePassing, AtomMessagePassing)):
        raise ValueError("--edge-partition requires bond or atom message passing")
    if getattr(model, "batch_norm", False):
        raise ValueError("--edge-partition does not support --batch-norm")
    if not isinstance(model.agg, (MeanAggregation, SumAggregation, NormAggregation)):
        raise ValueError("--edge-partition supports mean/sum/norm aggregation")


def build_partitioned_graph(
    mg,
    n_shards: int,
    min_halo_nodes: int = 8,
    min_halo_edges: int = 8,
    min_owned_nodes: int = 1,
    min_shard_edges: int = 1,
    V_d=None,
) -> tuple[PartitionedGraph, PartitionDims]:
    """Host-side: dst-sort a featurized MolGraph and cut it into shard
    slices with halo node-feature rows. The ``min_*`` floors force common
    padded dims across a dataset (one compiled program). ``V_d`` (optional
    ``[n_nodes, d_vd]`` extra atom descriptors) is sliced to each shard's
    owned node range."""
    src = np.asarray(mg.edge_index[0], np.int64)
    dst = np.asarray(mg.edge_index[1], np.int64)
    rev = np.asarray(mg.rev_edge_index, np.int64)
    order = np.argsort(dst, kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    src, dst, rev = src[order], dst[order], inv[rev[order]]
    E_feats = np.asarray(mg.E, np.float32)[order]
    V = np.asarray(mg.V, np.float32)
    n_nodes = V.shape[0]

    plan = partition_edges(
        src, dst, rev, n_nodes, n_shards,
        min_halo_nodes=min_halo_nodes,
        min_halo_edges=min_halo_edges,
        min_owned_nodes=min_owned_nodes,
        min_shard_edges=min_shard_edges,
    )
    S, Pp, N, HN, HE = plan.n_shards, plan.P, plan.N, plan.HN, plan.HE
    cuts = np.concatenate([[0], np.cumsum(np.asarray(plan.n_edges))]).astype(int)
    lo = np.asarray(plan.node_lo)

    V_ext = np.zeros((S, N + 2 * HN + 1, V.shape[1]), np.float32)
    E_p = np.zeros((S, Pp, E_feats.shape[1]), np.float32)
    own = np.asarray(plan.n_owned)
    for s in range(S):
        hi = int(lo[s]) + int(own[s])
        # [left-halo | owned (padded to N) | right-halo | sacrificial]: the
        # right halo sits AFTER the padded owned block, matching loc_node's
        # ``HN + N + (node - hi)`` localization
        for row0, g0, count in (
            (0, int(lo[s]) - HN, HN),
            (HN, int(lo[s]), int(own[s])),
            (HN + N, hi, HN),
        ):
            idx = np.arange(count) + g0
            ok = (idx >= 0) & (idx < n_nodes)
            V_ext[s, row0 : row0 + count][ok] = V[idx[ok]]
        k = cuts[s + 1] - cuts[s]
        E_p[s, :k] = E_feats[cuts[s] : cuts[s + 1]]

    V_d_own = None
    if V_d is not None:
        V_d = np.asarray(V_d, np.float32)
        V_d_own = np.zeros((S, N, V_d.shape[1]), np.float32)
        for s in range(S):
            k = int(own[s])
            V_d_own[s, :k] = V_d[int(lo[s]) : int(lo[s]) + k]

    g = PartitionedGraph(
        V_ext=V_ext,
        E=E_p,
        src_ext=np.asarray(plan.src_ext),
        dst_ext=np.asarray(plan.dst_ext),
        rev_ext=np.asarray(plan.rev_ext),
        edge_mask=np.asarray(plan.edge_mask),
        n_owned=np.asarray(plan.n_owned),
        n_edges=np.asarray(plan.n_edges),
        V_d_own=V_d_own,
    )
    single = bool(int(own.min()) >= 2 * HN) if S > 1 else True
    return g, PartitionDims(S, Pp, N, HN, HE, single)


def natural_dims(mg, n_shards: int) -> PartitionDims:
    """The per-molecule dims before any cross-dataset floors.

    Plan-only: runs :func:`partition_edges` on the dst-sorted index arrays
    without materializing any feature slices, so bucket routing over a
    dataset costs index work only (the full ``PartitionedGraph`` build
    happens once per molecule, after its bucket's floors are known)."""
    dst = np.asarray(mg.edge_index[1], np.int64)
    order = np.argsort(dst, kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    src = np.asarray(mg.edge_index[0], np.int64)[order]
    rev = inv[np.asarray(mg.rev_edge_index, np.int64)[order]]
    plan = partition_edges(src, dst[order], rev, np.asarray(mg.V).shape[0], n_shards)
    own = np.asarray(plan.n_owned)
    single = bool(int(own.min()) >= 2 * plan.HN) if plan.n_shards > 1 else True
    return PartitionDims(plan.n_shards, plan.P, plan.N, plan.HN, plan.HE, single)


def _dropout(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Inverted dropout matching ``flax.linen.Dropout`` semantics (keep
    probability scaling); per-shard rngs give independent masks per slice."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _mp_local(
    params, g: PartitionedGraph, dims: PartitionDims, mp, axis: str,
    dropout_rng: jax.Array | None = None,
    is_training: bool = True,
):
    """Per-shard D-MPNN forward on the local slice (inside shard_map).
    Returns ``(Hv [N, d_h], node_mask [N])`` for the owned nodes.

    ``dropout_rng`` (train step only, already folded per shard) activates
    the reference's dropout placements — after each depth iteration and
    after the W_o finalize (``chemprop/nn/message_passing/base.py:135-141,
    196-212``)."""
    from chemprop_tpu.nn.message_passing.base import AtomMessagePassing

    tau = get_activation_function(mp.activation)
    p = params["message_passing"]
    W_i, W_h = p["W_i"]["kernel"], p["W_h"]["kernel"]
    b_i, b_h = p["W_i"].get("bias"), p["W_h"].get("bias")
    W_o, b_o = p["W_o"]["kernel"], p["W_o"]["bias"]
    S, HN, HE, N = dims.n_shards, dims.HN, dims.HE, dims.N
    is_atom = isinstance(mp, AtomMessagePassing)
    drop_on = dropout_rng is not None and mp.dropout > 0

    V_ext, E = g.V_ext, g.E
    if not is_training and mp.graph_transform is not None:
        # eval-only extra-feature scaling (GraphTransform); garbage values
        # on pad/sacrificial rows are masked downstream exactly like the
        # raw features would be
        gt = mp.graph_transform
        if gt.V_transform is not None:
            V_ext = gt.V_transform(V_ext, is_training=False)
        if gt.E_transform is not None:
            E = gt.E_transform(E, is_training=False)
    g = g._replace(V_ext=V_ext, E=E)

    if is_atom:
        # atom MP: H0 = W_i(V)[src] (reference ``base.py:276-289``); the
        # src gather resolves locally because V_ext carries halo rows
        Hn = g.V_ext @ W_i
        if b_i is not None:
            Hn = Hn + b_i
        H0 = Hn[g.src_ext]
    else:
        X = jnp.concatenate([g.V_ext[g.src_ext], g.E], axis=-1)
        H0 = X @ W_i
        if b_i is not None:
            H0 = H0 + b_i
    def undirected_avg(H):
        # the reference's pre-average H = (H + H[rev]) / 2 at each
        # iteration (``base.py:196-212``); cross-cut reverse edges resolve
        # through the sideways edge halo
        Hm = jnp.where(g.edge_mask[:, None], H, 0)
        left_H = _shift(_tail(Hm, g.n_edges, HE), +1, axis, S)
        right_H = _shift(Hm[:HE], -1, axis, S)
        Hh = jnp.concatenate(
            [left_H, Hm, right_H, jnp.zeros((1, H.shape[1]), H.dtype)]
        )
        return (H + Hh[g.rev_ext]) / 2

    H = tau(H0)
    for t in range(1, mp.depth):
        if mp.undirected:
            H = undirected_avg(H)
        if is_atom:
            # M[e] = (Σ_{k: dst_k = v} cat(H_k, E_k))[src_e] — no
            # reverse-edge subtraction (reference ``mixins.py:21-30``);
            # only the node-accumulator halo exchange is needed
            HE_cat = jnp.concatenate([H, g.E], axis=-1)
            acc = halo_node_accumulators(
                HE_cat, g.dst_ext, g.edge_mask, g.n_owned, N, HN, axis, S,
                with_halo=True, single_phase=dims.single_phase,
            )
            acc = jnp.concatenate([acc, jnp.zeros((1, acc.shape[1]), acc.dtype)])
            M = jnp.where(g.edge_mask[:, None], acc[g.src_ext], 0)
        elif mp.undirected:
            # the averaged H is rev-symmetric (H'[rev] = (H[rev]+H)/2 =
            # H' bitwise), so the reverse-edge subtraction is local — no
            # sideways edge halo needed this iteration
            Hm = jnp.where(g.edge_mask[:, None], H, 0)
            acc = halo_node_accumulators(
                Hm, g.dst_ext, g.edge_mask, g.n_owned, N, HN, axis, S,
                with_halo=True, single_phase=dims.single_phase,
            )
            acc = jnp.concatenate([acc, jnp.zeros((1, acc.shape[1]), acc.dtype)])
            M = jnp.where(g.edge_mask[:, None], acc[g.src_ext] - Hm, 0)
        else:
            M = halo_message(
                H, g.src_ext, g.dst_ext, g.rev_ext, g.edge_mask,
                g.n_owned, g.n_edges, N, HN, HE, axis, S,
                single_phase=dims.single_phase,
            )
        Z = M @ W_h
        if b_h is not None:
            Z = Z + b_h
        H = tau(H0 + Z)
        if drop_on:
            H = _dropout(H, mp.dropout, jax.random.fold_in(dropout_rng, t))
    Hm = jnp.where(g.edge_mask[:, None], H, 0)
    M_v = halo_node_accumulators(
        Hm, g.dst_ext, g.edge_mask, g.n_owned, N, HN, axis, S, with_halo=False
    )
    V_own = g.V_ext[HN : HN + N]
    H_v = tau(jnp.concatenate([V_own, M_v], axis=-1) @ W_o + b_o)
    if drop_on:
        H_v = _dropout(H_v, mp.dropout, jax.random.fold_in(dropout_rng, mp.depth))
    if mp.d_vd:
        # extra atom descriptors: H_v = W_d([H_v ; V_d]) on the owned rows
        # (reference ``base.py:143-194``); the eval-only ScaleTransform
        # mirrors the dense path's is_training keying
        if g.V_d_own is None:
            raise ValueError(
                "model expects extra atom descriptors (d_vd > 0) but the "
                "partitioned graph carries none — pass V_d to "
                "build_partitioned_graph"
            )
        V_d = g.V_d_own
        if mp.V_d_transform is not None and not is_training:
            V_d = mp.V_d_transform(V_d, is_training=False)
        p_d = p["W_d"]
        H_v = jnp.concatenate([H_v, V_d], axis=-1) @ p_d["kernel"] + p_d["bias"]
        if drop_on:
            H_v = _dropout(
                H_v, mp.dropout, jax.random.fold_in(dropout_rng, mp.depth + 1)
            )
    node_mask = jnp.arange(N) < g.n_owned
    return H_v, node_mask


def _graph_embedding(model, local_sum, local_count, axis: str):
    from chemprop_tpu.nn.agg import MeanAggregation, NormAggregation

    s = jax.lax.psum(local_sum, axis)
    c = jax.lax.psum(local_count, axis)
    if isinstance(model.agg, MeanAggregation):
        return s / jnp.maximum(c, 1.0)
    if isinstance(model.agg, NormAggregation):
        return s / model.agg.norm
    return s  # sum


def make_partitioned_apply(
    model, mesh: Mesh, dims: PartitionDims, axis: str = DATA_AXIS,
    train_space: bool = False, encode_index: int | None = None,
) -> Callable:
    """Jitted shard_map inference: ``(variables, PartitionedGraph) ->
    preds [1, ...]`` (inference activations + output unscaling unless
    ``train_space``)."""
    check_partitionable(model)
    mp = model.message_passing

    def body(variables, g, x_d):
        g = jax.tree.map(lambda x: x[0], g)
        H_v, node_mask = _mp_local(
            variables["params"], g, dims, mp, axis, is_training=False
        )
        ls = jnp.sum(jnp.where(node_mask[:, None], H_v, 0), axis=0)
        lc = jnp.sum(node_mask).astype(jnp.float32)
        Z = _graph_embedding(model, ls, lc, axis)[None]
        if x_d is not None:
            # extra datapoint descriptors ride the fingerprint concat; the
            # eval-only X_d ScaleTransform mirrors MPNN.fingerprint
            xd = x_d
            if model.X_d_transform is not None:
                xd = model.X_d_transform(xd, is_training=False)
            Z = jnp.concatenate([Z, xd], axis=1)
        if encode_index is not None:
            # learned fingerprint: predictor FFN blocks [:i] on the
            # embedding (``chemprop-tpu fingerprint``)
            return model.predictor.apply(
                {"params": variables["params"]["predictor"]}, Z, encode_index,
                is_training=False, method="encode",
            )
        method = "train_step" if train_space else None
        kwargs = {"method": method} if method else {}
        return model.predictor.apply(
            {"params": variables["params"]["predictor"]}, Z, is_training=False, **kwargs
        )

    sm = _shard_map(body, mesh, (P(), P(axis), P()), P())

    @jax.jit
    def fn(variables, g, x_d=None):
        return sm(variables, g, x_d)

    return fn


def make_partitioned_train_step(
    model, tx: optax.GradientTransformation, mesh: Mesh, dims: PartitionDims,
    axis: str = DATA_AXIS,
) -> Callable:
    """Jitted shard_map train step for one partitioned molecule:
    ``(state, PartitionedGraph, y [1, t], w [1]) -> (state, loss)``.

    Gradient structure mirrors ``make_sharded_train_step``: the per-shard
    MP forward is VJP'd locally, the graph readout + head + criterion run
    replicated on the psum'd embedding, and the chained MP gradients are
    psum'd — exact full-molecule gradients (the halo ``ppermute``
    transposes are the reverse permutations)."""
    check_partitionable(model)
    mp = model.message_passing
    criterion = model.criterion

    def body(state, g, y, w, x_d):
        g = jax.tree.map(lambda x: x[0], g)
        y = y[0][None]
        w = w[0][None]
        rng, mp_rng, head_rng = jax.random.split(state.rng, 3)
        # distinct dropout masks per shard (mirrors make_sharded_train_step)
        dropout_rng = (
            jax.random.fold_in(mp_rng, jax.lax.axis_index(axis))
            if mp.dropout > 0
            else None
        )

        def local_fn(p_mp):
            H_v, node_mask = _mp_local(
                {"message_passing": p_mp}, g, dims, mp, axis, dropout_rng
            )
            ls = jnp.sum(jnp.where(node_mask[:, None], H_v, 0), axis=0)
            lc = jnp.sum(node_mask).astype(jnp.float32)
            return ls, lc

        (ls, lc), vjp_mp = jax.vjp(local_fn, state.params["message_passing"])

        def head_fn(p_pred, ls, lc):
            Z = _graph_embedding(model, ls, lc, axis)[None]
            if x_d is not None:
                # raw concat: the X_d ScaleTransform is a train-mode no-op
                # (train data is pre-normalized in the dataset)
                Z = jnp.concatenate([Z, x_d], axis=1)
            # the head runs REPLICATED on the psum'd embedding, so its
            # dropout rng must be identical across shards (un-folded)
            head_drop = getattr(model.predictor, "dropout", 0.0) > 0
            preds = model.predictor.apply(
                {"params": p_pred},
                Z,
                is_training=head_drop,
                method="train_step",
                **({"rngs": {"dropout": head_rng}} if head_drop else {}),
            )
            mask = jnp.isfinite(y)
            targets = jnp.nan_to_num(y)
            st = criterion.update_state(
                criterion.init_state(), preds, targets, mask, w,
                jnp.zeros_like(mask), jnp.zeros_like(mask),
            )
            return criterion.compute(st)

        # psum on PRIMALS; the replicated head differentiates cleanly
        gs = jax.lax.psum(ls, axis)
        gc = jax.lax.psum(lc, axis)
        loss, (g_pred, d_gs, _) = jax.value_and_grad(head_fn, argnums=(0, 1, 2))(
            state.params["predictor"], gs, gc
        )
        (g_mp,) = vjp_mp((d_gs, jnp.zeros_like(lc)))  # lc carries no param grad
        g_mp = _tree_psum(g_mp, axis)
        grads = dict(state.params)
        grads["message_passing"] = g_mp
        grads["predictor"] = g_pred
        for k in grads:
            if k not in ("message_passing", "predictor"):
                grads[k] = jax.tree.map(jnp.zeros_like, state.params[k])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1, rng=rng
        )
        return new_state, loss

    sm = _shard_map(body, mesh, (P(), P(axis), P(), P(), P()), (P(), P()))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, g, y, w, x_d=None):
        return sm(state, g, y, w, x_d)

    return step


def bucket_edge_pad(P_pad: int) -> int:
    """Power-of-two edge-pad bucket (floor 128): one compiled program per
    bucket across a dataset of differently-sized molecules."""
    import math

    return 128 * (1 << max(0, math.ceil(math.log2(max(1, P_pad // 128)))))


def plan_buckets(data, n_shards: int):
    """Shared bucket routing for a list of ``Datum``s: returns
    ``(keys, graphs, bucket_dims)`` where ``keys[i]`` is the dim-bucket of
    molecule ``i`` (``None`` = not partitionable over this mesh — route
    dense), ``graphs[i]`` the built :class:`PartitionedGraph` (or None),
    and ``bucket_dims[k]`` the common padded dims of bucket ``k``."""

    def try_nat(d):
        try:
            return natural_dims(d.mg, n_shards)
        except ValueError:
            return None

    nat = [try_nat(d) for d in data]
    keys = [None if x is None else bucket_edge_pad(x.P) for x in nat]
    buckets: dict[int, dict] = {}
    for k, x in zip(keys, nat):
        if k is None:
            continue
        b = buckets.setdefault(k, {"P": 0, "N": 0, "HN": 0, "HE": 0})
        b["P"] = max(b["P"], x.P)
        b["N"] = max(b["N"], x.N)
        b["HN"] = max(b["HN"], x.HN)
        b["HE"] = max(b["HE"], x.HE)

    built = []
    for i, (d, k) in enumerate(zip(data, keys)):
        if k is None:
            built.append(None)
            continue
        try:
            built.append(
                build_partitioned_graph(
                    d.mg, n_shards,
                    min_halo_nodes=buckets[k]["HN"], min_halo_edges=buckets[k]["HE"],
                    min_owned_nodes=buckets[k]["N"], min_shard_edges=k, V_d=d.V_d,
                )
            )
        except ValueError:
            # the bucket's shared halo floors (maxed over its members) can
            # exceed THIS molecule's per-shard minimums even though it
            # partitions fine on its own dims — route it dense rather than
            # aborting the run
            keys[i] = None
            built.append(None)
    bucket_dims = {}
    for k in set(buckets) & set(kk for kk in keys if kk is not None):
        members = [b[1] for b, kk in zip(built, keys) if kk == k]
        bucket_dims[k] = members[0]._replace(
            single_phase=all(dm.single_phase for dm in members)
        )
    graphs = [None if b is None else b[0] for b in built]
    return keys, graphs, bucket_dims


class PartitionedInference:
    """Reusable mixed partitioned/dense inference session.

    Builds the bucket plan, the per-bucket compiled programs, and the
    dense-fallback batches ONCE; :meth:`run` then evaluates any parameter
    set against the same graphs and compiled programs — an ensemble of
    same-config checkpoints shares one plan and one compile per bucket
    instead of re-planning and re-jitting per member. Dense-routed
    molecules are batched (up to ``dense_batch_size`` per dispatch) rather
    than dispatched one padded graph at a time; outputs are stacked in
    input order. ``plan``/``mesh`` accept a pre-built
    ``(keys, graphs, bucket_dims)`` routing (e.g. the one the training
    loop already computed) so graphs are not rebuilt."""

    def __init__(
        self, model, data, n_shards: int | None = None,
        encode_index: int | None = None, plan=None, mesh: Mesh | None = None,
        dense_batch_size: int = 64, train_space: bool = False,
    ):
        from chemprop_tpu.data.collate import PadSpec, collate_batch

        check_partitionable(model)
        devs = jax.devices()
        n_dev = min(n_shards or len(devs), len(devs))
        self.data = data
        self.keys, self.graphs, bucket_dims = (
            plan if plan is not None else plan_buckets(data, n_dev)
        )
        self.mesh = mesh if mesh is not None else Mesh(np.array(devs[:n_dev]), (DATA_AXIS,))
        used = set(k for k in self.keys if k is not None)
        self.apply_fns = {
            k: make_partitioned_apply(
                model, self.mesh, bucket_dims[k],
                encode_index=encode_index, train_space=train_space,
            )
            for k in used
        }
        self.x_ds = [
            None
            if d.x_d is None
            else jnp.asarray(np.asarray(d.x_d, np.float32).reshape(1, -1))
            for d in data
        ]
        dense_idx = [i for i, k in enumerate(self.keys) if k is None]
        self.dense_batches = []
        if dense_idx:
            bs = max(1, min(dense_batch_size, len(dense_idx)))
            pad = PadSpec.for_graphs([data[i].mg for i in dense_idx], n_graphs=bs)
            for j in range(0, len(dense_idx), bs):
                chunk = dense_idx[j : j + bs]
                tb = collate_batch([data[i] for i in chunk], pad)
                self.dense_batches.append((chunk, tb))

        @jax.jit
        def dense_infer(vs, bmg, V_d, X_d):
            if encode_index is not None:
                return model.apply(vs, bmg, V_d, X_d, i=encode_index, method="encoding")
            return model.apply(vs, bmg, V_d, X_d, is_training=False)

        self._dense_infer = dense_infer

    def run(self, variables) -> np.ndarray:
        rows: list = [None] * len(self.data)
        for i, (k, g) in enumerate(zip(self.keys, self.graphs)):
            if k is not None:
                rows[i] = np.asarray(self.apply_fns[k](variables, g, self.x_ds[i]))
        for chunk, tb in self.dense_batches:
            out = np.asarray(self._dense_infer(variables, tb.bmg, tb.V_d, tb.X_d))
            for t, i in enumerate(chunk):
                rows[i] = out[t : t + 1]
        return np.concatenate(rows, axis=0)


def predict_partitioned(
    model, variables, data, n_shards: int | None = None,
    encode_index: int | None = None,
):
    """Inference over a list of ``Datum``s with each partitionable molecule
    sharded across the device mesh (bucketed one-compile-per-dim-bucket)
    and a dense single-device fallback for the rest. Returns predictions
    stacked in input order (full inference semantics: eval transforms +
    output unscaling). With ``encode_index``, returns learned fingerprints
    (``model.encoding`` semantics) instead of predictions. CLI:
    ``chemprop-tpu predict|fingerprint --edge-partition [N]``. For
    repeated evaluation over the same data (ensembles), build one
    :class:`PartitionedInference` and call :meth:`~PartitionedInference.run`
    per parameter set."""
    return PartitionedInference(
        model, data, n_shards=n_shards, encode_index=encode_index
    ).run(variables)
