"""TPU-native batching: padded, static-shape batched molecular graphs.

The reference batches graphs as dynamically-sized COO concatenations
(``chemprop/data/collate.py:14-97``) — fine for eager PyTorch, hostile to XLA,
where every new shape triggers a recompile. Here a batch is a fixed-shape
padded structure:

* nodes and edges of all graphs are concatenated then padded to bucketed
  sizes (``N_pad``/``E_pad``), so a whole training run reuses a handful of
  compiled programs;
* padding edges point at the last (padding) node row and are masked; padding
  nodes belong to a sacrificial graph segment (id ``n_graphs``), so segment
  reductions need no masking of their own;
* ``rev`` is the reverse-edge permutation (identity on padding), enabling the
  D-MPNN reverse-edge subtraction as a pure gather.

The structure is a registered JAX pytree (flax.struct) and moves to device as
one transfer.
"""

from __future__ import annotations

import logging
from typing import Iterable, NamedTuple, Sequence

import numpy as np
from flax import struct

from chemprop_tpu.types import MolGraph

logger = logging.getLogger(__name__)
_fused_fallback_warned = False


def _warn_fused_fallback(max_block: int) -> None:
    """One-time telemetry when a batch loses the fused Pallas fast path: a
    single oversized molecule silently demotes the WHOLE batch to the
    composed (3-4x more HBM traffic) message ops — users should know."""
    global _fused_fallback_warned
    if _fused_fallback_warned:
        return
    _fused_fallback_warned = True
    from chemprop_tpu.ops.fused_message import SPAN_LIMIT

    limit = SPAN_LIMIT[max(SPAN_LIMIT)]
    logger.warning(
        f"a molecule with {max_block} directed edges (> {limit}, ~{limit // 2} bonds) "
        "disables the fused message kernel for its whole batch; message passing "
        "falls back to the composed ops (3-4x more HBM traffic). Consider "
        "isolating oversized molecules into their own batches."
    )


@struct.dataclass
class BatchMolGraph:
    V: np.ndarray  # [N_pad, d_v] float32
    E: np.ndarray  # [E_pad, d_e] float32
    src: np.ndarray  # [E_pad] int32: source node of each directed edge
    dst: np.ndarray  # [E_pad] int32: destination node
    rev: np.ndarray  # [E_pad] int32: index of the reverse directed edge
    batch: np.ndarray  # [N_pad] int32: owning graph id (padding -> n_graphs)
    node_mask: np.ndarray  # [N_pad] bool
    edge_mask: np.ndarray  # [E_pad] bool
    n_graphs: int = struct.field(pytree_node=False)
    # edges sorted ascending by dst (enables the sorted-scatter fast path:
    # XLA's indices_are_sorted and the Pallas sorted-segment kernel)
    edges_sorted: bool = struct.field(pytree_node=False, default=False)
    # every real edge's rev partner and same-dst neighbours lie within the
    # fused message kernel's sliding window (ops/fused_message.py);
    # fused_window is the chunk half-width that suffices (1 = 3-chunk
    # window for graphs <= 129 edges, 2 = 5-chunk for <= 257)
    fused_ok: bool = struct.field(pytree_node=False, default=False)
    fused_window: int = struct.field(pytree_node=False, default=2)
    # the fused iteration+readout backward may stream the M_v cotangent as a
    # node table (ops/fused_message.py:nodes_window_ok) — static, stamped at
    # collate where the check is free numpy
    readout_ok: bool = struct.field(pytree_node=False, default=False)
    # rounded max per-graph edge-block size: the fused kernels statically
    # trim their side-chunk one-hot products to this row band (128 = no
    # trim); quantized to 8 sublanes (a dataset has ONE stable value, so
    # the compiled-shape count stays tiny in practice)
    edge_band: int = struct.field(pytree_node=False, default=128)
    # the mean/sum readout backward may expand the graph-table cotangent
    # with the Pallas window gather (ops/window_gather.py) — static
    # containment stamp over the node->graph id vector
    agg_expand_ok: bool = struct.field(pytree_node=False, default=False)

    def __len__(self) -> int:
        return self.n_graphs

    @property
    def edge_index(self) -> np.ndarray:
        """Reference-compatible ``[2, E]`` view."""
        return np.stack([np.asarray(self.src), np.asarray(self.dst)])


class TrainingBatch(NamedTuple):
    bmg: BatchMolGraph
    V_d: np.ndarray | None  # [N_pad, d_vd]
    X_d: np.ndarray | None  # [B, d_xd]
    Y: np.ndarray | None  # [B, t] (padding rows are NaN -> masked by isfinite)
    w: np.ndarray  # [B, 1] sample weights (padding rows are 0)
    lt_mask: np.ndarray | None  # [B, t] bool
    gt_mask: np.ndarray | None  # [B, t] bool

    @property
    def pad_mask(self) -> np.ndarray:
        """[B] bool: True for real samples."""
        return np.asarray(self.w).reshape(-1) > 0


def pad_to_bucket(n: int, multiple: int = 128, ratio: float = 1.1) -> int:
    """Smallest bucket >= n from a geometric-ish ladder: multiples of
    ``multiple`` up to 4x, then geometric with ``ratio`` rounded to
    ``multiple``. Bounds both padding waste (<~10% — the training step is
    HBM-bandwidth-bound, so padding waste is throughput lost one-for-one)
    and the number of distinct compiled shapes (batches of a fixed graph
    count concentrate on 1-3 edge buckets in practice)."""
    if n <= multiple:
        return multiple
    if n <= 4 * multiple:
        return -(-n // multiple) * multiple
    b = 4 * multiple
    while b < n:
        b = -(-int(b * ratio) // multiple) * multiple
    return b


class PadSpec(NamedTuple):
    n_nodes: int
    n_edges: int
    n_graphs: int

    @classmethod
    def for_graphs(
        cls, mgs: Sequence[MolGraph], n_graphs: int | None = None, bucket: bool = True
    ) -> "PadSpec":
        n_nodes = sum(mg.V.shape[0] for mg in mgs) + 1  # >=1 padding node row
        n_edges = max(1, sum(mg.E.shape[0] for mg in mgs))
        if bucket:
            n_nodes = pad_to_bucket(n_nodes)
            # edges: 128-granular ladder, then aligned up to a 512-multiple —
            # the fused message kernels emit UNROLL(=4)x128-row blocks per
            # grid step, so whole-step edge tables skip the ragged-tail
            # output slice (~0.45 ms/step on the v5e bench batch); aligning
            # after bucketing keeps the ladder fine (<=0.4% extra padding)
            n_edges = -(-pad_to_bucket(n_edges) // 512) * 512
        return cls(n_nodes, n_edges, n_graphs or len(mgs))


def batch_mol_graphs(
    mgs: Sequence[MolGraph],
    pad: PadSpec | None = None,
    sort_edges: bool = True,
    return_perm: bool = False,
) -> BatchMolGraph:
    """Disjoint-union batching with static-shape padding.

    ``sort_edges=True`` (default) reorders the directed-edge table by
    destination node — free at collate time, and it turns every scatter in
    message passing into a sorted-segment reduction (2x+ faster under XLA,
    further with the Pallas kernel). Edge order never affects model output
    (all edge reductions are order-invariant sums).

    ``return_perm=True`` returns ``(bmg, perm)`` where ``perm`` is the edge
    sort permutation, for collate variants that carry per-edge side tables.
    """
    pad = pad or PadSpec.for_graphs(mgs)
    n_real_nodes = sum(mg.V.shape[0] for mg in mgs)
    n_real_edges = sum(mg.E.shape[0] for mg in mgs)
    if n_real_nodes >= pad.n_nodes:
        raise ValueError(
            f"pad.n_nodes={pad.n_nodes} must exceed total node count {n_real_nodes} "
            "(one padding row is required)"
        )
    if n_real_edges > pad.n_edges:
        raise ValueError(f"pad.n_edges={pad.n_edges} < total edge count {n_real_edges}")
    if len(mgs) > pad.n_graphs:
        raise ValueError(f"pad.n_graphs={pad.n_graphs} < batch size {len(mgs)}")

    d_v = mgs[0].V.shape[1]
    d_e = mgs[0].E.shape[1]
    V = np.zeros((pad.n_nodes, d_v), dtype=np.float32)
    E = np.zeros((pad.n_edges, d_e), dtype=np.float32)
    pad_node = pad.n_nodes - 1
    src = np.full(pad.n_edges, pad_node, dtype=np.int32)
    dst = np.full(pad.n_edges, pad_node, dtype=np.int32)
    rev = np.arange(pad.n_edges, dtype=np.int32)  # identity on padding
    batch = np.full(pad.n_nodes, pad.n_graphs, dtype=np.int32)
    node_mask = np.zeros(pad.n_nodes, dtype=bool)
    edge_mask = np.zeros(pad.n_edges, dtype=bool)

    # vectorized disjoint union: per-graph offsets repeated per row, one
    # concatenate per table (the per-molecule Python loop was the input
    # pipeline's hot spot at production batch sizes)
    nvs = np.fromiter((mg.V.shape[0] for mg in mgs), np.int64, len(mgs))
    nes = np.fromiter((mg.E.shape[0] for mg in mgs), np.int64, len(mgs))
    v_offs = np.concatenate([[0], np.cumsum(nvs)[:-1]])
    e_offs = np.concatenate([[0], np.cumsum(nes)[:-1]])
    V[:n_real_nodes] = np.concatenate([mg.V for mg in mgs], 0) if mgs else 0
    if n_real_edges:
        E[:n_real_edges] = np.concatenate(
            [mg.E for mg in mgs if mg.E.shape[0]], 0
        )
        ei = np.concatenate([mg.edge_index for mg in mgs if mg.E.shape[0]], 1)
        e_node_off = np.repeat(v_offs, nes).astype(np.int32)
        src[:n_real_edges] = ei[0] + e_node_off
        dst[:n_real_edges] = ei[1] + e_node_off
        rev[:n_real_edges] = np.concatenate(
            [mg.rev_edge_index for mg in mgs if mg.E.shape[0]]
        ) + np.repeat(e_offs, nes).astype(np.int32)
    batch[:n_real_nodes] = np.repeat(np.arange(len(mgs), dtype=np.int32), nvs)
    node_mask[:n_real_nodes] = True
    edge_mask[:n_real_edges] = True

    perm = np.arange(pad.n_edges, dtype=np.int32)
    if sort_edges:
        # stable sort by destination; padding edges (dst = pad_node, the
        # maximum index) land at the tail. rev is remapped through the
        # permutation so reverse-edge gathers stay correct.
        perm = np.argsort(dst, kind="stable").astype(np.int32)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm), dtype=np.int32)
        E = E[perm]
        src = src[perm]
        dst = dst[perm]
        rev = inv[rev[perm]]
        edge_mask = edge_mask[perm]

    # safety window for the fused message kernel (ops/fused_message.py):
    # in the dst-sorted layout each graph's edges form one contiguous block
    # (nodes are numbered per graph), and every quantity the kernel needs
    # for a real edge — its reverse edge and the in-edges of its source —
    # lives inside that block, so the batch qualifies iff every per-graph
    # edge block fits the kernel's sliding window (SPAN_LIMIT is the
    # authoritative per-window bound). Static flag (recompile-on-flip, like
    # edges_sorted) that essentially never flips within a run.
    from chemprop_tpu.ops.fused_message import SPAN_LIMIT

    max_block = max((mg.E.shape[0] for mg in mgs), default=0)
    max_window = max(SPAN_LIMIT)
    fused_ok = sort_edges and max_block <= SPAN_LIMIT[max_window]
    fused_window = next((w for w in sorted(SPAN_LIMIT) if max_block <= SPAN_LIMIT[w]), max_window)
    if sort_edges and not fused_ok:
        # a batch of ONLY oversized molecules is what the dataloader's
        # isolation deliberately produces — the fallback then costs exactly
        # the molecules that need it, nothing to warn about
        small = [mg for mg in mgs if mg.E.shape[0] <= SPAN_LIMIT[max_window]]
        if small:
            _warn_fused_fallback(max_block)

    readout_ok = False
    if fused_ok:
        from chemprop_tpu.ops.fused_message import nodes_window_ok

        readout_ok = nodes_window_ok(dst, pad.n_nodes, fused_window)
    edge_band = min(128, -(-max(max_block, 1) // 8) * 8)
    from chemprop_tpu.ops.window_gather import expand_window_ok

    agg_expand_ok = expand_window_ok(batch, pad.n_graphs + 1, 2)

    bmg = BatchMolGraph(
        V=V,
        E=E,
        src=src,
        dst=dst,
        rev=rev,
        batch=batch,
        node_mask=node_mask,
        edge_mask=edge_mask,
        n_graphs=pad.n_graphs,
        edges_sorted=sort_edges,
        fused_ok=fused_ok,
        fused_window=fused_window,
        readout_ok=readout_ok,
        edge_band=edge_band,
        agg_expand_ok=agg_expand_ok,
    )
    return (bmg, perm) if return_perm else bmg


def collate_batch(
    data: Iterable, pad: PadSpec | None = None, n_targets: int | None = None
) -> TrainingBatch:
    """Collate ``Datum`` tuples (mg, V_d, x_d, y, weight, lt_mask, gt_mask)
    into a padded :class:`TrainingBatch`. Padding samples get NaN targets and
    zero weight so masked losses ignore them without extra plumbing."""
    mgs, V_ds, x_ds, ys, weights, lt_masks, gt_masks = zip(*data)
    pad = pad or PadSpec.for_graphs(mgs)
    bmg = batch_mol_graphs(mgs, pad)
    b_real, b_pad = len(mgs), pad.n_graphs

    V_d = None
    if V_ds[0] is not None:
        V_d = np.zeros((pad.n_nodes, V_ds[0].shape[1]), dtype=np.float32)
        v0 = 0
        for mg, vd in zip(mgs, V_ds):
            if vd is not None:  # heterogeneous descriptor availability
                V_d[v0 : v0 + vd.shape[0]] = vd
            v0 += mg.V.shape[0]

    X_d = None
    if x_ds[0] is not None:
        X_d = np.zeros((b_pad, len(x_ds[0])), dtype=np.float32)
        X_d[:b_real] = np.array(x_ds, dtype=np.float32)

    Y = None
    if ys[0] is not None:
        t = len(ys[0]) if n_targets is None else n_targets
        Y = np.full((b_pad, t), np.nan, dtype=np.float32)
        Y[:b_real] = np.array(ys, dtype=np.float32)

    w = np.zeros((b_pad, 1), dtype=np.float32)
    w[:b_real, 0] = weights

    lt = gt = None
    if lt_masks[0] is not None:
        lt = np.zeros((b_pad, len(lt_masks[0])), dtype=bool)
        lt[:b_real] = np.array(lt_masks)
    if gt_masks[0] is not None:
        gt = np.zeros((b_pad, len(gt_masks[0])), dtype=bool)
        gt[:b_real] = np.array(gt_masks)

    return TrainingBatch(bmg, V_d, X_d, Y, w, lt, gt)


def collate_multicomponent(
    data: Iterable, pads: Sequence[PadSpec] | None = None
) -> TrainingBatch:
    """Collate rows of per-component Datum lists: one padded BatchMolGraph
    per component (tuple-valued ``bmg``/``V_d`` fields); targets/weights come
    from the first component (cf. reference ``collate.py:196-207``)."""
    rows = list(data)
    n_components = len(rows[0])
    columns = [[row[i] for row in rows] for i in range(n_components)]
    if pads is None:
        pads = [None] * n_components
    tbs = [collate_batch(col, pad) for col, pad in zip(columns, pads)]
    first = tbs[0]
    return TrainingBatch(
        bmg=tuple(tb.bmg for tb in tbs),
        V_d=tuple(tb.V_d for tb in tbs) if any(tb.V_d is not None for tb in tbs) else None,
        X_d=first.X_d,
        Y=first.Y,
        w=first.w,
        lt_mask=first.lt_mask,
        gt_mask=first.gt_mask,
    )


# --------------------------------------------------------------------------
# sharded (multi-chip) batching: stacked self-contained shards
# --------------------------------------------------------------------------


def partition_shards(sizes: Sequence[int], n_shards: int) -> list[list[int]]:
    """Deterministic LPT (longest-processing-time) partition of items into
    ``n_shards`` load-balanced groups, capped at ``ceil(n/n_shards)`` items
    per group so every shard holds the same graph count (static shapes).

    Shard assignment never affects model output: each graph's loss/gradient
    contribution is independent and globally reduced, so balancing purely by
    edge count (the compute cost driver) is safe."""
    sizes = np.asarray(list(sizes), dtype=np.int64)
    cap = -(-len(sizes) // max(n_shards, 1))
    order = np.argsort(-sizes, kind="stable")
    loads = np.zeros(n_shards, dtype=np.int64)
    groups: list[list[int]] = [[] for _ in range(n_shards)]
    for i in order:
        open_shards = [k for k in range(n_shards) if len(groups[k]) < cap]
        k = min(open_shards, key=lambda k: (loads[k], k))
        groups[k].append(int(i))
        loads[k] += sizes[i]
    return [sorted(g) for g in groups]


def _empty_like_bmg(bmg: BatchMolGraph) -> BatchMolGraph:
    """An all-padding shard with the same static shape/flags: every edge
    targets the sacrificial node, every node belongs to the sacrificial
    graph segment."""
    n_nodes, n_edges = bmg.V.shape[0], bmg.E.shape[0]
    return bmg.replace(
        V=np.zeros_like(bmg.V),
        E=np.zeros_like(bmg.E),
        src=np.full(n_edges, n_nodes - 1, dtype=np.int32),
        dst=np.full(n_edges, n_nodes - 1, dtype=np.int32),
        rev=np.arange(n_edges, dtype=np.int32),
        batch=np.full(n_nodes, bmg.n_graphs, dtype=np.int32),
        node_mask=np.zeros(n_nodes, dtype=bool),
        edge_mask=np.zeros(n_edges, dtype=bool),
    )


def _empty_like_batch(tb: TrainingBatch) -> TrainingBatch:
    """All-padding TrainingBatch shaped like ``tb`` (zero weights and NaN
    targets, so it contributes nothing to any globally-reduced loss/metric)."""
    tup = isinstance(tb.bmg, tuple)
    bmg = tuple(_empty_like_bmg(b) for b in tb.bmg) if tup else _empty_like_bmg(tb.bmg)
    V_d = None
    if tb.V_d is not None:
        V_d = (
            tuple(None if v is None else np.zeros_like(v) for v in tb.V_d)
            if tup
            else np.zeros_like(tb.V_d)
        )
    return TrainingBatch(
        bmg=bmg,
        V_d=V_d,
        X_d=None if tb.X_d is None else np.zeros_like(tb.X_d),
        Y=None if tb.Y is None else np.full_like(tb.Y, np.nan),
        w=np.zeros_like(tb.w),
        lt_mask=None if tb.lt_mask is None else np.zeros_like(tb.lt_mask),
        gt_mask=None if tb.gt_mask is None else np.zeros_like(tb.gt_mask),
    )


def _unify_fused_flags(bmgs: Sequence[BatchMolGraph]) -> list[BatchMolGraph]:
    """Static batch flags must agree across shards (one compiled program for
    the whole stacked batch): fused only if every shard qualifies, widest
    window wins."""
    fused_ok = all(b.fused_ok for b in bmgs)
    window = max(b.fused_window for b in bmgs)
    sorted_ = all(b.edges_sorted for b in bmgs)
    readout_ok = all(b.readout_ok for b in bmgs)
    band = max(b.edge_band for b in bmgs)
    agg_ok = all(b.agg_expand_ok for b in bmgs)
    return [
        b.replace(
            fused_ok=fused_ok,
            fused_window=window,
            edges_sorted=sorted_,
            readout_ok=readout_ok,
            edge_band=band,
            agg_expand_ok=agg_ok,
        )
        for b in bmgs
    ]


def stack_shards(shards: Sequence[TrainingBatch]) -> TrainingBatch:
    """Stack per-shard TrainingBatches into one batch with a leading shard
    axis on every array leaf. Sharded over a device mesh's data axis, chip
    ``k`` owns exactly shard ``k`` — whole graphs, no edge block straddles a
    chip (the graph-granularity guarantee the shard_map train step relies
    on). Static metadata (``n_graphs``, fused flags) is per-shard and must
    match across shards."""
    tup = isinstance(shards[0].bmg, tuple)
    if tup:
        unified_cols = [
            _unify_fused_flags([tb.bmg[c] for tb in shards])
            for c in range(len(shards[0].bmg))
        ]
        shards = [
            tb._replace(bmg=tuple(unified_cols[c][k] for c in range(len(tb.bmg))))
            for k, tb in enumerate(shards)
        ]
    else:
        unified = _unify_fused_flags([tb.bmg for tb in shards])
        shards = [tb._replace(bmg=bmg) for tb, bmg in zip(shards, unified)]
    return jax_tree_stack(shards)


def jax_tree_stack(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def collate_sharded(
    data: Iterable,
    n_shards: int,
    pad: PadSpec | None = None,
    n_targets: int | None = None,
) -> TrainingBatch:
    """Collate Datum rows into ``n_shards`` self-contained padded shards
    stacked on a leading axis (see :func:`stack_shards`).

    Graphs are LPT-balanced across shards by edge count; every shard is
    padded to the same :class:`PadSpec` (given per-shard, or the max over
    shards of the auto bucket). Shards left without any graphs (batch
    smaller than the shard count) become all-padding shards that contribute
    zero loss/gradient."""
    rows = list(data)
    if not rows:
        raise ValueError("collate_sharded needs at least one datum")
    multi = isinstance(rows[0], list)
    if multi:
        sizes = [sum(c.mg.E.shape[0] for c in row) for row in rows]
    else:
        sizes = [row[0].E.shape[0] for row in rows]
    groups = partition_shards(sizes, n_shards)
    cap = max(len(g) for g in groups)

    if multi:
        # one unified PadSpec per component (all shards share shapes)
        n_comp = len(rows[0])
        comp_pads = []
        for c in range(n_comp):
            per_group = [
                PadSpec.for_graphs([rows[i][c].mg for i in g], n_graphs=cap)
                for g in groups
                if g
            ]
            comp_pads.append(
                PadSpec(
                    max(p.n_nodes for p in per_group),
                    max(p.n_edges for p in per_group),
                    cap,
                )
            )
    elif pad is None:
        per_group = [
            PadSpec.for_graphs([rows[i][0] for i in g], n_graphs=cap) for g in groups if g
        ]
        pad = PadSpec(
            max(p.n_nodes for p in per_group), max(p.n_edges for p in per_group), cap
        )

    shard_batches: list[TrainingBatch | None] = []
    template: TrainingBatch | None = None
    for g in groups:
        if g:
            if multi:
                tb = collate_multicomponent([rows[i] for i in g], comp_pads)
            else:
                tb = collate_batch([rows[i] for i in g], pad, n_targets)
            template = template or tb
            shard_batches.append(tb)
        else:
            shard_batches.append(None)
    shard_batches = [tb if tb is not None else _empty_like_batch(template) for tb in shard_batches]
    return stack_shards(shard_batches)


class MABTrainingBatch(NamedTuple):
    """Triple-head training batch (cf. reference ``collate.py:113-195``):
    targets/weights/masks are per kind (mol [B,t], atom [N_pad,ta] aligned to
    node rows, bond [E_pad,tb] duplicated onto both directed edges)."""

    bmg: BatchMolGraph
    V_d: np.ndarray | None
    E_d: np.ndarray | None
    X_d: np.ndarray | None
    Ys: tuple  # (mol_Y|None, atom_Y|None, bond_Y|None)
    ws: tuple  # per-kind weights, aligned to the target tables
    lt_masks: tuple
    gt_masks: tuple
    constraints: tuple | None  # (atom_constraints [B,ca]|None, bond [B,cb]|None)
    edge_origin: np.ndarray | None = None  # [E_pad] pre-sort edge index (origin//2 = bond id)


def collate_mol_atom_bond_batch(data: Iterable, pad: PadSpec | None = None) -> MABTrainingBatch:
    """Collate MolAtomBond datum tuples (from MolAtomBondDataset):
    (mg, V_d, E_d, x_d, ys=(mol,atom,bond), weight, lt_masks, gt_masks,
    constraints). Packing is vectorized: per-graph offsets via cumsum, one
    concatenate per table (same scheme as :func:`batch_mol_graphs`)."""
    rows = list(data)
    mgs = [r.mg for r in rows]
    pad = pad or PadSpec.for_graphs(mgs)
    bmg, perm = batch_mol_graphs(mgs, pad, return_perm=True)
    b_real, b_pad = len(rows), pad.n_graphs
    nvs = np.fromiter((mg.V.shape[0] for mg in mgs), np.int64, len(mgs))
    nes = np.fromiter((mg.E.shape[0] for mg in mgs), np.int64, len(mgs))
    n_real_nodes = int(nvs.sum())
    n_real_edges = int(nes.sum())

    def pack_nodes(values, width, fill=0.0):
        out = np.full((pad.n_nodes, width), fill, dtype=np.float32)
        out[:n_real_nodes] = np.concatenate(
            [
                v.reshape(-1, width) if v is not None else np.zeros((nv, width), np.float32)
                for v, nv in zip(values, nvs)
            ]
        )
        return out

    def pack_edges(values, width, fill=0.0):
        """Per-bond tables repeated onto both directed edges, then routed
        through the dst-sort permutation to stay row-aligned with bmg.E."""
        out = np.full((pad.n_edges, width), fill, dtype=np.float32)
        if n_real_edges:
            out[:n_real_edges] = np.repeat(
                np.concatenate(
                    [
                        v.reshape(-1, width)
                        if v is not None
                        else np.zeros((ne // 2, width), np.float32)
                        for v, ne in zip(values, nes)
                    ]
                ),
                2,
                axis=0,
            )
        return out[perm]

    # ---- extra descriptors
    V_d = None
    if rows[0].V_d is not None:
        V_d = pack_nodes([r.V_d for r in rows], rows[0].V_d.shape[1])
    E_d = None
    if rows[0].E_d is not None:
        E_d = pack_edges([r.E_d for r in rows], rows[0].E_d.shape[1])
    X_d = None
    if rows[0].x_d is not None:
        X_d = np.zeros((b_pad, len(rows[0].x_d)), dtype=np.float32)
        X_d[:b_real] = np.array([r.x_d for r in rows], dtype=np.float32)

    # ---- per-kind targets
    mol_ys = [r.ys[0] for r in rows]
    atom_ys = [r.ys[1] for r in rows]
    bond_ys = [r.ys[2] for r in rows]

    mol_Y = None
    if mol_ys[0] is not None:
        t = len(mol_ys[0])
        mol_Y = np.full((b_pad, t), np.nan, dtype=np.float32)
        mol_Y[:b_real] = np.array(mol_ys, dtype=np.float32)
    atom_Y = None
    if atom_ys[0] is not None:
        atom_Y = pack_nodes(atom_ys, atom_ys[0].shape[1], fill=np.nan)
    bond_Y = None
    if bond_ys[0] is not None:
        t = bond_ys[0].shape[1] if bond_ys[0].ndim > 1 else 1
        bond_Y = pack_edges(bond_ys, t, fill=np.nan)

    # ---- per-kind bounded-loss masks (cf. reference ``collate.py:175-184``;
    # datapoint lt/gt (mol) + atom_lt/gt + bond_lt/gt, aligned like targets)
    def pack_mask_triple(triples):
        mol_m = atom_m = bond_m = None
        mols = [tr[0] for tr in triples]
        atoms = [tr[1] for tr in triples]
        bonds = [tr[2] for tr in triples]
        if mols[0] is not None:
            mol_m = np.zeros((b_pad, len(mols[0])), dtype=bool)
            mol_m[:b_real] = np.array(mols)
        if atoms[0] is not None:
            atom_m = pack_nodes(atoms, atoms[0].shape[1]).astype(bool)
        if bonds[0] is not None:
            t = bonds[0].shape[1] if bonds[0].ndim > 1 else 1
            bond_m = pack_edges(bonds, t).astype(bool)
        return (mol_m, atom_m, bond_m)

    has_masks = hasattr(rows[0], "lt_masks")
    lt_masks = pack_mask_triple([r.lt_masks for r in rows]) if has_masks else (None, None, None)
    gt_masks = pack_mask_triple([r.gt_masks for r in rows]) if has_masks else (None, None, None)

    # ---- per-kind weights (datapoint weight broadcast to its atoms/bonds)
    w_dp = np.array([r.weight for r in rows], dtype=np.float32)
    w_mol = np.zeros((b_pad, 1), dtype=np.float32)
    w_mol[:b_real, 0] = w_dp
    w_atom = np.zeros((pad.n_nodes, 1), dtype=np.float32)
    w_atom[:n_real_nodes, 0] = np.repeat(w_dp, nvs)
    w_bond = np.zeros((pad.n_edges, 1), dtype=np.float32)
    w_bond[:n_real_edges, 0] = np.repeat(w_dp, nes)
    w_bond = w_bond[perm]
    # bond losses count each bond once: zero out non-primary directions
    primary = (np.arange(pad.n_edges) < np.asarray(bmg.rev)) & np.asarray(bmg.edge_mask)
    w_bond = w_bond * primary[:, None]

    # ---- constraints
    atom_c = bond_c = None
    if rows[0].constraints is not None:
        ac = [r.constraints[0] for r in rows]
        bc = [r.constraints[1] for r in rows]
        if ac[0] is not None:
            atom_c = np.zeros((b_pad, len(ac[0])), dtype=np.float32)
            atom_c[:b_real] = np.array(ac, dtype=np.float32)
        if bc[0] is not None:
            bond_c = np.zeros((b_pad, len(bc[0])), dtype=np.float32)
            bond_c[:b_real] = np.array(bc, dtype=np.float32)

    return MABTrainingBatch(
        bmg=bmg,
        V_d=V_d,
        E_d=E_d,
        X_d=X_d,
        Ys=(mol_Y, atom_Y, bond_Y),
        ws=(w_mol, w_atom, w_bond),
        lt_masks=lt_masks,
        gt_masks=gt_masks,
        constraints=(atom_c, bond_c) if (atom_c is not None or bond_c is not None) else None,
        edge_origin=np.asarray(perm),
    )
