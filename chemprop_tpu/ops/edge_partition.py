"""Edge partitioning: D-MPNN message passing for a graph sharded ACROSS chips.

The default multi-chip path places whole graphs per chip
(``parallel/shard_train.py``) — no molecule ever straddles a shard. This
module supplies the missing capability for graphs too large for one shard
(giant polymers/proteins, or future pods where per-chip batch slices are
smaller than one molecule): the batched edge table is cut into contiguous
dst-sorted slices, one per chip, and each message-passing step exchanges
only BOUNDARY state with neighbor chips (``jax.lax.ppermute`` over ICI)
while the bulk segment-sum/gather math stays local — the graph analog of
ring-attention halo exchange (BASELINE.json north star; SURVEY.md §5.7).

Per message op, chip ``s`` (owning edges ``[cut_s, cut_{s+1})`` and nodes
``[lo_s, lo_{s+1})``):

1. local segment-sum of ``H`` over the EXTENDED node layout
   ``[left-halo(HN) | owned(N) | right-halo(HN)]`` — contributions to
   nodes owned by a neighbor land in the halo rows;
2. halo rows ``ppermute`` to the owning neighbor and are added in — every
   owned node accumulator is now exact;
3. finalized boundary rows ``ppermute`` back so each chip holds
   ``[left-halo | owned | right-halo]`` node accumulators for the ``src``
   gather (src locality: molecular graphs have bounded bandwidth);
4. the first/last ``HE`` rows of ``H`` ``ppermute`` sideways so reverse
   edges that cross the cut resolve locally.

Total traffic per chip per depth: ``4·HN·d + 2·HE·d`` values — independent
of graph size (vs ``all_gather``'s ``E·d``). Halo widths are VALIDATED at
partition time against the actual src/rev spans and padded to lane
multiples; ``partition_edges`` raises if a graph's bandwidth exceeds the
requested halo (no silent wrong answers).

Reference analog: none — the reference holds whole graphs per rank
(``chemprop/nn/message_passing/base.py:196-212`` on one device).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from chemprop_tpu.ops.segment import segment_sum


class EdgePartitionPlan(NamedTuple):
    """Host-built static partition of ONE dst-sorted edge table.

    All index arrays are stacked ``[n_shards, P]`` and pre-localized into
    the extended layouts above; padding edges carry ``edge_mask=False`` and
    point at a sacrificial row. ``n_owned``/``n_edges`` are the per-shard
    REAL counts — the dynamic boundary-slice positions.
    """

    n_shards: int
    P: int  # padded edges per shard
    N: int  # padded owned nodes per shard
    HN: int  # node halo rows
    HE: int  # edge halo rows
    src_ext: jax.Array  # [S, P] int32, into [HN | N | HN] (+1 sacrificial)
    dst_ext: jax.Array  # [S, P] int32, same layout
    rev_ext: jax.Array  # [S, P] int32, into [HE | P | HE]
    edge_mask: jax.Array  # [S, P] bool
    node_lo: jax.Array  # [S] global id of first owned node
    n_owned: jax.Array  # [S] int32 real owned node count
    n_edges: jax.Array  # [S] int32 real edge count


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def partition_edges(
    src: np.ndarray,
    dst: np.ndarray,
    rev: np.ndarray,
    n_nodes: int,
    n_shards: int,
    min_halo_nodes: int = 8,
    min_halo_edges: int = 8,
    min_owned_nodes: int = 1,
    min_shard_edges: int = 1,
) -> EdgePartitionPlan:
    """Cut a dst-sorted edge table into ``n_shards`` contiguous slices.

    Node ownership follows the dst at each cut (the straddled node belongs
    to the right shard; its left-shard contributions travel through the
    halo). Halo widths are computed from the ACTUAL src/rev spans of this
    graph and rounded up to lane multiples; a graph whose bandwidth exceeds
    its neighbors' boundary ranges raises a ``ValueError``.
    """
    E = len(dst)
    if E == 0 or n_shards < 1:
        raise ValueError("partition_edges needs a non-empty edge table")
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    rev = np.asarray(rev, np.int64)
    if not (np.diff(dst) >= 0).all():
        raise ValueError("edge table must be dst-sorted")

    cuts = [round(s * E / n_shards) for s in range(n_shards + 1)]
    node_lo = np.array([dst[c] if c < E else n_nodes for c in cuts], np.int64)
    owned = node_lo[1:] - node_lo[:-1]
    n_edges = np.diff(cuts)
    # min_owned_nodes/min_shard_edges force COMMON padded dims across a
    # dataset of differently-sized molecules (one compiled program)
    N = _round_up(max(min_owned_nodes, int(owned.max())), 8)
    P = _round_up(max(min_shard_edges, int(n_edges.max())), 128)

    # required halos, measured per shard from the real spans
    need_hn = 1  # dst spills at most onto the straddled boundary node
    need_he = 1
    for s in range(n_shards):
        a, b = cuts[s], cuts[s + 1]
        if a == b:
            continue
        lo, hi = node_lo[s], node_lo[s + 1]
        need_hn = max(
            need_hn,
            int(np.maximum(lo - src[a:b], 0).max(initial=0)),
            int(np.maximum(src[a:b] - (hi - 1), 0).max(initial=0)),
            int(np.maximum(dst[a:b] - (hi - 1), 0).max(initial=0)),
        )
        need_he = max(
            need_he,
            int(np.maximum(a - rev[a:b], 0).max(initial=0)),
            int(np.maximum(rev[a:b] - (b - 1), 0).max(initial=0)),
        )
    HN = _round_up(max(need_hn, min_halo_nodes), 8)
    HE = _round_up(max(need_he, min_halo_edges), 8)
    # a shard's halo is served by its NEIGHBOR's real rows
    if n_shards > 1 and HN > int(owned.min()):
        raise ValueError(
            f"node halo {HN} exceeds a shard's owned range ({int(owned.min())}): "
            "graph bandwidth too large for this shard count — use fewer shards"
        )
    if n_shards > 1 and HE > int(n_edges.min()):
        raise ValueError(
            f"edge halo {HE} exceeds a shard's edge count ({int(n_edges.min())}): "
            "reverse-edge span too large for this shard count — use fewer shards"
        )

    S = n_shards
    sac_n = N + 2 * HN  # sacrificial node row
    sac_e = P + 2 * HE
    src_ext = np.full((S, P), sac_n, np.int32)
    dst_ext = np.full((S, P), sac_n, np.int32)
    rev_ext = np.full((S, P), sac_e, np.int32)
    mask = np.zeros((S, P), bool)

    def loc_node(nodes: np.ndarray, s: int) -> np.ndarray:
        lo, hi = node_lo[s], node_lo[s + 1]
        # [left-halo | owned | right-halo]: halo rows count from the boundary
        out = np.where(
            nodes < lo,
            HN - (lo - nodes),
            np.where(nodes < hi, HN + (nodes - lo), HN + N + (nodes - hi)),
        )
        return out.astype(np.int32)

    for s in range(S):
        a, b = cuts[s], cuts[s + 1]
        k = b - a
        if k == 0:
            continue
        src_ext[s, :k] = loc_node(src[a:b], s)
        dst_ext[s, :k] = loc_node(dst[a:b], s)
        rev_ext[s, :k] = np.where(
            rev[a:b] < a,
            HE - (a - rev[a:b]),
            np.where(rev[a:b] < b, HE + (rev[a:b] - a), HE + P + (rev[a:b] - b)),
        ).astype(np.int32)
        mask[s, :k] = True
    return EdgePartitionPlan(
        n_shards=S,
        P=P,
        N=N,
        HN=HN,
        HE=HE,
        src_ext=jnp.asarray(src_ext),
        dst_ext=jnp.asarray(dst_ext),
        rev_ext=jnp.asarray(rev_ext),
        edge_mask=jnp.asarray(mask),
        node_lo=jnp.asarray(node_lo[:-1].astype(np.int32)),
        n_owned=jnp.asarray(owned.astype(np.int32)),
        n_edges=jnp.asarray(n_edges.astype(np.int32)),
    )


def shard_args(plan: EdgePartitionPlan):
    """The per-shard arrays of the plan, ready to pass through ``shard_map``
    with ``P('shards')`` over the leading axis."""
    return (
        plan.src_ext,
        plan.dst_ext,
        plan.rev_ext,
        plan.edge_mask,
        plan.n_owned,
        plan.n_edges,
    )


def _shift(x: jax.Array, direction: int, axis_name: str, n: int) -> jax.Array:
    """ppermute by one shard (+1 = toward higher shard ids); un-sourced
    shards receive zeros (graph boundary)."""
    if n == 1:
        return jnp.zeros_like(x)
    perm = [(s, s + direction) for s in range(n) if 0 <= s + direction < n]
    return jax.lax.ppermute(x, axis_name, perm)


def _tail(x: jax.Array, count: jax.Array, h: int) -> jax.Array:
    """Rows ``[count - h, count)`` of x (dynamic position, static size)."""
    return jax.lax.dynamic_slice_in_dim(x, count - h, h, axis=0)


def halo_node_accumulators(
    H: jax.Array,
    dst_ext: jax.Array,
    edge_mask: jax.Array,
    n_owned: jax.Array,
    N: int,
    HN: int,
    axis_name: str,
    n_shards: int,
    with_halo: bool,
    single_phase: bool = False,
) -> jax.Array:
    """Exact per-node sums ``Σ_{e: dst_e = v} H_e`` for the owned range
    (steps 1-2 of the module doc), optionally re-sharing finalized boundary
    rows so the result carries ``[HN | owned-layout | HN]`` halos (step 3).

    ``single_phase=True`` collapses steps 2+3 into ONE concurrent exchange
    phase: instead of (exchange partial halos → add → exchange finalized
    boundary rows), every shard sends its halo partials AND its boundary
    OWN partials in the same phase, and each receiver finalizes its halo
    copies locally (``left_halo = neighbor's tail partial + my ext halo
    rows``). All four ``ppermute``s then depend only on the local
    scatter-add — halving the collective depth on the critical path and
    letting the scheduler run them as one overlapped phase. EXACT only
    when every shard owns ≥ 2·HN nodes (otherwise a boundary row's
    finalized value mixes contributions from two hops away — the
    partition-time ``single_phase`` flag guards this)."""
    Hm = jnp.where(edge_mask[:, None], H, 0)
    ext = segment_sum(Hm, dst_ext, N + 2 * HN + 1, sorted=False)[:-1]  # drop sacrificial
    own = ext[HN : HN + N]
    # my right-halo rows hold contributions to the right neighbor's FIRST
    # owned nodes; my left-halo rows to the left neighbor's LAST owned nodes
    if with_halo and single_phase:
        from_left = _shift(ext[HN + N :], +1, axis_name, n_shards)
        from_right = _shift(ext[:HN], -1, axis_name, n_shards)
        # boundary OWN partials travel in the SAME phase; the receiver adds
        # its matching ext halo rows to finalize (owned >= 2*HN: the head
        # add and the tail region cannot overlap)
        tail_partial = _shift(_tail(own, n_owned, HN), +1, axis_name, n_shards)
        head_partial = _shift(own[:HN], -1, axis_name, n_shards)
        own = own.at[:HN].add(from_left)
        own = jax.lax.dynamic_update_slice_in_dim(
            own, _tail(own, n_owned, HN) + from_right, n_owned - HN, axis=0
        )
        left_halo = tail_partial + ext[:HN]
        right_halo = head_partial + ext[HN + N :]
        return jnp.concatenate([left_halo, own, right_halo], axis=0)
    from_left = _shift(ext[HN + N :], +1, axis_name, n_shards)  # my head rows
    from_right = _shift(ext[:HN], -1, axis_name, n_shards)  # my tail rows
    own = own.at[:HN].add(from_left)
    own = jax.lax.dynamic_update_slice_in_dim(
        own, _tail(own, n_owned, HN) + from_right, n_owned - HN, axis=0
    )
    if not with_halo:
        return own
    # step 3: finalized boundary rows for the neighbors' src gathers
    left_halo = _shift(_tail(own, n_owned, HN), +1, axis_name, n_shards)
    right_halo = _shift(own[:HN], -1, axis_name, n_shards)
    return jnp.concatenate([left_halo, own, right_halo], axis=0)


def halo_message(
    H: jax.Array,
    src_ext: jax.Array,
    dst_ext: jax.Array,
    rev_ext: jax.Array,
    edge_mask: jax.Array,
    n_owned: jax.Array,
    n_edges: jax.Array,
    N: int,
    HN: int,
    HE: int,
    axis_name: str,
    n_shards: int,
    single_phase: bool = False,
) -> jax.Array:
    """The D-MPNN message ``M[e] = Σ_{k: dst_k = src_e} H_k − H_rev(e)``
    for one chip's edge slice, with boundary exchange (module doc steps 1-4).

    Call inside ``shard_map``; per-shard index args come from
    :func:`shard_args`. ``H`` is the ``[P, d]`` local edge-hidden slice.

    The sideways H ``ppermute``s (step 4) are issued FIRST — they depend
    only on ``H``, so the scheduler overlaps them with the local
    scatter-add inside :func:`halo_node_accumulators`; with
    ``single_phase=True`` the accumulator exchange is additionally one
    concurrent phase instead of two sequential ones (SURVEY §5.7:
    exchange overlapped with local scatter-add).
    """
    Hm = jnp.where(edge_mask[:, None], H, 0)
    # sideways H halo for cross-cut reverse edges — independent of the
    # scatter-add below, so these collectives overlap it
    left_H = _shift(_tail(Hm, n_edges, HE), +1, axis_name, n_shards)
    right_H = _shift(Hm[:HE], -1, axis_name, n_shards)
    Mn_full = halo_node_accumulators(
        Hm, dst_ext, edge_mask, n_owned, N, HN, axis_name, n_shards,
        with_halo=True, single_phase=single_phase,
    )
    Mn_pad = jnp.concatenate([Mn_full, jnp.zeros((1, H.shape[1]), Mn_full.dtype)])
    Hh = jnp.concatenate([left_H, Hm, right_H, jnp.zeros((1, H.shape[1]), Hm.dtype)])
    M = Mn_pad[src_ext] - Hh[rev_ext]
    return jnp.where(edge_mask[:, None], M, 0).astype(H.dtype)
