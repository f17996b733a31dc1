"""Graph gathers with scatter-free backward passes.

In D-MPNN message passing the forward gathers are cheap but their autodiff
transposes are XLA scatter-adds with *unsorted* indices — the dominant cost
of the backward pass. Both transposes can be rewritten using the directed
edge structure (every edge e has a reverse edge rev[e] with
``src[e] == dst[rev[e]]`` and ``rev[rev] == identity``):

* transpose of ``M[src]``   = scatter-add by src
                            = sorted-segment-sum by dst of ``g[rev]``
* transpose of ``H[rev]``   = scatter-add by rev
                            = gather by rev (an involution)

so every backward reduction is either a permutation gather or a *sorted*
segment sum — no generic scatter anywhere in the training step.
"""

from __future__ import annotations

import jax

from chemprop_tpu.ops.segment import segment_sum


@jax.custom_vjp
def gather_src(M: jax.Array, rev: jax.Array, dst: jax.Array) -> jax.Array:
    """``M[src]`` for a node table M, computed as ``M[dst][rev]`` (valid since
    ``src == dst∘rev``): with edges sorted by dst the first gather streams
    node rows in order (near-bandwidth) and only the rev permutation is
    irregular — strictly cheaper than the random gather by src. Backward uses
    the same identity."""
    return M[dst][rev]


def _gather_src_fwd(M, rev, dst):
    return M[dst][rev], (M.shape[0], rev, dst)


def _gather_src_bwd(res, g):
    n_nodes, rev, dst = res
    dM = segment_sum(g[rev], dst, n_nodes, sorted=True)
    return dM.astype(g.dtype), None, None


gather_src.defvjp(_gather_src_fwd, _gather_src_bwd)


@jax.custom_vjp
def gather_dst(M: jax.Array, dst: jax.Array) -> jax.Array:
    """``M[dst]`` for a node table M and edge ids ``dst`` sorted ascending.

    The forward gather streams node rows in order (near-bandwidth). XLA's
    autodiff transpose of a plain ``M[dst]`` is a generic scatter-add (the
    single most expensive op in the backward pass, ~kCustom scatter fusion);
    with sorted ids it is exactly a sorted segment-sum, which dispatches to
    the Pallas one-hot-matmul kernel on TPU."""
    return M[dst]


def _gather_dst_fwd(M, dst):
    return M[dst], (M.shape[0], dst)


def _gather_dst_bwd(res, g):
    n_nodes, dst = res
    dM = segment_sum(g, dst, n_nodes, sorted=True)
    return dM.astype(g.dtype), None


gather_dst.defvjp(_gather_dst_fwd, _gather_dst_bwd)


@jax.custom_vjp
def gather_rev(H: jax.Array, rev: jax.Array) -> jax.Array:
    """``H[rev]`` where rev is an involution; backward is also ``[rev]``."""
    return H[rev]


def _gather_rev_fwd(H, rev):
    return H[rev], rev


def _gather_rev_bwd(rev, g):
    return g[rev], None


gather_rev.defvjp(_gather_rev_fwd, _gather_rev_bwd)
