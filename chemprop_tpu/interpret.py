"""Myerson-value atom attributions (cf. reference
``chemprop/callbacks/interpret.py:25-164``, which delegates the math to the
external ``myerson`` package).

The Myerson value is the Shapley value of the graph-restricted game: the
worth of an atom subset ``S`` is the sum of the model's predictions over the
connected components of the subgraph induced by ``S``,

    v(S) = sum_{C in components(S)} f(C),        v({}) = 0,

and atom ``i``'s attribution is its Shapley value under ``v``. Exact
computation enumerates all ``2^n`` subsets (used for molecules with at most
``sampling_threshold`` atoms, like the reference); larger molecules use
permutation sampling of marginal contributions.

TPU-native design: subset/component bookkeeping is integer bitmask work on
the host, while every distinct connected subgraph is evaluated by the model
in large padded batches of a single static shape — one XLA program serves
the whole explanation regardless of how many thousands of subgraphs it
touches.
"""

from __future__ import annotations

from math import lgamma
from typing import Sequence

import numpy as np

from chemprop_tpu.data.collate import PadSpec, batch_mol_graphs, pad_to_bucket
from chemprop_tpu.types import MolGraph


def _neighbor_masks(mg: MolGraph) -> list[int]:
    n = mg.V.shape[0]
    nb = [0] * n
    src, dst = mg.edge_index
    for u, v in zip(src.tolist(), dst.tolist()):
        nb[u] |= 1 << v
        nb[v] |= 1 << u
    return nb


def _component(members: int, start_bit: int, nb: Sequence[int]) -> int:
    """Connected component of ``start_bit`` within the ``members`` bitmask."""
    comp = 1 << start_bit
    frontier = comp
    while frontier:
        grow = 0
        f = frontier
        while f:
            b = f & -f
            grow |= nb[b.bit_length() - 1]
            f ^= b
        new = grow & members & ~comp
        comp |= new
        frontier = new
    return comp


def _submolgraph(mg: MolGraph, mask: int) -> MolGraph:
    atoms = [i for i in range(mg.V.shape[0]) if mask >> i & 1]
    relabel = {a: k for k, a in enumerate(atoms)}
    src, dst = mg.edge_index
    keep = [
        e
        for e in range(src.shape[0])
        if (mask >> int(src[e]) & 1) and (mask >> int(dst[e]) & 1)
    ]
    new_idx = {e: k for k, e in enumerate(keep)}
    V = mg.V[atoms]
    E = mg.E[keep] if keep else np.zeros((0, mg.E.shape[1]), dtype=mg.E.dtype)
    edge_index = np.array(
        [[relabel[int(src[e])] for e in keep], [relabel[int(dst[e])] for e in keep]],
        dtype=np.int32,
    ).reshape(2, -1)
    rev = np.array([new_idx[int(mg.rev_edge_index[e])] for e in keep], dtype=np.int32)
    return MolGraph(V=V, E=E, edge_index=edge_index, rev_edge_index=rev)


class MyersonExplainer:
    """Computes per-atom Myerson attributions for an :class:`MPNN`.

    Restricted (like the reference) to single-output-per-task heads whose
    ``__call__`` yields the quantity to attribute directly — regression
    means and binary-classification probabilities."""

    def __init__(
        self,
        model,
        variables: dict,
        sampling_threshold: int = 20,
        n_samples: int = 200,
        graphs_per_batch: int = 256,
        seed: int = 0,
    ):
        self.model = model
        self.variables = variables
        self.sampling_threshold = sampling_threshold
        self.n_samples = n_samples
        self.graphs_per_batch = graphs_per_batch
        self.seed = seed
        self._apply = None  # jitted per (pad shape) lazily

    # ------------------------------------------------------------- model eval
    def _eval_masks(self, mg: MolGraph, masks: list[int]) -> np.ndarray:
        """Model outputs ``[len(masks), t]`` for the induced subgraphs."""
        import jax

        if self._apply is None:
            self._apply = jax.jit(
                lambda v, bmg: self.model.apply(v, bmg, None, None, is_training=False)
            )
        n = mg.V.shape[0]
        B = min(self.graphs_per_batch, max(1, len(masks)))
        pad = PadSpec(
            pad_to_bucket(B * n + 1), pad_to_bucket(max(1, B * mg.E.shape[0])), B
        )
        outs = []
        for c0 in range(0, len(masks), B):
            chunk = masks[c0 : c0 + B]
            mgs = [_submolgraph(mg, m) for m in chunk]
            bmg = batch_mol_graphs(mgs, pad)
            out = np.asarray(self._apply(self.variables, bmg))
            outs.append(out[: len(chunk)])
        out = np.concatenate(outs, axis=0) if outs else np.zeros((0, 1))
        if out.ndim == 3:  # (mean, extra-head) outputs: attribute the mean
            out = out[..., 0]
        return out

    # ------------------------------------------------------------------ exact
    def _explain_exact(self, mg: MolGraph) -> np.ndarray:
        n = mg.V.shape[0]
        nb = _neighbor_masks(mg)
        size = 1 << n

        comp_of = np.zeros(size, dtype=np.int64)  # subset -> component id
        rest = np.zeros(size, dtype=np.int64)  # subset minus that component
        comp_ids: dict[int, int] = {}
        for S in range(1, size):
            j = (S & -S).bit_length() - 1
            C = _component(S, j, nb)
            cid = comp_ids.setdefault(C, len(comp_ids))
            comp_of[S] = cid
            rest[S] = S & ~C

        f_vals = self._eval_masks(mg, list(comp_ids.keys()))  # [n_comps, t]
        t = f_vals.shape[1]

        # v(S) via component DP, vectorized by popcount level (rest always
        # has strictly fewer bits than S, so levels resolve in order)
        vhat = np.zeros((size, t))
        all_masks = np.arange(size, dtype=np.int64)
        pops = np.array([int(m).bit_count() for m in range(size)], dtype=np.int64)
        for k in range(1, n + 1):
            Sk = all_masks[pops == k]
            vhat[Sk] = f_vals[comp_of[Sk]] + vhat[rest[Sk]]

        # Shapley weights w(s) = s! (n-s-1)! / n!
        logw = np.array(
            [lgamma(s + 1) + lgamma(n - s) - lgamma(n + 1) for s in range(n)]
        )
        w = np.exp(logw)

        phi = np.zeros((n, t))
        for i in range(n):
            bit = 1 << i
            without = all_masks[(all_masks & bit) == 0]
            marg = vhat[without | bit] - vhat[without]
            phi[i] = (w[pops[without]][:, None] * marg).sum(axis=0)
        return phi

    # --------------------------------------------------------------- sampling
    def _explain_sampling(self, mg: MolGraph) -> np.ndarray:
        n = mg.V.shape[0]
        nb = _neighbor_masks(mg)
        rng = np.random.default_rng(self.seed)
        perms = [rng.permutation(n) for _ in range(self.n_samples)]

        # pass 1: record, for every permutation step, the merged component
        # and the components it absorbs — all masks are known without f
        comp_ids: dict[int, int] = {}
        steps = []  # per perm: list of (atom, new_cid, [absorbed cids])
        for perm in perms:
            comps: list[int] = []  # current component masks
            rec = []
            for a in perm:
                bit = 1 << int(a)
                adj = [c for c in comps if c & nb[a]]
                new = bit
                for c in adj:
                    new |= c
                comps = [c for c in comps if not (c & nb[a])] + [new]
                rec.append(
                    (
                        int(a),
                        comp_ids.setdefault(new, len(comp_ids)),
                        [comp_ids.setdefault(c, len(comp_ids)) for c in adj],
                    )
                )
            steps.append(rec)

        f_vals = self._eval_masks(mg, list(comp_ids.keys()))
        t = f_vals.shape[1]
        phi = np.zeros((n, t))
        for rec in steps:
            for a, new_cid, adj_cids in rec:
                marg = f_vals[new_cid] - sum((f_vals[c] for c in adj_cids), np.zeros(t))
                phi[a] += marg
        return phi / self.n_samples

    # ------------------------------------------------------------------ entry
    def explain(self, mg: MolGraph) -> np.ndarray:
        """Myerson values ``[n_atoms, t]`` for one molecule's graph."""
        n = mg.V.shape[0]
        if n == 0:
            return np.zeros((0, 1))
        if n <= self.sampling_threshold:
            return self._explain_exact(mg)
        return self._explain_sampling(mg)
