"""Mol/Atom/Bond (MAB) message passing: the D-MPNN loop returning both vertex
and edge embeddings with separate finalize paths (cf. reference
``chemprop/nn/message_passing/mol_atom_bond.py:16-388``):

    H_v = dropout(tau(W_vo([V ; M_v])))  [; W_vd with descriptors]
    H_e = dropout(tau(W_eo([E ; H])))    [; W_ed with descriptors]

Either output can be suppressed (``return_vertex/edge_embeddings``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from chemprop_tpu.conf import DEFAULT_HIDDEN_DIM
from chemprop_tpu.data.collate import BatchMolGraph
from chemprop_tpu.nn.message_passing.base import PaddedDense, _gather_rev, _gather_src
from chemprop_tpu.ops.fused_message import (
    fused_depth_loop,
    fused_first_iter,
    fused_message,
    fused_message_iter,
)
from chemprop_tpu.ops.gather import gather_dst
from chemprop_tpu.nn.transforms import GraphTransform, ScaleTransform
from chemprop_tpu.nn.utils import get_activation_function
from chemprop_tpu.ops.segment import segment_sum


class _MABMessagePassingBase(nn.Module):
    d_h: int = DEFAULT_HIDDEN_DIM
    bias: bool = False
    depth: int = 3
    dropout: float = 0.0
    activation: str = "relu"
    undirected: bool = False
    d_vd: int | None = None
    d_ed: int | None = None
    return_vertex_embeddings: bool = True
    return_edge_embeddings: bool = True
    V_d_transform: ScaleTransform | None = None
    E_d_transform: ScaleTransform | None = None
    graph_transform: GraphTransform | None = None
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def output_dims(self) -> tuple[int | None, int | None]:
        d_v_out = (
            (self.d_h + self.d_vd if self.d_vd else self.d_h)
            if self.return_vertex_embeddings
            else None
        )
        d_e_out = (
            (self.d_h + self.d_ed if self.d_ed else self.d_h)
            if self.return_edge_embeddings
            else None
        )
        return d_v_out, d_e_out

    # MABBond keeps the depth loop's edge tables lane-aligned (PaddedDense
    # zero-pads to a 128-multiple at apply time; exact zeros, same params)
    _pad_hidden = False

    def setup(self):
        dt = self.compute_dtype
        self._dp = -(-self.d_h // 128) * 128 if self._pad_hidden else self.d_h
        self.W_i = PaddedDense(
            self.d_h, pad_to=self._dp, use_bias=self.bias, name="W_i", dtype=dt
        )
        self.W_h = PaddedDense(
            self.d_h,
            pad_to=self._dp,
            use_bias=self.bias,
            in_features=self.d_h if self._pad_hidden else None,
            name="W_h",
            dtype=dt,
        )
        if self.return_vertex_embeddings:
            self.W_vo = nn.Dense(self.d_h, use_bias=True, name="W_vo", dtype=dt)
            if self.d_vd:
                self.W_vd = nn.Dense(self.d_h + self.d_vd, use_bias=True, name="W_vd", dtype=dt)
        if self.return_edge_embeddings:
            self.W_eo = nn.Dense(self.d_h, use_bias=True, name="W_eo", dtype=dt)
            if self.d_ed:
                self.W_ed = nn.Dense(self.d_h + self.d_ed, use_bias=True, name="W_ed", dtype=dt)
        self.drop = nn.Dropout(self.dropout)
        self.tau = get_activation_function(self.activation)

    def _initialize(self, bmg):
        raise NotImplementedError

    def _message(self, H, bmg):
        raise NotImplementedError

    def _fused_iter_ok(self, bmg) -> bool:
        """Whether the whole-iteration fused kernel applies (bond MP only)."""
        return False

    def __call__(
        self,
        bmg: BatchMolGraph,
        V_d: jax.Array | None = None,
        E_d: jax.Array | None = None,
        is_training: bool = True,
        mc_dropout: bool = False,
    ) -> tuple[jax.Array | None, jax.Array | None]:
        # mc_dropout: dropout layers active, eval-only transforms stay eval
        # (Monte-Carlo dropout; cf. reference uncertainty/estimator.py:605-636)
        drop_on = is_training or mc_dropout
        if self.graph_transform is not None:
            bmg = self.graph_transform(bmg, is_training)
        H_0 = self._initialize(bmg).astype(self.compute_dtype)
        # per-layer activation taps for the reference parity gate (no-ops
        # unless the caller makes the 'intermediates' collection mutable)
        self.sow("intermediates", "H_0", H_0)
        H = self.tau(H_0)
        # bond MP with ReLU on sorted fused-safe batches: one Pallas pass per
        # depth iteration (message + W_h GEMM + residual + ReLU); see
        # nn/message_passing/base.py
        # depth > 1: see base.py — avoids param-structure divergence at depth=1
        fuse_iter = self.depth > 1 and self._fused_iter_ok(bmg)
        if fuse_iter:
            W_h, b_h = self.W_h(weights_only=True, in_width=self._dp)
        import os as _os

        # default OFF: measured on v5e r3, the whole-loop custom VJP with
        # in-kernel dH0 accumulation is ~0.1 ms/step SLOWER than the
        # per-iteration VJPs (6.63 vs 6.53 ms on the 123k-edge bench) — the
        # extra streamed accumulator input costs more inside the critical
        # kernel than XLA's well-overlapped add fusions cost outside it
        depth_loop_on = _os.environ.get("CHEMPROP_TPU_DEPTH_LOOP", "0") == "1"
        if fuse_iter and depth_loop_on and not (drop_on and self.dropout > 0):
            # the WHOLE depth loop as one custom-VJP op — hand-written
            # reverse walk with in-kernel dH0 accumulation (per-iteration
            # activation taps are not sown on this path)
            H = fused_depth_loop(
                H_0, W_h, b_h, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0],
                bmg.fused_window, self.depth,
            )
            self.sow("intermediates", "H", H)
        else:
            first = True
            for _ in range(1, self.depth):
                if self.undirected:
                    H = (H + _gather_rev(H, bmg)) / 2
                if fuse_iter:
                    if first:
                        # relu(H_0) streams through the kernel un-materialized
                        H = fused_first_iter(
                            H_0, W_h, b_h, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0], bmg.fused_window
                        )
                    else:
                        H = fused_message_iter(
                            H, H_0, W_h, b_h, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0], bmg.fused_window
                        )
                    H = self.drop(H, deterministic=not drop_on)
                else:
                    M = self._message(H, bmg)
                    H = self.drop(self.tau(H_0 + self.W_h(M)), deterministic=not drop_on)
                first = False
                self.sow("intermediates", "H", H)

        H_v = H_e = None
        if self.return_vertex_embeddings:
            M_v = segment_sum(H, bmg.dst, bmg.V.shape[0], sorted=bmg.edges_sorted)[
                :, : self.d_h
            ]
            self.sow("intermediates", "M_v", M_v)
            H_v = self.tau(
                self.W_vo(jnp.concatenate([bmg.V.astype(self.compute_dtype), M_v], axis=1))
            )
            H_v = self.drop(H_v, deterministic=not drop_on)
            if V_d is not None:
                if self.V_d_transform is not None:
                    V_d = self.V_d_transform(V_d, is_training)
                H_v = self.W_vd(jnp.concatenate([H_v, V_d.astype(self.compute_dtype)], axis=1))
                H_v = self.drop(H_v, deterministic=not drop_on)
            H_v = H_v.astype(jnp.float32)
        if self.return_edge_embeddings:
            H_e = self.tau(
                self.W_eo(
                    jnp.concatenate(
                        [bmg.E.astype(self.compute_dtype), H[:, : self.d_h]], axis=1
                    )
                )
            )
            H_e = self.drop(H_e, deterministic=not drop_on)
            if E_d is not None:
                if self.E_d_transform is not None:
                    E_d = self.E_d_transform(E_d, is_training)
                H_e = self.W_ed(jnp.concatenate([H_e, E_d.astype(self.compute_dtype)], axis=1))
                H_e = self.drop(H_e, deterministic=not drop_on)
            H_e = H_e.astype(jnp.float32)
        return H_v, H_e


class MABBondMessagePassing(_MABMessagePassingBase):
    _pad_hidden = True

    def _fused_iter_ok(self, bmg) -> bool:
        return (
            bmg.edges_sorted and bmg.fused_ok and self.activation == "relu" and not self.undirected
        )

    def _initialize(self, bmg):
        # cast BEFORE the node->edge gather (exact; halves gathered bytes in
        # bf16); lane-align the table so dW_i streams through the Pallas
        # reduction GEMM (zero input columns hit zero kernel rows — exact)
        d_in = bmg.V.shape[1] + bmg.E.shape[1]
        parts = [
            _gather_src(bmg.V.astype(self.compute_dtype), bmg),
            bmg.E.astype(self.compute_dtype),
        ]
        d_al = -(-d_in // 128) * 128
        if d_al != d_in:
            parts.append(jnp.zeros((bmg.E.shape[0], d_al - d_in), self.compute_dtype))
        return self.W_i(jnp.concatenate(parts, axis=1), d_in=d_in)

    def _message(self, H, bmg):
        if bmg.edges_sorted and bmg.fused_ok:
            return fused_message(
                H, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0], bmg.fused_window
            )
        M_node = segment_sum(H, bmg.dst, bmg.V.shape[0], sorted=bmg.edges_sorted)
        if bmg.edges_sorted:
            return _gather_rev(gather_dst(M_node, bmg.dst) - H, bmg)
        return M_node[bmg.src] - H[bmg.rev]


class MABAtomMessagePassing(_MABMessagePassingBase):
    def _initialize(self, bmg):
        return _gather_src(self.W_i(bmg.V.astype(self.compute_dtype)), bmg)

    def _message(self, H, bmg):
        HE = jnp.concatenate([H, bmg.E.astype(self.compute_dtype)], axis=1)
        return _gather_src(
            segment_sum(HE, bmg.dst, bmg.V.shape[0], sorted=bmg.edges_sorted), bmg
        )
