"""D-MPNN message passing as flax modules over padded batched graphs.

Math matches the reference exactly (``chemprop/nn/message_passing/base.py``
and ``mixins.py``):

    bond:  H0_e  = W_i([V[src_e] ; E_e])
           H_e   = tau(H0_e)
           M_e   = sum_{k: dst_k = src_e} H_k  -  H_{rev(e)}
           H_e   = dropout(tau(H0_e + W_h M_e))          (depth-1 times)
           M_v   = sum_{e: dst_e = v} H_e
           H_v   = dropout(tau(W_o([V_v ; M_v])))
           H_v   = dropout(W_d([H_v ; V_d_v]))           (if descriptors)

TPU-first formulation: the scatter/gather pair is a segment-sum over the
padded edge table (padding edges target the sacrificial padding node, so no
masking is required — garbage never reaches a real node), the depth loop is
unrolled at trace time (depth is small and static), and all feature dims are
static so XLA tiles the three GEMMs onto the MXU. ``param_dtype`` stays
float32; ``compute_dtype`` may be bfloat16 for throughput.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from chemprop_tpu.conf import DEFAULT_HIDDEN_DIM
from chemprop_tpu.data.collate import BatchMolGraph
from chemprop_tpu.nn.transforms import GraphTransform, ScaleTransform
from chemprop_tpu.nn.utils import get_activation_function
from chemprop_tpu.ops.gather import gather_dst, gather_rev, gather_src
from chemprop_tpu.ops.segment import segment_sum


def _gather_src(M, bmg):
    if bmg.edges_sorted:
        return gather_src(M, bmg.src, bmg.rev, bmg.dst)
    return M[bmg.src]


def _gather_rev(H, bmg):
    if bmg.edges_sorted:
        return gather_rev(H, bmg.rev)
    return H[bmg.rev]


class _MessagePassingBase(nn.Module):
    d_h: int = DEFAULT_HIDDEN_DIM
    bias: bool = False
    depth: int = 3
    dropout: float = 0.0
    activation: str = "relu"
    undirected: bool = False
    d_vd: int | None = None
    V_d_transform: ScaleTransform | None = None
    graph_transform: GraphTransform | None = None
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.d_h + self.d_vd if self.d_vd else self.d_h

    def setup(self):
        # dtype=compute_dtype keeps the whole depth loop in the compute
        # precision — flax's default promotion would bounce every Dense
        # output back to f32 (params stay f32; casts happen at apply)
        dt = self.compute_dtype
        self.W_i = nn.Dense(self.d_h, use_bias=self.bias, name="W_i", dtype=dt)
        self.W_h = nn.Dense(self.d_h, use_bias=self.bias, name="W_h", dtype=dt)
        self.W_o = nn.Dense(self.d_h, use_bias=True, name="W_o", dtype=dt)
        if self.d_vd:
            self.W_d = nn.Dense(self.d_h + self.d_vd, use_bias=True, name="W_d", dtype=dt)
        self.drop = nn.Dropout(self.dropout)
        self.tau: Callable = get_activation_function(self.activation)

    def _initialize(self, bmg: BatchMolGraph) -> jax.Array:
        raise NotImplementedError

    def _message(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        raise NotImplementedError

    def __call__(
        self, bmg: BatchMolGraph, V_d: jax.Array | None = None, is_training: bool = True
    ) -> jax.Array:
        if self.graph_transform is not None:
            bmg = self.graph_transform(bmg, is_training)
        n_nodes = bmg.V.shape[0]

        H_0 = self._initialize(bmg).astype(self.compute_dtype)
        H = self.tau(H_0)
        for _ in range(1, self.depth):
            if self.undirected:
                H = (H + _gather_rev(H, bmg)) / 2
            M = self._message(H, bmg)
            H = self.drop(self.tau(H_0 + self.W_h(M)), deterministic=not is_training)

        M_v = segment_sum(H, bmg.dst, n_nodes, sorted=bmg.edges_sorted)
        H_v = self.tau(self.W_o(jnp.concatenate([bmg.V.astype(self.compute_dtype), M_v], axis=1)))
        H_v = self.drop(H_v, deterministic=not is_training)

        if V_d is not None:
            if not self.d_vd:
                raise ValueError("V_d given but d_vd was not configured")
            if self.V_d_transform is not None:
                V_d = self.V_d_transform(V_d, is_training)
            H_v = self.W_d(jnp.concatenate([H_v, V_d.astype(self.compute_dtype)], axis=1))
            H_v = self.drop(H_v, deterministic=not is_training)

        return H_v.astype(jnp.float32)


class BondMessagePassing(_MessagePassingBase):
    """Directed-edge (D-MPNN) message passing; hidden states live on edges."""

    def _initialize(self, bmg: BatchMolGraph) -> jax.Array:
        VE = jnp.concatenate(
            [_gather_src(bmg.V, bmg).astype(self.compute_dtype), bmg.E.astype(self.compute_dtype)],
            axis=1,
        )
        return self.W_i(VE)

    def _message(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        M_node = segment_sum(H, bmg.dst, bmg.V.shape[0], sorted=bmg.edges_sorted)
        if bmg.edges_sorted:
            # M_node[src] - H[rev] == (M_node[dst] - H)[rev]: one sorted
            # (streaming) gather + one permutation instead of a random gather
            # plus a permutation — and the same identity holds in reverse
            return _gather_rev(gather_dst(M_node, bmg.dst) - H, bmg)
        return M_node[bmg.src] - H[bmg.rev]


class AtomMessagePassing(_MessagePassingBase):
    """Atom-centered message passing; hidden states live on edges but carry
    node-features-only initialization (cf. reference ``base.py:254-289``)."""

    def _initialize(self, bmg: BatchMolGraph) -> jax.Array:
        return _gather_src(self.W_i(bmg.V.astype(self.compute_dtype)), bmg)

    def _message(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        HE = jnp.concatenate([H, bmg.E.astype(self.compute_dtype)], axis=1)
        return _gather_src(
            segment_sum(HE, bmg.dst, bmg.V.shape[0], sorted=bmg.edges_sorted), bmg
        )
