"""MLP blocks and the constraint-redistribution FFN (cf. reference
``chemprop/nn/ffn.py:25-141``).

``MLP`` mirrors the reference's block structure — block 0 is a bare Linear,
each further block is (act -> dropout -> Linear) — so ``encode(X, i)``
(slice semantics of ``ffn[:i]``) and fingerprint extraction line up exactly.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from chemprop_tpu.nn.utils import get_activation_function
from chemprop_tpu.ops.segment import segment_sum


class MLP(nn.Module):
    input_dim: int
    output_dim: int
    hidden_dim: int | Sequence[int] = 300
    n_layers: int = 1
    dropout: float = 0.0
    activation: str = "relu"

    @property
    def dims(self) -> list[int]:
        hidden = (
            [self.hidden_dim] * self.n_layers
            if isinstance(self.hidden_dim, int)
            else list(self.hidden_dim)
        )
        return [self.input_dim] + hidden + [self.output_dim]

    @property
    def n_blocks(self) -> int:
        return len(self.dims) - 1

    def setup(self):
        from chemprop_tpu.nn import init as init_scheme

        dims = self.dims
        self.layers = [
            nn.Dense(
                d,
                name=f"block{i}",
                kernel_init=init_scheme.kernel_init(),
                bias_init=init_scheme.bias_init(dims[i]),
            )
            for i, d in enumerate(dims[1:])
        ]
        self.drop = nn.Dropout(self.dropout)
        self.tau = get_activation_function(self.activation)

    def __call__(self, X: jax.Array, is_training: bool = True) -> jax.Array:
        return self.encode(X, self.n_blocks, is_training)

    def encode(self, X: jax.Array, i: int, is_training: bool = True) -> jax.Array:
        """Apply blocks ``[:i]`` (python slice semantics, so ``i=-1`` applies
        all but the final block — the fingerprint hook)."""
        blocks = list(range(self.n_blocks))[:i]
        H = X
        for b in blocks:
            if b > 0:
                H = self.drop(self.tau(H), deterministic=not is_training)
            H = self.layers[b](H)
        return H


class ConstrainerFFN(nn.Module):
    """Adjusts per-atom/bond predictions so they sum to a molecule-level
    constraint, distributing the deviation by learned softmax weights."""

    n_constraints: int = 1
    fp_dim: int = 300
    hidden_dim: int | Sequence[int] = 300
    n_layers: int = 1
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(
        self,
        fp: jax.Array,
        preds: jax.Array,
        batch: jax.Array,
        constraints: jax.Array,
        is_training: bool = True,
    ) -> jax.Array:
        n_mols = constraints.shape[0]
        k = MLP(
            self.fp_dim,
            self.n_constraints,
            self.hidden_dim,
            self.n_layers,
            self.dropout,
            self.activation,
            name="ffn",
        )(fp, is_training)
        expk = jnp.exp(k)
        per_mol = segment_sum(expk, batch, n_mols + 1)[:n_mols]
        w = expk / jnp.maximum(per_mol[batch], 1e-12)

        per_mol_preds = segment_sum(preds, batch, n_mols + 1)[:n_mols]
        has_constraint = ~jnp.isnan(constraints[0])
        deviation = jnp.where(
            has_constraint[None, :], jnp.nan_to_num(constraints) - per_mol_preds, 0.0
        )
        return preds + w * deviation[batch]
