"""Multicomponent MPNN: per-component fingerprints concatenated before the
predictor (cf. reference ``chemprop/models/multi.py:16-109``)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from chemprop_tpu.data.collate import BatchMolGraph
from chemprop_tpu.models.model import MPNN


class MulticomponentMPNN(MPNN):
    def fingerprint(
        self,
        bmgs: Sequence[BatchMolGraph],
        V_ds: Sequence[jax.Array | None] | None = None,
        X_d: jax.Array | None = None,
        is_training: bool = True,
        mc_dropout: bool = False,
    ) -> jax.Array:
        H_vs = self.message_passing(bmgs, V_ds, is_training, mc_dropout)
        Hs = [self.agg(H_v, bmg) for H_v, bmg in zip(H_vs, bmgs)]
        H = jnp.concatenate(Hs, axis=1)
        if self.batch_norm:
            bmg0 = bmgs[0]
            graph_counts = jnp.zeros(bmg0.n_graphs + 1).at[bmg0.batch].add(1.0)[: bmg0.n_graphs]
            H = self.bn(H, mask=graph_counts > 0, is_training=is_training)
        if X_d is None:
            return H
        if self.X_d_transform is not None:
            X_d = self.X_d_transform(X_d, is_training)
        return jnp.concatenate([H, X_d], axis=1)
