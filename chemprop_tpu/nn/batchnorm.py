"""Padding-aware batch normalization.

The reference applies ``nn.BatchNorm1d`` to aggregated graph embeddings
(``chemprop/models/model.py:94``). Our batches carry padded graph rows whose
zero embeddings would corrupt batch statistics, so the statistics are computed
as weighted moments over real rows only (``pad_mask``). Running statistics are
kept in the ``batch_stats`` collection, flax-style.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    momentum: float = 0.9  # torch BatchNorm1d default (1 - 0.1)
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    # mesh axis to sync batch statistics over (shard_map/SPMD training):
    # moments are psum'd so every chip normalizes with the GLOBAL batch
    # statistics — numerically identical to single-device training
    axis_name: str | None = None

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: jax.Array | None = None, is_training: bool = True
    ) -> jax.Array:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(features))
        scale = self.param("scale", nn.initializers.ones, (features,)) if self.use_scale else 1.0
        bias = self.param("bias", nn.initializers.zeros, (features,)) if self.use_bias else 0.0

        if is_training:
            if mask is None:
                w = jnp.ones((x.shape[0], 1), x.dtype)
            else:
                w = mask.reshape(-1, 1).astype(x.dtype)
            n = w.sum()
            s = (x * w).sum(0)
            if self.axis_name is not None and not self.is_initializing():
                n = jax.lax.psum(n, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s / n
            v = (jnp.square(x - mean) * w).sum(0)
            if self.axis_name is not None and not self.is_initializing():
                v = jax.lax.psum(v, self.axis_name)
            var = v / n
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                # unbiased running variance, torch-style
                unbiased = var * n / jnp.maximum(n - 1, 1.0)
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
