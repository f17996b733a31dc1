"""Activation registry (cf. reference ``chemprop/nn/utils.py:11-55``)."""

from __future__ import annotations

from enum import auto
from typing import Callable

import jax
import jax.numpy as jnp

from chemprop_tpu.utils.utils import EnumMapping


class Activation(EnumMapping):
    RELU = auto()
    LEAKYRELU = auto()
    PRELU = auto()
    TANH = auto()
    ELU = auto()
    GELU = auto()
    SILU = auto()
    SOFTPLUS = auto()


_ACTIVATIONS: dict[Activation, Callable[[jax.Array], jax.Array]] = {
    Activation.RELU: jax.nn.relu,
    Activation.LEAKYRELU: lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    # PReLU with the (non-learnable) torch default slope of 0.25; a learnable
    # slope would belong in the module's params
    Activation.PRELU: lambda x: jnp.where(x >= 0, x, 0.25 * x),
    Activation.TANH: jnp.tanh,
    Activation.ELU: jax.nn.elu,
    Activation.GELU: jax.nn.gelu,
    Activation.SILU: jax.nn.silu,
    Activation.SOFTPLUS: jax.nn.softplus,
}


def get_activation_function(
    activation: str | Activation | Callable,
) -> Callable[[jax.Array], jax.Array]:
    if callable(activation):
        return activation
    return _ACTIVATIONS[Activation.get(activation)]
