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
    """Resolve an activation. Strings may carry positional args after a colon
    (``"leakyrelu:0.1"`` — the CLI's --activation-args encoding, cf. reference
    ``cli/train.py:261`` / ``nn/utils.py``), kept as a string so module
    configs stay JSON-serializable in checkpoints."""
    if callable(activation):
        return activation
    if isinstance(activation, str) and ":" in activation:
        name, _, argstr = activation.partition(":")
        fn_args = tuple(float(a) for a in argstr.split(",") if a)
        base = Activation.get(name)
        if base is Activation.LEAKYRELU and fn_args:
            return lambda x: jax.nn.leaky_relu(x, negative_slope=fn_args[0])
        if base is Activation.PRELU and fn_args:
            return lambda x: jnp.where(x >= 0, x, fn_args[0] * x)
        if base is Activation.ELU and fn_args:
            return lambda x: jax.nn.elu(x, alpha=fn_args[0])
        return _ACTIVATIONS[base]
    return _ACTIVATIONS[Activation.get(activation)]
