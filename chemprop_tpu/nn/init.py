"""Parameter-initialization schemes.

``lecun`` (flax defaults: lecun_normal kernels, zero biases) and ``torch``
(the reference's implicit scheme — every ``torch.nn.Linear`` is initialized
by ``reset_parameters`` with kaiming-uniform(a=sqrt(5)) weights and
uniform(+-1/sqrt(fan_in)) biases). The weight laws differ by a factor 3 in
variance and the bias law by being nonzero, which measurably shifts
small-dataset training outcomes (ACCURACY_r04 A/B); ``torch`` makes fresh
training runs distribution-identical to the reference's.

The scheme is a context variable read at *parameter creation* (``model.init``)
time only — applying a trained model never touches it.
"""

from __future__ import annotations

import contextlib
import contextvars
import math

import jax
import jax.numpy as jnp
from flax.linen import initializers as flax_init

_SCHEME = contextvars.ContextVar("chemprop_tpu_init_scheme", default="lecun")

SCHEMES = ("lecun", "torch")

# kaiming_uniform(a=sqrt(5)) on a (fan_in, fan_out) kernel == bound
# 1/sqrt(fan_in) == variance_scaling(1/3, fan_in, uniform)
_TORCH_KERNEL = flax_init.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
_LECUN_KERNEL = flax_init.lecun_normal()
_ZEROS = flax_init.zeros_init()


@contextlib.contextmanager
def init_scheme(scheme: str):
    if scheme not in SCHEMES:
        raise ValueError(f"unknown init scheme {scheme!r}; expected one of {SCHEMES}")
    token = _SCHEME.set(scheme)
    try:
        yield
    finally:
        _SCHEME.reset(token)


def current_scheme() -> str:
    return _SCHEME.get()


def kernel_init():
    """Dense-kernel initializer for the active scheme (kernel shape is
    ``(fan_in, fan_out)``, so fan_in is derived from the shape)."""
    return _TORCH_KERNEL if _SCHEME.get() == "torch" else _LECUN_KERNEL


def bias_init(fan_in: int | None):
    """Bias initializer for the active scheme. torch biases are
    U(+-1/sqrt(fan_in)) where fan_in is the weight's input width — it is not
    derivable from the bias shape, so callers pass it explicitly."""
    if _SCHEME.get() != "torch" or not fan_in:
        return _ZEROS
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
