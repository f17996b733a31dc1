"""Pallas reduction GEMM for weight gradients: ``dW = Xᵀ @ G``.

The D-MPNN backward needs ``dW_h = Hᵀ(Sᵀgz)`` — a [E, d]ᵀ @ [E, d]
contraction over the ~123k-edge table with a tiny [d, d] output. XLA's
windowed GEMM emitter handles this shape badly on v5e: it stages the full
bf16 edge tables into scoped VMEM through async quarter-slices (~2.2 ms of
copy traffic per step in the profiled train step) and still runs the MXU at
~25% (0.74 ms measured vs the 0.18 ms flops bound; see
``experiments`` + the r2 profiling notes in docs/performance.md).

This kernel streams both operands once (auto-pipelined row blocks) and
accumulates the [d, d] product in a VMEM f32 scratch — HBM traffic is the
2 input passes and one [d, d] store, the bytes-bound minimum. Reduction
order is the fixed block order: bitwise deterministic.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 512


def _interpret() -> bool:
    return os.environ.get("CHEMPROP_TPU_INTERPRET", "0") == "1"


def _kernel(x_ref, g_ref, out_ref, acc_ref, *, n_steps):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...],
        g_ref[...],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(s == n_steps - 1)
    def _():
        out_ref[...] = acc_ref[...]


def grad_weight_usable(X, G) -> bool:
    n, dx = X.shape
    ng, dg = G.shape
    if os.environ.get("CHEMPROP_TPU_PALLAS", "1") != "1":
        return False
    # default OFF: measured IN the jitted train step on v5e (r3), XLA's
    # windowed emitter beats this kernel in context (7.47 vs 8.11 ms step;
    # isolated: XLA 0.397 ms vs Pallas 0.422 ms on the 123k x 384 x 384
    # contraction) — the r2 profile's 2.2 ms async-copy attribution did not
    # reproduce as recoverable time. The wiring stays (flip the env to
    # re-evaluate on other TPU generations where the emitter behaves worse).
    if os.environ.get("CHEMPROP_TPU_GRAD_W", "0") != "1":
        return False
    if jax.devices()[0].platform != "tpu" and not _interpret():
        return False
    return (
        n == ng
        and n % BLOCK_ROWS == 0
        and dx % 128 == 0
        and dg % 128 == 0
        and X.dtype == jnp.bfloat16
        and G.dtype == jnp.bfloat16
        # two double-buffered input blocks + f32 accumulator
        and (2 * 2 * BLOCK_ROWS * (dx + dg) * 2 + dx * dg * 4) <= (10 << 20)
    )


def grad_weight(X: jax.Array, G: jax.Array) -> jax.Array:
    """``Xᵀ @ G`` with f32 accumulation, f32 output ``[dx, dg]``.

    Falls back to the XLA dot off-TPU or on unsupported shapes."""
    n, dx = X.shape
    _, dg = G.shape
    if not grad_weight_usable(X, G):
        return jax.lax.dot_general(
            X, G, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    n_steps = n // BLOCK_ROWS
    return pl.pallas_call(
        functools.partial(_kernel, n_steps=n_steps),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, dx), lambda s: (s, 0)),
            pl.BlockSpec((BLOCK_ROWS, dg), lambda s: (s, 0)),
        ],
        out_specs=pl.BlockSpec((dx, dg), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((dx, dg), jnp.float32),
        scratch_shapes=[pltpu.VMEM((dx, dg), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(X, G)


@jax.custom_vjp
def matmul(x: jax.Array, k: jax.Array) -> jax.Array:
    """``x @ k`` whose weight-gradient contraction streams through
    :func:`grad_weight` instead of XLA's windowed emitter.

    Drop-in for the activation@kernel product of a dense layer: the forward
    and the data-gradient (``g @ kᵀ``) are the ordinary XLA dots; only the
    tall-skinny ``xᵀ @ g`` kernel-gradient is rerouted (it dispatches to the
    Pallas reduction GEMM when the shapes/dtypes qualify, XLA otherwise)."""
    return x @ k


def _mm_fwd(x, k):
    return x @ k, (x, k)


def _mm_bwd(res, g):
    x, k = res
    dx = g @ k.T
    xf = x.reshape(-1, x.shape[-1])
    gf = g.reshape(-1, g.shape[-1])
    dk = grad_weight(xf, gf).astype(k.dtype)
    return dx, dk


matmul.defvjp(_mm_fwd, _mm_bwd)
