"""Segment/scatter primitives — the D-MPNN hot ops.

The reference's hot loop is torch ``scatter_reduce_`` + gather
(``chemprop/nn/message_passing/mixins.py:8-30``). The XLA-native formulation
is ``jax.ops.segment_sum`` over the padded edge tables from
:mod:`chemprop_tpu.data.collate`: destinations of padding edges point at the
sacrificial padding node, so no masks are needed in the reduction itself.

``jax.ops.segment_sum`` lowers to a one-hot matmul or scatter depending on
shape; on TPU a sorted-segment scatter is bitwise-deterministic (fixed
reduction order), unlike the reference's nondeterministic GPU atomics (see
SURVEY.md §5.2). The Pallas kernels — ops/sorted_segments.py (one-hot-matmul
segment sum) and ops/fused_message.py (whole message op in one HBM pass) —
replace the segment_sum + gather pairs under the CHEMPROP_TPU_PALLAS flag.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    # default ON: the Pallas sorted-segment kernel is ~18% faster end-to-end
    # on TPU (it no-ops on other backends via the platform check in
    # ops/sorted_segments.py); set CHEMPROP_TPU_PALLAS=0 to fall back to
    # XLA's sorted scatter
    return os.environ.get("CHEMPROP_TPU_PALLAS", "1") == "1"


def segment_sum(
    data: jax.Array, segment_ids: jax.Array, num_segments: int, sorted: bool = False
) -> jax.Array:
    """Segment sum; ``sorted=True`` promises ascending segment_ids and takes
    the fast path (XLA sorted-scatter, or the Pallas one-hot-matmul kernel
    when CHEMPROP_TPU_PALLAS=1)."""
    if sorted:
        # the kernel rounds the segment dim up to whole output tiles itself,
        # so num_segments needs no alignment (only the row count does)
        if _use_pallas() and data.ndim == 2 and data.shape[0] % 128 == 0:
            from chemprop_tpu.ops.sorted_segments import sorted_segment_sum

            # out_dtype=data.dtype: f32 accumulation inside the kernel, cast
            # at the tile write — numerics identical to .astype on the f32
            # result, one fewer full HBM pass (and half the write bytes in
            # bf16 mode)
            return sorted_segment_sum(data, segment_ids, num_segments, data.dtype)
        return jax.ops.segment_sum(
            data, segment_ids, num_segments=num_segments, indices_are_sorted=True
        )
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jax.Array, segment_ids: jax.Array, num_segments: int, sorted: bool = False
) -> jax.Array:
    totals = segment_sum(data, segment_ids, num_segments, sorted=sorted)
    # counts in f32 regardless of data dtype: bf16 addition saturates at 256
    # (8 mantissa bits), which would overstate means for >256-row segments
    counts = jax.ops.segment_sum(
        jnp.ones((data.shape[0],), dtype=jnp.float32),
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=sorted,
    )
    return (totals / jnp.maximum(counts, 1)[:, None]).astype(data.dtype)


def segment_softmax_weights(
    logits: jax.Array, segment_ids: jax.Array, num_segments: int
) -> jax.Array:
    """Per-segment softmax weights for ``[n, 1]`` logits (numerically-stable
    exp-normalize within each segment)."""
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    expl = jnp.exp(shifted)
    denom = jax.ops.segment_sum(expl, segment_ids, num_segments=num_segments)
    return expl / jnp.maximum(denom[segment_ids], 1e-12)
