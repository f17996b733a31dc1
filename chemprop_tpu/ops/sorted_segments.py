"""Pallas TPU kernel: segment-sum over rows sorted by segment id.

THE hot op of D-MPNN training (reference ``chemprop/nn/message_passing/
mixins.py:8-30``: ``scatter_reduce_``). XLA's generic scatter-add runs at a
few percent of HBM speed-of-light on TPU; with rows pre-sorted by segment id
(done host-side at collate, where it is free) each destination tile owns a
contiguous edge range, and the reduction becomes:

    for each segment tile [TILE_S rows of the output]:
        for each chunk of C input rows in the tile's edge range:
            P[i, j] = (ids[chunk_start + j] == tile_start + i)   # one-hot
            acc += P @ data_chunk                                 # MXU

i.e. a sequence of small one-hot matmuls feeding a VMEM accumulator —
MXU-friendly, bitwise-deterministic (fixed order), no atomics.

The backward pass of segment-sum is a plain gather (cheap in XLA), wired via
``custom_vjp``. Works for edge->node aggregation AND node->graph readout
(node tables are naturally sorted by graph id).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_S = 128  # output segment rows per grid step
CHUNK = 128  # input rows per inner iteration


def _make_kernel(n_rows: int):
    def _kernel(e_lo_ref, e_hi_ref, data_ref, ids2d_ref, out_ref, acc_ref, data_buf, ids_buf, sems):
        t = pl.program_id(0)
        seg_start = t * TILE_S
        e_lo = e_lo_ref[t]
        e_hi = e_hi_ref[t]
        # CHUNK-aligned windows covering [e_lo, e_hi); because ids are sorted,
        # rows outside this tile's segment range simply never match the row
        # iota, so no explicit masking is needed — id equality is the mask.
        base_idx = e_lo // CHUNK
        n_chunks = pl.cdiv(e_hi - base_idx * CHUNK, CHUNK)

        acc_ref[...] = jnp.zeros_like(acc_ref)

        def start_dma(k, slot):
            # starts expressed as index*granule so Mosaic can prove alignment
            chunk_idx = base_idx + k
            pltpu.make_async_copy(
                data_ref.at[pl.ds(chunk_idx * CHUNK, CHUNK), :],
                data_buf.at[slot],
                sems.at[slot, 0],
            ).start()
            # ids live as [n/CHUNK, CHUNK]; fetch the sublane-aligned 8-row
            # group containing our chunk row; the row is selected via one-hot
            pltpu.make_async_copy(
                ids2d_ref.at[pl.ds((chunk_idx // 8) * 8, 8), :],
                ids_buf.at[slot],
                sems.at[slot, 1],
            ).start()

        def wait_dma(k, slot):
            chunk_idx = base_idx + k
            pltpu.make_async_copy(
                data_ref.at[pl.ds(chunk_idx * CHUNK, CHUNK), :],
                data_buf.at[slot],
                sems.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                ids2d_ref.at[pl.ds((chunk_idx // 8) * 8, 8), :],
                ids_buf.at[slot],
                sems.at[slot, 1],
            ).wait()

        start_dma(0, 0)

        def body(k, _):
            slot = jax.lax.rem(k, 2)
            next_slot = 1 - slot

            @pl.when(k + 1 < n_chunks)
            def _():
                start_dma(k + 1, next_slot)

            wait_dma(k, slot)
            chunk_idx = base_idx + k
            group = (chunk_idx // 8) * 8
            row_sel = (
                jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 0) == (chunk_idx - group)
            )
            ids = jnp.sum(jnp.where(row_sel, ids_buf[slot], 0), axis=0)  # [CHUNK]
            rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_S, CHUNK), 0) + seg_start
            # two-pass bf16 split: P is exactly representable in bf16, so
            # hi+lo recovers ~16 mantissa bits of the f32 data at 2 MXU
            # passes (vs 6 for Precision.HIGHEST) with f32 accumulation
            P = (ids[None, :] == rows).astype(jnp.bfloat16)
            x = data_buf[slot]
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc_ref[...] += (
                jax.lax.dot(P, hi, preferred_element_type=jnp.float32)
                + jax.lax.dot(P, lo, preferred_element_type=jnp.float32)
            ).astype(acc_ref.dtype)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        out_ref[...] = acc_ref[...]

    return _kernel


@functools.partial(jax.jit, static_argnames=("num_segments",))
def _tile_tables(ids: jax.Array, num_segments: int):
    n_tiles = -(-num_segments // TILE_S)
    tile_starts = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE_S
    bounds = jnp.searchsorted(ids, tile_starts).astype(jnp.int32)
    return bounds[:-1], bounds[1:]


def _sorted_segment_sum_fwd_impl(data: jax.Array, ids: jax.Array, num_segments: int):
    n, d_orig = data.shape
    if n % CHUNK != 0:
        raise ValueError(f"row count {n} must be a multiple of {CHUNK}")
    if num_segments % TILE_S != 0:
        raise ValueError(f"num_segments {num_segments} must be a multiple of {TILE_S}")
    # Mosaic HBM DMA needs a lane-aligned (x128) feature dim
    d = -(-d_orig // 128) * 128
    if d != d_orig:
        data = jnp.pad(data, ((0, 0), (0, d - d_orig)))
    e_lo, e_hi = _tile_tables(ids, num_segments)
    n_tiles = num_segments // TILE_S
    # ids as [rows, CHUNK] padded so any 8-row group window is in-bounds
    n_id_rows = n // CHUNK
    n_id_rows_pad = -(-n_id_rows // 8) * 8
    ids2d = jnp.full((n_id_rows_pad, CHUNK), num_segments, jnp.int32)
    ids2d = jax.lax.dynamic_update_slice(ids2d, ids.reshape(n_id_rows, CHUNK), (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # e_lo, e_hi
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # data stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # ids stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE_S, d), lambda t, e_lo, e_hi: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_S, d), jnp.float32),
            pltpu.VMEM((2, CHUNK, d), data.dtype),
            pltpu.VMEM((2, 8, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments, d), jnp.float32),
    )(e_lo, e_hi, data, ids2d)
    return out[:, :d_orig] if d != d_orig else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sorted_segment_sum(data: jax.Array, ids: jax.Array, num_segments: int) -> jax.Array:
    """segment_sum(data, ids) for ``ids`` sorted ascending; TPU Pallas fast
    path with XLA fallback on other backends."""
    return _dispatch(data, ids, num_segments)


def _dispatch(data, ids, num_segments):
    platform = jax.devices()[0].platform
    if platform in ("tpu",) and data.shape[0] % CHUNK == 0 and num_segments % TILE_S == 0:
        return _sorted_segment_sum_fwd_impl(data, ids, num_segments)
    return jax.ops.segment_sum(
        data, ids, num_segments=num_segments, indices_are_sorted=True
    ).astype(jnp.float32)


def _fwd(data, ids, num_segments):
    return _dispatch(data, ids, num_segments), ids


def _bwd(num_segments, ids, g):
    return g[ids], None


sorted_segment_sum.defvjp(_fwd, _bwd)
