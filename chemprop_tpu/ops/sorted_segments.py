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

Tuning (measured on v5e, 131k rows x 300 features -> 53k segments):
the id table is small (4 bytes/row) and lives fully in VMEM, eliminating a
second DMA stream per chunk; the data stream uses a DEPTH-deep pipeline of
async HBM->VMEM copies so the per-chunk DMA latency is hidden. TILE_S=256 /
CHUNK=128 / DEPTH=8 was the sweep optimum (~1.5x over the naive 128/128
double-buffer variant); end-to-end D-MPNN training gains ~18% over XLA's
sorted scatter.

The backward pass of segment-sum is a plain gather (cheap in XLA), wired via
``custom_vjp``. Works for edge->node aggregation AND node->graph readout
(node tables are naturally sorted by graph id).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# TILE_S/DEPTH env-overridable for on-device tuning sweeps
TILE_S = int(os.environ.get("CHEMPROP_TPU_TILE_S", 256))  # output segment rows per grid step
CHUNK = 128  # input rows per inner iteration
DEPTH = int(os.environ.get("CHEMPROP_TPU_SEG_DEPTH", 8))  # DMA pipeline depth (in-flight chunk copies)
# total VMEM budget (ids table + data pipeline + acc/out tiles); conservative
# vs ~16 MB/core so oversized configs fall back to XLA instead of failing to
# compile
MAX_VMEM_BYTES = 12 << 20


def _make_kernel(TILE_S: int, CHUNK: int, DEPTH: int, n_total: int, with_counts: bool = False):
    def _kernel(e_lo_ref, e_hi_ref, ids2d_ref, data_ref, *rest):
        if with_counts:
            out_ref, counts_ref, acc_ref, cacc_ref, data_buf, marks, sems = rest
        else:
            out_ref, acc_ref, data_buf, marks, sems = rest
            counts_ref = cacc_ref = None
        """GLOBAL chunk pipeline: ``marks`` (SMEM) holds monotonic
        issued/waited chunk watermarks that persist across grid steps, so
        the DMA stream flows tile-to-tile — each chunk is issued and waited
        exactly once for the whole call, and only grid step 0 pays exposed
        DMA latency (the per-TILE prologue of the previous version exposed
        ~1-2 µs at every one of the ~200 tile starts)."""
        t = pl.program_id(0)
        seg_start = t * TILE_S
        e_lo = e_lo_ref[t]
        e_hi = e_hi_ref[t]
        # CHUNK-aligned windows covering [e_lo, e_hi); because ids are sorted,
        # rows outside this tile's segment range simply never match the row
        # iota, so no explicit masking is needed — id equality is the mask.
        base_idx = e_lo // CHUNK
        n_chunks = pl.cdiv(e_hi - base_idx * CHUNK, CHUNK)

        @pl.when(t == 0)
        def _():
            marks[0] = 0  # issued watermark (next chunk to start)
            marks[1] = 0  # waited watermark (next chunk to wait)

        acc_ref[...] = jnp.zeros_like(acc_ref)
        if with_counts:
            cacc_ref[...] = jnp.zeros_like(cacc_ref)

        # NSLOTS = DEPTH + 1: issuing chunk c+DEPTH clobbers the slot of
        # chunk c-1 — strictly consumed, even when the last chunk of this
        # tile is shared with the next tile's first chunk (with DEPTH slots
        # it would clobber chunk c, which the next tile may still read)
        NSLOTS = DEPTH + 1

        def dma(c):
            # starts expressed as index*granule so Mosaic can prove alignment
            slot = jax.lax.rem(c, NSLOTS)
            return pltpu.make_async_copy(
                data_ref.at[pl.ds(c * CHUNK, CHUNK), :],
                data_buf.at[slot],
                sems.at[slot],
            )

        def issue_to(c):
            """Advance the issue watermark to ``c`` (exclusive)."""
            hi = jnp.minimum(c, n_total)

            def ib(k, _):
                dma(k).start()
                return 0

            jax.lax.fori_loop(marks[0], jnp.maximum(marks[0], hi), ib, 0)
            marks[0] = jnp.maximum(marks[0], hi)

        # steady state: the previous tile already issued ahead of us
        issue_to(base_idx + DEPTH)

        def body(k, _):
            c = base_idx + k

            @pl.when(c >= marks[1])
            def _():
                dma(c).wait()
                marks[1] = c + 1

            ids = ids2d_ref[c, :]  # VMEM-resident id table
            rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_S, CHUNK), 0) + seg_start
            # two-pass bf16 split: P is exactly representable in bf16, so
            # hi+lo recovers ~16 mantissa bits of the f32 data at 2 MXU
            # passes (vs 6 for Precision.HIGHEST) with f32 accumulation
            P = (ids[None, :] == rows).astype(jnp.bfloat16)
            if with_counts:
                # per-segment element counts ride along as P's row sums —
                # VPU-only, no extra HBM traffic (replaces a whole
                # segment-sum-of-ones pass for mean readouts). Broadcast over
                # the 8 sublane rows (TPU block-shape minimum); the caller
                # reads row 0.
                sums = jnp.sum(P.astype(jnp.float32), axis=1)
                cacc_ref[...] += jnp.broadcast_to(sums[None, :], cacc_ref.shape)
            x = data_buf[jax.lax.rem(c, NSLOTS)]
            if x.dtype == jnp.bfloat16:
                # bf16 inputs: one MXU pass with f32 accumulation is exact
                acc_ref[...] += jax.lax.dot(P, x, preferred_element_type=jnp.float32)
            else:
                hi = x.astype(jnp.bfloat16)
                lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                acc_ref[...] += (
                    jax.lax.dot(P, hi, preferred_element_type=jnp.float32)
                    + jax.lax.dot(P, lo, preferred_element_type=jnp.float32)
                ).astype(acc_ref.dtype)

            # keep DEPTH chunks in flight; the slot being reused (c) was
            # consumed just above, and the watermark makes re-issue impossible
            @pl.when((c + DEPTH < n_total) & (c + DEPTH >= marks[0]))
            def _():
                dma(c + DEPTH).start()
                marks[0] = c + DEPTH + 1

            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        # accumulation stays f32 in VMEM; the (possibly narrowing) cast
        # happens at the single tile write, so a bf16 out_dtype halves the
        # HBM write bytes with numerics identical to casting afterwards
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)
        if with_counts:
            counts_ref[...] = cacc_ref[...]

    return _kernel


@functools.partial(jax.jit, static_argnames=("num_segments",))
def _tile_tables(ids: jax.Array, num_segments: int):
    n_tiles = -(-num_segments // TILE_S)
    tile_starts = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE_S
    bounds = jnp.searchsorted(ids, tile_starts).astype(jnp.int32)
    return bounds[:-1], bounds[1:]


def _sorted_segment_sum_fwd_impl(
    data: jax.Array,
    ids: jax.Array,
    num_segments: int,
    out_dtype=jnp.float32,
    with_counts: bool = False,
):
    n, d_orig = data.shape
    if n % CHUNK != 0:
        raise ValueError(f"row count {n} must be a multiple of {CHUNK}")
    # Mosaic HBM DMA needs a lane-aligned (x128) feature dim
    d = -(-d_orig // 128) * 128
    if d != d_orig:
        data = jnp.pad(data, ((0, 0), (0, d - d_orig)))
    e_lo, e_hi = _tile_tables(ids, num_segments)
    # segment dim rounded up to whole tiles; surplus rows receive no ids and
    # stay zero, sliced off below
    n_tiles = -(-num_segments // TILE_S)
    s_pad = n_tiles * TILE_S
    ids2d = ids.reshape(n // CHUNK, CHUNK)

    out_specs = pl.BlockSpec(
        (TILE_S, d), lambda t, e_lo, e_hi: (t, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((s_pad, d), out_dtype)
    scratch = [
        pltpu.VMEM((TILE_S, d), jnp.float32),
        pltpu.VMEM((DEPTH + 1, CHUNK, d), data.dtype),
        pltpu.SMEM((2,), jnp.int32),  # issued/waited chunk watermarks
        pltpu.SemaphoreType.DMA((DEPTH + 1,)),
    ]
    if with_counts:
        out_specs = [
            out_specs,
            pl.BlockSpec((8, TILE_S), lambda t, e_lo, e_hi: (t, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((n_tiles * 8, TILE_S), jnp.float32)]
        scratch = scratch[:1] + [pltpu.VMEM((8, TILE_S), jnp.float32)] + scratch[1:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # e_lo, e_hi
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ids fully VMEM-resident
            pl.BlockSpec(memory_space=pl.ANY),  # data stays in HBM
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        _make_kernel(TILE_S, CHUNK, DEPTH, n_total=n // CHUNK, with_counts=with_counts),
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(e_lo, e_hi, ids2d, data)
    if with_counts:
        out, counts = out
        counts = counts.reshape(n_tiles, 8, TILE_S)[:, 0, :].reshape(-1)[:num_segments]
        return out[:num_segments, :d_orig], counts
    return out[:num_segments, :d_orig]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sorted_segment_sum(
    data: jax.Array, ids: jax.Array, num_segments: int, out_dtype=jnp.float32
) -> jax.Array:
    """segment_sum(data, ids) for ``ids`` sorted ascending; TPU Pallas fast
    path with XLA fallback on other backends. Accumulation is always f32;
    ``out_dtype`` only narrows the final tile write (one fewer HBM pass than
    ``.astype`` on the f32 result)."""
    return _dispatch(data, ids, num_segments, out_dtype)


def _dispatch(data, ids, num_segments, out_dtype=jnp.float32):
    platform = jax.devices()[0].platform
    d = -(-data.shape[1] // 128) * 128  # lane-aligned feature dim
    itemsize = jnp.dtype(data.dtype).itemsize
    vmem = (
        DEPTH * CHUNK * d * itemsize  # data DMA pipeline
        + TILE_S * d * (4 + 4)  # f32 accumulator + output tile
        + data.shape[0] * 4  # VMEM-resident ids table
    )
    if (
        platform in ("tpu",)
        and data.dtype in (jnp.float32, jnp.bfloat16)
        and data.shape[0] % CHUNK == 0
        and vmem <= MAX_VMEM_BYTES
    ):
        return _sorted_segment_sum_fwd_impl(data, ids, num_segments, out_dtype)
    return jax.ops.segment_sum(
        data, ids, num_segments=num_segments, indices_are_sorted=True
    ).astype(out_dtype)


def _fwd(data, ids, num_segments, out_dtype):
    # zero-size residual carries the primal dtype (a dtype object itself is
    # not a valid JAX residual type)
    return _dispatch(data, ids, num_segments, out_dtype), (ids, jnp.zeros((0,), data.dtype))


def _bwd(num_segments, out_dtype, res, g):
    ids, proto = res
    return g[ids].astype(proto.dtype), None


sorted_segment_sum.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sorted_segment_sum_counts(
    data: jax.Array, ids: jax.Array, num_segments: int, out_dtype=jnp.float32,
    expand_w: int = 0,
):
    """Like :func:`sorted_segment_sum` but also returns the per-segment
    element counts ``[num_segments]`` (f32). On the Pallas path the counts
    are the one-hot matrix's row sums accumulated on the VPU — zero extra
    HBM traffic, vs a full data pass for a segment-sum-of-ones (the mean
    readout's denominator).

    ``expand_w > 0``: the backward's cotangent expansion ``g[ids]`` runs
    through the Pallas window gather with that chunk window (XLA's row
    gather runs at ~25% of bandwidth here). STATIC promise — callers pass
    it only when collate stamped containment (BatchMolGraph.agg_expand_ok)."""
    return _dispatch_counts(data, ids, num_segments, out_dtype)


def _dispatch_counts(data, ids, num_segments, out_dtype=jnp.float32):
    platform = jax.devices()[0].platform
    d = -(-data.shape[1] // 128) * 128
    itemsize = jnp.dtype(data.dtype).itemsize
    vmem = (
        DEPTH * CHUNK * d * itemsize
        + TILE_S * d * (4 + 4)
        + data.shape[0] * 4
    )
    if (
        platform in ("tpu",)
        and os.environ.get("CHEMPROP_TPU_PALLAS", "1") == "1"
        and data.dtype in (jnp.float32, jnp.bfloat16)
        and data.shape[0] % CHUNK == 0
        and vmem <= MAX_VMEM_BYTES
    ):
        return _sorted_segment_sum_fwd_impl(
            data, ids, num_segments, out_dtype, with_counts=True
        )
    out = jax.ops.segment_sum(
        data, ids, num_segments=num_segments, indices_are_sorted=True
    ).astype(out_dtype)
    counts = jax.ops.segment_sum(
        jnp.ones(ids.shape[0], jnp.float32), ids, num_segments=num_segments,
        indices_are_sorted=True,
    )
    return out, counts


def _fwd_counts(data, ids, num_segments, out_dtype, expand_w):
    return (
        _dispatch_counts(data, ids, num_segments, out_dtype),
        (ids, jnp.zeros((0,), data.dtype)),
    )


def _bwd_counts(num_segments, out_dtype, expand_w, res, g):
    ids, proto = res
    g_out, _ = g  # counts carry no data gradient
    if expand_w and proto.dtype == jnp.bfloat16:
        from chemprop_tpu.ops.window_gather import window_gather

        # cast-then-expand == expand-then-cast, one tiny table cast
        return window_gather(g_out.astype(jnp.bfloat16), ids, w=expand_w, checked=True), None
    return g_out[ids].astype(proto.dtype), None


sorted_segment_sum_counts.defvjp(_fwd_counts, _bwd_counts)
