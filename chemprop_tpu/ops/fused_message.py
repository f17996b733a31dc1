"""Fully-fused D-MPNN message kernel (Pallas TPU).

Computes, in ONE pass over the edge table, the message of reference
``chemprop/nn/message_passing/mixins.py:11-18``:

    M[e] = sum_{k : dst[k] == src[e]} H[k]  -  H[rev[e]]

(the sum runs over the in-edges of e's source node). The unfused
formulation is 3-4 HBM passes (segment-sum to nodes, gather back to edges,
reverse-edge gather, subtract). With edges sorted by ``dst``, a molecule's
edges occupy one contiguous block, so for edge ``e`` both its reverse edge
and ALL in-edges of its source node lie inside that block — i.e. within a
bounded window of ``e``. The operator restricted to a 128-edge chunk is then
one small matrix:

    M[chunk] = C @ H[window],
    C[j, k]  = [dst_window[k] == src_chunk[j]] - [k == rev_local[j]]

a single MXU pass per window chunk against a 5-chunk (640-row) sliding
window. C's entries are in {-1, 0, 1} (exactly representable in bf16), so
bf16 data needs one MXU pass per block and f32 two (hi/lo split) — with f32
accumulation, bitwise-deterministic (fixed order).

The window slides by one chunk per grid step, so a ring buffer of chunk
tiles gives **each H row exactly one HBM read**: per call the kernel moves
read-E + write-E bytes — speed-of-light for this operator.

Transpose: M = (S - R) H with S[e,k] = [dst[k] == src[e]] and R the rev
involution. Sᵀ[e,k] = [src[k] == dst[e]] — the same kernel with the src/dst
roles of rows and columns swapped (and R is symmetric), so the VJP is one
more kernel call, no scatter in either direction.

Safety window (stamped by collate as ``BatchMolGraph.fused_ok``): the
largest per-graph edge block must fit in the +-2-chunk window (<= 257
edges per molecule, ~128 bonds — real molecules sit far below). Padding
edges all target one sacrificial node whose giant block violates the
window, but their M rows are garbage-tolerated by construction (padding
hidden states only ever propagate back into padding rows; the S-part of
real rows never matches a padding edge because padding dst is the
sacrificial node, which is no real edge's src)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
PREFETCH = 1  # issued-ahead chunks beyond the window
# total VMEM the kernel may claim (ring buffer + out/acc tiles + id tables);
# conservative vs the ~16 MB/core on v5e so wide hidden dims fall back to the
# composed XLA path instead of dying in a Mosaic VMEM-exhaustion error
MAX_VMEM_BYTES = 12 << 20

# largest per-graph edge block each window width supports: kw=1 (3-chunk
# window, 40% less one-hot MXU work) for blocks <= 129 edges, kw=2 (5-chunk)
# for blocks <= 257. Collate stamps BatchMolGraph.fused_window accordingly.
SPAN_LIMIT = {1: CHUNK + 1, 2: 2 * CHUNK + 1}


def _kernel(row2d_ref, col2d_ref, revloc_ref, data_ref, out_ref, bufs, sems, *, n_chunks, dtype, kw):
    NWIN = 2 * kw + 1
    NSLOTS = NWIN + kw + PREFETCH
    c = pl.program_id(0)
    base = jnp.clip(c - kw, 0, n_chunks - NWIN)  # first window chunk

    def dma(k):
        return pltpu.make_async_copy(
            data_ref.at[pl.ds(k * CHUNK, CHUNK), :],
            bufs.at[jax.lax.rem(k, NSLOTS)],
            sems.at[jax.lax.rem(k, NSLOTS)],
        )

    # Fetch schedule: chunk k is DMA'd exactly once (step 0 for k <= 5, step
    # k-5 after) and waited exactly once (step 0 for k <= 4, step k-KW
    # after) — each H row gets a single HBM read per call.
    @pl.when(c == 0)
    def _():
        for k in range(NWIN + PREFETCH):  # issue chunks 0..5

            @pl.when(k < n_chunks)
            def _(k=k):
                dma(k).start()

    fetch = c + NWIN + PREFETCH - 1

    @pl.when((c >= 1) & (fetch < n_chunks))
    def _():
        dma(fetch).start()

    @pl.when(c == 0)
    def _():
        for k in range(NWIN):  # wait chunks 0..4

            @pl.when(k < n_chunks)
            def _(k=k):
                dma(k).wait()

    enter = c + kw  # the chunk entering the window this step

    @pl.when((c >= 1) & (enter < n_chunks) & (enter >= NWIN))
    def _():
        dma(enter).wait()

    row_c = row2d_ref[c, :]  # (CHUNK,) row ids (fwd: src of this chunk)
    rev_l = revloc_ref[c, :]  # (CHUNK,) rev index local to the window

    acc = jnp.zeros((CHUNK, bufs.shape[-1]), jnp.float32)
    for j in range(NWIN):  # static unroll over window chunks
        k = base + j
        col_w = col2d_ref[k, :]  # (CHUNK,) column ids (fwd: dst of window)
        # C block: id match minus rev indicator; exact in bf16
        same = col_w[None, :] == row_c[:, None]
        col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1) + j * CHUNK
        isrev = col == rev_l[:, None]
        C = same.astype(jnp.bfloat16) - isrev.astype(jnp.bfloat16)
        x = bufs[jax.lax.rem(k, NSLOTS)]
        if dtype == jnp.bfloat16:
            acc += jax.lax.dot(C, x, preferred_element_type=jnp.float32)
        else:
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc += jax.lax.dot(C, hi, preferred_element_type=jnp.float32)
            acc += jax.lax.dot(C, lo, preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def _fused_message_impl(
    H: jax.Array, row_ids: jax.Array, col_ids: jax.Array, rev: jax.Array, kw: int = 2
) -> jax.Array:
    """out[e] = sum_{k in window(e): col_ids[k] == row_ids[e]} H[k] - H[rev[e]]."""
    NWIN = 2 * kw + 1
    NSLOTS = NWIN + kw + PREFETCH
    n, d = H.shape
    n_chunks = n // CHUNK
    row2d = row_ids.astype(jnp.int32).reshape(n_chunks, CHUNK)
    col2d = col_ids.astype(jnp.int32).reshape(n_chunks, CHUNK)
    base = jnp.clip(jnp.arange(n_chunks, dtype=jnp.int32) - kw, 0, n_chunks - NWIN)
    rev_local = rev.astype(jnp.int32).reshape(n_chunks, CHUNK) - base[:, None] * CHUNK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # row ids (whole-array resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # col ids
            pl.BlockSpec(memory_space=pltpu.VMEM),  # rev_local
            pl.BlockSpec(memory_space=pl.ANY),  # data stays in HBM
        ],
        out_specs=pl.BlockSpec((CHUNK, d), lambda c: (c, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, CHUNK, d), H.dtype),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, dtype=H.dtype, kw=kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), H.dtype),
        interpret=os.environ.get("CHEMPROP_TPU_INTERPRET", "0") == "1",
    )(row2d, col2d, rev_local, H)


def _usable(H, kw: int = 2) -> bool:
    n, d = H.shape
    if os.environ.get("CHEMPROP_TPU_PALLAS", "1") != "1":
        return False
    interpret = os.environ.get("CHEMPROP_TPU_INTERPRET", "0") == "1"
    if jax.devices()[0].platform != "tpu" and not interpret:
        return False
    nslots = (2 * kw + 1) + kw + PREFETCH
    itemsize = jnp.dtype(H.dtype).itemsize
    vmem = (
        nslots * CHUNK * d * itemsize  # data ring buffer
        + CHUNK * d * (4 + itemsize)  # f32 accumulator + output tile
        + n * 12  # 3 VMEM-resident id tables
    )
    return (
        H.dtype in (jnp.float32, jnp.bfloat16)
        and n % CHUNK == 0
        and n >= (2 * kw + 1) * CHUNK
        and d % 128 == 0
        and vmem <= MAX_VMEM_BYTES
    )


def _composed(H, src, dst, rev, n_nodes):
    """The unfused composition (off-TPU fallback; also the parity oracle):
    (M_node[dst] - H)[rev] == M_node[src] - H[rev] since src == dst∘rev."""
    from chemprop_tpu.ops.gather import gather_dst, gather_rev
    from chemprop_tpu.ops.segment import segment_sum

    M_node = segment_sum(H, dst, n_nodes, sorted=True)
    return gather_rev(gather_dst(M_node, dst) - H, rev)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_message(
    H: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    rev: jax.Array,
    n_nodes: int,
    window: int = 2,
) -> jax.Array:
    """``segment-sum over in-edges of src minus reverse-edge`` in one pass.

    Requires ``dst`` sorted ascending and the collate-verified safety window
    (``BatchMolGraph.fused_ok`` / ``fused_window``, the +-window-chunk bound
    every per-graph edge block fits in); callers dispatch on those.
    ``n_nodes`` is used only by the composed fallback. Off TPU the op falls
    back to the composed ops (set CHEMPROP_TPU_INTERPRET=1 to run the kernel
    in Pallas interpret mode for testing). Kernel output differs from the
    composed path ONLY on padding-edge rows (garbage-tolerated; see module
    doc)."""
    return _fwd(H, src, dst, rev, n_nodes, window)[0]


def _fwd(H, src, dst, rev, n_nodes, window):
    if _usable(H, window):
        out = _fused_message_impl(H, src, dst, rev, window)
    else:
        out = _composed(H, src, dst, rev, n_nodes)
    return out, (src, dst, rev)


def _bwd(n_nodes, window, res, g):
    src, dst, rev = res
    # transpose of (S − R): S = R·PᵀP so Sᵀ = PᵀP·R — the same kernel with
    # the row/col id roles swapped (R is symmetric)
    if _usable(g, window):
        dH = _fused_message_impl(g, dst, src, rev, window)
    else:
        from chemprop_tpu.ops.gather import gather_dst, gather_rev
        from chemprop_tpu.ops.segment import segment_sum

        g_rev = gather_rev(g, rev)
        dH = gather_dst(segment_sum(g_rev, dst, n_nodes, sorted=True), dst) - g_rev
    return dH, None, None, None


fused_message.defvjp(_fwd, _bwd)
