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
read-E + write-E bytes — speed-of-light for this operator. Each grid step
emits UNROLL consecutive output chunks (measured: the per-step fixed cost
of ~0.5 us dominates the 128-row step, and UNROLL=4 cuts the kernel from
0.50 ms to 0.36 ms on the 123k-edge v5e benchmark batch); ragged tails
(edge counts not a multiple of UNROLL*128) are handled by padding the id
tables and slicing the output.

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
# env-overridable for on-device tuning sweeps (values are compile-time
# constants; the persistent compile cache keys on the resulting kernels)
UNROLL = int(os.environ.get("CHEMPROP_TPU_UNROLL", 4))  # output chunks per grid step
# issued-ahead chunks beyond the window: r3 on-device sweep over
# (UNROLL, PREFETCH) on the 123k-edge train step — (4,2) 7.72 ms,
# (4,4) 7.10, (4,6) 7.00, (4,8) 6.95 <- best, (4,10) 6.99, (2,6) 7.10,
# (8,*) >8.4 (VMEM pressure) — deep prefetch hides the DMA issue latency
PREFETCH = int(os.environ.get("CHEMPROP_TPU_PREFETCH", 8))
# total VMEM the kernel may claim (ring buffer + out/acc tiles + id tables);
# conservative vs the ~16 MB/core on v5e so wide hidden dims fall back to the
# composed XLA path instead of dying in a Mosaic VMEM-exhaustion error
MAX_VMEM_BYTES = 12 << 20

# largest per-graph edge block each window width supports: kw=1 (3-chunk
# window, 40% less one-hot MXU work) for blocks <= 129 edges, kw=2 (5-chunk)
# for blocks <= 257, kw=3 (7-chunk) for <= 385 (~192 bonds: peptides/small
# polymers keep the fast path instead of dropping the whole batch to the
# composed ops). Collate stamps BatchMolGraph.fused_window accordingly.
SPAN_LIMIT = {1: CHUNK + 1, 2: 2 * CHUNK + 1, 3: 3 * CHUNK + 1}


def _window_dot(acc, C, x, dtype):
    if dtype == jnp.bfloat16:
        return acc + jax.lax.dot(C, x, preferred_element_type=jnp.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = acc + jax.lax.dot(C, hi, preferred_element_type=jnp.float32)
    return acc + jax.lax.dot(C, lo, preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# shared kernel scaffolding: every kernel in this module streams the edge
# table in 128-row chunks through a ring buffer, UNROLL output chunks per
# grid step, with a ±kw-chunk sliding window per output chunk. The DMA
# fetch/wait schedule and the one-hot window product are defined ONCE here.
# --------------------------------------------------------------------------


def _nslots(kw: int) -> int:
    return (UNROLL + 2 * kw) + PREFETCH + UNROLL


def _dma_schedule(s, n_chunks, kw, start, wait):
    """Exactly-once fetch/wait schedule for the UNROLL-chunk sliding window:
    step 0 issues chunks [0, NWIN+PREFETCH) and waits [0, NWIN); step s>=1
    issues [u0+kw+PREFETCH, u0+UNROLL+kw+PREFETCH) and waits
    [u0+kw, u0+UNROLL+kw) — each chunk is DMA'd and waited exactly once, so
    each data row gets a single HBM read per call."""
    NWIN = UNROLL + 2 * kw
    u0 = s * UNROLL

    @pl.when(s == 0)
    def _():
        for k in range(NWIN + PREFETCH):

            @pl.when(k < n_chunks)
            def _(k=k):
                start(k)

    @pl.when(s >= 1)
    def _():
        for j in range(UNROLL):
            f = u0 + kw + PREFETCH + j

            @pl.when((f < n_chunks) & (f >= NWIN + PREFETCH))
            def _(f=f):
                start(f)

    @pl.when(s == 0)
    def _():
        for k in range(NWIN):

            @pl.when(k < n_chunks)
            def _(k=k):
                wait(k)

    @pl.when(s >= 1)
    def _():
        for j in range(UNROLL):
            e = u0 + kw + j

            @pl.when((e < n_chunks) & (e >= NWIN))
            def _(e=e):
                wait(e)


def _ring_dma(ref, bufs, sems, k):
    slot = jax.lax.rem(k, bufs.shape[0])
    return pltpu.make_async_copy(
        ref.at[pl.ds(k * CHUNK, CHUNK), :], bufs.at[slot], sems.at[slot]
    )


def _window_product(c, n_chunks, kw, row2d_ref, col2d_ref, revloc_ref, x_at, d, dtype, band=CHUNK):
    """f32 accumulator of the one-hot window product for output chunk ``c``:
    ``acc = Σ_j C_j @ x(k_j)`` with ``C = [col==row] − [k==rev]`` (exact in
    bf16). The window is SYMMETRIC around ``c`` (offsets −kw..+kw): the col
    id table is front-padded ``kw`` chunks with match-nothing ids and the
    data chunk index clamps into range, so out-of-range window slots
    contribute exact zeros (sufficient: a per-graph block of ≤ kw·128+1
    edges never reaches past ±kw chunks).

    ``band`` (static, collate's rounded max per-graph edge-block size) trims
    the SIDE products to the only rows that can match across a chunk
    boundary — row p of chunk c matches a col in chunk c+off only when
    ``|p − q − off·128| < max_block`` — cutting the dominant one-hot MXU
    cost by ~(1 − band/128) per side chunk."""
    row_c = row2d_ref[c, :]  # (CHUNK,) row ids (fwd: src of this chunk)
    rev_l = revloc_ref[c, :]  # (CHUNK,) rev index local to the window
    acc = jnp.zeros((CHUNK, d), jnp.float32)
    for j in range(2 * kw + 1):  # static unroll over window chunks
        off = j - kw
        m = jnp.clip(c + off, 0, n_chunks - 1)  # data chunk (id-guarded)
        col_w = col2d_ref[c + j, :]  # (CHUNK,) col ids (front-padded table)
        x = x_at(m)
        bj = min(CHUNK, max(0, band - (abs(off) - 1) * CHUNK)) if off else CHUNK
        if bj == 0:
            continue  # this side chunk is statically unreachable
        if bj >= CHUNK:
            same = col_w[None, :] == row_c[:, None]
            col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1) + j * CHUNK
            isrev = col == rev_l[:, None]
            C = same.astype(jnp.bfloat16) - isrev.astype(jnp.bfloat16)
            acc = _window_dot(acc, C, x, dtype)
            continue
        lo = 0 if off < 0 else CHUNK - bj  # top band (left) / bottom (right)
        rc = row_c[lo : lo + bj]
        rl = rev_l[lo : lo + bj]
        same = col_w[None, :] == rc[:, None]
        col = jax.lax.broadcasted_iota(jnp.int32, (bj, CHUNK), 1) + j * CHUNK
        isrev = col == rl[:, None]
        C = same.astype(jnp.bfloat16) - isrev.astype(jnp.bfloat16)
        part = _window_dot(jnp.zeros((bj, d), jnp.float32), C, x, dtype)
        band_rows = acc[lo : lo + bj] + part
        if off < 0:
            acc = jnp.concatenate([band_rows, acc[bj:]], axis=0)
        else:
            acc = jnp.concatenate([acc[: CHUNK - bj], band_rows], axis=0)
    return acc


def _prep_tables(row_ids, col_ids, rev, kw):
    """Chunked id tables (row, col, window-local rev), padded to whole grid
    steps; padded rows use ids that match nothing, so their output chunks
    are garbage and sliced off by the caller.

    The col table is FRONT-padded ``kw`` chunks (and tail-padded ``kw``
    past the grid) with match-nothing ids: the window is symmetric around
    each output chunk (``_window_product`` indexes ``col2d[c + j]`` for
    window slot j), and out-of-range slots must contribute zeros. The rev
    table is window-local relative to the symmetric window start
    ``(c - kw) * CHUNK`` (possibly negative — rev offsets stay positive)."""
    n = row_ids.shape[0]
    n_chunks = n // CHUNK
    n_steps = -(-n_chunks // UNROLL)
    c_pad = n_steps * UNROLL
    row2d = row_ids.astype(jnp.int32).reshape(n_chunks, CHUNK)
    col2d = col_ids.astype(jnp.int32).reshape(n_chunks, CHUNK)
    base = jnp.arange(n_chunks, dtype=jnp.int32) - kw
    rev_local = rev.astype(jnp.int32).reshape(n_chunks, CHUNK) - base[:, None] * CHUNK
    if c_pad != n_chunks:
        pad = ((0, c_pad - n_chunks), (0, 0))
        row2d = jnp.pad(row2d, pad, constant_values=-1)
        rev_local = jnp.pad(rev_local, pad, constant_values=-1)
    col2d = jnp.pad(
        col2d, ((kw, c_pad - n_chunks + kw), (0, 0)), constant_values=-2
    )
    return row2d, col2d, rev_local, n_chunks, n_steps, c_pad


def _id_specs():
    return [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # row ids (whole-array resident)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # col ids
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rev_local
    ]


def _block_spec(d):
    return pl.BlockSpec((UNROLL * CHUNK, d), lambda s: (s, 0), memory_space=pltpu.VMEM)


def _interpret() -> bool:
    return os.environ.get("CHEMPROP_TPU_INTERPRET", "0") == "1"


def _kernel(row2d_ref, col2d_ref, revloc_ref, data_ref, out_ref, bufs, sems, *, n_chunks, dtype, kw):
    """The plain message operator, UNROLL output chunks per grid step."""
    s = pl.program_id(0)
    _dma_schedule(
        s,
        n_chunks,
        kw,
        lambda k: _ring_dma(data_ref, bufs, sems, k).start(),
        lambda k: _ring_dma(data_ref, bufs, sems, k).wait(),
    )
    x_at = lambda k: bufs[jax.lax.rem(k, bufs.shape[0])]
    for u in range(UNROLL):
        c = s * UNROLL + u
        acc = _window_product(
            c, n_chunks, kw, row2d_ref, col2d_ref, revloc_ref, x_at, bufs.shape[-1], dtype
        )
        out_ref[pl.ds(u * CHUNK, CHUNK), :] = acc.astype(out_ref.dtype)


def _fused_message_impl(
    H: jax.Array, row_ids: jax.Array, col_ids: jax.Array, rev: jax.Array, kw: int = 2
) -> jax.Array:
    """out[e] = sum_{k in window(e): col_ids[k] == row_ids[e]} H[k] - H[rev[e]]."""
    n, d = H.shape
    row2d, col2d, rev_local, n_chunks, n_steps, c_pad = _prep_tables(row_ids, col_ids, rev, kw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=_id_specs() + [pl.BlockSpec(memory_space=pl.ANY)],  # data stays in HBM
        out_specs=_block_spec(d),
        scratch_shapes=[
            pltpu.VMEM((_nslots(kw), CHUNK, d), H.dtype),
            pltpu.SemaphoreType.DMA((_nslots(kw),)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, dtype=H.dtype, kw=kw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c_pad * CHUNK, d), H.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(row2d, col2d, rev_local, H)
    return out[:n] if c_pad != n_chunks else out


def _iter_kernel(
    row2d_ref,
    col2d_ref,
    revloc_ref,
    data_ref,
    h0_ref,
    w_ref,
    b_ref,
    out_ref,
    bufs,
    sems,
    *,
    n_chunks,
    kw,
    has_bias,
    relu_stream=False,
    band=CHUNK,
):
    """One full D-MPNN depth iteration per edge chunk:

        out = relu(H0 + fused_message(H) @ W [+ b])

    — the message windows stream through the DMA ring exactly as in
    ``_kernel``, then the ``W_h`` GEMM, residual add, bias, and ReLU happen
    on the VMEM tile before the single HBM write. Removes the intermediate
    message table M entirely (two HBM passes per iteration at d=384).

    ``relu_stream``: apply ReLU to each streamed chunk right after its DMA
    completes — the FIRST depth iteration can then consume the raw ``H_0``
    table directly and ``relu(H_0)`` is never materialized in HBM."""
    s = pl.program_id(0)

    def wait(k):
        _ring_dma(data_ref, bufs, sems, k).wait()
        if relu_stream:
            slot = jax.lax.rem(k, bufs.shape[0])
            # compare in f32 (Mosaic has no bf16 cmpf on this target)
            bufs[slot] = jnp.where(
                bufs[slot].astype(jnp.float32) > 0, bufs[slot], jnp.zeros_like(bufs[slot])
            )

    _dma_schedule(
        s,
        n_chunks,
        kw,
        lambda k: _ring_dma(data_ref, bufs, sems, k).start(),
        wait,
    )
    x_at = lambda k: bufs[jax.lax.rem(k, bufs.shape[0])]
    W = w_ref[...]
    for u in range(UNROLL):
        c = s * UNROLL + u
        acc = _window_product(
            c, n_chunks, kw, row2d_ref, col2d_ref, revloc_ref, x_at, bufs.shape[-1],
            jnp.bfloat16, band=band,
        )
        z = jax.lax.dot(acc.astype(jnp.bfloat16), W, preferred_element_type=jnp.float32)
        h0 = h0_ref[pl.ds(u * CHUNK, CHUNK), :].astype(jnp.float32)
        if has_bias:
            z = z + b_ref[0, :].astype(jnp.float32)[None, :]
        out_ref[pl.ds(u * CHUNK, CHUNK), :] = jnp.maximum(h0 + z, 0.0).astype(out_ref.dtype)


def _iter_impl(H, H0, W, b, row_ids, col_ids, rev, kw, relu_stream=False, band=CHUNK):
    n, d = H.shape
    row2d, col2d, rev_local, n_chunks, n_steps, c_pad = _prep_tables(row_ids, col_ids, rev, kw)
    H0p = H0 if c_pad == n_chunks else jnp.pad(H0, ((0, c_pad * CHUNK - n), (0, 0)))
    has_bias = b is not None
    b2d = b.reshape(1, d) if has_bias else jnp.zeros((1, d), H.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=_id_specs()
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # H stays in HBM (ring-streamed)
            _block_spec(d),  # H0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W fully resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=_block_spec(d),
        scratch_shapes=[
            pltpu.VMEM((_nslots(kw), CHUNK, d), H.dtype),
            pltpu.SemaphoreType.DMA((_nslots(kw),)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _iter_kernel, n_chunks=n_chunks, kw=kw, has_bias=has_bias,
            relu_stream=relu_stream, band=band,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c_pad * CHUNK, d), H.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(row2d, col2d, rev_local, H, H0p, W, b2d)
    return out[:n] if c_pad != n_chunks else out


# env-gated: the chained two-iteration forward kernel (measured on-device;
# see docs/performance.md for the A/B)
ITER2 = os.environ.get("CHEMPROP_TPU_ITER2", "0") == "1"


def _iter2_kernel(
    row2d_ref,
    col2d_ref,
    revloc_ref,
    h0_ref,  # raw H0, HBM (single ring-streamed read for BOTH iterations)
    w_ref,  # W, fully VMEM-resident (shared weights across depth)
    b_ref,
    y1_ref,  # iteration-1 output, HBM (written via explicit ring DMA)
    y2_ref,  # iteration-2 output (grid-uniform VMEM blocks)
    h0_bufs,  # raw-H0 DMA ring (2kw effective window: y1 leads y2 by kw)
    y1_bufs,  # y1 compute ring (window source for iteration 2)
    h0_sems,
    y1_wsems,  # y1 HBM-writeback semaphores (one live DMA per ring slot)
    *,
    n_chunks,
    kw,
    has_bias,
    band=CHUNK,
):
    """TWO chained D-MPNN depth iterations in one pass over the edge table:

        y1 = relu(H0 + message(relu(H0)) @ W [+ b])
        y2 = relu(H0 + message(y1)       @ W [+ b])

    The separate-kernel chain costs 6 edge-table HBM passes (iter-1 reads H0
    twice, iter-2 reads y1 + H0, both write their output); this kernel costs
    3 (one H0 read, two output writes). y1 chunks are computed ``kw`` chunks
    AHEAD of y2 chunks into a VMEM ring — iteration 2's ±kw window then
    reads finished y1 values without an HBM round-trip — and stream back to
    HBM (the backward pass needs y1 as its ReLU-mask residual) via explicit
    async copies overlapped with compute. ``relu(H0)`` for iteration 1's
    window product is computed at use time from the raw ring (the raw chunk
    is also both iterations' residual), so it never occupies VMEM or HBM.
    Values are bitwise-identical to the sequential kernels: same window
    products, same GEMM shapes, same bf16 ring dtypes."""
    s = pl.program_id(0)
    lead = kw + UNROLL  # y1 runs a grid step ahead of y2, so the y2 window
    # only reads y1 chunks computed in previous steps
    kw2 = lead + kw  # h0 ring effective window: y1's lead + y1's own ±kw

    _dma_schedule(
        s,
        n_chunks,
        kw2,
        lambda k: _ring_dma(h0_ref, h0_bufs, h0_sems, k).start(),
        lambda k: _ring_dma(h0_ref, h0_bufs, h0_sems, k).wait(),
    )

    W = w_ref[...]
    yslots = y1_bufs.shape[0]
    d = y1_bufs.shape[-1]

    def h0_at(k):
        return h0_bufs[jax.lax.rem(k, h0_bufs.shape[0])]

    def h1_at(k):  # relu(H0) chunk, computed at use time (VPU-cheap)
        x = h0_at(k)
        return jnp.where(x.astype(jnp.float32) > 0, x, jnp.zeros_like(x))

    def compute_y1(f):
        """y1 chunk f into ring slot f%yslots, then start its HBM writeback
        (waiting the slot's previous writeback first — exactly-once sems)."""
        slot = jax.lax.rem(f, yslots)

        @pl.when(f >= yslots)  # first lap has no prior writeback on the slot
        def _():
            pltpu.make_async_copy(
                y1_bufs.at[slot], y1_ref.at[pl.ds(0, CHUNK), :], y1_wsems.at[slot]
            ).wait()

        acc = _window_product(
            f, n_chunks, kw, row2d_ref, col2d_ref, revloc_ref, h1_at, d,
            jnp.bfloat16, band=band,
        )
        z = jax.lax.dot(acc.astype(jnp.bfloat16), W, preferred_element_type=jnp.float32)
        if has_bias:
            z = z + b_ref[0, :].astype(jnp.float32)[None, :]
        h0 = h0_at(f).astype(jnp.float32)
        y1_bufs[slot] = jnp.maximum(h0 + z, 0.0).astype(y1_bufs.dtype)
        pltpu.make_async_copy(
            y1_bufs.at[slot], y1_ref.at[pl.ds(f * CHUNK, CHUNK), :], y1_wsems.at[slot]
        ).start()

    u0 = s * UNROLL

    @pl.when(s == 0)
    def _():
        for f in range(UNROLL + lead):

            @pl.when(f < n_chunks)
            def _(f=f):
                compute_y1(f)

    @pl.when(s >= 1)
    def _():
        for j in range(UNROLL):
            f = u0 + lead + j

            @pl.when((f < n_chunks) & (f >= UNROLL + lead))
            def _(f=f):
                compute_y1(f)

    def y1_at(k):
        return y1_bufs[jax.lax.rem(k, yslots)]

    for u in range(UNROLL):
        c = s * UNROLL + u
        acc = _window_product(
            c, n_chunks, kw, row2d_ref, col2d_ref, revloc_ref, y1_at, d,
            jnp.bfloat16, band=band,
        )
        z = jax.lax.dot(acc.astype(jnp.bfloat16), W, preferred_element_type=jnp.float32)
        if has_bias:
            z = z + b_ref[0, :].astype(jnp.float32)[None, :]
        h0 = h0_at(c).astype(jnp.float32)
        y2_ref[pl.ds(u * CHUNK, CHUNK), :] = jnp.maximum(h0 + z, 0.0).astype(y2_ref.dtype)

    # drain: the last yslots y1 writebacks are never waited at slot reuse
    n_steps = pl.num_programs(0)

    @pl.when(s == n_steps - 1)
    def _():
        for t in range(yslots):
            f = n_chunks - yslots + t
            if f < 0:
                continue
            pltpu.make_async_copy(
                y1_bufs.at[f % yslots],
                y1_ref.at[pl.ds(0, CHUNK), :],
                y1_wsems.at[f % yslots],
            ).wait()


def _iter2_impl(H0, W, b, row_ids, col_ids, rev, kw, band=CHUNK):
    """(y1, y2): the first two depth iterations chained through VMEM."""
    n, d = H0.shape
    row2d, col2d, rev_local, n_chunks, n_steps, c_pad = _prep_tables(row_ids, col_ids, rev, kw)
    has_bias = b is not None
    b2d = b.reshape(1, d) if has_bias else jnp.zeros((1, d), H0.dtype)
    lead = kw + UNROLL
    yslots = lead + kw + UNROLL + 3  # lead + ±kw window + in flight + margin

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=_id_specs()
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # H0 (ring-streamed once)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # y1 (explicit ring DMA)
            _block_spec(d),  # y2
        ],
        scratch_shapes=[
            pltpu.VMEM((_nslots(lead + kw), CHUNK, d), H0.dtype),  # raw-H0 ring
            pltpu.VMEM((yslots, CHUNK, d), H0.dtype),  # y1 ring
            pltpu.SemaphoreType.DMA((_nslots(lead + kw),)),
            pltpu.SemaphoreType.DMA((yslots,)),
        ],
    )
    y1, y2 = pl.pallas_call(
        functools.partial(
            _iter2_kernel, n_chunks=n_chunks, kw=kw, has_bias=has_bias, band=band
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks * CHUNK, d), H0.dtype),
            jax.ShapeDtypeStruct((c_pad * CHUNK, d), H0.dtype),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(row2d, col2d, rev_local, H0, W, b2d)
    return y1[:n], (y2[:n] if c_pad != n_chunks else y2)


def iter2_usable(H0, W, kw: int) -> bool:
    """Gate for the chained two-iteration kernel. DEFAULT OFF: measured on
    the v5e chip it LOSES to the two separate iteration kernels (isolated
    2.27-2.29 vs 2.04-2.06 ms incl. ~1 ms dispatch; full step 5.57 vs
    5.39 ms) despite reading the edge table 3 HBM passes fewer — the
    in-kernel y1 writeback stream + the doubled per-step MXU chain cost
    more than the saved bandwidth, the same lesson as the rejected
    all-in-one backward and depth-loop kernels (docs/performance.md). A
    group-batched writeback variant measured worse still (2.39-2.87 ms:
    dynamic sub-slot addressing in the window product). Re-enable with
    CHEMPROP_TPU_ITER2=1."""
    n, d = H0.shape
    lead = kw + UNROLL
    yslots = lead + kw + UNROLL + 3
    vmem = (
        _nslots(lead + kw) * CHUNK * d * 2  # raw-H0 bf16 ring
        + yslots * CHUNK * d * 2  # y1 bf16 ring
        + d * d * 2  # W tile
        + 2 * CHUNK * d * 4  # f32 window accumulator + GEMM output
        + 2 * 2 * UNROLL * CHUNK * d * 2  # double-buffered y2 blocks
        + n * 12  # id tables
    )
    return (
        ITER2
        and _usable(H0, kw)
        and H0.dtype == jnp.bfloat16
        and W.shape == (d, d)
        and W.dtype == jnp.bfloat16
        and vmem <= MAX_VMEM_BYTES
    )


def _iter_bwd_kernel(
    row2d_ref,  # dst ids (transposed-message rows)
    col2d_ref,  # src ids (transposed-message cols)
    revloc_ref,
    g_ref,  # upstream cotangent, HBM (ring-streamed)
    y_ref,  # saved forward output (ReLU mask), HBM (ring-streamed)
    h_ref,  # forward input H, auto-pipelined blocks (for dW)
    wT_ref,  # Wᵀ, fully VMEM-resident
    dh_ref,  # out: dL/dH blocks
    gz_ref,  # out: gz = g ∘ (y > 0) blocks (= dL/dH0)
    dw_ref,  # out: dL/dW (d, d) f32, accumulated across the whole grid
    g_bufs,
    y_bufs,
    g_sems,
    y_sems,
    *,
    n_chunks,
    kw,
):
    """Whole-iteration backward in one pass. With S the message operator and
    gz the ReLU-masked cotangent:

        dH  = (Sᵀ gz) Wᵀ      dW = Hᵀ (Sᵀ gz)      dH0 = gz

    G = Sᵀ gz is never materialized: each output chunk's G tile feeds the
    Wᵀ GEMM (→ dH) and the Hᵀ-contraction (→ dW accumulator) while still in
    VMEM. gz is formed ONCE per chunk by masking the g ring slot in place
    right after its DMA completes (one VPU pass per chunk, not one per
    window access — the per-access recompute was what made the first version
    of this kernel lose to the composed path), then read back for the window
    products and for the dH0 output."""
    s = pl.program_id(0)

    def start(k):
        _ring_dma(g_ref, g_bufs, g_sems, k).start()
        _ring_dma(y_ref, y_bufs, y_sems, k).start()

    def wait(k):
        _ring_dma(g_ref, g_bufs, g_sems, k).wait()
        _ring_dma(y_ref, y_bufs, y_sems, k).wait()
        slot = jax.lax.rem(k, g_bufs.shape[0])
        # mask in place: the slot now holds gz (compare in f32 — Mosaic has
        # no bf16 cmpf on this target)
        g_bufs[slot] = jnp.where(
            y_bufs[slot].astype(jnp.float32) > 0,
            g_bufs[slot],
            jnp.zeros_like(g_bufs[slot]),
        )

    _dma_schedule(s, n_chunks, kw, start, wait)

    def gz_at(k):
        return g_bufs[jax.lax.rem(k, g_bufs.shape[0])]

    WT = wT_ref[...]
    dw_step = jnp.zeros((wT_ref.shape[0], wT_ref.shape[1]), jnp.float32)
    for u in range(UNROLL):
        c = s * UNROLL + u
        acc = _window_product(
            c, n_chunks, kw, row2d_ref, col2d_ref, revloc_ref, gz_at, g_bufs.shape[-1], jnp.bfloat16
        )
        G = acc.astype(jnp.bfloat16)
        dh_ref[pl.ds(u * CHUNK, CHUNK), :] = jax.lax.dot(
            G, WT, preferred_element_type=jnp.float32
        ).astype(dh_ref.dtype)
        gz_ref[pl.ds(u * CHUNK, CHUNK), :] = gz_at(c).astype(gz_ref.dtype)
        h_c = h_ref[pl.ds(u * CHUNK, CHUNK), :]
        # Hᵀ-contraction over the chunk's rows: (d, CHUNK) @ (CHUNK, d)
        dw_step = dw_step + jax.lax.dot_general(
            h_c, G, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(s == 0)
    def _():
        dw_ref[...] = dw_step

    @pl.when(s != 0)
    def _():
        dw_ref[...] = dw_ref[...] + dw_step


def _iter_bwd_impl(g, y, H, W, src, dst, rev, kw):
    n, d = H.shape
    # transposed message: row ids = dst, col ids = src (R is symmetric)
    row2d, col2d, rev_local, n_chunks, n_steps, c_pad = _prep_tables(dst, src, rev, kw)
    gp, yp = g, y
    hp = H if c_pad == n_chunks else jnp.pad(H, ((0, c_pad * CHUNK - n), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=_id_specs()
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # g (ring-streamed)
            pl.BlockSpec(memory_space=pl.ANY),  # y (ring-streamed)
            _block_spec(d),  # H
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wᵀ
        ],
        out_specs=[
            _block_spec(d),  # dH
            _block_spec(d),  # gz (= dH0)
            pl.BlockSpec((d, d), lambda s: (0, 0), memory_space=pltpu.VMEM),  # dW
        ],
        scratch_shapes=[
            pltpu.VMEM((_nslots(kw), CHUNK, d), g.dtype),
            pltpu.VMEM((_nslots(kw), CHUNK, d), y.dtype),
            pltpu.SemaphoreType.DMA((_nslots(kw),)),
            pltpu.SemaphoreType.DMA((_nslots(kw),)),
        ],
    )
    dh, gz, dw = pl.pallas_call(
        functools.partial(_iter_bwd_kernel, n_chunks=n_chunks, kw=kw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c_pad * CHUNK, d), H.dtype),
            jax.ShapeDtypeStruct((c_pad * CHUNK, d), g.dtype),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(row2d, col2d, rev_local, gp, yp, hp, W.T)
    if c_pad != n_chunks:
        dh, gz = dh[:n], gz[:n]
    return dh, gz, dw


def _bwd_msg_kernel(
    row2d_ref,  # dst ids (transposed-message rows)
    col2d_ref,  # src ids (transposed-message cols)
    revloc_ref,
    g_ref,  # upstream cotangent, HBM (ring-streamed)
    y_ref,  # saved forward output (ReLU mask), HBM (ring-streamed)
    *rest,  # [acc_ref (auto-pipelined blocks, if has_acc)], outputs, scratch
    n_chunks,
    kw,
    dtype,
    has_acc=False,
):
    """Masked transposed message: G = Sᵀ(g ∘ [y > 0]) and gz in ONE pass.

    The composed backward materializes gz (read g + read y + write gz) and
    then runs the transposed message kernel over it (read gz + write G) —
    4 edge-table passes. Here gz is formed by masking the g ring slot in
    place right after its DMA completes, so the pass reads g and y once and
    writes G and gz once: 4 passes become the bytes-bound minimum for the
    (G, gz) pair, and the two kernel launches become one. The GEMMs that
    consume G (dH = G Wᵀ, dW = Hᵀ G) stay in XLA, which handles them well
    on this target (measured r3; cf. ops/grad_weight.py).

    ``has_acc``: an extra auto-pipelined input block carries the RUNNING
    dH0 accumulator from later depth iterations, folded into the gz output
    in-kernel (``gz_out = gz + acc``) — the depth loop's cotangent
    accumulation then costs one overlapped streamed read instead of a
    separate 3-table XLA add pass (see ``fused_depth_loop``)."""
    if has_acc:
        acc_in_ref, G_ref, gz_ref, g_bufs, y_bufs, g_sems, y_sems = rest
    else:
        acc_in_ref = None
        G_ref, gz_ref, g_bufs, y_bufs, g_sems, y_sems = rest
    s = pl.program_id(0)

    def start(k):
        _ring_dma(g_ref, g_bufs, g_sems, k).start()
        _ring_dma(y_ref, y_bufs, y_sems, k).start()

    def wait(k):
        _ring_dma(g_ref, g_bufs, g_sems, k).wait()
        _ring_dma(y_ref, y_bufs, y_sems, k).wait()
        slot = jax.lax.rem(k, g_bufs.shape[0])
        # mask in place (compare in f32 — Mosaic has no bf16 cmpf here)
        g_bufs[slot] = jnp.where(
            y_bufs[slot].astype(jnp.float32) > 0,
            g_bufs[slot],
            jnp.zeros_like(g_bufs[slot]),
        )

    _dma_schedule(s, n_chunks, kw, start, wait)

    def gz_at(k):
        return g_bufs[jax.lax.rem(k, g_bufs.shape[0])]

    for u in range(UNROLL):
        c = s * UNROLL + u
        acc = _window_product(
            c, n_chunks, kw, row2d_ref, col2d_ref, revloc_ref, gz_at, g_bufs.shape[-1], dtype
        )
        G_ref[pl.ds(u * CHUNK, CHUNK), :] = acc.astype(G_ref.dtype)
        gz = gz_at(c)
        if acc_in_ref is not None:
            gz = gz.astype(jnp.float32) + acc_in_ref[pl.ds(u * CHUNK, CHUNK), :].astype(
                jnp.float32
            )
        gz_ref[pl.ds(u * CHUNK, CHUNK), :] = gz.astype(gz_ref.dtype)


def _bwd_msg_impl(g, y, src, dst, rev, kw, gz_acc=None):
    """(G, gz) with G[e] = Σ_{k in window: src[k] == dst[e]} gz[k] − gz[rev[e]]
    and gz = g ∘ [y > 0] — the transposed message over the ReLU-masked
    cotangent, single pass. ``gz_acc`` (optional) is folded into the gz
    output in-kernel: ``gz_out = gz + gz_acc``."""
    n, d = g.shape
    # transposed message: row ids = dst, col ids = src (R is symmetric)
    row2d, col2d, rev_local, n_chunks, n_steps, c_pad = _prep_tables(dst, src, rev, kw)
    has_acc = gz_acc is not None
    extra_in_specs = []
    extra_args = []
    if has_acc:
        accp = gz_acc if c_pad == n_chunks else jnp.pad(gz_acc, ((0, c_pad * CHUNK - n), (0, 0)))
        extra_in_specs = [_block_spec(d)]
        extra_args = [accp]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=_id_specs()
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # g (ring-streamed)
            pl.BlockSpec(memory_space=pl.ANY),  # y (ring-streamed)
        ]
        + extra_in_specs,
        out_specs=[_block_spec(d), _block_spec(d)],
        scratch_shapes=[
            pltpu.VMEM((_nslots(kw), CHUNK, d), g.dtype),
            pltpu.VMEM((_nslots(kw), CHUNK, d), y.dtype),
            pltpu.SemaphoreType.DMA((_nslots(kw),)),
            pltpu.SemaphoreType.DMA((_nslots(kw),)),
        ],
    )
    G, gz = pl.pallas_call(
        functools.partial(
            _bwd_msg_kernel, n_chunks=n_chunks, kw=kw, dtype=g.dtype, has_acc=has_acc
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c_pad * CHUNK, d), g.dtype),
            jax.ShapeDtypeStruct((c_pad * CHUNK, d), g.dtype),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(row2d, col2d, rev_local, g, y, *extra_args)
    if c_pad != n_chunks:
        G, gz = G[:n], gz[:n]
    return G, gz


# ---- node-streamed backward (the fused iteration+readout op) --------------
# the last depth iteration's cotangent arrives as the M_v NODE table (the
# readout segment-sum's upstream grad); expanding it to the edge table in XLA
# is a full extra pass (g[dst]: read nodes + write 94.8 MB at 123k edges,
# measured 362 us/step). This kernel variant streams the node table through
# its own watermark ring and expands per edge chunk IN VMEM (a 2-chunk
# one-hot product), so the expanded table never exists in HBM.
WN = 2  # node-window chunks per edge chunk (sorted dst: span <= 127 + offset)
# node ring slots: must cover the max in-flight node-chunk distance
# (lookahead edge chunks x node-advance rate, PLUS the padding-transition
# jump where nbase leaps to the sacrificial node's chunk — measured 22 on
# the 123k-edge bench batch); statically guarded by nodes_window_ok
NSLOTS_N = 28


def _bwd_msg_nodes_kernel(
    nbase_ref,  # [c_pad] per-edge-chunk node-window base (chunk units), SMEM
    row2d_ref,  # dst ids (transposed-message rows)
    col2d_ref,  # src ids (transposed-message cols)
    revloc_ref,
    gn_ref,  # node cotangent table, HBM (watermark-ring streamed)
    y_ref,  # saved forward output (ReLU mask), HBM (ring-streamed)
    G_ref,
    gz_ref,
    g_bufs,  # gz scratch ring (NO DMA: filled by the in-VMEM expansion)
    y_bufs,
    n_bufs,
    y_sems,
    n_sems,
    nmarks,  # SMEM [2]: issued/waited node-chunk watermarks
    *,
    n_chunks,
    n_node_chunks,
    kw,
    band=CHUNK,
):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        nmarks[0] = 0
        nmarks[1] = 0

    def issue_nodes_to(target):
        hi = jnp.minimum(target, n_node_chunks)

        def ib(j, _):
            _ring_dma(gn_ref, n_bufs, n_sems, j).start()
            return 0

        jax.lax.fori_loop(nmarks[0], jnp.maximum(nmarks[0], hi), ib, 0)
        nmarks[0] = jnp.maximum(nmarks[0], hi)

    def wait_nodes_to(target):
        hi = jnp.minimum(target, n_node_chunks)

        def wb(j, _):
            _ring_dma(gn_ref, n_bufs, n_sems, j).wait()
            return 0

        jax.lax.fori_loop(nmarks[1], jnp.maximum(nmarks[1], hi), wb, 0)
        nmarks[1] = jnp.maximum(nmarks[1], hi)

    def start(k):
        _ring_dma(y_ref, y_bufs, y_sems, k).start()
        issue_nodes_to(nbase_ref[k] + WN)

    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)

    def wait(k):
        _ring_dma(y_ref, y_bufs, y_sems, k).wait()
        nb = nbase_ref[k]
        wait_nodes_to(nb + WN)
        # expand the node cotangent to this edge chunk: one-hot rows for ids
        # outside the window are all-zero — exactly right for padding edges
        # (their dst is the sacrificial node whose M_v cotangent is zero)
        local = row2d_ref[k, :] - nb * CHUNK
        acc = jnp.zeros((CHUNK, y_bufs.shape[-1]), jnp.float32)
        for w in range(WN):
            C = (col == (local[:, None] - w * CHUNK)).astype(jnp.bfloat16)
            nslot = jax.lax.rem(nb + w, NSLOTS_N)
            acc = acc + jax.lax.dot(C, n_bufs[nslot], preferred_element_type=jnp.float32)
        slot = jax.lax.rem(k, g_bufs.shape[0])
        g_bufs[slot] = jnp.where(
            y_bufs[jax.lax.rem(k, y_bufs.shape[0])].astype(jnp.float32) > 0,
            acc,
            0.0,
        ).astype(g_bufs.dtype)

    _dma_schedule(s, n_chunks, kw, start, wait)

    def gz_at(k):
        return g_bufs[jax.lax.rem(k, g_bufs.shape[0])]

    for u in range(UNROLL):
        c = s * UNROLL + u
        acc = _window_product(
            c, n_chunks, kw, row2d_ref, col2d_ref, revloc_ref, gz_at,
            g_bufs.shape[-1], jnp.bfloat16,
        )
        G_ref[pl.ds(u * CHUNK, CHUNK), :] = acc.astype(G_ref.dtype)
        gz_ref[pl.ds(u * CHUNK, CHUNK), :] = gz_at(c).astype(gz_ref.dtype)


def nodes_window_ok(dst, n_nodes: int, kw: int) -> bool:
    """STATIC (host/numpy, collate-time) validity of the node-streamed
    backward for a dst-sorted edge table: every real dst id (the sacrificial
    padding id ``n_nodes - 1`` is expected out-of-window) lies inside its
    chunk's WN-chunk window, and the DMA lookahead never outruns the node
    ring. Collate stamps the result on ``BatchMolGraph.readout_ok`` so the
    backward picks the kernel with a Python-level branch — a traced
    ``lax.cond`` here measured +360 us/step of conditional copy overhead
    AND let XLA hoist the fallback's g[dst] expand out of the branch."""
    import numpy as _np

    dst = _np.asarray(dst)
    n = dst.shape[0]
    if n % CHUNK != 0:
        return False
    row2d = dst.reshape(n // CHUNK, CHUNK)
    n_node_chunks = -(-n_nodes // CHUNK)
    nbase = _np.clip(row2d[:, 0] // CHUNK, 0, max(n_node_chunks - WN, 0))
    real = row2d < n_nodes - 1
    mx = _np.where(real, row2d, -1).max(axis=1)
    if not bool((mx - nbase * CHUNK < WN * CHUNK).all()):
        return False
    lookahead = (UNROLL + 2 * kw) + PREFETCH
    ahead = _np.concatenate([nbase[lookahead:], _np.full(min(lookahead, len(nbase)), nbase[-1])])
    return bool((ahead + WN - nbase <= NSLOTS_N).all())


def _bwd_msg_nodes_impl(g_nodes, y, src, dst, rev, kw, band=CHUNK):
    """(G, gz) with the node-cotangent expansion fused into the masked
    transposed-message kernel (see ``_bwd_msg_nodes_kernel``). Callers must
    have verified ``nodes_window_ok`` (collate stamps it statically)."""
    n, d = y.shape
    n_nodes = g_nodes.shape[0]
    row2d, col2d, rev_local, n_chunks, n_steps, c_pad = _prep_tables(dst, src, rev, kw)
    n_node_chunks = -(-n_nodes // CHUNK)
    gp = g_nodes
    if n_node_chunks * CHUNK != n_nodes:
        gp = jnp.pad(g_nodes, ((0, n_node_chunks * CHUNK - n_nodes), (0, 0)))
    # dst sorted -> the chunk's first id is its minimum (padded chunks carry
    # -1 ids -> base clips to 0, outputs sliced)
    nbase = jnp.clip(row2d[:, 0] // CHUNK, 0, max(n_node_chunks - WN, 0)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # nbase
        grid=(n_steps,),
        in_specs=_id_specs()
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # g_nodes (watermark ring)
            pl.BlockSpec(memory_space=pl.ANY),  # y (ring-streamed)
        ],
        # index maps take (grid idx, scalar-prefetch ref) here
        out_specs=[
            pl.BlockSpec((UNROLL * CHUNK, d), lambda s, nb: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((UNROLL * CHUNK, d), lambda s, nb: (s, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_nslots(kw), CHUNK, d), jnp.bfloat16),  # gz scratch ring
            pltpu.VMEM((_nslots(kw), CHUNK, d), y.dtype),  # y ring
            pltpu.VMEM((NSLOTS_N, CHUNK, d), g_nodes.dtype),  # node ring
            pltpu.SemaphoreType.DMA((_nslots(kw),)),
            pltpu.SemaphoreType.DMA((NSLOTS_N,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    G, gz = pl.pallas_call(
        functools.partial(
            _bwd_msg_nodes_kernel,
            n_chunks=n_chunks,
            n_node_chunks=n_node_chunks,
            kw=kw,
            band=band,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c_pad * CHUNK, d), y.dtype),
            jax.ShapeDtypeStruct((c_pad * CHUNK, d), y.dtype),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(nbase, row2d, col2d, rev_local, gp, y)
    if c_pad != n_chunks:
        G, gz = G[:n], gz[:n]
    return G, gz


def _bwd_msg_nodes_usable(g_nodes, y, kw: int) -> bool:
    n, d = y.shape
    nslots = _nslots(kw)
    vmem = (
        2 * nslots * CHUNK * d * 2  # gz scratch + y rings (bf16)
        + NSLOTS_N * CHUNK * d * 2  # node ring
        + CHUNK * d * 4  # f32 accumulators
        + 2 * 2 * UNROLL * CHUNK * d * 2  # double-buffered G/gz out blocks
        + n * 12  # id tables
    )
    return (
        _usable(y, kw)
        and y.dtype == jnp.bfloat16
        and g_nodes.dtype == jnp.bfloat16
        and vmem <= MAX_VMEM_BYTES
    )


def _bwd_msg_premul_kernel(
    row2d_ref,  # dst ids (transposed-message rows)
    col2d_ref,  # src ids (transposed-message cols)
    revloc_ref,
    gin_ref,  # G of the NEXT iteration's backward, HBM (ring-streamed)
    y_ref,  # this iteration's saved forward output (ReLU mask), HBM
    h0_ref,  # H0 (only when fold_h0), HBM
    wT_ref,  # Wᵀ, fully VMEM-resident
    G_ref,
    z_ref,  # gz (fold_h0=False) or dH0_first = gz + dH∘[H0>0] (fold_h0=True)
    g_bufs,  # gz scratch ring (filled by the in-VMEM Wᵀ product + mask)
    y_bufs,
    h0_bufs,
    z_bufs,  # retained per-chunk z rows (written at output time)
    y_sems,
    h0_sems,
    gin_bufs,
    gin_sems,
    *,
    n_chunks,
    kw,
    fold_h0,
    band=CHUNK,
):
    """Premultiplied masked transposed message: the upstream cotangent
    arrives as the NEXT stage's G table and ``dH = G_next Wᵀ`` happens on
    the VMEM tile right after its DMA — the dH edge table (an XLA GEMM
    writing + this kernel re-reading 94.8 MB at 123k edges) never exists.
    With ``fold_h0`` the first iteration's full H0-cotangent
    ``gz + dH ∘ [H0 > 0]`` is emitted instead of gz, which drops two edge
    tables from the dW_i accumulation prologue downstream."""
    s = pl.program_id(0)

    def start(k):
        _ring_dma(gin_ref, gin_bufs, gin_sems, k).start()
        _ring_dma(y_ref, y_bufs, y_sems, k).start()
        if fold_h0:
            _ring_dma(h0_ref, h0_bufs, h0_sems, k).start()

    WT = wT_ref[...]

    def wait(k):
        _ring_dma(gin_ref, gin_bufs, gin_sems, k).wait()
        _ring_dma(y_ref, y_bufs, y_sems, k).wait()
        dh = jax.lax.dot(
            gin_bufs[jax.lax.rem(k, gin_bufs.shape[0])], WT,
            preferred_element_type=jnp.float32,
        )
        yk = y_bufs[jax.lax.rem(k, y_bufs.shape[0])].astype(jnp.float32)
        gz = jnp.where(yk > 0, dh, 0.0)
        slot = jax.lax.rem(k, g_bufs.shape[0])
        g_bufs[slot] = gz.astype(g_bufs.dtype)
        if fold_h0:
            _ring_dma(h0_ref, h0_bufs, h0_sems, k).wait()
            h0k = h0_bufs[jax.lax.rem(k, h0_bufs.shape[0])].astype(jnp.float32)
            z = gz + jnp.where(h0k > 0, dh, 0.0)
            z_bufs[jax.lax.rem(k, z_bufs.shape[0])] = z.astype(z_bufs.dtype)

    _dma_schedule(s, n_chunks, kw, start, wait)

    def gz_at(k):
        return g_bufs[jax.lax.rem(k, g_bufs.shape[0])]

    for u in range(UNROLL):
        c = s * UNROLL + u
        acc = _window_product(
            c, n_chunks, kw, row2d_ref, col2d_ref, revloc_ref, gz_at,
            g_bufs.shape[-1], jnp.bfloat16, band=band,
        )
        G_ref[pl.ds(u * CHUNK, CHUNK), :] = acc.astype(G_ref.dtype)
        src_ring = z_bufs if fold_h0 else g_bufs
        z_ref[pl.ds(u * CHUNK, CHUNK), :] = src_ring[
            jax.lax.rem(c, src_ring.shape[0])
        ].astype(z_ref.dtype)


def _bwd_msg_premul_impl(G_in, y, H0, W, src, dst, rev, kw, fold_h0, band=CHUNK):
    """(G, z): the premultiplied backward stage. ``z`` is gz, or the folded
    first-iteration H0 cotangent when ``fold_h0`` (H0 required then)."""
    n, d = y.shape
    row2d, col2d, rev_local, n_chunks, n_steps, c_pad = _prep_tables(dst, src, rev, kw)
    h0 = H0 if fold_h0 else jnp.zeros((CHUNK, d), y.dtype)  # placeholder
    nslots = _nslots(kw)
    # compute-side scratch rings (no DMA prefetch to cover): the gz window
    # product reads +-kw around each output chunk and writes land kw+UNROLL
    # ahead, so retention is 2kw + UNROLL (+2 margin) — NOT the DMA ring
    # depth (VMEM budget: three full DMA rings already cost ~9 MB at d=384)
    sslots = 2 * kw + UNROLL + 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=_id_specs()
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # G_in
            pl.BlockSpec(memory_space=pl.ANY),  # y
            pl.BlockSpec(memory_space=pl.ANY),  # H0 (or placeholder)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wᵀ
        ],
        out_specs=[_block_spec(d), _block_spec(d)],
        scratch_shapes=[
            pltpu.VMEM((sslots, CHUNK, d), jnp.bfloat16),  # gz scratch ring
            pltpu.VMEM((nslots, CHUNK, d), y.dtype),  # y ring
            pltpu.VMEM((nslots if fold_h0 else 1, CHUNK, d), y.dtype),  # h0 ring
            pltpu.VMEM((sslots if fold_h0 else 1, CHUNK, d), jnp.bfloat16),  # z ring
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((nslots if fold_h0 else 1,)),
            pltpu.VMEM((nslots, CHUNK, d), G_in.dtype),  # G_in ring
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )
    G, z = pl.pallas_call(
        functools.partial(
            _bwd_msg_premul_kernel, n_chunks=n_chunks, kw=kw, fold_h0=fold_h0, band=band
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c_pad * CHUNK, d), y.dtype),
            jax.ShapeDtypeStruct((c_pad * CHUNK, d), y.dtype),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(row2d, col2d, rev_local, G_in, y, h0, W.T)
    if c_pad != n_chunks:
        G, z = G[:n], z[:n]
    return G, z


def _bwd_msg_premul_usable(G_in, y, W, kw: int) -> bool:
    n, d = y.shape
    nslots = _nslots(kw)
    sslots = 2 * kw + UNROLL + 2
    vmem = (
        3 * nslots * CHUNK * d * 2  # G_in, y, h0 DMA rings (bf16)
        + 2 * sslots * CHUNK * d * 2  # gz, z compute scratch rings
        + d * d * 2  # Wᵀ tile
        + CHUNK * d * 4 * 2  # f32 accumulators (window product + Wᵀ GEMM)
        + 2 * 2 * UNROLL * CHUNK * d * 2  # double-buffered out blocks
        + n * 12  # id tables
    )
    return (
        _usable(y, kw)
        and y.dtype == jnp.bfloat16
        and G_in.dtype == jnp.bfloat16
        and W.shape == (d, d)
        and W.dtype == jnp.bfloat16
        and vmem <= MAX_VMEM_BYTES
    )


def _bwd_msg_usable(g, y, kw: int) -> bool:
    n, d = g.shape
    nslots = _nslots(kw)
    itemsize = jnp.dtype(g.dtype).itemsize
    vmem = (
        2 * nslots * CHUNK * d * itemsize  # g and y rings
        + CHUNK * d * 4  # f32 message accumulator
        + 2 * 2 * UNROLL * CHUNK * d * itemsize  # double-buffered G/gz blocks
        + n * 12  # id tables
    )
    return _usable(g, kw) and y.dtype == g.dtype and vmem <= MAX_VMEM_BYTES


def iter_usable(H, W, kw: int) -> bool:
    """Gate for the fused-iteration kernel: bf16 compute only (the TPU
    production precision policy), square lane-aligned W, and a VMEM budget
    that also covers the iteration kernels' extra residents beyond the
    plain message kernel (W / Wᵀ, the double-buffered H0 and output blocks,
    and the opt-in backward's second ring + (d, d) f32 accumulator)."""
    n, d = H.shape
    nslots = (UNROLL + 2 * kw) + PREFETCH + UNROLL
    vmem = (
        2 * nslots * CHUNK * d * 2  # two bf16 DMA rings (bwd streams g AND y)
        + 2 * d * d * 2  # W and Wᵀ tiles
        + d * d * 4  # bwd dW f32 accumulator block
        + 3 * 2 * UNROLL * CHUNK * d * 2  # double-buffered H0/out/gz blocks
        + CHUNK * d * 4  # f32 message accumulator
        + n * 12  # id tables
    )
    return (
        _usable(H, kw)
        and H.dtype == jnp.bfloat16
        and W.shape == (d, d)
        and W.dtype == jnp.bfloat16
        and vmem <= MAX_VMEM_BYTES
    )


def _iter_composed(H, H0, W, b, src, dst, rev, n_nodes, window):
    y = fused_message(H, src, dst, rev, n_nodes, window) @ W
    if b is not None:
        y = y + b
    return jax.nn.relu(H0 + y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_message_iter(H, H0, W, b, src, dst, rev, n_nodes: int, window: int = 2):
    """One D-MPNN depth iteration, ``relu(H0 + message(H) @ W [+ b])``, as a
    single Pallas pass (reference semantics: ``chemprop/nn/message_passing/
    base.py:135-141`` update with ReLU activation).

    The custom VJP never materializes the message table M: with S the
    message operator, ``d/dW = Hᵀ(Sᵀ gz)`` and ``d/dH = (Sᵀ gz) Wᵀ`` share
    the single transposed-kernel product ``G = Sᵀ gz`` (gz masked by the
    saved ReLU output), so the backward pass is one kernel call plus two
    GEMMs. Same safety-window requirements as :func:`fused_message`."""
    return _iter_fwd(H, H0, W, b, src, dst, rev, n_nodes, window)[0]


def _iter_fwd(H, H0, W, b, src, dst, rev, n_nodes, window):
    if iter_usable(H, W, window):
        y = _iter_impl(H, H0, W, b, src, dst, rev, window)
    else:
        y = _iter_composed(H, H0, W, b, src, dst, rev, n_nodes, window)
    return y, (y, H, W, b, src, dst, rev)


def _iter_bwd(n_nodes, window, res, g):
    y, H, W, b, src, dst, rev = res
    # the all-in-one bwd kernel measures SLOWER than the composed bwd on
    # v5e (1.48 vs 0.95 ms on the 123k-edge batch: the in-kernel Hᵀ
    # contraction and double-ring gz recompute cost more than the saved
    # HBM passes), so it stays opt-in for future tuning
    fused_bwd = os.environ.get("CHEMPROP_TPU_FUSED_BWD", "0") == "1"
    if fused_bwd and iter_usable(H, W, window) and g.dtype == jnp.bfloat16:
        dH, gz, dWf = _iter_bwd_impl(g, y, H, W, src, dst, rev, window)
        dW = dWf.astype(W.dtype)
    else:
        if _bwd_msg_usable(g, y, window):
            # one pass: gz masking fused into the transposed message kernel
            G, gz = _bwd_msg_impl(g, y, src, dst, rev, window)
        else:
            gz = g * (y > 0).astype(g.dtype)
            # G = Sᵀ gz: transposed message kernel (row/col id roles swapped)
            if _usable(gz, window):
                G = _fused_message_impl(gz, dst, src, rev, window)
            else:
                from chemprop_tpu.ops.gather import gather_dst, gather_rev
                from chemprop_tpu.ops.segment import segment_sum

                g_rev = gather_rev(gz, rev)
                G = gather_dst(segment_sum(g_rev, dst, n_nodes, sorted=True), dst) - g_rev
                G = G.astype(gz.dtype)
        from chemprop_tpu.ops.grad_weight import grad_weight

        # no preferred_element_type: the MXU accumulates in f32 either way,
        # and a bf16 output dtype avoids materializing an f32 edge table
        # (2x the write bytes) plus a separate convert pass
        dH = jax.lax.dot(G, W.T).astype(H.dtype)
        # dW = Hᵀ G: grad_weight dispatches to the Pallas reduction GEMM only
        # when CHEMPROP_TPU_GRAD_W=1 (XLA wins in context on v5e — measured)
        dW = grad_weight(H, G).astype(W.dtype)
    db = None if b is None else jnp.sum(gz.astype(jnp.float32), axis=0).astype(b.dtype)
    return dH, gz, dW, db, None, None, None


fused_message_iter.defvjp(_iter_fwd, _iter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_first_iter(H0, W, b, src, dst, rev, n_nodes: int, window: int = 2):
    """The FIRST depth iteration ``relu(H0 + message(relu(H0)) @ W [+ b])``
    with the input activation applied on the fly to the streamed chunks
    (``relu_stream``) — ``relu(H0)`` is never materialized in HBM, saving a
    full edge-table write + read per step vs the generic
    :func:`fused_message_iter` (reference semantics: ``base.py:196-206``
    first loop pass over ``H = tau(H_0)``)."""
    return _first_fwd(H0, W, b, src, dst, rev, n_nodes, window)[0]


def _relu(x):
    return jnp.maximum(x, 0).astype(x.dtype)


def _first_fwd(H0, W, b, src, dst, rev, n_nodes, window):
    if iter_usable(H0, W, window):
        y = _iter_impl(H0, H0, W, b, src, dst, rev, window, relu_stream=True)
    else:
        y = _iter_composed(_relu(H0), H0, W, b, src, dst, rev, n_nodes, window)
    return y, (y, H0, W, b, src, dst, rev)


def _first_bwd(n_nodes, window, res, g):
    y, H0, W, b, src, dst, rev = res
    if _bwd_msg_usable(g, y, window):
        G, gz = _bwd_msg_impl(g, y, src, dst, rev, window)
    else:
        gz = g * (y > 0).astype(g.dtype)
        if _usable(gz, window):
            G = _fused_message_impl(gz, dst, src, rev, window)
        else:
            from chemprop_tpu.ops.gather import gather_dst, gather_rev
            from chemprop_tpu.ops.segment import segment_sum

            g_rev = gather_rev(gz, rev)
            G = gather_dst(segment_sum(g_rev, dst, n_nodes, sorted=True), dst) - g_rev
            G = G.astype(gz.dtype)
    from chemprop_tpu.ops.grad_weight import grad_weight

    # no preferred_element_type: bf16 store with f32 MXU accumulation (see
    # _iter_bwd) — halves this GEMM's output bytes
    dH = jax.lax.dot(G, W.T).astype(H0.dtype)
    # message input was relu(H0): chain through the streamed activation
    dH0 = gz + dH * (H0 > 0).astype(dH.dtype)
    dW = grad_weight(_relu(H0), G).astype(W.dtype)
    db = None if b is None else jnp.sum(gz.astype(jnp.float32), axis=0).astype(b.dtype)
    return dH0, dW, db, None, None, None


fused_first_iter.defvjp(_first_fwd, _first_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_depth_loop(H0, W, b, src, dst, rev, n_nodes: int, window: int, depth: int):
    """The WHOLE D-MPNN depth loop (iterations 1..depth-1, shared W_h, no
    dropout) as one custom-VJP op:

        H = relu(H0);  repeat depth-1 times:  H = relu(H0 + message(H) @ W [+ b])

    Forward runs :func:`fused_first_iter`'s streamed-ReLU kernel then
    depth-2 fused iterations. The hand-written backward walks the chain in
    reverse with the masked transposed-message kernel, ACCUMULATING the
    running dH0 cotangent in-kernel (``has_acc``) — the per-iteration
    custom-VJP formulation leaves that accumulation to XLA ``add`` passes
    over the edge table (~0.2 ms/step at 123k edges). Reference semantics:
    ``chemprop/nn/message_passing/base.py:196-206``."""
    return _loop_fwd(H0, W, b, src, dst, rev, n_nodes, window, depth)[0]


def _loop_fwd(H0, W, b, src, dst, rev, n_nodes, window, depth):
    usable = iter_usable(H0, W, window)
    if usable:
        y = _iter_impl(H0, H0, W, b, src, dst, rev, window, relu_stream=True)
    else:
        y = _iter_composed(_relu(H0), H0, W, b, src, dst, rev, n_nodes, window)
    ys = [y]
    for _ in range(2, depth):
        if usable:
            y = _iter_impl(y, H0, W, b, src, dst, rev, window)
        else:
            y = _iter_composed(y, H0, W, b, src, dst, rev, n_nodes, window)
        ys.append(y)
    return ys[-1], (tuple(ys), H0, W, b, src, dst, rev)


def _loop_bwd(n_nodes, window, depth, res, g):
    ys, H0, W, b, src, dst, rev = res

    def transposed(g, y, acc):
        if _bwd_msg_usable(g, y, window):
            return _bwd_msg_impl(g, y, src, dst, rev, window, gz_acc=acc)
        gz = g * (y > 0).astype(g.dtype)
        if _usable(gz, window):
            G = _fused_message_impl(gz, dst, src, rev, window)
        else:
            from chemprop_tpu.ops.gather import gather_dst, gather_rev
            from chemprop_tpu.ops.segment import segment_sum

            g_rev = gather_rev(gz, rev)
            G = gather_dst(segment_sum(g_rev, dst, n_nodes, sorted=True), dst) - g_rev
            G = G.astype(gz.dtype)
        return G, (gz if acc is None else gz + acc)

    from chemprop_tpu.ops.grad_weight import grad_weight

    dW = None
    dH0_acc = None
    for t in range(depth - 1, 0, -1):
        y_t = ys[t - 1]
        G, dH0_acc = transposed(g, y_t, dH0_acc)
        x_t = ys[t - 2] if t >= 2 else _relu(H0)  # iteration input
        dWt = grad_weight(x_t, G)
        dW = dWt if dW is None else dW + dWt
        g = jax.lax.dot(G, W.T).astype(H0.dtype)  # cotangent into H_{t-1}
    # bias gradient: sum of every iteration's gz = the accumulator pre-final
    db = (
        None
        if b is None
        else jnp.sum(dH0_acc.astype(jnp.float32), axis=0).astype(b.dtype)
    )
    # first iteration's input was relu(H0): chain through the activation
    dH0 = dH0_acc + g * (H0 > 0).astype(g.dtype)
    return dH0, dW.astype(W.dtype), db, None, None, None


fused_depth_loop.defvjp(_loop_fwd, _loop_bwd)


def _usable(H, kw: int = 2) -> bool:
    n, d = H.shape
    if os.environ.get("CHEMPROP_TPU_PALLAS", "1") != "1":
        return False
    if jax.devices()[0].platform != "tpu" and not _interpret():
        return False
    nslots = (UNROLL + 2 * kw) + PREFETCH + UNROLL
    itemsize = jnp.dtype(H.dtype).itemsize
    vmem = (
        nslots * CHUNK * d * itemsize  # data ring buffer
        + CHUNK * d * 4  # f32 accumulator
        + UNROLL * CHUNK * d * itemsize  # output block
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_iter_readout(
    H, H0, W, b, src, dst, rev, n_nodes: int, window: int = 2, nodes_ok: bool = False
):
    """The LAST depth iteration fused with the M_v readout:

        y   = relu(H0 + message(H) @ W [+ b])
        M_v = segment_sum(y, dst)                 (the node readout table)

    Forward runs the fused iteration kernel then the sorted-segment kernel
    (y is materialized once — it is also this op's own ReLU-mask residual).
    The payoff is the BACKWARD: the upstream cotangent arrives as the NODE
    table dM_v, and the masked transposed-message kernel expands it to edge
    rows in VMEM (``_bwd_msg_nodes_kernel``) — the expanded edge table
    (g[dst], a full extra HBM pass, measured 362 us/step at 123k edges)
    never exists. ``nodes_ok`` is the STATIC collate-stamped window validity
    (``nodes_window_ok`` / ``BatchMolGraph.readout_ok``). Reference
    semantics: the last loop pass + scatter of
    ``chemprop/nn/message_passing/base.py:196-212``."""
    return _readout_fwd(H, H0, W, b, src, dst, rev, n_nodes, window, nodes_ok)[0]


def _readout_fwd(H, H0, W, b, src, dst, rev, n_nodes, window, nodes_ok):
    from chemprop_tpu.ops.segment import segment_sum

    if iter_usable(H, W, window):
        y = _iter_impl(H, H0, W, b, src, dst, rev, window)
    else:
        y = _iter_composed(H, H0, W, b, src, dst, rev, n_nodes, window)
    M_v = segment_sum(y, dst, n_nodes, sorted=True)
    return M_v, (y, H, W, b, src, dst, rev)


def _readout_bwd(n_nodes, window, nodes_ok, res, g_Mv):
    y, H, W, b, src, dst, rev = res
    g_Mv = g_Mv.astype(y.dtype)
    if nodes_ok and _bwd_msg_nodes_usable(g_Mv, y, window):
        G, gz = _bwd_msg_nodes_impl(g_Mv, y, src, dst, rev, window)
    else:
        g = g_Mv[dst].astype(y.dtype)
        if _bwd_msg_usable(g, y, window):
            G, gz = _bwd_msg_impl(g, y, src, dst, rev, window)
        else:
            gz = g * (y > 0).astype(g.dtype)
            if _usable(gz, window):
                G = _fused_message_impl(gz, dst, src, rev, window)
            else:
                from chemprop_tpu.ops.gather import gather_dst, gather_rev
                from chemprop_tpu.ops.segment import segment_sum

                g_rev = gather_rev(gz, rev)
                G = gather_dst(segment_sum(g_rev, dst, n_nodes, sorted=True), dst) - g_rev
                G = G.astype(gz.dtype)
    from chemprop_tpu.ops.grad_weight import grad_weight

    dH = jax.lax.dot(G, W.T).astype(H.dtype)
    dW = grad_weight(H, G).astype(W.dtype)
    db = None if b is None else jnp.sum(gz.astype(jnp.float32), axis=0).astype(b.dtype)
    return dH, gz, dW, db, None, None, None


fused_iter_readout.defvjp(_readout_fwd, _readout_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_loop_readout(
    H0, W, b, src, dst, rev, n_nodes: int, window: int, depth: int,
    nodes_ok: bool = False, band: int = CHUNK,
):
    """The WHOLE depth loop + M_v readout as one custom-VJP op (the fused
    path's production composition for ReLU bond MP without dropout):

        H = relu(H0); repeat depth-1 times: H = relu(H0 + message(H) @ W [+ b])
        M_v = segment_sum(H, dst)

    Forward: the streamed-ReLU first-iteration kernel, depth-2 fused
    iterations, then the sorted-segment readout (identical numerics and
    kernels to the unfused chain). The hand-written backward chains three
    kernel specializations so NO cotangent edge table ever round-trips HBM:

    * last iteration: the M_v NODE cotangent expands in VMEM
      (``_bwd_msg_nodes_kernel`` — kills the g[dst] expand pass);
    * middle/first iterations: the next stage's G table premultiplies by Wᵀ
      in VMEM (``_bwd_msg_premul_kernel`` — kills the dH GEMM pass), and the
      first iteration folds ``gz + dH∘[H0>0]`` so the dW_i accumulation
      downstream reads two fewer edge tables.

    Bias gradients need the per-iteration gz sums, so ``b is not None``
    falls back to the per-iteration VJP composition at the model level.
    Reference semantics: ``chemprop/nn/message_passing/base.py:196-212``."""
    return _loop_readout_fwd(H0, W, b, src, dst, rev, n_nodes, window, depth, nodes_ok, band)[0]


def _loop_readout_fwd(H0, W, b, src, dst, rev, n_nodes, window, depth, nodes_ok, band):
    from chemprop_tpu.ops.segment import segment_sum

    usable = iter_usable(H0, W, window)
    if depth >= 3 and usable and iter2_usable(H0, W, window):
        # the chained kernel: iterations 1+2 in one edge-table pass
        y1, y = _iter2_impl(H0, W, b, src, dst, rev, window, band=band)
        ys = [y1, y]
        it0 = 3
    elif usable:
        y = _iter_impl(H0, H0, W, b, src, dst, rev, window, relu_stream=True, band=band)
        ys = [y]
        it0 = 2
    else:
        y = _iter_composed(_relu(H0), H0, W, b, src, dst, rev, n_nodes, window)
        ys = [y]
        it0 = 2
    for _ in range(it0, depth):
        if usable:
            y = _iter_impl(y, H0, W, b, src, dst, rev, window, band=band)
        else:
            y = _iter_composed(y, H0, W, b, src, dst, rev, n_nodes, window)
        ys.append(y)
    M_v = segment_sum(y, dst, n_nodes, sorted=True)
    return M_v, (tuple(ys), H0, W, b, src, dst, rev)


def _loop_readout_bwd(n_nodes, window, depth, nodes_ok, band, res, g_Mv):
    ys, H0, W, b, src, dst, rev = res
    from chemprop_tpu.ops.grad_weight import grad_weight

    g_Mv = g_Mv.astype(ys[-1].dtype)
    fast = (
        b is None
        and depth >= 3  # depth 2's single iteration needs the H0 chain rule
        and nodes_ok
        and _bwd_msg_nodes_usable(g_Mv, ys[-1], window)
        and _bwd_msg_premul_usable(ys[-1], ys[-1], W, window)
    )
    if fast:
        # last iteration: node-streamed expansion
        G, gz_last = _bwd_msg_nodes_impl(g_Mv, ys[-1], src, dst, rev, window, band=band)
        dW = grad_weight(ys[-2] if depth >= 3 else _relu(H0), G)
        dH0_parts = [gz_last]
        # middle iterations (depth >= 4), then the first (H0-folded)
        for t in range(depth - 2, 0, -1):
            y_t = ys[t - 1]
            fold = t == 1
            G, z = _bwd_msg_premul_impl(
                G, y_t, H0 if fold else None, W, src, dst, rev, window, fold, band=band
            )
            x_t = ys[t - 2] if t >= 2 else _relu(H0)
            dW = dW + grad_weight(x_t, G)
            dH0_parts.append(z)
        dH0 = dH0_parts[0]
        for p in dH0_parts[1:]:
            dH0 = dH0 + p
        return dH0, dW.astype(W.dtype), None, None, None, None
    # composed fallback: per-iteration chain (identical to the per-iter VJPs)
    g = g_Mv[dst].astype(ys[-1].dtype)
    dW = None
    dH0_acc = None
    for t in range(depth - 1, 0, -1):
        y_t = ys[t - 1]
        if _bwd_msg_usable(g, y_t, window):
            G, gz = _bwd_msg_impl(g, y_t, src, dst, rev, window, gz_acc=dH0_acc)
            dH0_acc = gz
        else:
            gz = g * (y_t > 0).astype(g.dtype)
            if _usable(gz, window):
                G = _fused_message_impl(gz, dst, src, rev, window)
            else:
                from chemprop_tpu.ops.gather import gather_dst, gather_rev
                from chemprop_tpu.ops.segment import segment_sum

                g_rev = gather_rev(gz, rev)
                G = gather_dst(segment_sum(g_rev, dst, n_nodes, sorted=True), dst) - g_rev
                G = G.astype(gz.dtype)
            dH0_acc = gz if dH0_acc is None else dH0_acc + gz
        x_t = ys[t - 2] if t >= 2 else _relu(H0)
        dWt = grad_weight(x_t, G)
        dW = dWt if dW is None else dW + dWt
        g = jax.lax.dot(G, W.T).astype(H0.dtype)
    db = (
        None
        if b is None
        else jnp.sum(dH0_acc.astype(jnp.float32), axis=0).astype(b.dtype)
    )
    dH0 = dH0_acc + g * (H0 > 0).astype(g.dtype)
    return dH0, dW.astype(W.dtype), db, None, None, None


fused_loop_readout.defvjp(_loop_readout_fwd, _loop_readout_bwd)
