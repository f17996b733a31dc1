"""D-MPNN message passing as flax modules over padded batched graphs.

Math matches the reference exactly (``chemprop/nn/message_passing/base.py``
and ``mixins.py``):

    bond:  H0_e  = W_i([V[src_e] ; E_e])
           H_e   = tau(H0_e)
           M_e   = sum_{k: dst_k = src_e} H_k  -  H_{rev(e)}
           H_e   = dropout(tau(H0_e + W_h M_e))          (depth-1 times)
           M_v   = sum_{e: dst_e = v} H_e
           H_v   = dropout(tau(W_o([V_v ; M_v])))
           H_v   = dropout(W_d([H_v ; V_d_v]))           (if descriptors)

TPU-first formulation: the scatter/gather pair is a segment-sum over the
padded edge table (padding edges target the sacrificial padding node, so no
masking is required — garbage never reaches a real node), the depth loop is
unrolled at trace time (depth is small and static), and all feature dims are
static so XLA tiles the three GEMMs onto the MXU. ``param_dtype`` stays
float32; ``compute_dtype`` may be bfloat16 for throughput.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from chemprop_tpu.conf import DEFAULT_HIDDEN_DIM
from chemprop_tpu.data.collate import BatchMolGraph
from chemprop_tpu.nn.transforms import GraphTransform, ScaleTransform
from chemprop_tpu.nn.utils import get_activation_function
from chemprop_tpu.ops.fused_message import (
    fused_depth_loop,
    fused_first_iter,
    fused_loop_readout,
    fused_message,
    fused_message_iter,
)
from chemprop_tpu.ops.gather import gather_dst, gather_rev, gather_src
from chemprop_tpu.ops.grad_weight import matmul as gw_matmul
from chemprop_tpu.ops.segment import segment_sum


class PaddedDense(nn.Module):
    """``nn.Dense`` whose *apply* zero-pads the kernel to lane-aligned
    widths.

    Parameter names, shapes, and initializers match ``nn.Dense`` exactly
    (checkpoint-compatible, identical init values for the same RNG); only
    the computation is widened: extra OUTPUT columns are exact zeros (zero
    kernel columns) and extra INPUT columns hit zero kernel rows, so results
    equal the unpadded computation bit-for-bit on the real block. This keeps
    every edge-table tensor in the D-MPNN depth loop at a 128-multiple
    width, which is what the Pallas kernels' HBM DMAs require — without it,
    every kernel call pays a full-table pad copy."""

    features: int
    pad_to: int | None = None  # output width incl. zero columns
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    in_features: int | None = None  # real input width; inferred if None

    @nn.compact
    def __call__(
        self,
        x: jax.Array | None = None,
        *,
        weights_only: bool = False,
        in_width: int | None = None,
        d_in: int | None = None,
        out_width: int | None = None,
    ) -> jax.Array | tuple[jax.Array, jax.Array | None]:
        """Apply the dense layer, or — with ``weights_only=True`` — create
        the parameters and return the zero-padded ``(kernel, bias)`` pair
        (for fused Pallas ops that consume the weights directly; gradients
        flow back through the pad slices). ``d_in``/``out_width`` override
        the real input width / padded output width per call (the parameter
        shapes always follow ``d_in``/``features``), letting one layer serve
        both the tight and the lane-aligned layout of the same computation."""
        if weights_only:
            d_in = d_in if d_in is not None else (
                self.in_features if self.in_features is not None else in_width
            )
            x_width = in_width if in_width is not None else d_in
        else:
            if d_in is None:
                d_in = self.in_features if self.in_features is not None else x.shape[-1]
            x_width = x.shape[-1]
        from chemprop_tpu.nn import init as init_scheme

        kernel = self.param(
            "kernel", init_scheme.kernel_init(), (d_in, self.features), jnp.float32
        )
        out_w = out_width or self.pad_to or self.features
        k = kernel
        if x_width != d_in:
            k = jnp.pad(k, ((0, x_width - d_in), (0, 0)))
        if out_w != self.features:
            k = jnp.pad(k, ((0, 0), (0, out_w - self.features)))
        b = None
        if self.use_bias:
            b = self.param("bias", init_scheme.bias_init(d_in), (self.features,), jnp.float32)
            if out_w != self.features:
                b = jnp.pad(b, (0, out_w - self.features))
        if weights_only:
            return k.astype(self.dtype), (b.astype(self.dtype) if b is not None else None)
        y = gw_matmul(x.astype(self.dtype), k.astype(self.dtype))
        if b is not None:
            y = y + b.astype(self.dtype)
        return y


def _gather_src(M, bmg):
    if bmg.edges_sorted:
        return gather_src(M, bmg.rev, bmg.dst)
    return M[bmg.src]


def _gather_rev(H, bmg):
    if bmg.edges_sorted:
        return gather_rev(H, bmg.rev)
    return H[bmg.rev]


class _MessagePassingBase(nn.Module):
    d_h: int = DEFAULT_HIDDEN_DIM
    bias: bool = False
    depth: int = 3
    dropout: float = 0.0
    activation: str = "relu"
    undirected: bool = False
    d_vd: int | None = None
    V_d_transform: ScaleTransform | None = None
    graph_transform: GraphTransform | None = None
    compute_dtype: jnp.dtype = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.d_h + self.d_vd if self.d_vd else self.d_h

    # subclasses set True to keep the depth loop's edge tables lane-aligned
    # (PaddedDense zero-pads to a 128-multiple width at apply time)
    _pad_hidden = False

    def setup(self):
        # dtype=compute_dtype keeps the whole depth loop in the compute
        # precision — flax's default promotion would bounce every Dense
        # output back to f32 (params stay f32; casts happen at apply)
        dt = self.compute_dtype
        self._dp = -(-self.d_h // 128) * 128 if self._pad_hidden else self.d_h
        self.W_i = PaddedDense(
            self.d_h, pad_to=self._dp, use_bias=self.bias, name="W_i", dtype=dt
        )
        # in_features: with padded hidden tables W_h sees (E, dp) input whose
        # real block is d_h wide (bond MP; atom MP feeds d_h+d_e unpadded and
        # infers the width from the input)
        self.W_h = PaddedDense(
            self.d_h,
            pad_to=self._dp,
            use_bias=self.bias,
            in_features=self.d_h if self._pad_hidden else None,
            name="W_h",
            dtype=dt,
        )
        # PaddedDense with no pad_to behaves exactly like nn.Dense; the
        # lane-aligned finalize path overrides d_in/out_width per call
        self.W_o = PaddedDense(self.d_h, use_bias=True, name="W_o", dtype=dt)
        if self.d_vd:
            from chemprop_tpu.nn import init as init_scheme

            self.W_d = nn.Dense(
                self.d_h + self.d_vd,
                use_bias=True,
                name="W_d",
                dtype=dt,
                kernel_init=init_scheme.kernel_init(),
                bias_init=init_scheme.bias_init(self.d_h + self.d_vd),
            )
        self.drop = nn.Dropout(self.dropout)
        self.tau: Callable = get_activation_function(self.activation)

    def _initialize(self, bmg: BatchMolGraph) -> jax.Array:
        raise NotImplementedError

    def _message(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        raise NotImplementedError

    def _fused_iter_ok(self, bmg: BatchMolGraph) -> bool:
        """Whether the whole-iteration fused kernel applies (bond MP only)."""
        return False

    def __call__(
        self,
        bmg: BatchMolGraph,
        V_d: jax.Array | None = None,
        is_training: bool = True,
        mc_dropout: bool = False,
        keep_padded: bool = False,
        out_dtype: jnp.dtype | None = jnp.float32,
    ) -> jax.Array:
        # mc_dropout activates dropout layers ONLY (Monte-Carlo dropout
        # uncertainty, reference ``uncertainty/estimator.py:605-636`` patches
        # torch Dropout modules to train mode); eval-only transforms still
        # key on is_training.
        drop_on = is_training or mc_dropout
        if self.graph_transform is not None:
            bmg = self.graph_transform(bmg, is_training)
        n_nodes = bmg.V.shape[0]

        H_0 = self._initialize(bmg).astype(self.compute_dtype)
        # per-layer activation taps for the reference parity gate (no-ops
        # unless the caller makes the 'intermediates' collection mutable)
        self.sow("intermediates", "H_0", H_0)
        H = self.tau(H_0)
        # bond MP with ReLU on sorted fused-safe batches runs each depth
        # iteration as ONE Pallas pass (message + W_h GEMM + residual + ReLU;
        # dispatches internally, composing on other backends)
        # depth > 1 guard: at depth=1 neither branch touches W_h, and the
        # weights-only call would create params the composed branch never
        # does (param-structure divergence across batch flags)
        fuse_iter = self.depth > 1 and self._fused_iter_ok(bmg)
        if fuse_iter:
            W_h, b_h = self.W_h(weights_only=True, in_width=self._dp)
        import os as _os

        # default OFF: measured on v5e r3, the whole-loop custom VJP with
        # in-kernel dH0 accumulation is ~0.1 ms/step SLOWER than the
        # per-iteration VJPs (6.63 vs 6.53 ms on the 123k-edge bench) — the
        # extra streamed accumulator input costs more inside the critical
        # kernel than XLA's well-overlapped add fusions cost outside it
        depth_loop_on = _os.environ.get("CHEMPROP_TPU_DEPTH_LOOP", "0") == "1"
        if fuse_iter and depth_loop_on and not (drop_on and self.dropout > 0):
            # the WHOLE depth loop as one custom-VJP op — hand-written
            # reverse walk with in-kernel dH0 accumulation (per-iteration
            # activation taps are not sown on this path)
            H = fused_depth_loop(
                H_0, W_h, b_h, bmg.src, bmg.dst, bmg.rev, n_nodes,
                bmg.fused_window, self.depth,
            )
            self.sow("intermediates", "H", H)
            M_v = segment_sum(H, bmg.dst, n_nodes, sorted=bmg.edges_sorted)
        else:
            # the WHOLE depth loop + M_v readout as one custom-VJP op
            # (ops/fused_message.py:fused_loop_readout): its hand-written
            # backward chains the node-streamed and premultiplied kernels so
            # no cotangent edge table round-trips HBM. Applicable when
            # nothing needs the intermediate H tables afterwards: no
            # per-iteration dropout, depth >= 3 (depth 2's only iteration is
            # the streamed-ReLU first pass), no activation taps requested
            last_fused = (
                fuse_iter
                and self.depth >= 3
                and not (drop_on and self.dropout > 0)
                and not self.is_mutable_collection("intermediates")
                and _os.environ.get("CHEMPROP_TPU_FUSED_READOUT", "1") == "1"
            )
            n_iters = 1 if last_fused else self.depth
            first = True
            for _ in range(1, n_iters):
                if self.undirected:
                    H = (H + _gather_rev(H, bmg)) / 2
                if fuse_iter:
                    if first:
                        # relu(H_0) streams through the kernel un-materialized
                        H = fused_first_iter(
                            H_0, W_h, b_h, bmg.src, bmg.dst, bmg.rev, n_nodes, bmg.fused_window
                        )
                    else:
                        H = fused_message_iter(
                            H, H_0, W_h, b_h, bmg.src, bmg.dst, bmg.rev, n_nodes, bmg.fused_window
                        )
                    H = self.drop(H, deterministic=not drop_on)
                else:
                    M = self._message(H, bmg)
                    H = self.drop(self.tau(H_0 + self.W_h(M)), deterministic=not drop_on)
                first = False
                self.sow("intermediates", "H", H)
            if last_fused:
                M_v = fused_loop_readout(
                    H_0, W_h, b_h, bmg.src, bmg.dst, bmg.rev, n_nodes,
                    bmg.fused_window, self.depth, getattr(bmg, "readout_ok", False),
                    getattr(bmg, "edge_band", 128),
                )
            else:
                M_v = segment_sum(H, bmg.dst, n_nodes, sorted=bmg.edges_sorted)

        self.sow("intermediates", "M_v", M_v)
        d_v = bmg.V.shape[1]
        wide = (
            keep_padded
            and self._pad_hidden
            and V_d is None
            and self._dp != self.d_h
            # the zero output columns stay exactly zero only when tau(0) == 0
            and self.activation in ("relu", "leakyrelu", "prelu", "tanh", "elu", "gelu", "silu")
        )
        if wide:
            # lane-aligned finalize: keep the 128-multiple edge-hidden width
            # through W_o and the readout, slicing only at graph level — the
            # M_v column slice and the pre-readout pad copy both disappear.
            # M_v's pad block sits at the END of the concat, so W_o's kernel
            # rows zero-pad to cover it and the extra output columns are
            # exact zeros (zero kernel columns, zero bias; tau(0) == 0 for
            # every registered MP activation).
            VM = jnp.concatenate([bmg.V.astype(self.compute_dtype), M_v], axis=1)
            H_v = self.tau(self.W_o(VM, d_in=d_v + self.d_h, out_width=self._dp))
        else:
            M_v = M_v[:, : self.d_h]
            VM = jnp.concatenate([bmg.V.astype(self.compute_dtype), M_v], axis=1)
            H_v = self.tau(self.W_o(VM, d_in=d_v + self.d_h))
        H_v = self.drop(H_v, deterministic=not drop_on)

        if V_d is not None:
            if not self.d_vd:
                raise ValueError("V_d given but d_vd was not configured")
            if self.V_d_transform is not None:
                V_d = self.V_d_transform(V_d, is_training)
            H_v = self.W_d(jnp.concatenate([H_v, V_d.astype(self.compute_dtype)], axis=1))
            H_v = self.drop(H_v, deterministic=not drop_on)

        # out_dtype=None keeps the compute dtype: in bf16 mode the node table
        # is then written once in bf16 (casting to f32 here would materialize
        # an extra f32 node table — ~2x the HBM bytes — for values that are
        # bf16-representable anyway; MPNN casts AFTER the graph readout,
        # which is bitwise-identical since the readout accumulates in f32)
        return H_v if out_dtype is None else H_v.astype(out_dtype)


class BondMessagePassing(_MessagePassingBase):
    """Directed-edge (D-MPNN) message passing; hidden states live on edges.

    Edge tables run lane-aligned (_pad_hidden: d_h padded to a 128-multiple
    with exact-zero columns) so the Pallas kernels never pay pad copies, and
    the message op dispatches to the fully-fused kernel when the batch's
    ``fused_ok`` window holds (one HBM pass instead of 3-4)."""

    _pad_hidden = True

    def _fused_iter_ok(self, bmg: BatchMolGraph) -> bool:
        # ReLU is baked into the fused kernel; other activations (and the
        # undirected pre-average) take the composed path
        return bmg.edges_sorted and bmg.fused_ok and self.activation == "relu" and not self.undirected

    def _initialize(self, bmg: BatchMolGraph) -> jax.Array:
        # cast BEFORE the node->edge gather: exact (casts commute with
        # gathers) and halves the gathered bytes in bf16 mode
        d_in = bmg.V.shape[1] + bmg.E.shape[1]
        V_c = bmg.V.astype(self.compute_dtype)
        import os as _os

        if (
            _os.environ.get("CHEMPROP_TPU_WINDOW_GATHER", "0") == "1"
            and bmg.edges_sorted
            and bmg.fused_ok
            and V_c.dtype == jnp.bfloat16
        ):
            # opt-in Pallas sliding-window gather — measured SLOWER in the
            # full step than the plain gather below on v5e (6.15 vs 6.05 ms
            # on the 123k-edge bench: the containment check + cond + one-hot
            # MXU cost more than XLA's random gather); kept for future
            # hardware (see ops/window_gather.py)
            from chemprop_tpu.ops.window_gather import window_gather

            v_src = window_gather(V_c, bmg.src, w=4 if bmg.fused_window <= 1 else 5)
        else:
            # plain single row gather: V carries no gradient (input data), so
            # the scatter-free-backward rewrite M[dst][rev] buys nothing here
            # and measured 2x slower than the direct gather (381 vs 190 us)
            v_src = V_c[bmg.src]
        parts = [
            v_src,
            bmg.E.astype(self.compute_dtype),
        ]
        # lane-align the edge-feature table: zero input columns hit zero
        # kernel rows (exact), the MXU tiles to 128 either way, and the
        # 128-aligned width lets dW_i stream through the Pallas reduction
        # GEMM instead of XLA's windowed emitter
        d_al = -(-d_in // 128) * 128
        if self._pad_hidden and d_al != d_in:
            parts.append(jnp.zeros((bmg.E.shape[0], d_al - d_in), self.compute_dtype))
        return self.W_i(jnp.concatenate(parts, axis=1), d_in=d_in)

    def _message(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        if bmg.edges_sorted and bmg.fused_ok:
            # single-pass fused kernel (falls back to the composition below
            # internally when the kernel is unusable, e.g. off-TPU)
            return fused_message(
                H, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0], bmg.fused_window
            )
        M_node = segment_sum(H, bmg.dst, bmg.V.shape[0], sorted=bmg.edges_sorted)
        if bmg.edges_sorted:
            # M_node[src] - H[rev] == (M_node[dst] - H)[rev]: one sorted
            # (streaming) gather + one permutation instead of a random gather
            # plus a permutation — and the same identity holds in reverse
            return _gather_rev(gather_dst(M_node, bmg.dst) - H, bmg)
        return M_node[bmg.src] - H[bmg.rev]


class AtomMessagePassing(_MessagePassingBase):
    """Atom-centered message passing; hidden states live on edges but carry
    node-features-only initialization (cf. reference ``base.py:254-289``)."""

    def _initialize(self, bmg: BatchMolGraph) -> jax.Array:
        return _gather_src(self.W_i(bmg.V.astype(self.compute_dtype)), bmg)

    def _message(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        HE = jnp.concatenate([H, bmg.E.astype(self.compute_dtype)], axis=1)
        return _gather_src(
            segment_sum(HE, bmg.dst, bmg.V.shape[0], sorted=bmg.edges_sorted), bmg
        )
