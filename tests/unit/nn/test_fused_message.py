"""Parity tests for the fused message kernel (ops/fused_message.py) run in
Pallas interpret mode against the composed segment-sum/gather formulation.
Real-edge rows must match exactly (padding-edge rows are garbage-tolerated
by design). The gradient check exercises the transpose-kernel VJP."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset
from chemprop_tpu.data.collate import PadSpec, batch_mol_graphs
from chemprop_tpu.ops.fused_message import (
    CHUNK,
    _composed,
    _fused_message_impl,
    fused_message,
)

WIN = 5 * CHUNK

SMIS = [
    "CCO",
    "c1ccccc1",
    "CC(=O)Nc1ccc(O)cc1",
    "CNC(C)Cc1ccccc1",
    "CC(C)CC1=CC=C(C=C1)C(C)C(=O)O",
    "c1ccc2ccccc2c1",
    "CC(=O)OC1=CC=CC=C1C(=O)O",
    "C1CCNCC1",
    "C",  # zero-edge molecule
    "O=[N+]([O-])c1ccc(Cl)cc1",
]


@pytest.fixture(scope="module")
def bmg():
    dps = [MoleculeDatapoint.from_smi(s, y=np.zeros(1)) for s in SMIS]
    ds = MoleculeDataset(dps)
    mgs = [ds[i].mg for i in range(len(ds))]
    b = batch_mol_graphs(mgs, PadSpec(256, 768, len(SMIS)), sort_edges=True)
    assert b.fused_ok and b.E.shape[0] >= WIN
    return b


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setenv("CHEMPROP_TPU_INTERPRET", "1")


def _rand(bmg, d, dtype, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((bmg.E.shape[0], d)).astype(dtype))


@pytest.mark.parametrize("kw", [1, 2])
@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_forward_matches_composed(bmg, dtype, kw):
    H = _rand(bmg, 128, np.dtype(dtype) if dtype != "bfloat16" else jnp.bfloat16)
    out_k = np.asarray(
        _fused_message_impl(H, bmg.src, bmg.dst, bmg.rev, kw), np.float32
    )
    out_c = np.asarray(
        _composed(H, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0]), np.float32
    )
    mask = np.asarray(bmg.edge_mask)
    tol = 1e-4 if dtype == np.float32 else 0.15
    np.testing.assert_allclose(out_k[mask], out_c[mask], atol=tol, rtol=tol)


def test_gradient_matches_composed(bmg):
    H = _rand(bmg, 128, np.float32)
    mask = jnp.asarray(np.asarray(bmg.edge_mask))[:, None]

    def loss_fused(H):
        out = fused_message(H, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0])
        return jnp.sum(jnp.where(mask, out, 0.0) ** 2)

    def loss_composed(H):
        out = _composed(H, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0])
        return jnp.sum(jnp.where(mask, out, 0.0) ** 2)

    g_k = np.asarray(jax.grad(loss_fused)(H))
    g_c = np.asarray(jax.grad(loss_composed)(H))
    # gradients flow into ALL real-edge rows (incl. via neighbours), and
    # padding-edge H rows only influence padding outputs, which are masked
    real = np.asarray(bmg.edge_mask)
    np.testing.assert_allclose(g_k[real], g_c[real], atol=2e-3, rtol=2e-3)


def test_transpose_identity(bmg):
    """<v, T u> == <Tᵀ v, u> — the VJP really is the operator transpose."""
    rng = np.random.default_rng(1)
    # zero padding rows: that is the operator's contract (in the model, the
    # cotangent reaching the message op is exactly zero on padding edges,
    # and kernel outputs on padding rows are garbage-tolerated)
    mask = np.asarray(bmg.edge_mask)[:, None]
    u = jnp.asarray(rng.standard_normal((bmg.E.shape[0], 128)).astype(np.float32) * mask)
    v = jnp.asarray(rng.standard_normal((bmg.E.shape[0], 128)).astype(np.float32) * mask)
    n_nodes = bmg.V.shape[0]

    Tu, vjp = jax.vjp(lambda x: fused_message(x, bmg.src, bmg.dst, bmg.rev, n_nodes), u)
    (Ttv,) = vjp(v)
    lhs = float(jnp.vdot(v, Tu))
    rhs = float(jnp.vdot(Ttv, u))
    assert lhs == pytest.approx(rhs, rel=1e-3)


def test_model_level_fused_vs_composed(bmg, monkeypatch):
    """BondMessagePassing output is identical whether the batch dispatches
    to the fused kernel (interpret) or the composed path."""
    from chemprop_tpu.nn import BondMessagePassing

    model = BondMessagePassing(d_h=32, depth=3)
    variables = model.init(jax.random.PRNGKey(0), bmg, None, False)
    out_fused = np.asarray(model.apply(variables, bmg, None, False))
    b_no = bmg.replace(fused_ok=False)
    out_comp = np.asarray(model.apply(variables, b_no, None, False))
    node_mask = np.asarray(bmg.node_mask)
    np.testing.assert_allclose(out_fused[node_mask], out_comp[node_mask], atol=1e-4)


class TestFusedMessageIter:
    """The whole-iteration op relu(H0 + message(H) @ W [+ b]): kernel
    (interpret) vs the composed formulation, values and custom-VJP grads."""

    def _inputs(self, bmg, d=128, seed=3):
        rng = np.random.default_rng(seed)
        n = bmg.E.shape[0]
        H = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
        H0 = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
        W = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((d,)), jnp.bfloat16)
        return H, H0, W, b

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_forward_matches_composed(self, bmg, with_bias):
        from chemprop_tpu.ops.fused_message import (
            _iter_composed,
            fused_message_iter,
            iter_usable,
        )

        H, H0, W, b = self._inputs(bmg)
        bias = b if with_bias else None
        assert iter_usable(H, W, bmg.fused_window)
        n_nodes = bmg.V.shape[0]
        y_k = np.asarray(
            fused_message_iter(
                H, H0, W, bias, bmg.src, bmg.dst, bmg.rev, n_nodes, bmg.fused_window
            ),
            np.float32,
        )
        y_c = np.asarray(
            _iter_composed(H, H0, W, bias, bmg.src, bmg.dst, bmg.rev, n_nodes, bmg.fused_window),
            np.float32,
        )
        mask = np.asarray(bmg.edge_mask)
        np.testing.assert_allclose(y_k[mask], y_c[mask], atol=0.15, rtol=0.05)

    @pytest.mark.parametrize("fused_bwd", ["0", "1"])
    def test_grads_match_composed(self, bmg, monkeypatch, fused_bwd):
        from chemprop_tpu.ops.fused_message import _iter_composed, fused_message_iter

        monkeypatch.setenv("CHEMPROP_TPU_FUSED_BWD", fused_bwd)
        H, H0, W, b = self._inputs(bmg)
        n_nodes = bmg.V.shape[0]
        mask = jnp.asarray(np.asarray(bmg.edge_mask))[:, None]

        def loss(fn):
            def f(H, H0, W, b):
                y = fn(H, H0, W, b, bmg.src, bmg.dst, bmg.rev, n_nodes, bmg.fused_window)
                return jnp.sum(jnp.where(mask, y.astype(jnp.float32), 0.0) ** 2)

            return f

        gk = jax.grad(loss(fused_message_iter), argnums=(0, 1, 2, 3))(H, H0, W, b)
        gc = jax.grad(loss(_iter_composed), argnums=(0, 1, 2, 3))(H, H0, W, b)
        real = np.asarray(bmg.edge_mask)
        for name, a, c in zip(["dH", "dH0", "dW", "db"], gk, gc):
            a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
            if a.ndim == 2 and a.shape[0] == bmg.E.shape[0]:
                a, c = a[real], c[real]
            scale = np.abs(c).max() + 1e-3
            np.testing.assert_allclose(a / scale, c / scale, atol=0.03, err_msg=name)

    def test_model_uses_iter_path(self, bmg):
        """BondMessagePassing with bf16 compute and ReLU matches the
        composed path through the whole module."""
        from chemprop_tpu.nn import BondMessagePassing

        model = BondMessagePassing(d_h=128, depth=3, compute_dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), bmg, None, False)
        assert model.bind(variables)._fused_iter_ok(bmg)
        out_fused = np.asarray(model.apply(variables, bmg, None, False), np.float32)
        b_no = bmg.replace(fused_ok=False)
        out_comp = np.asarray(model.apply(variables, b_no, None, False), np.float32)
        node_mask = np.asarray(bmg.node_mask)
        np.testing.assert_allclose(out_fused[node_mask], out_comp[node_mask], atol=0.05, rtol=0.05)


class TestWideWindow:
    """kw=3 (7-chunk window) coverage: a ~150-bond molecule (318 directed
    edges, > SPAN_LIMIT[2]) keeps the fast path at the widened window."""

    @pytest.fixture(scope="class")
    def wide_bmg(self):
        smis = ["C" * 160, "CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1"]
        dps = [MoleculeDatapoint.from_smi(s, y=np.zeros(1)) for s in smis]
        ds = MoleculeDataset(dps)
        b = batch_mol_graphs([ds[i].mg for i in range(len(ds))], PadSpec(512, 1024, len(smis)))
        assert b.fused_ok and b.fused_window == 3
        assert b.E.shape[0] >= 7 * CHUNK
        return b

    @pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
    def test_forward_matches_composed(self, wide_bmg, dtype):
        H = _rand(wide_bmg, 128, np.dtype(dtype) if dtype != "bfloat16" else jnp.bfloat16)
        out_k = np.asarray(
            _fused_message_impl(H, wide_bmg.src, wide_bmg.dst, wide_bmg.rev, 3), np.float32
        )
        out_c = np.asarray(
            _composed(H, wide_bmg.src, wide_bmg.dst, wide_bmg.rev, wide_bmg.V.shape[0]),
            np.float32,
        )
        mask = np.asarray(wide_bmg.edge_mask)
        tol = 1e-4 if dtype == np.float32 else 0.3
        np.testing.assert_allclose(out_k[mask], out_c[mask], atol=tol, rtol=tol)

    def test_iter_grads_match_composed(self, wide_bmg):
        from chemprop_tpu.ops.fused_message import (
            _iter_composed,
            fused_message_iter,
            iter_usable,
        )

        rng = np.random.default_rng(7)
        n, d = wide_bmg.E.shape[0], 128
        H = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
        H0 = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
        W = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.bfloat16)
        assert iter_usable(H, W, wide_bmg.fused_window)
        n_nodes = wide_bmg.V.shape[0]
        mask = jnp.asarray(np.asarray(wide_bmg.edge_mask))[:, None]

        def loss(fn):
            def f(H, H0, W):
                y = fn(H, H0, W, None, wide_bmg.src, wide_bmg.dst, wide_bmg.rev, n_nodes, 3)
                return jnp.sum(jnp.where(mask, y.astype(jnp.float32), 0.0) ** 2)

            return f

        gk = jax.grad(loss(fused_message_iter), argnums=(0, 1, 2))(H, H0, W)
        gc = jax.grad(loss(_iter_composed), argnums=(0, 1, 2))(H, H0, W)
        real = np.asarray(wide_bmg.edge_mask)
        for name, a, c in zip(["dH", "dH0", "dW"], gk, gc):
            a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
            if a.shape[0] == n:
                a, c = a[real], c[real]
            scale = np.abs(c).max() + 1e-3
            np.testing.assert_allclose(a / scale, c / scale, atol=0.03, err_msg=name)


class TestFusedFirstIter:
    """The first-iteration op relu(H0 + message(relu(H0)) @ W [+ b]) with
    the input ReLU applied to the streamed chunks: kernel (interpret) vs the
    composed formulation, values and custom-VJP grads (dH0 chains through
    both the residual and the streamed activation)."""

    def _inputs(self, bmg, d=128, seed=7):
        rng = np.random.default_rng(seed)
        n = bmg.E.shape[0]
        H0 = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
        W = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((d,)), jnp.bfloat16)
        return H0, W, b

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_forward_matches_composed(self, bmg, with_bias):
        from chemprop_tpu.ops.fused_message import (
            _iter_composed,
            fused_first_iter,
            iter_usable,
        )

        H0, W, b = self._inputs(bmg)
        bias = b if with_bias else None
        assert iter_usable(H0, W, bmg.fused_window)
        n_nodes = bmg.V.shape[0]
        relu_H0 = jnp.maximum(H0, 0).astype(H0.dtype)
        y_k = np.asarray(
            fused_first_iter(H0, W, bias, bmg.src, bmg.dst, bmg.rev, n_nodes, bmg.fused_window),
            np.float32,
        )
        y_c = np.asarray(
            _iter_composed(
                relu_H0, H0, W, bias, bmg.src, bmg.dst, bmg.rev, n_nodes, bmg.fused_window
            ),
            np.float32,
        )
        mask = np.asarray(bmg.edge_mask)
        np.testing.assert_allclose(y_k[mask], y_c[mask], atol=0.15, rtol=0.05)

    def test_grads_match_composed(self, bmg):
        from chemprop_tpu.ops.fused_message import _iter_composed, fused_first_iter

        H0, W, b = self._inputs(bmg)
        n_nodes = bmg.V.shape[0]
        mask = jnp.asarray(bmg.edge_mask)[:, None]

        def loss_fused(H0, W, b):
            y = fused_first_iter(H0, W, b, bmg.src, bmg.dst, bmg.rev, n_nodes, bmg.fused_window)
            return jnp.sum((y * mask).astype(jnp.float32) ** 2) * 1e-3

        def loss_composed(H0, W, b):
            relu_H0 = jnp.maximum(H0, 0).astype(H0.dtype)
            y = _iter_composed(
                relu_H0, H0, W, b, bmg.src, bmg.dst, bmg.rev, n_nodes, bmg.fused_window
            )
            return jnp.sum((y * mask).astype(jnp.float32) ** 2) * 1e-3

        gk = jax.grad(loss_fused, argnums=(0, 1, 2))(H0, W, b)
        gc = jax.grad(loss_composed, argnums=(0, 1, 2))(H0, W, b)
        for name, a, c in zip(("dH0", "dW", "db"), gk, gc):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                atol=0.5, rtol=0.1, err_msg=name,
            )


class TestFusedDepthLoop:
    """The whole-depth-loop op with hand-written reverse walk and in-kernel
    dH0 accumulation vs the composed per-iteration chain."""

    def _inputs(self, bmg, d=128, seed=11):
        rng = np.random.default_rng(seed)
        n = bmg.E.shape[0]
        H0 = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
        W = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.bfloat16)
        return H0, W, b

    def _composed(self, H0, W, b, bmg, depth):
        from chemprop_tpu.ops.fused_message import _iter_composed

        n_nodes = bmg.V.shape[0]
        H = jnp.maximum(H0, 0).astype(H0.dtype)
        for _ in range(1, depth):
            H = _iter_composed(H, H0, W, b, bmg.src, bmg.dst, bmg.rev, n_nodes, bmg.fused_window)
        return H

    @pytest.mark.parametrize("depth", [2, 3, 4])
    def test_forward_matches_composed(self, bmg, depth):
        from chemprop_tpu.ops.fused_message import fused_depth_loop

        H0, W, b = self._inputs(bmg)
        y_k = np.asarray(
            fused_depth_loop(H0, W, b, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0],
                             bmg.fused_window, depth),
            np.float32,
        )
        y_c = np.asarray(self._composed(H0, W, b, bmg, depth), np.float32)
        mask = np.asarray(bmg.edge_mask)
        np.testing.assert_allclose(y_k[mask], y_c[mask], atol=0.2, rtol=0.05)

    @pytest.mark.parametrize("depth", [2, 3])
    def test_grads_match_composed(self, bmg, depth):
        from chemprop_tpu.ops.fused_message import fused_depth_loop

        H0, W, b = self._inputs(bmg)
        mask = jnp.asarray(bmg.edge_mask)[:, None]

        def loss_fused(H0, W, b):
            y = fused_depth_loop(H0, W, b, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0],
                                 bmg.fused_window, depth)
            return jnp.sum((y * mask).astype(jnp.float32) ** 2) * 1e-3

        def loss_composed(H0, W, b):
            y = self._composed(H0, W, b, bmg, depth)
            return jnp.sum((y * mask).astype(jnp.float32) ** 2) * 1e-3

        gk = jax.grad(loss_fused, argnums=(0, 1, 2))(H0, W, b)
        gc = jax.grad(loss_composed, argnums=(0, 1, 2))(H0, W, b)
        for name, a, c in zip(("dH0", "dW", "db"), gk, gc):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                atol=0.6, rtol=0.1, err_msg=f"depth={depth} {name}",
            )


class TestChainedIter2:
    """The chained two-iteration kernel (``_iter2_impl``) vs the sequential
    ``_iter_impl`` chain: BITWISE-identical y1/y2 on real edge rows (same
    window products, GEMM shapes, and bf16 ring dtypes). The kernel is
    measured-slower on the v5e chip and ships default-OFF behind
    CHEMPROP_TPU_ITER2 (see ``iter2_usable``); this pin keeps it correct."""

    @pytest.mark.parametrize("kw", [1, 2])
    @pytest.mark.parametrize("with_bias", [False, True])
    def test_bitwise_matches_sequential(self, bmg, kw, with_bias):
        from chemprop_tpu.ops.fused_message import _iter2_impl, _iter_impl

        rng = np.random.default_rng(17)
        n, d = bmg.E.shape[0], 128
        H0 = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
        W = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.bfloat16) if with_bias else None

        y1_s = _iter_impl(H0, H0, W, b, bmg.src, bmg.dst, bmg.rev, kw, relu_stream=True)
        y2_s = _iter_impl(y1_s, H0, W, b, bmg.src, bmg.dst, bmg.rev, kw)
        y1_f, y2_f = _iter2_impl(H0, W, b, bmg.src, bmg.dst, bmg.rev, kw)

        mask = np.asarray(bmg.edge_mask)
        for name, a, c in (("y1", y1_f, y1_s), ("y2", y2_f, y2_s)):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32)[mask], np.asarray(c, np.float32)[mask],
                err_msg=f"kw={kw} bias={with_bias} {name}",
            )

    def test_loop_readout_routes_through_iter2_when_enabled(self, bmg, monkeypatch):
        from chemprop_tpu.ops import fused_message as fm

        rng = np.random.default_rng(3)
        n, d = bmg.E.shape[0], 128
        H0 = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
        W = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.bfloat16)
        args = (bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0], bmg.fused_window, 3)

        ref = np.asarray(fm.fused_loop_readout(H0, W, None, *args), np.float32)
        monkeypatch.setattr(fm, "ITER2", True)
        assert fm.iter2_usable(H0, W, bmg.fused_window)
        got = np.asarray(fm.fused_loop_readout(H0, W, None, *args), np.float32)
        np.testing.assert_array_equal(got, ref)
