"""Pallas reduction-GEMM (weight gradient) kernel: interpret-mode
correctness vs the XLA contraction, gating, and determinism."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chemprop_tpu.ops.grad_weight import BLOCK_ROWS, grad_weight, grad_weight_usable


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setenv("CHEMPROP_TPU_INTERPRET", "1")
    # the kernel defaults OFF on v5e (XLA wins in-context; see grad_weight.py)
    monkeypatch.setenv("CHEMPROP_TPU_GRAD_W", "1")


def _ref(X, G):
    return jax.lax.dot_general(
        X, G, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


@pytest.mark.parametrize("n,dx,dg", [(1024, 384, 384), (2048, 128, 256)])
def test_matches_xla_contraction(n, dx, dg):
    X = jax.random.normal(jax.random.PRNGKey(0), (n, dx), jnp.bfloat16)
    G = jax.random.normal(jax.random.PRNGKey(1), (n, dg), jnp.bfloat16)
    assert grad_weight_usable(X, G)
    np.testing.assert_allclose(grad_weight(X, G), _ref(X, G), rtol=1e-5, atol=1e-3)


def test_deterministic_across_calls():
    X = jax.random.normal(jax.random.PRNGKey(2), (4 * BLOCK_ROWS, 128), jnp.bfloat16)
    G = jax.random.normal(jax.random.PRNGKey(3), (4 * BLOCK_ROWS, 128), jnp.bfloat16)
    a = np.asarray(grad_weight(X, G))
    b = np.asarray(grad_weight(X, G))
    np.testing.assert_array_equal(a, b)


def test_fallback_on_bad_shapes():
    # non-block-multiple rows and non-lane-aligned widths fall back to XLA
    X = jax.random.normal(jax.random.PRNGKey(4), (100, 86), jnp.bfloat16)
    G = jax.random.normal(jax.random.PRNGKey(5), (100, 300), jnp.bfloat16)
    assert not grad_weight_usable(X, G)
    np.testing.assert_allclose(grad_weight(X, G), _ref(X, G), rtol=1e-5, atol=1e-3)


def test_disabled_without_pallas_env(monkeypatch):
    monkeypatch.setenv("CHEMPROP_TPU_PALLAS", "0")
    X = jnp.zeros((BLOCK_ROWS, 128), jnp.bfloat16)
    assert not grad_weight_usable(X, X)
