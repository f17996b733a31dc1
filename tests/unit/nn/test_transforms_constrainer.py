"""Unit tests for the eval-only scaling transforms and the constraint FFN
(cf. reference ``tests/unit/nn/test_transforms.py`` and
``test_constrainer.py``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chemprop_tpu.nn.transforms import GraphTransform, ScaleTransform, UnscaleTransform
from chemprop_tpu.nn.ffn import ConstrainerFFN


class TestScaleTransform:
    def test_train_is_noop_eval_scales(self):
        t = ScaleTransform(mean=np.array([1.0, 2.0]), scale=np.array([2.0, 4.0]))
        X = np.array([[3.0, 10.0]], np.float32)
        np.testing.assert_array_equal(np.asarray(t(X, is_training=True)), X)
        np.testing.assert_allclose(
            np.asarray(t(X, is_training=False)), [[1.0, 2.0]], atol=1e-6
        )

    def test_pad_protects_base_block(self):
        # reference transforms.py:12-16 — `pad` leaves the first columns
        # (the base featurizer block) untouched
        t = ScaleTransform(mean=np.array([5.0]), scale=np.array([2.0]), pad=2)
        X = np.array([[1.0, 2.0, 9.0]], np.float32)
        out = np.asarray(t(X, is_training=False))
        np.testing.assert_allclose(out, [[1.0, 2.0, 2.0]], atol=1e-6)

    def test_standard_scaler_round_trip(self):
        pytest.importorskip("sklearn")
        t = ScaleTransform(mean=np.array([1.0, -1.0]), scale=np.array([0.5, 3.0]))
        s = t.to_standard_scaler()
        t2 = ScaleTransform.from_standard_scaler(s)
        np.testing.assert_allclose(t2.mean, t.mean)
        np.testing.assert_allclose(t2.scale, t.scale)

    def test_mismatched_shapes_raise(self):
        with pytest.raises(ValueError):
            ScaleTransform(mean=np.zeros(2), scale=np.ones(3))


class TestUnscaleTransform:
    def test_unscale_and_variance(self):
        t = UnscaleTransform(mean=np.array([1.0]), scale=np.array([2.0]))
        X = np.array([[3.0]], np.float32)
        np.testing.assert_allclose(np.asarray(t(X, is_training=False)), [[7.0]])
        # variance transforms by scale^2 (reference transforms.py:45-56)
        var = np.array([[0.25]], np.float32)
        np.testing.assert_allclose(
            np.asarray(t.transform_variance(var, is_training=False)), [[1.0]]
        )
        np.testing.assert_array_equal(
            np.asarray(t.transform_variance(var, is_training=True)), var
        )


class TestGraphTransform:
    def test_scales_V_E_only_at_eval(self):
        from chemprop_tpu.data.collate import BatchMolGraph

        V = np.ones((4, 3), np.float32) * 2
        E = np.ones((2, 2), np.float32) * 4
        bmg = BatchMolGraph(
            V=V,
            E=E,
            src=np.zeros(2, np.int32),
            dst=np.zeros(2, np.int32),
            rev=np.arange(2, dtype=np.int32),
            batch=np.zeros(4, np.int32),
            node_mask=np.ones(4, bool),
            edge_mask=np.ones(2, bool),
            n_graphs=1,
        )
        gt = GraphTransform(
            V_transform=ScaleTransform(mean=np.zeros(3), scale=np.full(3, 2.0)),
            E_transform=ScaleTransform(mean=np.zeros(2), scale=np.full(2, 4.0)),
        )
        out_train = gt(bmg, is_training=True)
        np.testing.assert_array_equal(np.asarray(out_train.V), V)
        out_eval = gt(bmg, is_training=False)
        np.testing.assert_allclose(np.asarray(out_eval.V), np.ones((4, 3)))
        np.testing.assert_allclose(np.asarray(out_eval.E), np.ones((2, 2)))
        # original batch untouched (shallow copy semantics)
        np.testing.assert_array_equal(np.asarray(bmg.V), V)


class TestConstrainerFFN:
    def test_constrained_sums(self):
        """After the constrainer, per-molecule sums equal the constraints
        (reference ffn.py:93-141)."""
        rng = np.random.default_rng(0)
        n_atoms, n_mols, t = 10, 3, 2
        fp = jnp.asarray(rng.standard_normal((n_atoms, 8)).astype(np.float32))
        preds = jnp.asarray(rng.standard_normal((n_atoms, t)).astype(np.float32))
        batch = jnp.asarray(np.array([0, 0, 0, 0, 1, 1, 1, 2, 2, 2], np.int32))
        constraints = jnp.asarray(np.array([[1.0, -2.0], [0.5, 3.0], [2.0, 0.0]], np.float32))

        model = ConstrainerFFN(n_constraints=t, fp_dim=8, hidden_dim=16, n_layers=1)
        variables = model.init(jax.random.PRNGKey(0), fp, preds, batch, constraints, False)
        out = np.asarray(model.apply(variables, fp, preds, batch, constraints, False))

        for m in range(n_mols):
            got = out[np.asarray(batch) == m].sum(axis=0)
            np.testing.assert_allclose(got, np.asarray(constraints)[m], atol=1e-5)

    def test_nan_constraint_passthrough(self):
        """NaN constraints mean 'unconstrained': predictions unchanged."""
        rng = np.random.default_rng(1)
        fp = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
        preds = jnp.asarray(rng.standard_normal((4, 1)).astype(np.float32))
        batch = jnp.asarray(np.zeros(4, np.int32))
        constraints = jnp.asarray(np.array([[np.nan]], np.float32))
        model = ConstrainerFFN(n_constraints=1, fp_dim=8, hidden_dim=16)
        variables = model.init(jax.random.PRNGKey(0), fp, preds, batch, constraints, False)
        out = np.asarray(model.apply(variables, fp, preds, batch, constraints, False))
        np.testing.assert_allclose(out, np.asarray(preds), atol=1e-6)
