"""Unit tests for uncertainty estimators/calibrators/evaluators, focused on
the multiclass/multilabel conformal family (cf. reference
``chemprop/uncertainty/calibrator.py:451-713``, ``evaluator.py:246-368``)."""

import numpy as np
import pytest

from chemprop_tpu.uncertainty import (
    CalibratorRegistry,
    UncertaintyEstimatorRegistry,
    UncertaintyEvaluatorRegistry,
)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


@pytest.fixture()
def multiclass_data():
    rng = np.random.default_rng(0)
    n, t, c = 500, 2, 4
    targets = rng.integers(0, c, size=(n, t))
    logits = rng.normal(size=(n, t, c))
    # make the true class likelier so sets are informative
    np.put_along_axis(logits, targets[..., None], logits.max(-1, keepdims=True) + 1.0, axis=2)
    probs = _softmax(logits)
    mask = np.ones((n, t), dtype=bool)
    return probs, targets, mask


class TestMulticlassConformal:
    @pytest.mark.parametrize("method", ["conformal-multiclass", "conformal-adaptive"])
    def test_coverage(self, multiclass_data, method):
        probs, targets, mask = multiclass_data
        alpha = 0.1
        cal = CalibratorRegistry[method](alpha=alpha)
        cal.fit(None, probs[:250], targets[:250], mask[:250])
        sets = cal.apply(probs[250:])
        assert sets.shape == probs[250:].shape
        assert set(np.unique(sets)) <= {0, 1}
        cov = UncertaintyEvaluatorRegistry["conformal-coverage-multiclass"]().evaluate(
            None, sets, targets[250:], mask[250:]
        )
        assert cov.shape == (2,)
        # marginal coverage guarantee: >= 1 - alpha (up to finite-sample noise)
        assert (cov >= 1 - alpha - 0.05).all()

    def test_adaptive_sets_are_supersets(self, multiclass_data):
        """APS cumulative scores produce sets at least as large as plain
        conformal at the same alpha on this data."""
        probs, targets, mask = multiclass_data
        plain = CalibratorRegistry["conformal-multiclass"](alpha=0.1)
        adaptive = CalibratorRegistry["conformal-adaptive"](alpha=0.1)
        plain.fit(None, probs, targets, mask)
        adaptive.fit(None, probs, targets, mask)
        assert adaptive.apply(probs).sum() >= plain.apply(probs).sum() * 0.9

    def test_alpha_validation(self):
        with pytest.raises(ValueError):
            CalibratorRegistry["conformal-multiclass"](alpha=1.5)


class TestIsotonicMulticlass:
    def test_recalibrates_and_normalizes(self, multiclass_data):
        probs, targets, mask = multiclass_data
        # distort the probabilities with a temperature
        distorted = _softmax(np.log(np.maximum(probs, 1e-12)) * 3.0)
        cal = CalibratorRegistry["isotonic-multiclass"]()
        cal.fit(None, distorted, targets, mask)
        out = cal.apply(distorted)
        assert out.shape == distorted.shape
        np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-6)
        nll = UncertaintyEvaluatorRegistry["nll-multiclass"]()
        before = nll.evaluate(None, distorted, targets, mask)
        after = nll.evaluate(None, out, targets, mask)
        assert after.mean() <= before.mean() + 1e-6


class TestConformalMultilabel:
    def test_in_out_sets_and_coverage(self):
        rng = np.random.default_rng(1)
        n, t = 400, 3
        targets = rng.integers(0, 2, size=(n, t)).astype(float)
        probs = np.clip(targets * 0.8 + 0.1 + rng.normal(0, 0.1, size=(n, t)), 0, 1)
        mask = np.ones((n, t), dtype=bool)
        cal = CalibratorRegistry["conformal-multilabel"](alpha=0.1)
        cal.fit(None, probs[:200], targets[:200], mask[:200])
        sets = cal.apply(probs[200:])
        assert sets.shape == (200, t, 2)
        assert set(np.unique(sets)) <= {0, 1}
        cov = UncertaintyEvaluatorRegistry["conformal-coverage-classification"]().evaluate(
            None, sets, targets[200:], mask[200:]
        )
        assert (cov >= 0.8).all()

    def test_single_task_rejected(self):
        cal = CalibratorRegistry["conformal-multilabel"](alpha=0.1)
        with pytest.raises(ValueError):
            cal.fit(None, np.zeros((5, 1)), np.zeros((5, 1)), np.ones((5, 1), dtype=bool))


class TestEvaluatorGoldens:
    def test_nll_multiclass_golden(self):
        # n=2, t=1, c=3; true classes 0 and 2 with probs 0.5 and 0.25
        uncs = np.array([[[0.5, 0.3, 0.2]], [[0.25, 0.5, 0.25]]])
        targets = np.array([[0], [2]])
        mask = np.ones((2, 1), dtype=bool)
        nll = UncertaintyEvaluatorRegistry["nll-multiclass"]().evaluate(None, uncs, targets, mask)
        expected = -(np.log(0.5) + np.log(0.25)) / 2
        np.testing.assert_allclose(nll, [expected], rtol=1e-6)

    def test_multiclass_coverage_golden(self):
        sets = np.array([[[1, 0, 0]], [[0, 1, 1]], [[1, 1, 1]], [[0, 0, 0]]])
        targets = np.array([[0], [0], [2], [1]])
        mask = np.ones((4, 1), dtype=bool)
        cov = UncertaintyEvaluatorRegistry["conformal-coverage-multiclass"]().evaluate(
            None, sets, targets, mask
        )
        np.testing.assert_allclose(cov, [0.5])


class TestDirichletEstimators:
    def test_classification_dirichlet(self):
        stacked = np.stack([np.stack([np.full((4, 2), 0.7), np.full((4, 2), 0.3)], axis=-1)])
        uncs = UncertaintyEstimatorRegistry["classification-dirichlet"]()(stacked)
        np.testing.assert_allclose(uncs, 0.3)

    def test_multiclass_dirichlet(self):
        m, n, t, c = 2, 5, 1, 3
        stacked = np.random.default_rng(0).uniform(size=(m, n, t, c + 1))
        uncs = UncertaintyEstimatorRegistry["multiclass-dirichlet"]()(stacked)
        np.testing.assert_allclose(uncs, stacked[..., -1].mean(0))

    def test_rejects_bad_shapes(self):
        with pytest.raises(ValueError):
            UncertaintyEstimatorRegistry["classification-dirichlet"]()(np.zeros((2, 3, 4)))
