"""Evaluator golden parity vs the reference's pinned fixtures
(``/root/reference/tests/unit/uncertainty/test_evaluators.py``): same
inputs, same expected metric values — pinning bin structure, endpoint
handling, and coverage semantics."""

from __future__ import annotations

import numpy as np
import numpy.testing as npt
import pytest

from chemprop_tpu.uncertainty import (
    CalibrationAreaEvaluator,
    ExpectedNormalizedErrorEvaluator,
    MulticlassConformalEvaluator,
    MultilabelConformalEvaluator,
    NLLClassEvaluator,
    NLLMulticlassEvaluator,
    NLLRegressionEvaluator,
    RegressionConformalEvaluator,
    SpearmanEvaluator,
)

N100 = np.arange(1, 101, dtype=np.float64)[:, None]
M100 = np.ones((100, 1), dtype=bool)


@pytest.mark.parametrize(
    "uncs,targets,likelihood",
    [(np.array([[0.8]]), np.ones((1, 1)), 0.8), (np.array([[0.8]]), np.zeros((1, 1)), 0.2)],
)
def test_nll_classification_golden(uncs, targets, likelihood):
    nll = NLLClassEvaluator().evaluate(uncs, uncs, targets, np.ones((1, 1), bool))
    npt.assert_allclose(np.exp(-nll), [likelihood], rtol=1e-6)


@pytest.mark.parametrize(
    "uncs,targets,likelihood",
    [
        (
            np.array(
                [
                    [[0.29, 0.22, 0.49]],
                    [[0.35, 0.19, 0.46]],
                    [[0.55, 0.38, 0.07]],
                    [[0.15, 0.29, 0.56]],
                    [[0.08, 0.68, 0.24]],
                ]
            ),
            np.array([[0], [2], [2], [0], [1]]),
            0.24875443,
        ),
        (
            np.array(
                [
                    [[8.7385e-01, 8.3770e-04, 3.3212e-02, 9.2103e-02]],
                    [[7.2274e-03, 1.0541e-01, 8.8703e-01, 3.2886e-04]],
                    [[1.7376e-03, 9.9478e-01, 1.4227e-03, 2.0596e-03]],
                    [[2.6487e-04, 1.3251e-03, 2.4325e-02, 9.7409e-01]],
                ]
            ),
            np.array([[0], [2], [1], [3]]),
            0.93094635,
        ),
    ],
)
def test_nll_multiclass_golden(uncs, targets, likelihood):
    nll = NLLMulticlassEvaluator().evaluate(uncs, uncs, targets, np.ones(targets.shape, bool))
    npt.assert_allclose(np.exp(-nll), [likelihood], rtol=1e-5)


def test_nll_regression_golden():
    nll = NLLRegressionEvaluator().evaluate(
        np.zeros((2, 2)), np.ones((2, 2)), np.zeros((2, 2)), np.ones((2, 2), bool)
    )
    npt.assert_allclose(np.exp(-nll), [0.39894228, 0.39894228], rtol=1e-6)


@pytest.mark.parametrize("sign,rho", [(1.0, 1.0), (-1.0, -1.0)])
def test_spearman_golden(sign, rho):
    out = SpearmanEvaluator().evaluate(np.zeros((100, 1)), sign * N100, N100, M100)
    npt.assert_allclose(out, [rho], atol=1e-12)


def test_multiclass_conformal_coverage_golden():
    uncs = np.array([[[1, 0], [0, 1]], [[0, 1], [1, 0]], [[1, 0], [1, 0]]])
    targets = np.array([[0, 0], [1, 0], [1, 1]])
    out = MulticlassConformalEvaluator().evaluate(None, uncs, targets, np.ones((3, 2), bool))
    npt.assert_allclose(out, [2 / 3, 1 / 3], rtol=1e-4)


def test_multilabel_conformal_coverage_golden():
    # [n, t, 2] (in, out) sets flattened as [n, 2t] in the reference fixture
    uncs = np.array([[0, 0, 0, 0], [0, 1, 1, 1], [0, 0, 0, 0]]).reshape(3, 2, 2)
    targets = np.array([[0, 0], [1, 0], [1, 1]])
    out = MultilabelConformalEvaluator().evaluate(None, uncs, targets, np.ones((3, 2), bool))
    npt.assert_allclose(out, [2 / 3, 1 / 3], rtol=1e-4)


@pytest.mark.parametrize(
    "preds,uncs,targets,coverage",
    [
        (
            np.arange(100, dtype=np.float64)[:, None],
            np.arange(100, dtype=np.float64)[:, None] / 2,
            np.arange(10, 110, dtype=np.float64)[:, None],
            [0.8],
        ),
        (
            np.array([[0, 0.3, 1.0]]),
            np.array([[0.2, 0.3, 0.4]]),
            np.array([[0.5, 0.5, 0.5]]),
            [0.0, 1.0, 0.0],
        ),
        (
            np.arange(100, 0, -1, dtype=np.float64)[:, None],
            np.full((100, 1), 70.0),
            np.arange(1, 101, dtype=np.float64)[:, None],
            [0.7],
        ),
    ],
)
def test_regression_conformal_coverage_golden(preds, uncs, targets, coverage):
    out = RegressionConformalEvaluator().evaluate(
        preds, uncs, targets, np.ones(preds.shape, bool)
    )
    npt.assert_allclose(out, coverage, rtol=1e-6)


@pytest.mark.parametrize(
    "preds,targets,area",
    [
        # z = 0 everywhere: observed coverage 1 at every bin ->
        # sum_{f=1..99} (1 - f/100) / 100 = 0.495 (endpoints contribute 0)
        (np.zeros((100, 1)), np.zeros((100, 1)), 0.495),
        # |err| = 99, std = 1: observed coverage 0 at every bin
        (np.ones((100, 1)), np.full((100, 1), 100.0), 0.495),
    ],
)
def test_miscalibration_area_golden(preds, targets, area):
    out = CalibrationAreaEvaluator().evaluate(preds, np.ones((100, 1)), targets, M100)
    npt.assert_allclose(out, [area], rtol=1e-6)


@pytest.mark.parametrize(
    "preds,uncs,targets,ence",
    [
        (np.zeros((100, 1)), np.ones((100, 1)), np.zeros((100, 1)), 1.0),
        # 100 singleton bins (torch.chunk semantics): per-sample
        # |sqrt(v) - |err|| / sqrt(v) with v = linspace(1, 10) and the
        # +-1/+-2 error pattern
        (
            np.linspace(1, 100, 100)[:, None],
            np.linspace(1, 10, 100)[:, None],
            np.linspace(1, 100, 100)[:, None] + np.tile([-2, -1, 1, 2], 25)[:, None],
            0.392,
        ),
    ],
)
def test_ence_golden(preds, uncs, targets, ence):
    out = ExpectedNormalizedErrorEvaluator().evaluate(preds, uncs, targets, M100)
    npt.assert_allclose(out, [ence], atol=5e-4)


class TestEncePartialMask:
    """Pinned behavior for partial masks (documented deviation, PARITY.md):
    masked entries are DROPPED — the per-task ENCE equals the full-mask ENCE
    of the kept rows. The reference's zero-fill would instead produce NaN
    (zero-variance bins give RMV = 0 -> 0/0)."""

    def test_drop_semantics(self):
        import numpy as np

        from chemprop_tpu.uncertainty.evaluator import UncertaintyEvaluatorRegistry

        rng = np.random.default_rng(0)
        n = 40
        preds = rng.normal(size=(n, 2))
        targets = preds + rng.normal(scale=0.3, size=(n, 2))
        uncs = np.abs(rng.normal(scale=0.5, size=(n, 2))) + 0.05
        mask = np.ones((n, 2), dtype=bool)
        mask[::3, 1] = False  # partial mask on task 1 only

        ev = UncertaintyEvaluatorRegistry["ence"]()
        got = np.asarray(ev.evaluate(preds, uncs, targets, mask))
        assert np.isfinite(got).all()
        # task 1 == full-mask evaluation of only the kept rows
        keep = mask[:, 1]
        want = np.asarray(
            ev.evaluate(
                preds[keep][:, 1:], uncs[keep][:, 1:], targets[keep][:, 1:],
                np.ones((keep.sum(), 1), dtype=bool),
            )
        )
        np.testing.assert_allclose(got[1], want[0], rtol=1e-12)
