"""Calibrator golden parity vs the reference's pinned fixtures.

Every expected value below is a behavioral golden from the reference's
calibrator unit suite (``/root/reference/tests/unit/uncertainty/
test_calibrators.py``): same calibration inputs, same expected calibrated
outputs. These pin the *semantics* of each method (quantile interpolation
modes, additive vs multiplicative conformal adjustment, the Platt Bayes
correction), which is exactly where implementations silently drift.
"""

from __future__ import annotations

import numpy as np
import numpy.testing as npt
import pytest

from chemprop_tpu.uncertainty import (
    AdaptiveMulticlassConformalCalibrator,
    ConformalMultilabelCalibrator,
    ConformalRegressionCalibrator,
    IsotonicCalibrator,
    IsotonicMulticlassCalibrator,
    MulticlassConformalCalibrator,
    MVEWeightingCalibrator,
    PlattCalibrator,
    ZelikmanCalibrator,
    ZScalingCalibrator,
)

N = np.arange(1, 101, dtype=np.float64)[:, None]  # [100, 1]
ONES_MASK = np.ones((100, 1), dtype=bool)
ZEROS = np.zeros((100, 1))

CLS_UNCS = np.array(
    [
        [0.1, 0.2, 0.3],
        [0.4, 0.5, 0.6],
        [0.7, 0.8, 0.9],
        [0.1, 0.2, 0.3],
        [0.4, 0.5, 0.6],
        [0.7, 0.8, 0.9],
    ]
)
CLS_TARGETS = np.array([[0, 1, 0], [0, 0, 1], [0, 1, 1], [1, 1, 0], [1, 0, 0], [1, 1, 0]])
CLS_MASK = np.array(
    [[1, 1, 1], [1, 0, 1], [1, 1, 1], [1, 1, 1], [0, 1, 1], [1, 1, 1]], dtype=bool
)
CLS_TEST = np.array([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]])


def test_isotonic_golden():
    cal = IsotonicCalibrator().fit(CLS_UNCS, CLS_UNCS, CLS_TARGETS, CLS_MASK)
    out = cal.apply(CLS_TEST)
    npt.assert_allclose(out, [[1 / 3, 2 / 3, 0.0], [1 / 3, 2 / 3, 0.5]], atol=1e-7)


def test_platt_golden():
    cal = PlattCalibrator().fit(CLS_UNCS, CLS_UNCS, CLS_TARGETS, CLS_MASK)
    out = cal.apply(CLS_TEST)
    npt.assert_allclose(
        out,
        [[0.4182101, 0.8000248, 0.1312900], [0.3973791, 0.7999378, 0.2770228]],
        rtol=1e-3,
        atol=1e-4,
    )


def test_platt_training_targets_bayes_correction():
    training_targets = np.array([[0, 0, 0], [1, 1, 1], [1, 1, 0], [1, 0, 1]])
    cal = PlattCalibrator().fit(
        CLS_UNCS, CLS_UNCS, CLS_TARGETS, CLS_MASK, training_targets=training_targets
    )
    out = cal.apply(CLS_TEST)
    npt.assert_allclose(
        out,
        [[0.5285367, 0.6499191, 0.3089508], [0.5188822, 0.6499544, 0.3998689]],
        rtol=1e-3,
        atol=1e-4,
    )


def test_platt_rejects_non_binary_targets():
    with pytest.raises(ValueError, match="0/1"):
        PlattCalibrator().fit(CLS_UNCS, CLS_UNCS, CLS_TARGETS + 0.5, CLS_MASK)


@pytest.mark.parametrize(
    "cal_uncs,expected_scale",
    [
        (N**2, 1.0),  # var = y^2, err = y -> optimal std scale 1
        ((2 * N) ** 2, 0.25),  # var = (2y)^2 -> optimal scale 1/2, applied squared
    ],
)
def test_zscaling_golden(cal_uncs, expected_scale):
    cal = ZScalingCalibrator().fit(ZEROS, cal_uncs, N, ONES_MASK)
    out = cal.apply(N)
    npt.assert_allclose(out, N * expected_scale, rtol=1e-4)


@pytest.mark.parametrize(
    "cal_uncs,expected",
    [
        (N**2, N),  # z = 1 everywhere -> scaling 1
        # var = 1: z = 1..100, p=0.9 lower-quantile -> z[89] = 90 -> x 8100
        (np.ones((100, 1)), N * 8100.0),
    ],
)
def test_zelikman_golden(cal_uncs, expected):
    cal = ZelikmanCalibrator(p=0.9).fit(ZEROS, cal_uncs, N, ONES_MASK)
    out = cal.apply(N)
    npt.assert_allclose(out, expected, rtol=1e-6)


def test_zelikman_rejects_bad_p():
    with pytest.raises(ValueError):
        ZelikmanCalibrator(p=1.5)


def test_mve_weighting_golden():
    # 5 identical ensemble members: any convex weights reproduce the input
    uncs5 = np.broadcast_to(N, (5, 100, 1)).copy()
    cal = MVEWeightingCalibrator().fit(ZEROS, uncs5, N, ONES_MASK)
    out = cal.apply(uncs5)
    npt.assert_allclose(out, N, rtol=1e-6)
    npt.assert_allclose(cal.weights.sum(axis=0), 1.0, rtol=1e-9)


@pytest.mark.parametrize(
    "cal_uncs,test_uncs,expected",
    [
        # half-intervals y/20, |err| = 10: scores 10 - y/20, conformal quantile
        # (higher, level ceil(101*0.9)/100) = 9.6, applied ADDITIVELY
        (
            np.arange(100, dtype=np.float64)[:, None] / 20,
            np.arange(100, 200, dtype=np.float64)[:, None] / 20,
            np.arange(14.6, 19.55, 0.05)[:, None],
        ),
        # degenerate point regression (half = 0): interval becomes +-qhat = 10
        (np.zeros((100, 1)), np.zeros((100, 1)), np.full((100, 1), 10.0)),
    ],
)
def test_conformal_regression_golden(cal_uncs, test_uncs, expected):
    preds = np.arange(100, dtype=np.float64)[:, None]
    targets = np.arange(10, 110, dtype=np.float64)[:, None]
    cal = ConformalRegressionCalibrator(alpha=0.1).fit(preds, cal_uncs, targets, ONES_MASK)
    out = cal.apply(test_uncs)
    npt.assert_allclose(out, expected, rtol=1e-6, atol=1e-9)


MC_CAL_UNCS = np.array(
    [
        [[0.2, 0.3, 0.5], [0.1, 0.6, 0.3]],
        [[0.1, 0.6, 0.3], [0.4, 0.4, 0.2]],
        [[0.4, 0.4, 0.2], [0.2, 0.3, 0.5]],
    ]
)
MC_TEST_UNCS = np.array(
    [
        [[0.3, 0.4, 0.3], [0.5, 0.2, 0.3]],
        [[0.5, 0.2, 0.3], [0.6, 0.3, 0.1]],
        [[0.6, 0.3, 0.1], [0.3, 0.4, 0.3]],
    ]
)


def test_multiclass_conformal_golden():
    targets = np.array([[2, 2], [1, 0], [0, 2]])
    cal = MulticlassConformalCalibrator(alpha=0.5).fit(
        MC_CAL_UNCS, MC_CAL_UNCS, targets, np.ones((3, 2), dtype=bool)
    )
    out = cal.apply(MC_TEST_UNCS)
    npt.assert_array_equal(
        out,
        [[[0, 1, 0], [1, 0, 1]], [[1, 0, 0], [1, 1, 0]], [[1, 0, 0], [1, 1, 1]]],
    )


def test_adaptive_multiclass_conformal_golden():
    targets = np.array([[2, 1], [1, 0], [0, 2]])
    cal = AdaptiveMulticlassConformalCalibrator(alpha=0.5).fit(
        MC_CAL_UNCS, MC_CAL_UNCS, targets, np.ones((3, 2), dtype=bool)
    )
    out = cal.apply(MC_TEST_UNCS)
    npt.assert_array_equal(
        out,
        [[[0, 1, 0], [1, 0, 0]], [[1, 0, 0], [1, 0, 0]], [[1, 0, 0], [0, 1, 0]]],
    )


def test_multilabel_conformal_golden():
    uncs = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float64)
    targets = uncs.astype(int)
    cal = ConformalMultilabelCalibrator(alpha=0.1).fit(
        uncs, uncs, targets, np.ones((3, 3), dtype=bool)
    )
    out = cal.apply(np.eye(3))
    npt.assert_array_equal(
        out,
        [
            [[1, 1], [1, 0], [1, 0]],
            [[1, 0], [1, 1], [1, 0]],
            [[1, 0], [1, 0], [1, 1]],
        ],
    )


def test_isotonic_multiclass_golden():
    cal_uncs = np.array(
        [
            [[0.2, 0.3, 0.5], [0.1, 0.6, 0.3]],
            [[0.1, 0.6, 0.3], [0.4, 0.4, 0.2]],
            [[0.4, 0.4, 0.2], [0.2, 0.3, 0.5]],
            [[0.0, 0.6, 0.4], [0.8, 0.1, 0.1]],
            [[0.5, 0.2, 0.3], [0.4, 0.4, 0.2]],
            [[0.4, 0.3, 0.3], [0.7, 0.3, 0.0]],
        ]
    )
    targets = np.array([[2, 1], [1, 2], [0, 2], [1, 1], [0, 0], [2, 0]])
    test_uncs = np.array(
        [
            [[0.0, 0.1, 0.9], [0.5, 0.2, 0.3]],
            [[0.3, 0.4, 0.3], [0.6, 0.3, 0.1]],
            [[0.9, 0.1, 0.0], [0.3, 0.4, 0.3]],
        ]
    )
    cal = IsotonicMulticlassCalibrator().fit(
        cal_uncs, cal_uncs, targets, np.ones((6, 2), dtype=bool)
    )
    out = cal.apply(test_uncs)
    npt.assert_allclose(
        out,
        [
            [[0.000000, 0.000000, 1.000000], [0.483871, 0.193548, 0.322581]],
            [[0.500000, 0.000000, 0.500000], [0.714286, 0.285714, 0.000000]],
            [[1.000000, 0.000000, 0.000000], [0.319149, 0.255319, 0.425532]],
        ],
        atol=1e-5,
    )
