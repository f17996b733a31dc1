"""Loss golden values copied from the reference test suite
(``/root/reference/tests/unit/nn/test_loss_functions.py``) — behavioral
parity: identical inputs must give identical losses to float32 round-off."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from chemprop_tpu.nn import metrics as M


def _call(metric, preds, targets, mask=None, weights=None, lt=None, gt=None):
    preds = jnp.asarray(preds, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    kw = {}
    if mask is not None:
        kw["mask"] = jnp.asarray(mask, bool)
    if weights is not None:
        kw["weights"] = jnp.asarray(weights, jnp.float32)
    if lt is not None:
        kw["lt_mask"] = jnp.asarray(lt, bool)
    if gt is not None:
        kw["gt_mask"] = jnp.asarray(gt, bool)
    return float(metric(preds, targets, **kw))


P22 = [[-3.0, 2.0], [1.0, -1.0]]
Z22 = [[0.0, 0.0], [0.0, 0.0]]
ONES22 = [[True, True], [True, True]]
NONE22 = [[False, False], [False, False]]


@pytest.mark.parametrize(
    "lt,gt,expected",
    [
        (NONE22, NONE22, 3.75),  # plain MSE
        (NONE22, ONES22, 2.5),  # '>x' targets: overshoot forgiven
        (ONES22, NONE22, 1.25),  # '<x' targets: undershoot forgiven
    ],
)
def test_bounded_mse_golden(lt, gt, expected):
    assert _call(M.BoundedMSE(), P22, Z22, lt=lt, gt=gt) == pytest.approx(expected)


def test_mve_golden():
    # mean 0, var 1, target 0 -> likelihood = 1/sqrt(2 pi)
    nll = _call(M.MVELoss(), [[[0.0, 1.0]]], [[0.0]])
    assert np.exp(-nll) == pytest.approx(0.39894228, rel=1e-5)


@pytest.mark.parametrize(
    "v_kl,expected", [(0.0, 0.6), (0.2, 0.63862943)]
)
def test_binary_dirichlet_golden(v_kl, expected):
    assert _call(M.DirichletLoss(v_kl=v_kl), [[[2.0, 2.0]]], [[1.0]]) == pytest.approx(
        expected, rel=1e-5
    )


@pytest.mark.parametrize(
    "v_kl,expected", [(0.2, 1.868991), (0.0, 1.102344)]
)
def test_multiclass_dirichlet_golden(v_kl, expected):
    preds = [[[0.2, 0.1, 0.3], [0.1, 0.3, 0.1]], [[1.2, 0.5, 1.7], [1.1, 1.4, 0.8]]]
    targets = [[0.0, 0.0], [1.0, 1.0]]
    assert _call(M.DirichletLoss(v_kl=v_kl), preds, targets) == pytest.approx(
        expected, rel=1e-5
    )


@pytest.mark.parametrize(
    "v_kl,expected", [(0.0, 1.56893861), (0.2, 2.768938541)]
)
def test_evidential_golden(v_kl, expected):
    assert _call(
        M.EvidentialLoss(v_kl=v_kl), [[[2.0, 2.0, 2.0, 2.0]]], [[1.0]]
    ) == pytest.approx(expected, rel=1e-5)


@pytest.mark.parametrize(
    "preds,expected", [([[2.0], [2.0]], 0.126928), ([[0.5], [0.5]], 0.474077)]
)
def test_bce_golden(preds, expected):
    assert _call(M.BCELoss(), preds, [[1.0], [1.0]]) == pytest.approx(expected, rel=1e-5)


@pytest.mark.parametrize(
    "preds,targets,expected",
    [
        (
            [[[1.2, 0.5, 0.7], [-0.1, 0.3, 0.1]], [[1.2, 0.5, 0.7], [1.1, 1.3, 1.1]]],
            [[1, 0], [1, 2]],
            1.34214,
        ),
        (
            [[[1.2, 1.5, 0.7], [-0.1, 2.3, 1.1]], [[1.2, 1.5, 1.7], [2.1, 1.3, 1.1]]],
            [[1, 1], [2, 2]],
            0.899472,
        ),
    ],
)
def test_cross_entropy_golden(preds, targets, expected):
    assert _call(M.CrossEntropyLoss(), preds, targets) == pytest.approx(expected, rel=1e-5)


@pytest.mark.parametrize(
    "preds,targets,expected",
    [
        ([[0], [1], [1], [0]], [[0], [1], [1], [0]], 0.0),
        (
            [[0], [1], [0], [1], [1], [1], [0], [1], [1]],
            [[0], [1], [1], [0], [1], [1], [0], [0], [1]],
            0.683772,
        ),
    ],
)
def test_binary_mcc_golden(preds, targets, expected):
    # the reference passes hard 0/1 predictions (post-sigmoid space)
    assert _call(M.BinaryMCCLoss(assume_logits=False), preds, targets) == pytest.approx(expected, rel=1e-4, abs=1e-6)


@pytest.mark.parametrize(
    "mask,expected",
    [
        (ONES22, 0.5),
        ([[True, True], [False, True]], 1.0),
    ],
)
def test_multiclass_mcc_golden(mask, expected):
    preds = [
        [[0.16, 0.26, 0.58], [0.22, 0.61, 0.17]],
        [[0.71, 0.09, 0.20], [0.05, 0.82, 0.13]],
    ]
    targets = [[2, 1], [0, 0]]
    assert _call(M.MulticlassMCCLoss(assume_logits=False), preds, targets, mask=mask) == pytest.approx(
        expected, rel=1e-4, abs=1e-6
    )


@pytest.mark.parametrize(
    "preds,targets,mask,threshold,expected",
    [
        ([[0.8, 0.2], [0.3, 0.7]], [[0.9, 0.1], [0.4, 0.6]], ONES22, None, 0.031319),
        (
            [[0.6, 0.4], [0.2, 0.8]],
            [[0.7, 0.3], [0.3, 0.7]],
            [[True, True], [True, False]],
            None,
            0.295655,
        ),
        ([[0.6, 0.4], [0.2, 0.8]], [[0.7, 0.3], [0.3, 0.7]], ONES22, 0.5, 0.033673),
    ],
)
def test_sid_golden(preds, targets, mask, threshold, expected):
    assert _call(M.SID(threshold=threshold), preds, targets, mask=mask) == pytest.approx(
        expected, rel=1e-4
    )


@pytest.mark.parametrize(
    "mask,threshold,expected",
    [
        ([[1, 1, 1, 1], [1, 0, 1, 0]], None, 0.1125),
        ([[1, 1, 1, 1], [1, 1, 1, 1]], None, 0.515625),
        ([[1, 1, 1, 1], [1, 1, 1, 1]], 0.3, 0.501984),
    ],
)
def test_wasserstein_golden(mask, threshold, expected):
    preds = [[0.1, 0.3, 0.5, 0.7], [0.2, 0.4, 0.6, 0.8]]
    targets = [[0.1, 0.2, 0.3, 0.4], [0.5, 0.6, 0.7, 0.8]]
    assert _call(
        M.Wasserstein(threshold=threshold), preds, targets, mask=mask
    ) == pytest.approx(expected, rel=1e-4)


@pytest.mark.parametrize(
    "n1,n2,method,mask,expected",
    [
        (900, 800, "sqrt", [[1], [1]], 0.21284),
        (500, 600, "score", [[1, 1], [1, 1]], 0.47931),
        (10, 1000, "wald", [[1, 1], [1, 1]], 1.79683),
    ],
)
def test_nlogprob_enrichment_golden(n1, n2, method, mask, expected):
    loss = M.NLogProbEnrichment(n1=n1, n2=n2, method=method)
    preds = jnp.asarray([[0.5], [0.5]], jnp.float32)
    targets = jnp.asarray([[1, 2], [3, 4]], jnp.float32)
    v = float(loss(preds, targets, mask=jnp.asarray(mask, bool)))
    assert v == pytest.approx(expected, rel=1e-4)


# ------------------------------------------------------------------ quantile
# golden values from /root/reference/tests/unit/nn/test_loss_functions.py:541-755
@pytest.mark.parametrize(
    "preds,targets,alpha,expected",
    [
        ([[1.0], [2.0]], [[2.0], [3.0]], 0.1, 0.1),  # under: alpha * d
        ([[2.0], [3.0]], [[1.0], [2.0]], 0.1, 0.9),  # over: (1-alpha) * |d|
        ([[1.0], [2.0]], [[1.0], [2.0]], 0.1, 0.0),  # exact
        ([[1.0], [3.0]], [[2.0], [2.0]], 0.1, 0.5),  # mixed
        ([[1.0], [3.0]], [[2.0], [2.0]], 0.5, 0.5),  # median regression
        ([[1.0, 2.0], [3.0, 1.0]], [[2.0, 1.0], [2.0, 2.0]], 0.1, 0.5),  # multitask
    ],
)
def test_point_quantile_golden(preds, targets, alpha, expected):
    assert _call(M.PointQuantileLoss(alpha=alpha), preds, targets) == pytest.approx(
        expected, abs=1e-6
    )


def test_point_quantile_masks_and_weights():
    # mask drops the third sample entirely
    v = _call(
        M.PointQuantileLoss(alpha=0.1),
        [[1.0], [2.0], [3.0]],
        [[2.0], [3.0], [4.0]],
        mask=[[True], [True], [False]],
    )
    assert v == pytest.approx(0.1 * 2 / 2, abs=1e-6)
    # sample weights scale per-row contributions (weighted sum / masked count)
    v = _call(
        M.PointQuantileLoss(alpha=0.1),
        [[1.0], [2.0]],
        [[2.0], [3.0]],
        weights=[0.5, 2.0],
    )
    assert v == pytest.approx((0.5 * 0.1 + 2.0 * 0.1) / 2, abs=1e-6)
    # task weights scale per-column contributions
    loss = M.PointQuantileLoss(alpha=0.1, task_weights=[0.5, 2.0])
    v = _call(loss, [[1.0, 2.0]], [[2.0, 3.0]])
    assert v == pytest.approx((0.5 * 0.1 + 2.0 * 0.1) / 2, abs=1e-6)


@pytest.mark.parametrize("alpha", [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0])
def test_point_quantile_alpha_range(alpha):
    preds, targets = [[1.0], [3.0]], [[2.0], [2.0]]
    v = _call(M.PointQuantileLoss(alpha=alpha), preds, targets)
    assert v >= 0
    if alpha == 0.5:
        swapped = _call(M.PointQuantileLoss(alpha=alpha), [[3.0], [1.0]], targets)
        assert v == pytest.approx(swapped, abs=1e-6)


def test_point_quantile_math():
    # d > 0: alpha*d; d < 0: (1-alpha)*|d|; d == 0: 0
    assert _call(M.PointQuantileLoss(alpha=0.2), [[1.0]], [[3.0]]) == pytest.approx(0.4)
    assert _call(M.PointQuantileLoss(alpha=0.2), [[3.0]], [[1.0]]) == pytest.approx(1.6)
    assert _call(M.PointQuantileLoss(alpha=0.2), [[2.0]], [[2.0]]) == pytest.approx(0.0)


def test_interval_quantile_golden():
    """Interval pinball over (mean, interval) heads: hand-computed from the
    reference formula (chemprop/nn/metrics.py:588-615)."""
    # mean 2, interval 2 -> bounds (1, 3); target 5: L_lower = a/2*(5-1)=0.2,
    # L_upper = (1-a/2)*(5-3)=1.9 -> 2.1
    v = _call(M.QuantileLoss(alpha=0.1), [[[2.0, 2.0]]], [[5.0]])
    assert v == pytest.approx(0.05 * 4 + 0.95 * 2, abs=1e-6)
    # target inside the interval (2.5): L_lower = a/2-1<0 branch ->
    # max(0.05*1.5, -0.95*1.5) = 0.075; L_upper = max(0.95*-0.5, -0.05*-0.5) = 0.025
    v = _call(M.QuantileLoss(alpha=0.1), [[[2.0, 2.0]]], [[2.5]])
    assert v == pytest.approx(0.075 + 0.025, abs=1e-6)


def test_bounded_mse_weighted_golden():
    """Sample and task weights compose multiplicatively with bounds
    (reference semantics: L * w[:,None] * task_w * mask, mean over mask)."""
    loss = M.BoundedMSE(task_weights=[1.0, 2.0])
    v = _call(loss, P22, Z22, weights=[2.0, 1.0], gt=ONES22)
    # '>x' targets forgive overshoot: clamped preds [[-3,0],[0,-1]] ->
    # sq [[9,0],[0,1]]; * w rows [2,1] -> [[18,0],[0,1]];
    # * task [1,2] -> [[18,0],[0,2]]; mean over the 4 masked cells
    assert v == pytest.approx((18 + 0 + 0 + 2) / 4, abs=1e-6)
