"""Loss/metric golden values (cf. reference ``tests/unit/test_loss_functions.py``
semantics, recomputed analytically for this implementation)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from chemprop_tpu.nn import metrics as M


def _call(metric, preds, targets, **kw):
    return float(
        metric(
            jnp.asarray(preds, jnp.float32),
            jnp.asarray(targets, jnp.float32),
            **{k: (jnp.asarray(v) if v is not None else None) for k, v in kw.items()},
        )
    )


def test_mse_mae_rmse():
    p = [[1.0, 2.0], [3.0, 4.0]]
    t = [[0.0, 2.0], [3.0, 2.0]]
    assert _call(M.MSE(), p, t) == pytest.approx((1 + 0 + 0 + 4) / 4)
    assert _call(M.MAE(), p, t) == pytest.approx((1 + 0 + 0 + 2) / 4)
    assert _call(M.RMSE(), p, t) == pytest.approx(np.sqrt(5 / 4))


def test_masking_and_weights():
    p = [[1.0, 5.0], [3.0, 7.0]]
    t = [[0.0, 0.0], [0.0, 0.0]]
    mask = [[True, False], [True, False]]
    v = _call(M.MSE(), p, t, mask=mask)
    assert v == pytest.approx((1 + 9) / 2)
    w = [2.0, 1.0]
    v = _call(M.MSE(), p, t, mask=mask, weights=w)
    assert v == pytest.approx((2 * 1 + 1 * 9) / 2)


def test_task_weights():
    p = [[1.0, 1.0]]
    t = [[0.0, 0.0]]
    v = float(M.MSE(task_weights=[2.0, 1.0])(jnp.asarray(p), jnp.asarray(t)))
    assert v == pytest.approx((2 + 1) / 2)


def test_bounded_mse():
    p = [[1.0], [5.0]]
    t = [[2.0], [3.0]]
    lt = [[True], [False]]  # target is "<2": pred 1 < 2 satisfies -> clamp
    gt = [[False], [False]]
    v = _call(M.BoundedMSE(), p, t, lt_mask=lt, gt_mask=gt)
    assert v == pytest.approx((0 + 4) / 2)


def test_bce_matches_manual():
    p = [[0.5], [-1.0]]
    t = [[1.0], [0.0]]
    expected = np.mean(
        [np.log1p(np.exp(-0.5)), np.log1p(np.exp(-1.0))]
    )
    assert _call(M.BCELoss(), p, t) == pytest.approx(expected, rel=1e-5)


def test_ce_matches_manual():
    logits = np.array([[[2.0, 1.0, 0.0]], [[0.0, 0.0, 0.0]]])
    targets = np.array([[0.0], [2.0]])
    lse0 = np.log(np.exp(2) + np.exp(1) + np.exp(0))
    expected = np.mean([lse0 - 2.0, np.log(3.0)])
    assert _call(M.CrossEntropyLoss(), logits, targets) == pytest.approx(expected, rel=1e-5)


def test_mve_loss():
    preds = np.array([[[1.0, 1.0]]])  # mean 1, var 1
    t = np.array([[2.0]])
    expected = 0.5 + np.log(2 * np.pi) / 2
    assert _call(M.MVELoss(), preds, t) == pytest.approx(expected, rel=1e-5)


def test_evidential_finite():
    preds = np.random.default_rng(0).uniform(0.5, 2.0, (4, 2, 4))
    t = np.zeros((4, 2))
    v = _call(M.EvidentialLoss(), preds, t)
    assert np.isfinite(v)


def test_quantile_interval():
    # mean 1, interval 2 -> bounds (0, 2); target 3 above upper
    preds = np.array([[[1.0, 2.0]]])
    t = np.array([[3.0]])
    a = 0.1
    expected = max(a / 2 * 3, (a / 2 - 1) * 3) + max((1 - a / 2) * 1, -a / 2 * 1)
    assert _call(M.QuantileLoss(alpha=a), preds, t) == pytest.approx(expected, rel=1e-5)


def test_binary_mcc_perfect_and_inverted():
    m = M.BinaryMCCMetric()
    ones = jnp.ones((4, 1), bool)
    w = jnp.ones(4)
    p = jnp.asarray([[10.0], [-10.0], [10.0], [-10.0]])  # logits
    t = jnp.asarray([[1.0], [0.0], [1.0], [0.0]])
    s = m.update_state(m.init_state(), p, t, ones, w, None, None)
    assert float(m.compute(s)) == pytest.approx(1.0, abs=1e-3)
    s = m.update_state(m.init_state(), -p, t, ones, w, None, None)
    assert float(m.compute(s)) == pytest.approx(-1.0, abs=1e-3)


def test_r2_streaming_equals_batch():
    rng = np.random.default_rng(0)
    t = rng.normal(size=(32, 1)).astype(np.float32)
    p = t + 0.1 * rng.normal(size=(32, 1)).astype(np.float32)
    m = M.R2Score()
    # streamed in two chunks
    s = m.init_state()
    for sl in (slice(0, 16), slice(16, 32)):
        s = m.update_state(
            s, jnp.asarray(p[sl]), jnp.asarray(t[sl]),
            jnp.ones((16, 1), bool), jnp.ones(16), None, None,
        )
    streamed = float(m.compute(s))
    ss_res = ((p - t) ** 2).sum()
    ss_tot = ((t - t.mean()) ** 2).sum()
    assert streamed == pytest.approx(1 - ss_res / ss_tot, rel=1e-4)


def test_sid_normalizes():
    preds = np.abs(np.random.default_rng(0).normal(size=(2, 8))) + 0.1
    t = np.abs(np.random.default_rng(1).normal(size=(2, 8))) + 0.1
    t = t / t.sum(1, keepdims=True)
    v = _call(M.SID(), preds, t, mask=np.ones((2, 8), bool))
    assert np.isfinite(v) and v > 0


def test_registry_contents():
    for alias in ["mse", "mae", "rmse", "bounded-mse", "mve", "evidential", "bce", "ce",
                  "binary-mcc", "multiclass-mcc", "dirichlet", "sid", "wasserstein",
                  "quantile", "quantile-point"]:
        assert alias in M.LossFunctionRegistry, alias
    for alias in ["mse", "mae", "rmse", "r2", "roc", "prc", "accuracy", "f1",
                  "binary-mcc", "multiclass-mcc"]:
        assert alias in M.MetricRegistry, alias


def test_collected_metrics():
    roc = M.BinaryAUROC()
    assert roc.needs_collection
    p = np.array([0.9, 0.8, 0.3, 0.1])
    t = np.array([1.0, 1.0, 0.0, 0.0])
    mask = np.ones(4, bool)
    assert roc.compute_from_arrays(p, t, mask) == 1.0
    acc = M.BinaryAccuracy()
    assert acc.compute_from_arrays(p, t, mask) == 1.0
    f1 = M.BinaryF1Score()
    assert f1.compute_from_arrays(p, t, mask) == 1.0
    prc = M.BinaryAUPRC()
    assert prc.compute_from_arrays(p, t, mask) == 1.0
