"""Uncertainty calibrators (cf. reference ``chemprop/uncertainty/
calibrator.py:18-713``): ``fit(preds, uncs, targets, mask)`` then
``apply(uncs)``. Regression calibrators treat ``uncs`` as variances."""

from __future__ import annotations

import numpy as np
from scipy.optimize import least_squares, minimize
from scipy.special import expit, logit

from chemprop_tpu.utils.registry import ClassRegistry

CalibratorRegistry = ClassRegistry()


class CalibratorBase:
    def fit(self, preds, uncs, targets, mask) -> "CalibratorBase":
        raise NotImplementedError

    def apply(self, uncs: np.ndarray) -> np.ndarray:
        raise NotImplementedError


@CalibratorRegistry.register("zscaling")
class ZScalingCalibrator(CalibratorBase):
    """Per-task scalar on the variance chosen to maximize Gaussian likelihood
    of the z-scores (cf. reference ``calibrator.py:78-113``)."""

    def fit(self, preds, uncs, targets, mask):
        t = preds.shape[1]
        self.scalings = np.ones(t)
        for j in range(t):
            m = mask[:, j]
            err = preds[m, j] - targets[m, j]
            var = np.maximum(uncs[m, j], 1e-12)

            def nll(s):
                scaled = var * s[0] ** 2
                return float(
                    np.sum(np.log(2 * np.pi * scaled) / 2 + err**2 / (2 * scaled))
                )

            res = minimize(nll, x0=[np.sqrt(np.mean(err**2 / var))], method="Nelder-Mead")
            self.scalings[j] = res.x[0] ** 2
        return self

    def apply(self, uncs):
        return uncs * self.scalings[None, :]


@CalibratorRegistry.register("zelikman-interval")
class ZelikmanCalibrator(CalibratorBase):
    """Scale variance so the p-interval empirically covers p of the
    calibration set (cf. reference ``calibrator.py:114-154``)."""

    def __init__(self, p: float = 0.9):
        self.p = p

    def fit(self, preds, uncs, targets, mask):
        t = preds.shape[1]
        self.scalings = np.ones(t)
        for j in range(t):
            m = mask[:, j]
            z = np.abs(preds[m, j] - targets[m, j]) / np.sqrt(np.maximum(uncs[m, j], 1e-12))
            from scipy.stats import norm

            z_crit = norm.ppf(0.5 + self.p / 2)
            q = np.quantile(z, self.p)
            self.scalings[j] = (q / z_crit) ** 2
        return self

    def apply(self, uncs):
        return uncs * self.scalings[None, :]


@CalibratorRegistry.register("mve-weighting")
class MVEWeightingCalibrator(CalibratorBase):
    """For ensembles of MVE/evidential heads: learn convex weights over the
    per-model variances maximizing calibration NLL (cf. reference
    ``calibrator.py:155-227``). Here ``uncs`` must be [m, n, t]."""

    def fit(self, preds, uncs, targets, mask):
        m_models, _, t = uncs.shape
        self.weights = np.full((m_models, t), 1 / m_models)
        for j in range(t):
            msk = mask[:, j]
            err2 = (preds[msk, j] - targets[msk, j]) ** 2
            V = np.maximum(uncs[:, msk, j], 1e-12)

            def nll(w):
                w = np.exp(w)
                w = w / w.sum()
                var = np.tensordot(w, V, axes=1)
                return float(np.sum(np.log(var) / 2 + err2 / (2 * var)))

            res = minimize(nll, x0=np.zeros(m_models), method="Nelder-Mead")
            w = np.exp(res.x)
            self.weights[:, j] = w / w.sum()
        return self

    def apply(self, uncs):
        # uncs [m, n, t] -> weighted [n, t]
        return np.einsum("mt,mnt->nt", self.weights, uncs)


@CalibratorRegistry.register("conformal-regression")
class ConformalRegressionCalibrator(CalibratorBase):
    """Split-conformal half-interval per task (cf. reference
    ``calibrator.py:228-340``)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha

    def fit(self, preds, uncs, targets, mask):
        t = preds.shape[1]
        self.qhats = np.zeros(t)
        for j in range(t):
            m = mask[:, j]
            interval = np.maximum(uncs[m, j], 1e-12)
            scores = np.abs(preds[m, j] - targets[m, j]) / interval
            n = m.sum()
            q = min(1.0, np.ceil((n + 1) * (1 - self.alpha)) / n)
            self.qhats[j] = np.quantile(scores, q)
        return self

    def apply(self, uncs):
        return uncs * self.qhats[None, :]


@CalibratorRegistry.register("platt")
class PlattCalibrator(CalibratorBase):
    """Logistic recalibration of classification probabilities (cf. reference
    ``calibrator.py:341-410``)."""

    def fit(self, preds, uncs, targets, mask):
        t = uncs.shape[1]
        self.ab = np.tile([1.0, 0.0], (t, 1))
        for j in range(t):
            m = mask[:, j]
            x = logit(np.clip(uncs[m, j], 1e-7, 1 - 1e-7))
            y = targets[m, j]

            def loss(ab):
                p = np.clip(expit(ab[0] * x + ab[1]), 1e-7, 1 - 1e-7)
                return float(-np.sum(y * np.log(p) + (1 - y) * np.log(1 - p)))

            res = minimize(loss, x0=[1.0, 0.0], method="Nelder-Mead")
            self.ab[j] = res.x
        return self

    def apply(self, uncs):
        x = logit(np.clip(uncs, 1e-7, 1 - 1e-7))
        return expit(self.ab[:, 0][None, :] * x + self.ab[:, 1][None, :])


@CalibratorRegistry.register("isotonic")
class IsotonicCalibrator(CalibratorBase):
    """Isotonic regression of classification probabilities (cf. reference
    ``calibrator.py:411-450``)."""

    def fit(self, preds, uncs, targets, mask):
        from sklearn.isotonic import IsotonicRegression

        self.models = []
        for j in range(uncs.shape[1]):
            m = mask[:, j]
            iso = IsotonicRegression(y_min=0, y_max=1, out_of_bounds="clip")
            iso.fit(uncs[m, j], targets[m, j])
            self.models.append(iso)
        return self

    def apply(self, uncs):
        out = np.empty_like(uncs)
        for j, iso in enumerate(self.models):
            out[:, j] = iso.predict(uncs[:, j])
        return out


@CalibratorRegistry.register("conformal-multilabel")
class ConformalMultilabelCalibrator(CalibratorBase):
    """Conformal set membership threshold per task for multilabel
    classification (cf. reference ``calibrator.py:451-577``)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha

    def fit(self, preds, uncs, targets, mask):
        t = uncs.shape[1]
        self.tin = np.zeros(t)
        for j in range(t):
            m = mask[:, j]
            pos = uncs[m, j][targets[m, j] > 0.5]
            if len(pos) == 0:
                self.tin[j] = 0.0
                continue
            n = len(pos)
            q = max(0.0, np.floor((n + 1) * self.alpha) - 1) / max(n, 1)
            self.tin[j] = np.quantile(pos, q)
        return self

    def apply(self, uncs):
        return (uncs >= self.tin[None, :]).astype(float)
