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


# marker bases matching the reference class hierarchy
# (``calibrator.py:47-76``): useful for isinstance dispatch
class RegressionCalibrator(CalibratorBase):
    """Base for calibrators of regression uncertainties (variances)."""


class BinaryClassificationCalibrator(CalibratorBase):
    """Base for calibrators of binary class probabilities."""


class MulticlassClassificationCalibrator(CalibratorBase):
    """Base for calibrators of multiclass probabilities."""


@CalibratorRegistry.register("zscaling")
class ZScalingCalibrator(RegressionCalibrator):
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
class ZelikmanCalibrator(RegressionCalibrator):
    """CRUDE interval scaling (Zelikman et al. 2020): the variance scaling is
    the squared p-quantile of the absolute z-scores — distribution-free, no
    Gaussian critical value involved (cf. reference ``calibrator.py:114-154``:
    ``quantile(z, p, interpolation="lower")`` then ``uncs * scaling**2``)."""

    def __init__(self, p: float = 0.9):
        if not 0 <= p <= 1:
            raise ValueError(f"p must be in [0, 1], got {p}")
        self.p = p

    def fit(self, preds, uncs, targets, mask):
        t = preds.shape[1]
        self.scalings = np.ones(t)
        for j in range(t):
            m = mask[:, j]
            z = np.abs(preds[m, j] - targets[m, j]) / np.sqrt(np.maximum(uncs[m, j], 1e-12))
            # torch.quantile(interpolation="lower") equivalent
            self.scalings[j] = np.quantile(z, self.p, method="lower")
        return self

    def apply(self, uncs):
        return uncs * (self.scalings**2)[None, :]


@CalibratorRegistry.register("mve-weighting")
class MVEWeightingCalibrator(RegressionCalibrator):
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
class ConformalRegressionCalibrator(RegressionCalibrator):
    """Split-conformal interval adjustment (Angelopoulos & Bates 2021):
    ``uncs`` are half-interval widths (0 for plain point regression); the
    nonconformity score is the signed distance of the target outside the
    interval, ``max((pred - half) - y, y - (pred + half)) = |err| - half``,
    and ``apply`` GROWS the half-interval additively by the conformal
    quantile (cf. reference ``calibrator.py:228-340``: additive, not
    multiplicative)."""

    def __init__(self, alpha: float = 0.1):
        if not 0 <= alpha <= 1:
            raise ValueError(f"alpha must be in [0, 1], got {alpha}")
        self.alpha = alpha

    def fit(self, preds, uncs, targets, mask):
        t = preds.shape[1]
        self.qhats = np.zeros(t)
        for j in range(t):
            m = mask[:, j]
            half = np.asarray(uncs[m, j], dtype=np.float64)
            err = np.asarray(targets[m, j], dtype=np.float64) - np.asarray(
                preds[m, j], dtype=np.float64
            )
            scores = np.maximum(-err - half, err - half)
            n = int(m.sum())
            if self.alpha >= 1 / (n + 1):
                q = np.ceil((n + 1) * (1 - self.alpha)) / n
            else:
                q = 1.0
            self.qhats[j] = _higher_quantile(scores, q)
        return self

    def apply(self, uncs):
        return uncs + self.qhats[None, :]


@CalibratorRegistry.register("platt")
class PlattCalibrator(BinaryClassificationCalibrator):
    """Logistic recalibration of classification probabilities (cf. reference
    ``calibrator.py:341-410``)."""

    def fit(self, preds, uncs, targets, mask, training_targets=None):
        """``training_targets`` (optional ``[n_train, t]`` 0/1 array) enables
        Platt's Bayesian correction: calibration targets are replaced by the
        MAP estimates ``1/(N- + 2)`` and ``(N+ + 1)/(N+ + 2)`` computed from
        the training-set class counts, avoiding calibration-set overfitting
        (cf. reference ``calibrator.py:356-384``)."""
        targets = np.asarray(targets, dtype=np.float64)
        msk = np.asarray(mask, dtype=bool)
        if np.any((targets[msk] != 0) & (targets[msk] != 1)):
            raise ValueError(
                "Platt scaling requires binary 0/1 calibration targets"
            )
        if training_targets is not None:
            training_targets = np.asarray(training_targets)
            n_neg = (training_targets == 0).sum(axis=0)
            n_pos = (training_targets == 1).sum(axis=0)
            neg_map = np.broadcast_to(1 / (n_neg + 2), targets.shape)
            pos_map = np.broadcast_to((n_pos + 1) / (n_pos + 2), targets.shape)
            targets = np.where(targets == 1, pos_map, neg_map)
        t = uncs.shape[1]
        self.ab = np.tile([1.0, 0.0], (t, 1))
        for j in range(t):
            m = msk[:, j]
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
class IsotonicCalibrator(BinaryClassificationCalibrator):
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


def _higher_quantile(x: np.ndarray, q: float) -> float:
    """torch.quantile(..., interpolation="higher") equivalent."""
    return float(np.quantile(x, min(max(q, 0.0), 1.0), method="higher"))


@CalibratorRegistry.register("conformal-multilabel")
class ConformalMultilabelCalibrator(BinaryClassificationCalibrator):
    """Conformal in-set/out-set pair for multilabel classification
    (Cauchois et al. 2020; cf. reference ``calibrator.py:451-546``):
    nonconformity score is ``-p``; the in-threshold is the ``alpha/2``
    quantile of the per-sample min score over true-negative labels, the
    out-threshold the ``1 - alpha/2`` quantile of the per-sample max score
    over true-positive labels. ``apply`` returns ``[n, t, 2]`` with the
    (in, out) 0/1 set memberships stacked on the last axis."""

    def __init__(self, alpha: float = 0.1):
        if not 0 <= alpha <= 1:
            raise ValueError(f"alpha must be in [0, 1], got {alpha}")
        self.alpha = alpha

    def fit(self, preds, uncs, targets, mask):
        if targets.shape[1] < 2:
            raise ValueError(f"conformal-multilabel needs > 1 task, got {targets.shape[1]}")
        scores = -np.asarray(uncs, dtype=np.float64)
        targets = np.asarray(targets)
        mask = np.asarray(mask, dtype=bool)

        has_zeros = np.any(targets == 0, axis=1)
        s_in = np.where((targets[has_zeros] == 0) & mask[has_zeros], scores[has_zeros], np.inf)
        cal_in = s_in.min(axis=1)

        has_ones = np.any(targets == 1, axis=1)
        s_out = np.where((targets[has_ones] == 1) & mask[has_ones], scores[has_ones], -np.inf)
        cal_out = s_out.max(axis=1)

        self.tin = _higher_quantile(cal_in, self.alpha / 2)
        self.tout = _higher_quantile(cal_out, 1 - self.alpha / 2)
        return self

    def apply(self, uncs):
        scores = -np.asarray(uncs)
        return np.stack(
            [(scores <= self.tin).astype(int), (scores <= self.tout).astype(int)], axis=2
        )


@CalibratorRegistry.register("conformal-multiclass")
class MulticlassConformalCalibrator(MulticlassClassificationCalibrator):
    """Split-conformal prediction sets for multiclass classification
    (cf. reference ``calibrator.py:578-646``). ``uncs`` is ``[n, t, c]``
    class probabilities, ``targets`` ``[n, t]`` class ids; the
    nonconformity score is ``-p_true``; ``apply`` returns the 0/1 set
    membership per class, shape ``[n, t, c]``."""

    def __init__(self, alpha: float = 0.1):
        if not 0 <= alpha <= 1:
            raise ValueError(f"alpha must be in [0, 1], got {alpha}")
        self.alpha = alpha

    @staticmethod
    def nonconformity_scores(preds: np.ndarray) -> np.ndarray:
        return -preds

    def fit(self, preds, uncs, targets, mask):
        t = uncs.shape[1]
        self.qhats = np.zeros(t)
        scores = self.nonconformity_scores(np.asarray(uncs, dtype=np.float64))
        targets = np.asarray(targets).astype(int)
        for j in range(t):
            m = np.asarray(mask[:, j], dtype=bool)
            s_j = scores[m, j]  # [nj, c]
            y_j = targets[m, j]
            s_true = np.take_along_axis(s_j, y_j[:, None], axis=1)[:, 0]
            n = len(s_true)
            if self.alpha >= 1 / (n + 1):
                q = np.ceil((n + 1) * (1 - self.alpha)) / n
            else:
                q = 1.0
            self.qhats[j] = _higher_quantile(s_true, q)
        return self

    def apply(self, uncs):
        scores = self.nonconformity_scores(np.asarray(uncs))
        return (scores <= self.qhats[None, :, None]).astype(int)


@CalibratorRegistry.register("conformal-adaptive")
class AdaptiveMulticlassConformalCalibrator(MulticlassConformalCalibrator):
    """Adaptive prediction sets: nonconformity score is the cumulative
    probability mass of classes at least as likely as each class
    (cf. reference ``calibrator.py:648-666``)."""

    @staticmethod
    def nonconformity_scores(preds: np.ndarray) -> np.ndarray:
        sort_index = np.argsort(-preds, axis=2)
        sorted_preds = np.take_along_axis(preds, sort_index, axis=2)
        sorted_scores = np.cumsum(sorted_preds, axis=2)
        unsorted = np.empty_like(sorted_scores)
        np.put_along_axis(unsorted, sort_index, sorted_scores, axis=2)
        return unsorted


@CalibratorRegistry.register("isotonic-multiclass")
class IsotonicMulticlassCalibrator(MulticlassClassificationCalibrator):
    """One-vs-all isotonic recalibration of ``[n, t, c]`` class
    probabilities, renormalized over classes (Guo et al. 2017; cf.
    reference ``calibrator.py:668-713``)."""

    def fit(self, preds, uncs, targets, mask):
        from sklearn.isotonic import IsotonicRegression

        targets = np.asarray(targets).astype(int)
        self.models = []
        for j in range(uncs.shape[1]):
            m = np.asarray(mask[:, j], dtype=bool)
            per_class = []
            for k in range(uncs.shape[2]):
                iso = IsotonicRegression(y_min=0, y_max=1, out_of_bounds="clip")
                iso.fit(uncs[m, j, k], (targets[m, j] == k).astype(float))
                per_class.append(iso)
            self.models.append(per_class)
        return self

    def apply(self, uncs):
        out = np.zeros_like(uncs)
        for j, per_class in enumerate(self.models):
            for k, iso in enumerate(per_class):
                out[:, j, k] = iso.predict(uncs[:, j, k])
        return out / np.maximum(out.sum(axis=-1, keepdims=True), 1e-12)


# reference-compatible names (``chemprop/uncertainty/__init__.py:1-17``)
RegressionConformalCalibrator = ConformalRegressionCalibrator
MultilabelConformalCalibrator = ConformalMultilabelCalibrator
UncertaintyCalibratorRegistry = CalibratorRegistry
