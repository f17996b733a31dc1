"""Uncertainty evaluators (cf. reference ``chemprop/uncertainty/
evaluator.py:13-368``): score (preds, uncs, targets, mask) -> per-task values."""

from __future__ import annotations

import numpy as np
from scipy.special import erfinv
from scipy.stats import norm, spearmanr

from chemprop_tpu.utils.registry import ClassRegistry

UncertaintyEvaluatorRegistry = ClassRegistry()


def _per_task(fn, preds, uncs, targets, mask):
    return np.array(
        [fn(preds[mask[:, j], j], uncs[mask[:, j], j], targets[mask[:, j], j]) for j in range(preds.shape[1])]
    )


@UncertaintyEvaluatorRegistry.register("nll-regression")
class NLLRegressionEvaluator:
    def evaluate(self, preds, uncs, targets, mask):
        def f(p, v, y):
            v = np.maximum(v, 1e-12)
            return float(np.mean(np.log(2 * np.pi * v) / 2 + (p - y) ** 2 / (2 * v)))

        return _per_task(f, preds, uncs, targets, mask)


@UncertaintyEvaluatorRegistry.register("nll-classification")
class NLLClassEvaluator:
    def evaluate(self, preds, uncs, targets, mask):
        def f(p, u, y):
            u = np.clip(u, 1e-7, 1 - 1e-7)
            return float(-np.mean(y * np.log(u) + (1 - y) * np.log(1 - u)))

        return _per_task(f, preds, uncs, targets, mask)


@UncertaintyEvaluatorRegistry.register("miscalibration_area")
class CalibrationAreaEvaluator:
    """Area between the observed-vs-expected coverage curve and the
    diagonal: trapezoid endpoints (0, 0) and (1, 1) are included and the
    |observed - expected| sum over the ``num_bins + 1`` curve points is
    divided by ``num_bins`` (cf. reference ``evaluator.py:68-114``)."""

    def evaluate(self, preds, uncs, targets, mask, num_bins: int = 100):
        fractions = np.arange(1, num_bins) / num_bins

        def f(p, v, y):
            std = np.sqrt(np.maximum(v, 1e-12))
            z = np.abs(p - y) / std
            z_crit = np.sqrt(2) * erfinv(fractions)
            observed = np.mean(z[None, :] <= z_crit[:, None], axis=1)
            # endpoints (obs 0 @ expected 0, obs 1 @ expected 1) add zero
            # |diff|; the 1/num_bins normalization is over intervals, not
            # curve points
            return float(np.sum(np.abs(observed - fractions)) / num_bins)

        return _per_task(f, preds, uncs, targets, mask)


@UncertaintyEvaluatorRegistry.register("ence")
class ExpectedNormalizedErrorEvaluator:
    """Bin by predicted variance; compare per-bin RMS error vs RMS predicted
    std. Binning matches ``torch.chunk(x, num_bins)``: chunk size
    ``ceil(n / num_bins)``, so n <= num_bins means one sample per bin
    (cf. reference ``evaluator.py:116-179``, ``num_bins=100``).

    DELIBERATE deviation under PARTIAL masks (documented in PARITY.md):
    the reference zero-FILLS masked entries (``preds * mask``), so they
    sort into the low-variance bins and give RMV = 0 -> 0/0 = NaN for any
    task with missing targets; here masked entries are DROPPED before
    binning, which yields the finite per-task ENCE the metric intends.
    Full-mask inputs (the reference's own unit fixtures) are exact-parity.
    Pinned by ``tests/unit/uncertainty/test_evaluator_parity.py``."""

    def evaluate(self, preds, uncs, targets, mask, num_bins: int = 100):
        def f(p, v, y):
            order = np.argsort(v, kind="stable")
            size = -(-len(order) // num_bins)  # torch.chunk semantics
            bins = [order[i : i + size] for i in range(0, len(order), size)]
            vals = []
            for b in bins:
                rmv = np.sqrt(np.mean(np.maximum(v[b], 1e-12)))
                rmse = np.sqrt(np.mean((p[b] - y[b]) ** 2))
                vals.append(abs(rmv - rmse) / max(rmv, 1e-12))
            return float(np.mean(vals))

        return _per_task(f, preds, uncs, targets, mask)


@UncertaintyEvaluatorRegistry.register("spearman")
class SpearmanEvaluator:
    """Rank correlation between predicted uncertainty and |error|."""

    def evaluate(self, preds, uncs, targets, mask):
        def f(p, v, y):
            rho = spearmanr(v, np.abs(p - y)).statistic
            return float(rho)

        return _per_task(f, preds, uncs, targets, mask)


@UncertaintyEvaluatorRegistry.register("conformal-coverage-regression")
class RegressionConformalCoverageEvaluator:
    """Fraction of targets inside [pred - unc, pred + unc]."""

    def evaluate(self, preds, uncs, targets, mask):
        def f(p, half, y):
            return float(np.mean(np.abs(p - y) <= half))

        return _per_task(f, preds, uncs, targets, mask)


@UncertaintyEvaluatorRegistry.register("conformal-coverage-classification")
class MultilabelConformalCoverageEvaluator:
    """Coverage of conformal in/out sets for multilabel classification
    (cf. reference ``evaluator.py:274-292``): fraction of samples where
    ``in_set <= target <= out_set``. ``uncs`` is ``[n, t, 2]`` with
    (in, out) stacked on the last axis (the conformal-multilabel
    calibrator's output)."""

    def evaluate(self, preds, uncs, targets, mask):
        in_set, out_set = uncs[..., 0], uncs[..., 1]
        covered = (in_set <= targets) & (targets <= out_set)
        mask = np.asarray(mask, dtype=bool)
        return (covered & mask).sum(0) / np.maximum(mask.sum(0), 1)


@UncertaintyEvaluatorRegistry.register("nll-multiclass")
class NLLMulticlassEvaluator:
    """Mean NLL of the true class given ``[n, t, c]`` class probabilities
    (cf. reference ``evaluator.py:318-352``)."""

    def evaluate(self, preds, uncs, targets, mask):
        targets = np.asarray(targets).astype(int)
        nlls = []
        for j in range(uncs.shape[1]):
            m = np.asarray(mask[:, j], dtype=bool)
            p_true = np.take_along_axis(uncs[m, j], targets[m, j][:, None], axis=1)[:, 0]
            nlls.append(float(np.mean(-np.log(np.maximum(p_true, 1e-12)))))
        return np.array(nlls)


@UncertaintyEvaluatorRegistry.register("conformal-coverage-multiclass")
class MulticlassConformalCoverageEvaluator:
    """Coverage of multiclass conformal prediction sets: fraction of samples
    whose true class is in the 0/1 set ``uncs [n, t, c]`` (cf. reference
    ``evaluator.py:354-368``)."""

    def evaluate(self, preds, uncs, targets, mask):
        targets = np.asarray(targets).astype(int)
        in_set = np.take_along_axis(uncs, targets[..., None], axis=2)[..., 0] > 0
        mask = np.asarray(mask, dtype=bool)
        return (in_set & mask).sum(0) / np.maximum(mask.sum(0), 1)


# marker bases + reference-compatible names
# (``chemprop/uncertainty/evaluator.py:13,222,294`` and ``__init__.py:33-48``)
class RegressionEvaluator:
    """Base for regression-uncertainty evaluators."""


class BinaryClassificationEvaluator:
    """Base for binary-classification-uncertainty evaluators."""


class MulticlassClassificationEvaluator:
    """Base for multiclass-uncertainty evaluators."""


RegressionConformalEvaluator = RegressionConformalCoverageEvaluator
MultilabelConformalEvaluator = MultilabelConformalCoverageEvaluator
MulticlassConformalEvaluator = MulticlassConformalCoverageEvaluator
