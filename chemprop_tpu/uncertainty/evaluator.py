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
    """Mean |empirical - expected| coverage over 100 symmetric intervals."""

    def evaluate(self, preds, uncs, targets, mask):
        fractions = np.arange(1, 100) / 100

        def f(p, v, y):
            std = np.sqrt(np.maximum(v, 1e-12))
            z = np.abs(p - y) / std
            areas = []
            for frac in fractions:
                z_crit = np.sqrt(2) * erfinv(frac)
                areas.append(abs(np.mean(z <= z_crit) - frac))
            return float(np.mean(areas))

        return _per_task(f, preds, uncs, targets, mask)


@UncertaintyEvaluatorRegistry.register("ence")
class ExpectedNormalizedErrorEvaluator:
    """Bin by predicted variance; compare RMS error vs RMS predicted std."""

    n_bins: int = 10

    def evaluate(self, preds, uncs, targets, mask):
        def f(p, v, y):
            order = np.argsort(v)
            bins = np.array_split(order, 10)
            vals = []
            for b in bins:
                if len(b) == 0:
                    continue
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
