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
    """For 0/1 conformal sets: fraction of positives included."""

    def evaluate(self, preds, uncs, targets, mask):
        def f(p, in_set, y):
            pos = y > 0.5
            if pos.sum() == 0:
                return float("nan")
            return float(np.mean(in_set[pos] > 0.5))

        return _per_task(f, preds, uncs, targets, mask)
