"""Uncertainty estimators (cf. reference ``chemprop/uncertainty/estimator.py``).

Operate on stacked model outputs ``[m, n, t]`` (regression / classification)
or ``[m, n, t, u]`` (multi-head: MVE u=2, evidential u=4, quantile u=2) and
return per-sample uncertainties ``[n, t]``:

* ensemble:  Var_m(point predictions)                (``:184-251``)
* mve:       E_m[var head]                           (``:118-180``)
* evidential total / epistemic / aleatoric from the NIG head
  ((1+1/v)·β/(α−1), (1/v)·β/(α−1), β/(α−1))          (``:303-489``)
* classification: the predicted probability itself    (``:253-301``)
* quantile-regression: the predicted interval          (``:823-877``)
* dropout: Var over MC samples (same math as ensemble over the MC axis)
"""

from __future__ import annotations

import numpy as np

from chemprop_tpu.utils.registry import ClassRegistry

UncertaintyEstimatorRegistry = ClassRegistry()


class UncertaintyEstimator:
    """Base: map stacked model outputs to per-sample uncertainties
    (reference ``estimator.py:15-60``)."""

    def __call__(self, stacked: np.ndarray):
        raise NotImplementedError


@UncertaintyEstimatorRegistry.register("none")
class NoUncertaintyEstimator(UncertaintyEstimator):
    def __call__(self, stacked: np.ndarray) -> None:
        return None


@UncertaintyEstimatorRegistry.register("ensemble")
class EnsembleEstimator(UncertaintyEstimator):
    def __call__(self, stacked: np.ndarray) -> np.ndarray:
        if stacked.shape[0] == 1:
            raise ValueError("ensemble uncertainty requires >= 2 models")
        point = stacked[..., 0] if stacked.ndim == 4 else stacked
        return point.var(axis=0)


@UncertaintyEstimatorRegistry.register("dropout")
class DropoutEstimator(EnsembleEstimator):
    """MC-dropout variance (callers stack MC samples on the model axis)."""

    def __call__(self, stacked: np.ndarray) -> np.ndarray:
        point = stacked[..., 0] if stacked.ndim == 4 else stacked
        return point.var(axis=0)


@UncertaintyEstimatorRegistry.register("mve")
class MVEEstimator(UncertaintyEstimator):
    def __call__(self, stacked: np.ndarray) -> np.ndarray:
        if stacked.ndim != 4 or stacked.shape[-1] != 2:
            raise ValueError("mve uncertainty requires [m, n, t, 2] outputs")
        return stacked[..., 1].mean(axis=0)


class _EvidentialBase(UncertaintyEstimator):
    def _vab(self, stacked):
        if stacked.ndim != 4 or stacked.shape[-1] != 4:
            raise ValueError("evidential uncertainty requires [m, n, t, 4] outputs")
        v = stacked[..., 1]
        alpha = stacked[..., 2]
        beta = stacked[..., 3]
        return v, alpha, beta


@UncertaintyEstimatorRegistry.register("evidential-total")
class EvidentialTotalEstimator(_EvidentialBase):
    def __call__(self, stacked: np.ndarray) -> np.ndarray:
        v, alpha, beta = self._vab(stacked)
        return ((1 + 1 / v) * beta / (alpha - 1)).mean(axis=0)


@UncertaintyEstimatorRegistry.register("evidential-epistemic")
class EvidentialEpistemicEstimator(_EvidentialBase):
    def __call__(self, stacked: np.ndarray) -> np.ndarray:
        v, alpha, beta = self._vab(stacked)
        return ((1 / v) * beta / (alpha - 1)).mean(axis=0)


@UncertaintyEstimatorRegistry.register("evidential-aleatoric")
class EvidentialAleatoricEstimator(_EvidentialBase):
    def __call__(self, stacked: np.ndarray) -> np.ndarray:
        v, alpha, beta = self._vab(stacked)
        return (beta / (alpha - 1)).mean(axis=0)


@UncertaintyEstimatorRegistry.register("classification")
class ClassEstimator(UncertaintyEstimator):
    """The predicted probabilities themselves (binary [m, n, t] ->
    [n, t]; multiclass [m, n, t, c] -> [n, t, c])."""

    def __call__(self, stacked: np.ndarray) -> np.ndarray:
        return stacked.mean(axis=0)


@UncertaintyEstimatorRegistry.register("classification-dirichlet")
class ClassificationDirichletEstimator(UncertaintyEstimator):
    """Binary Dirichlet head outputs [m, n, t, 2] = (p, u); uncertainty is
    the mean Dirichlet ``u = K / sum(alpha)`` (cf. reference ``:648-721``)."""

    def __call__(self, stacked: np.ndarray) -> np.ndarray:
        if stacked.ndim != 4 or stacked.shape[-1] != 2:
            raise ValueError("classification-dirichlet requires [m, n, t, 2] outputs")
        return stacked[..., 1].mean(axis=0)


@UncertaintyEstimatorRegistry.register("multiclass-dirichlet")
class MulticlassDirichletEstimator(UncertaintyEstimator):
    """Multiclass Dirichlet head outputs [m, n, t, c+1] = (p_1..p_c, u);
    uncertainty is the mean ``u`` channel (cf. reference ``:724-816``)."""

    def __call__(self, stacked: np.ndarray) -> np.ndarray:
        if stacked.ndim != 4:
            raise ValueError("multiclass-dirichlet requires [m, n, t, c+1] outputs")
        return stacked[..., -1].mean(axis=0)


@UncertaintyEstimatorRegistry.register("quantile-regression")
class QuantileRegressionEstimator(UncertaintyEstimator):
    def __call__(self, stacked: np.ndarray) -> np.ndarray:
        if stacked.ndim != 4 or stacked.shape[-1] != 2:
            raise ValueError("quantile uncertainty requires [m, n, t, 2] outputs")
        return stacked[..., 1].mean(axis=0)
