"""Task heads (cf. reference ``chemprop/nn/predictors.py:43-371``).

Each predictor wraps an :class:`~chemprop_tpu.nn.ffn.MLP` and defines:

* ``train_step(Z)`` — the representation fed to the criterion (e.g. logits);
* ``__call__(Z)`` — inference output (e.g. probabilities, unscaled means);
* ``encode(Z, i)`` — the i-th hidden representation (fingerprint hook).

``n_targets`` is the per-task output multiplicity (2 for MVE, 4 for
evidential, ...). Output unscaling runs only at eval (``is_training=False``),
matching the reference's train/eval transform asymmetry.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from chemprop_tpu.conf import DEFAULT_HIDDEN_DIM
from chemprop_tpu.nn.ffn import MLP
from chemprop_tpu.nn.metrics import (
    MSE,
    SID,
    BCELoss,
    BinaryAUROC,
    ChempropMetric,
    CrossEntropyLoss,
    DirichletLoss,
    EvidentialLoss,
    MulticlassMCCMetric,
    MVELoss,
    QuantileLoss,
)
from chemprop_tpu.nn.transforms import UnscaleTransform
from chemprop_tpu.utils.registry import ClassRegistry, Factory

PredictorRegistry = ClassRegistry()


class _FFNPredictorBase(nn.Module):
    n_tasks: int = 1
    input_dim: int = DEFAULT_HIDDEN_DIM
    hidden_dim: int | Sequence[int] = 300
    n_layers: int = 1
    dropout: float = 0.0
    activation: str = "relu"
    criterion: ChempropMetric | None = None
    task_weights: Sequence[float] | None = None
    threshold: float | None = None
    output_transform: UnscaleTransform | None = None

    n_targets: int = 1
    _T_default_criterion = MSE
    _T_default_metric = MSE

    @property
    def output_dim(self) -> int:
        return self.n_tasks * self.n_targets

    def setup(self):
        self.ffn = MLP(
            self.input_dim,
            self.output_dim,
            self.hidden_dim,
            self.n_layers,
            self.dropout,
            self.activation,
            name="ffn",
        )

    def get_criterion(self) -> ChempropMetric:
        if self.criterion is not None:
            return self.criterion
        tw = self.task_weights if self.task_weights is not None else [1.0] * self.n_tasks
        return Factory.build(
            self._T_default_criterion, task_weights=tw, threshold=self.threshold
        )

    def _unscale(self, X, active: bool):
        """Output unscaling is applied only on the inference path (reference
        keeps output_transform in train mode — a no-op — during training AND
        validation; ``models/model.py:163-168``)."""
        if self.output_transform is None or not active:
            return X
        return self.output_transform(X, is_training=False)

    def train_step(self, Z: jax.Array, is_training: bool = True) -> jax.Array:
        return self.ffn(Z, is_training)

    def __call__(self, Z: jax.Array, is_training: bool = True) -> jax.Array:
        return self.ffn(Z, is_training)

    def val_step(self, Z: jax.Array) -> jax.Array:
        """Validation-metric preds: inference activations but NO output
        unscaling — the reference keeps output_transform in train mode (a
        no-op) during validation (``models/model.py:162-168``)."""
        return self(Z, is_training=False)

    def mc_step(self, Z: jax.Array) -> jax.Array:
        """Monte-Carlo-dropout inference: dropout active, everything else in
        eval semantics (cf. reference ``uncertainty/estimator.py:605-636``)."""
        return self(Z, is_training=True)

    def encode(self, Z: jax.Array, i: int, is_training: bool = True) -> jax.Array:
        return self.ffn.encode(Z, i, is_training)


@PredictorRegistry.register("regression")
class RegressionFFN(_FFNPredictorBase):
    n_targets: int = 1
    _T_default_criterion = MSE
    _T_default_metric = MSE

    def _forward(self, Z, is_training: bool, unscale: bool):
        return self._unscale(self.ffn(Z, is_training), unscale)

    def __call__(self, Z, is_training: bool = True):
        return self._forward(Z, is_training, unscale=not is_training)

    def train_step(self, Z, is_training: bool = True):
        return self._forward(Z, is_training, unscale=False)

    def val_step(self, Z):
        return self._forward(Z, is_training=False, unscale=False)

    def mc_step(self, Z):
        # dropout on, output unscaling on (the reference's MC-dropout runs
        # the normal eval predict path with Dropout modules patched to train)
        return self._forward(Z, is_training=True, unscale=True)


@PredictorRegistry.register("regression-mve")
class MveFFN(RegressionFFN):
    n_targets: int = 2
    _T_default_criterion = MVELoss

    def _forward(self, Z, is_training: bool, unscale: bool):
        Y = self.ffn(Z, is_training)
        mean, var = jnp.split(Y, 2, axis=1)
        var = jax.nn.softplus(var)
        mean = self._unscale(mean, unscale)
        if self.output_transform is not None and unscale:
            var = self.output_transform.transform_variance(var, is_training=False)
        return jnp.stack([mean, var], axis=2)


@PredictorRegistry.register("regression-evidential")
class EvidentialFFN(RegressionFFN):
    n_targets: int = 4
    _T_default_criterion = EvidentialLoss

    def _forward(self, Z, is_training: bool, unscale: bool):
        Y = self.ffn(Z, is_training)
        mean, v, alpha, beta = jnp.split(Y, 4, axis=1)
        v = jax.nn.softplus(v)
        alpha = jax.nn.softplus(alpha) + 1
        beta = jax.nn.softplus(beta)
        mean = self._unscale(mean, unscale)
        if self.output_transform is not None and unscale:
            beta = self.output_transform.transform_variance(beta, is_training=False)
        return jnp.stack([mean, v, alpha, beta], axis=2)


@PredictorRegistry.register("regression-quantile")
class QuantileFFN(RegressionFFN):
    n_targets: int = 2
    _T_default_criterion = QuantileLoss

    def _forward(self, Z, is_training: bool, unscale: bool):
        lower, upper = jnp.split(self.ffn(Z, is_training), 2, axis=1)
        lower = self._unscale(lower, unscale)
        upper = self._unscale(upper, unscale)
        mean = (lower + upper) / 2
        interval = upper - lower
        return jnp.stack([mean, interval], axis=2)


class BinaryClassificationFFNBase(_FFNPredictorBase):
    pass


@PredictorRegistry.register("classification")
class BinaryClassificationFFN(BinaryClassificationFFNBase):
    n_targets: int = 1
    _T_default_criterion = BCELoss
    _T_default_metric = BinaryAUROC

    def __call__(self, Z, is_training: bool = True):
        return jax.nn.sigmoid(self.ffn(Z, is_training))

    def train_step(self, Z, is_training: bool = True):
        return self.ffn(Z, is_training)  # logits


@PredictorRegistry.register("classification-dirichlet")
class BinaryDirichletFFN(BinaryClassificationFFNBase):
    n_targets: int = 2
    _T_default_criterion = DirichletLoss
    _T_default_metric = BinaryAUROC

    def __call__(self, Z, is_training: bool = True):
        Y = self.ffn(Z, is_training).reshape(Z.shape[0], -1, 2)
        alpha = jax.nn.softplus(Y) + 1
        u = 2 / alpha.sum(-1)
        p = alpha / alpha.sum(-1, keepdims=True)
        return jnp.stack([p[..., 1], u], axis=2)

    def train_step(self, Z, is_training: bool = True):
        Y = self.ffn(Z, is_training).reshape(Z.shape[0], -1, 2)
        return jax.nn.softplus(Y) + 1


@PredictorRegistry.register("multiclass")
class MulticlassClassificationFFN(_FFNPredictorBase):
    n_classes: int = 3
    n_targets: int = 1
    _T_default_criterion = CrossEntropyLoss
    _T_default_metric = MulticlassMCCMetric

    @property
    def output_dim(self) -> int:
        return self.n_tasks * self.n_targets * self.n_classes

    def __call__(self, Z, is_training: bool = True):
        logits = self.ffn(Z, is_training).reshape(Z.shape[0], -1, self.n_classes)
        return jax.nn.softmax(logits, axis=-1)

    def train_step(self, Z, is_training: bool = True):
        return self.ffn(Z, is_training).reshape(Z.shape[0], -1, self.n_classes)


@PredictorRegistry.register("multiclass-dirichlet")
class MulticlassDirichletFFN(MulticlassClassificationFFN):
    _T_default_criterion = DirichletLoss
    _T_default_metric = MulticlassMCCMetric

    def __call__(self, Z, is_training: bool = True):
        # [n, t, c+1]: class probabilities + Dirichlet uncertainty u = c/S,
        # matching the reference estimator's patched forward
        # (reference ``uncertainty/estimator.py:806-820``)
        Y = self.ffn(Z, is_training).reshape(Z.shape[0], -1, self.n_classes)
        alpha = jax.nn.softplus(Y) + 1
        S = alpha.sum(-1, keepdims=True)
        return jnp.concatenate([alpha / S, self.n_classes / S], axis=-1)

    def train_step(self, Z, is_training: bool = True):
        Y = self.ffn(Z, is_training).reshape(Z.shape[0], -1, self.n_classes)
        return jax.nn.softplus(Y) + 1


@PredictorRegistry.register("spectral")
class SpectralFFN(_FFNPredictorBase):
    n_targets: int = 1
    spectral_activation: str = "softplus"
    _T_default_criterion = SID
    _T_default_metric = SID

    def __call__(self, Z, is_training: bool = True):
        Y = self.ffn(Z, is_training)
        match self.spectral_activation:
            case "exp":
                Y = jnp.exp(Y)
            case "softplus" | None:
                Y = jax.nn.softplus(Y)
            case _:
                raise ValueError(f"unknown spectral activation {self.spectral_activation!r}")
        return Y / jnp.maximum(Y.sum(1, keepdims=True), 1e-12)

    train_step = __call__
