"""Eval-only scaling transforms baked into the model graph.

Semantics match the reference exactly (``chemprop/nn/transforms.py:37-74``):
during *training* these are no-ops (training data is pre-normalized in the
dataset); at *eval* they scale/unscale so the model consumes raw inputs and
emits raw-unit predictions. The train/eval asymmetry is expressed with an
explicit ``is_training`` argument rather than module mode state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass
class ScaleTransform:
    mean: np.ndarray
    scale: np.ndarray
    pad: int = 0

    def __post_init__(self):
        mean = np.asarray(self.mean, dtype=np.float32).reshape(-1)
        scale = np.asarray(self.scale, dtype=np.float32).reshape(-1)
        if mean.shape != scale.shape:
            raise ValueError(f"uneven shapes for mean/scale: {mean.shape} vs {scale.shape}")
        if self.pad:
            mean = np.concatenate([np.zeros(self.pad, np.float32), mean])
            scale = np.concatenate([np.ones(self.pad, np.float32), scale])
        self.mean = mean[None, :]
        self.scale = scale[None, :]

    @classmethod
    def from_standard_scaler(cls, scaler, pad: int = 0) -> "ScaleTransform":
        return cls(scaler.mean_, scaler.scale_, pad=pad)

    def to_standard_scaler(self):
        from sklearn.preprocessing import StandardScaler

        s = StandardScaler()
        s.mean_ = np.asarray(self.mean)[0]
        s.scale_ = np.asarray(self.scale)[0]
        return s

    def __call__(self, X, is_training: bool = True):
        if is_training:
            return X
        return (X - self.mean) / self.scale

    def to_dict(self) -> dict:
        return {
            "mean": np.asarray(self.mean)[0].tolist(),
            "scale": np.asarray(self.scale)[0].tolist(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ScaleTransform":
        return cls(np.array(d["mean"]), np.array(d["scale"]))


@dataclass
class UnscaleTransform(ScaleTransform):
    def __call__(self, X, is_training: bool = True):
        if is_training:
            return X
        return X * self.scale + self.mean

    def transform_variance(self, var, is_training: bool = True):
        if is_training:
            return var
        return var * jnp.square(self.scale)


@dataclass
class GraphTransform:
    """Scales ``bmg.V``/``bmg.E`` at eval time (extra-feature blocks only,
    protected by the featurizer-width ``pad``)."""

    V_transform: ScaleTransform | None
    E_transform: ScaleTransform | None

    def __call__(self, bmg, is_training: bool = True):
        if is_training:
            return bmg
        V, E = bmg.V, bmg.E
        if self.V_transform is not None:
            V = self.V_transform(V, is_training)
        if self.E_transform is not None:
            E = self.E_transform(E, is_training)
        return bmg.replace(V=V, E=E)
