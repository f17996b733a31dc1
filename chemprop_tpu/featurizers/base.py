"""Featurizer protocols (cf. reference ``chemprop/featurizers/base.py:13-30``)."""

from __future__ import annotations

from abc import abstractmethod
from typing import Generic, Protocol, TypeVar, runtime_checkable

import numpy as np

S = TypeVar("S", contravariant=True)
T = TypeVar("T")


@runtime_checkable
class VectorFeaturizer(Protocol[S]):
    """Maps an input (atom, bond, molecule, ...) to a 1-D feature vector."""

    @abstractmethod
    def __len__(self) -> int: ...

    @abstractmethod
    def __call__(self, x: S) -> np.ndarray: ...


@runtime_checkable
class GraphFeaturizer(Protocol[S]):
    """Maps an input to a :class:`~chemprop_tpu.data.molgraph.MolGraph`."""

    @property
    @abstractmethod
    def shape(self) -> tuple[int, int]: ...

    @abstractmethod
    def __call__(self, x: S, atom_features_extra, bond_features_extra): ...
