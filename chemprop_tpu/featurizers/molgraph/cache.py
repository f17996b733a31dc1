"""MolGraph cache facades (cf. reference ``chemprop/featurizers/molgraph/
cache.py:12-91``): a Sequence interface over featurized graphs, either
precomputed in memory or computed on access. The datasets' ``cache`` toggle
uses the same precompute path internally; these classes are the standalone
public API for it."""

from __future__ import annotations

from collections.abc import Sequence
from typing import Iterable

import numpy as np

from chemprop_tpu.types import MolGraph
from chemprop_tpu.utils.utils import parallel_execute


class MolGraphCacheFacade(Sequence):
    """Sequence-of-MolGraph interface; subclasses decide whether the
    underlying data is actually cached."""


class MolGraphCache(MolGraphCacheFacade):
    """Precomputes all MolGraphs in memory (optionally in parallel)."""

    def __init__(
        self,
        inputs: Iterable,
        V_fs: Iterable[np.ndarray | None],
        E_fs: Iterable[np.ndarray | None],
        featurizer,
        n_workers: int = 0,
    ):
        items = list(zip(inputs, V_fs, E_fs))
        self._mgs = parallel_execute(
            lambda i: featurizer(items[i][0], items[i][1], items[i][2]),
            range(len(items)),
            n_workers,
        )

    def __len__(self) -> int:
        return len(self._mgs)

    def __getitem__(self, index: int) -> MolGraph:
        return self._mgs[index]


class MolGraphCacheOnTheFly(MolGraphCacheFacade):
    """Featurizes on each access."""

    def __init__(
        self,
        inputs: Iterable,
        V_fs: Iterable[np.ndarray | None],
        E_fs: Iterable[np.ndarray | None],
        featurizer,
    ):
        self._inputs = list(inputs)
        self._V_fs = list(V_fs)
        self._E_fs = list(E_fs)
        self._featurizer = featurizer

    def __len__(self) -> int:
        return len(self._inputs)

    def __getitem__(self, index: int) -> MolGraph:
        return self._featurizer(self._inputs[index], self._V_fs[index], self._E_fs[index])
