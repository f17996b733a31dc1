"""Index samplers (cf. reference ``chemprop/data/samplers.py:8-66``), free of
any torch dependency: plain iterables of dataset indices."""

from __future__ import annotations

from itertools import chain
from typing import Iterator

import numpy as np


class SeededSampler:
    """Deterministically seeded shuffling; reshuffles each epoch."""

    def __init__(self, N: int, seed: int):
        if seed is None:
            raise ValueError("a SeededSampler must be seeded!")
        self.idxs = np.arange(N)
        self.rg = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[int]:
        self.rg.shuffle(self.idxs)
        return iter(self.idxs.tolist())

    def __len__(self) -> int:
        return len(self.idxs)


class ClassBalanceSampler:
    """Alternates positive/negative samples so each batch is class-balanced
    (a sample is positive if *any* task target is nonzero)."""

    def __init__(self, Y: np.ndarray, seed: int | None = None, shuffle: bool = False):
        self.shuffle = shuffle
        self.rg = np.random.default_rng(seed)
        idxs = np.arange(len(Y))
        actives = Y.any(1)
        self.pos_idxs = idxs[actives]
        self.neg_idxs = idxs[~actives]
        self.length = 2 * min(len(self.pos_idxs), len(self.neg_idxs))

    def __iter__(self) -> Iterator[int]:
        if self.shuffle:
            self.rg.shuffle(self.pos_idxs)
            self.rg.shuffle(self.neg_idxs)
        return chain(*zip(self.pos_idxs.tolist(), self.neg_idxs.tolist()))

    def __len__(self) -> int:
        return self.length
