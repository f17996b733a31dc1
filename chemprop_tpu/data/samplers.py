"""Epoch index streams for the padded-batch DataLoader.

Torch-free counterparts of the reference's sampler layer
(``chemprop/data/samplers.py:8-66``): each sampler is a plain re-iterable
of dataset indices. RNG semantics are a deliberate compatibility
constraint — one ``np.random.default_rng(seed)`` Generator created at
construction and advanced by in-place shuffles each epoch — so that
seeded runs shuffle identically to the reference (pinned by
``tests/unit/data/test_samplers.py``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


class SeededSampler:
    """Epoch-reshuffled permutation of ``range(n)`` from a seeded stream.

    Each epoch re-shuffles the *current* permutation in place with the same
    persistent Generator, so epoch k's order depends on the seed and k —
    never on wall clock or global RNG state.
    """

    def __init__(self, n: int, seed: int):
        if seed is None:
            raise ValueError("SeededSampler requires an explicit seed")
        self._order = np.arange(n)
        self._rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[int]:
        self._rng.shuffle(self._order)
        yield from self._order.tolist()

    def __len__(self) -> int:
        return self._order.size


class ClassBalanceSampler:
    """Interleaved positive/negative index stream: consecutive (pos, neg)
    pairs, truncated to the smaller class, so every batch prefix is
    class-balanced. A row counts as positive when ANY task target is
    nonzero. With ``shuffle``, both class pools reshuffle each epoch from
    one persistent seeded Generator (positives first — stream-order
    compatible with the reference).
    """

    def __init__(self, Y: np.ndarray, seed: int | None = None, shuffle: bool = False):
        self._shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        is_pos = np.asarray(Y).any(axis=1)
        all_idxs = np.arange(len(Y))
        self._pools = [all_idxs[is_pos], all_idxs[~is_pos]]

    def __iter__(self) -> Iterator[int]:
        if self._shuffle:
            for pool in self._pools:
                self._rng.shuffle(pool)
        pairs = len(self) // 2
        for pos, neg in zip(self._pools[0][:pairs], self._pools[1][:pairs]):
            yield int(pos)
            yield int(neg)

    def __len__(self) -> int:
        return 2 * min(pool.size for pool in self._pools)
