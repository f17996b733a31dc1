"""Sampler tests (cf. reference ``tests/unit/data/test_samplers.py``)."""

import numpy as np
import pytest

from chemprop_tpu.data.samplers import ClassBalanceSampler, SeededSampler


class TestSeededSampler:
    def test_requires_seed(self):
        with pytest.raises(ValueError):
            SeededSampler(10, None)

    def test_covers_all_indices(self):
        s = SeededSampler(50, 0)
        assert sorted(s) == list(range(50))
        assert len(s) == 50

    def test_same_seed_same_order(self):
        assert list(SeededSampler(100, 7)) == list(SeededSampler(100, 7))

    def test_different_seed_different_order(self):
        assert list(SeededSampler(100, 0)) != list(SeededSampler(100, 1))

    def test_reshuffles_each_epoch(self):
        s = SeededSampler(100, 0)
        assert list(s) != list(s)


class TestClassBalanceSampler:
    def test_alternates_pos_neg(self):
        Y = np.array([[1], [0], [1], [0], [1], [0], [0], [0]])
        s = ClassBalanceSampler(Y)
        order = list(s)
        assert len(order) == len(s) == 2 * 3  # 3 positives
        pos = {0, 2, 4}
        labels = [i in pos for i in order]
        assert labels == [True, False] * 3

    def test_any_task_positive_counts(self):
        Y = np.array([[0, 1], [0, 0], [1, 0], [0, 0]])
        s = ClassBalanceSampler(Y)
        assert len(s) == 4

    def test_seeded_shuffle_deterministic(self):
        Y = np.tile(np.array([[1], [0]]), (10, 1))
        assert list(ClassBalanceSampler(Y, seed=3, shuffle=True)) == list(
            ClassBalanceSampler(Y, seed=3, shuffle=True)
        )
