"""Registry/Factory semantics and dataset normalization round-trips
(cf. reference ``tests/unit/utils/test_registry.py`` and dataset tests)."""

import numpy as np
import pytest

from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset
from chemprop_tpu.utils.registry import ClassRegistry, Factory


class TestClassRegistry:
    def test_register_and_lookup(self):
        reg = ClassRegistry()

        @reg.register("foo")
        class Foo:
            pass

        @reg.register(["bar", "baz"])
        class Bar:
            pass

        assert reg["foo"] is Foo
        assert reg["bar"] is Bar and reg["baz"] is Bar
        assert set(reg.keys()) >= {"foo", "bar", "baz"}

    def test_unknown_key(self):
        reg = ClassRegistry()
        with pytest.raises(KeyError):
            reg["nope"]


class TestFactory:
    def test_filters_kwargs_by_signature(self):
        class Thing:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        t = Factory.build(Thing, a=1, b=3, c="ignored")
        assert (t.a, t.b) == (1, 3)


@pytest.fixture()
def dataset():
    smis = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCCC", "c1ccncc1"]
    ys = np.array([[1.0], [2.0], [3.0], [4.0], [5.0], [6.0]])
    dps = [MoleculeDatapoint.from_smi(s, y=y) for s, y in zip(smis, ys)]
    return MoleculeDataset(dps)


class TestNormalization:
    def test_normalize_targets_round_trip(self, dataset):
        raw = dataset.Y.copy()
        scaler = dataset.normalize_targets()
        normed = dataset.Y
        assert abs(normed.mean()) < 1e-6 and abs(normed.std() - 1) < 1e-6
        # unscaling recovers the raw targets
        back = normed * scaler.scale_ + scaler.mean_
        np.testing.assert_allclose(back, raw, atol=1e-6)

    def test_reset_restores_raw(self, dataset):
        raw = dataset.Y.copy()
        dataset.normalize_targets()
        dataset.reset()
        np.testing.assert_allclose(dataset.Y, raw, atol=1e-6)

    def test_cache_toggle_preserves_featurization(self, dataset):
        mg_cold = dataset[0].mg
        dataset.cache = True
        mg_hot = dataset[0].mg
        np.testing.assert_array_equal(mg_cold.V, mg_hot.V)
        np.testing.assert_array_equal(mg_cold.edge_index, mg_hot.edge_index)
