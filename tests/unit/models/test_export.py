"""StableHLO export tests (cf. reference ``tests/integration/test_export.py``
and the dynamic-shape torch.export check in
``tests/unit/nn/test_message_passing.py:44``): the exported program must match
eager apply, accept other padded shapes when dynamic, survive a
serialize/deserialize round trip, and handle zero-edge molecules."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset, PadSpec, collate_batch
from chemprop_tpu.models import MPNN
from chemprop_tpu.models.export import export_forward, load_exported, save_exported
from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN


def _batch(smis, pad_nodes=128, pad_edges=128):
    dps = [MoleculeDatapoint.from_smi(s, y=np.array([float(i)])) for i, s in enumerate(smis)]
    ds = MoleculeDataset(dps)
    data = [ds[i] for i in range(len(ds))]
    return collate_batch(data, PadSpec(pad_nodes, pad_edges, len(smis)))


@pytest.fixture(scope="module")
def model_and_vars():
    model = MPNN(
        message_passing=BondMessagePassing(depth=2),
        agg=MeanAggregation(),
        predictor=RegressionFFN(),
        batch_norm=False,
    )
    batch = _batch(["CCO", "c1ccccc1", "CC(=O)O", "CNC"])
    variables = model.init(jax.random.PRNGKey(0), batch.bmg, is_training=False)
    return model, variables, batch


class TestExport:
    def test_matches_eager(self, model_and_vars):
        model, variables, batch = model_and_vars
        exported = export_forward(model, variables, batch)
        got = np.asarray(exported.call(variables, batch.bmg, batch.V_d, batch.X_d))
        want = np.asarray(
            model.apply(variables, batch.bmg, batch.V_d, batch.X_d, is_training=False)
        )
        assert np.allclose(got, want, atol=1e-5)

    def test_dynamic_shapes_accept_other_padding(self, model_and_vars):
        model, variables, batch = model_and_vars
        exported = export_forward(model, variables, batch)
        bigger = _batch(["CCO", "c1ccccc1", "CC(=O)O", "CNC"], pad_nodes=256, pad_edges=384)
        got = np.asarray(exported.call(variables, bigger.bmg, bigger.V_d, bigger.X_d))
        want = np.asarray(
            model.apply(variables, bigger.bmg, bigger.V_d, bigger.X_d, is_training=False)
        )
        assert np.allclose(got, want, atol=1e-5)
        # same molecules -> same predictions regardless of padding
        eager_small = np.asarray(
            model.apply(variables, batch.bmg, batch.V_d, batch.X_d, is_training=False)
        )
        assert np.allclose(got, eager_small, atol=1e-5)

    def test_serialize_roundtrip(self, model_and_vars, tmp_path):
        model, variables, batch = model_and_vars
        exported = export_forward(model, variables, batch)
        p = tmp_path / "model.stablehlo"
        save_exported(p, exported)
        assert p.stat().st_size > 0
        call = load_exported(p)
        got = np.asarray(call(variables, batch.bmg, batch.V_d, batch.X_d))
        want = np.asarray(
            model.apply(variables, batch.bmg, batch.V_d, batch.X_d, is_training=False)
        )
        assert np.allclose(got, want, atol=1e-5)

    def test_zero_edge_molecule(self, model_and_vars):
        # single atoms have no bonds (reference test_export.py:19 zero-edge
        # case); the exported program must still produce finite predictions
        model, variables, _ = model_and_vars
        batch = _batch(["C", "O", "CCO", "N"])
        exported = export_forward(model, variables, batch)
        got = np.asarray(exported.call(variables, batch.bmg, batch.V_d, batch.X_d))
        assert np.isfinite(got).all()
        want = np.asarray(
            model.apply(variables, batch.bmg, batch.V_d, batch.X_d, is_training=False)
        )
        assert np.allclose(got, want, atol=1e-5)
