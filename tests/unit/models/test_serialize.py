"""Checkpoint round-trip tests for every model family (cf. reference
``tests/unit/utils/test_save_load_mol.py``): save_model -> load_model must
reproduce identical predictions."""

import numpy as np
import pytest

import jax

from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset, PadSpec, collate_batch
from chemprop_tpu.data.collate import batch_mol_graphs
from chemprop_tpu.models import MPNN, MulticomponentMPNN
from chemprop_tpu.models.mol_atom_bond import MolAtomBondMPNN
from chemprop_tpu.models.serialize import load_model, save_model
from chemprop_tpu.nn import (
    BondMessagePassing,
    MeanAggregation,
    MulticomponentMessagePassing,
    RegressionFFN,
)
from chemprop_tpu.nn.message_passing.mol_atom_bond import MABBondMessagePassing

SMIS = ["CCO", "c1ccccc1", "CC(=O)O", "CNC"]


def _batch(pad=PadSpec(64, 64, 4)):
    dps = [MoleculeDatapoint.from_smi(s, y=np.array([float(i)])) for i, s in enumerate(SMIS)]
    ds = MoleculeDataset(dps)
    return collate_batch([ds[i] for i in range(len(ds))], pad)


class TestCheckpointRoundTrip:
    def test_mpnn(self, tmp_path):
        batch = _batch()
        model = MPNN(
            message_passing=BondMessagePassing(d_h=32),
            agg=MeanAggregation(),
            predictor=RegressionFFN(input_dim=32, hidden_dim=16),
            batch_norm=False,
        )
        variables = model.init(jax.random.PRNGKey(0), batch.bmg, is_training=False)
        want = np.asarray(model.apply(variables, batch.bmg, is_training=False))

        save_model(tmp_path / "m.ckpt", model, variables, output_columns=["y"])
        m2, v2, extra = load_model(tmp_path / "m.ckpt")
        got = np.asarray(m2.apply(v2, batch.bmg, is_training=False))
        np.testing.assert_array_equal(got, want)
        assert extra["output_columns"] == ["y"]

    def test_multicomponent(self, tmp_path):
        b1, b2 = _batch(), _batch()
        model = MulticomponentMPNN(
            message_passing=MulticomponentMessagePassing(
                blocks=[BondMessagePassing(d_h=32), BondMessagePassing(d_h=32)],
                n_components=2,
            ),
            agg=MeanAggregation(),
            predictor=RegressionFFN(input_dim=64, hidden_dim=16),
        )
        bmgs = (b1.bmg, b2.bmg)
        variables = model.init(jax.random.PRNGKey(0), bmgs, is_training=False)
        want = np.asarray(model.apply(variables, bmgs, is_training=False))

        save_model(tmp_path / "mc.ckpt", model, variables)
        m2, v2, _ = load_model(tmp_path / "mc.ckpt")
        assert isinstance(m2, MulticomponentMPNN)
        got = np.asarray(m2.apply(v2, bmgs, is_training=False))
        np.testing.assert_array_equal(got, want)

    def test_mol_atom_bond(self, tmp_path):
        batch = _batch()
        model = MolAtomBondMPNN(
            message_passing=MABBondMessagePassing(d_h=32),
            agg=MeanAggregation(),
            mol_predictor=RegressionFFN(n_tasks=1, input_dim=32, hidden_dim=16),
            atom_predictor=RegressionFFN(n_tasks=1, input_dim=32, hidden_dim=16),
            bond_predictor=RegressionFFN(n_tasks=1, input_dim=64, hidden_dim=16),
        )
        variables = model.init(jax.random.PRNGKey(0), batch.bmg, is_training=False)
        want = model.apply(variables, batch.bmg, is_training=False)

        save_model(tmp_path / "mab.ckpt", model, variables)
        m2, v2, _ = load_model(tmp_path / "mab.ckpt")
        assert isinstance(m2, MolAtomBondMPNN)
        got = m2.apply(v2, batch.bmg, is_training=False)
        for g, w in zip(got, want):
            if w is None:
                assert g is None
            else:
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
