"""Order-preserving oversized-molecule isolation for MolAtomBond loaders
(VERDICT r4 next #8): a >385-directed-edge molecule is routed into its own
batch so small co-batched molecules keep the fused message path, while the
per-molecule, per-ATOM and per-BOND prediction tables still come out in
dataset row order (grouped un-permutation in MABTrainer._predict_with)."""

import numpy as np
import pytest

from chemprop_tpu.data import DataLoader, MolAtomBondDatapoint
from chemprop_tpu.data.datasets import MolAtomBondDataset
from chemprop_tpu.models.mol_atom_bond import MolAtomBondMPNN
from chemprop_tpu.nn import MeanAggregation, RegressionFFN
from chemprop_tpu.nn.message_passing.mol_atom_bond import MABBondMessagePassing
from chemprop_tpu.train.mab_trainer import MABTrainer

SMALL = ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1", "C1CCNCC1", "CCCCO"]
GIANT = "C1(CCCCC1)" * 40  # ~480 directed edges: over the fused-kernel window


@pytest.fixture(scope="module")
def mixed_dataset():
    def dp(smi):
        from chemprop_tpu.chem import make_mol

        mol = make_mol(smi, keep_h=False, add_h=False)
        return MolAtomBondDatapoint.from_smi(
            smi,
            y=np.array([1.0]),
            atom_y=np.zeros((mol.num_atoms, 1)),
            bond_y=np.zeros((mol.num_bonds, 1)),
        )

    # giant in the middle so isolation visibly reorders emission
    dps = [dp(SMALL[0]), dp(SMALL[1]), dp(GIANT), dp(SMALL[2]), dp(SMALL[3]), dp(SMALL[4])]
    ds = MolAtomBondDataset(dps)
    ds.cache = True
    return ds


@pytest.fixture(scope="module")
def mab_model_vars(mixed_dataset):
    import jax

    d_h = 32
    model = MolAtomBondMPNN(
        message_passing=MABBondMessagePassing(d_h=d_h),
        agg=MeanAggregation(),
        mol_predictor=RegressionFFN(n_tasks=1, input_dim=d_h, hidden_dim=d_h),
        atom_predictor=RegressionFFN(n_tasks=1, input_dim=d_h, hidden_dim=d_h),
        bond_predictor=RegressionFFN(n_tasks=1, input_dim=2 * d_h, hidden_dim=d_h),
    )
    loader = DataLoader(mixed_dataset, batch_size=1, prefetch=0)
    batch = next(iter(loader))
    variables = model.init(
        jax.random.PRNGKey(0), batch.bmg, batch.V_d, batch.E_d, batch.X_d,
        batch.constraints, is_training=False,
    )
    return model, variables


class TestMABOversizedIsolation:
    def test_loader_isolates_and_reports_order(self, mixed_dataset):
        loader = DataLoader(mixed_dataset, batch_size=4, prefetch=0)
        order = loader.emitted_order()
        # the giant (dataset index 2) was deferred to its own final batch
        assert order is not None
        assert list(order) == [0, 1, 3, 4, 5, 2]
        sizes = [len(b) for b in loader._index_batches()]
        assert sizes == [4, 1, 1]

    def test_predictions_restored_to_dataset_order(self, mixed_dataset, mab_model_vars):
        model, variables = mab_model_vars
        tr = MABTrainer(model)
        # batch_size=1 emits strictly in order (each batch fills immediately)
        ref = tr.predict(DataLoader(mixed_dataset, batch_size=1, prefetch=0), variables)
        got = tr.predict(DataLoader(mixed_dataset, batch_size=4, prefetch=0), variables)
        for name, a, b in zip(("mol", "atom", "bond"), got, ref):
            assert a.shape == b.shape, name
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)
        n_atoms = sum(d.mol.num_atoms for d in mixed_dataset.data)
        n_bonds = sum(d.mol.num_bonds for d in mixed_dataset.data)
        assert got[1].shape[0] == n_atoms
        assert got[2].shape[0] == n_bonds

    def test_drop_last_subset_restores_without_crash(self, mixed_dataset, mab_model_vars):
        """drop_last makes emitted_order a SUBSET of the dataset (isolated
        tail batches are dropped); restoration must sort the emitted rows
        by dataset index instead of crashing on the scatter inverse
        (code-review r5 finding)."""
        model, variables = mab_model_vars
        tr = MABTrainer(model)
        loader = DataLoader(mixed_dataset, batch_size=4, prefetch=0, drop_last=True)
        order = loader.emitted_order()
        # the giant (index 2) and the partial tail were dropped
        assert list(order) == [0, 1, 3, 4]
        got = tr.predict(loader, variables)
        ref = tr.predict(DataLoader(mixed_dataset, batch_size=1, prefetch=0), variables)
        data = mixed_dataset.data
        # mol rows: the emitted subset in ascending dataset order
        np.testing.assert_allclose(
            got[0], ref[0][[0, 1, 3, 4]], rtol=2e-4, atol=2e-4
        )
        # atom/bond rows: grouped restore over the emitted subset
        a_starts = np.concatenate([[0], np.cumsum([d.mol.num_atoms for d in data])])
        b_starts = np.concatenate([[0], np.cumsum([d.mol.num_bonds for d in data])])
        ref_atoms = np.concatenate(
            [ref[1][a_starts[i] : a_starts[i + 1]] for i in (0, 1, 3, 4)]
        )
        ref_bonds = np.concatenate(
            [ref[2][b_starts[i] : b_starts[i + 1]] for i in (0, 1, 3, 4)]
        )
        np.testing.assert_allclose(got[1], ref_atoms, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got[2], ref_bonds, rtol=2e-4, atol=2e-4)
