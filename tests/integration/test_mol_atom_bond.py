"""MolAtomBond integration: triple-head training on the reference MAB QM
dataset (cf. reference ``tests/integration/test_mol_atom_bond.py``)."""

import ast
import csv

import numpy as np
import pytest

from chemprop_tpu.data import DataLoader, MolAtomBondDatapoint
from chemprop_tpu.data.datasets import MolAtomBondDataset
from chemprop_tpu.models.mol_atom_bond import MolAtomBondMPNN
from chemprop_tpu.nn import MeanAggregation, RegressionFFN
from chemprop_tpu.nn.message_passing.mol_atom_bond import MABBondMessagePassing
from chemprop_tpu.train.mab_trainer import MABTrainer


@pytest.fixture(scope="module")
def mab_dataset(data_dir):
    with open(data_dir / "mol_atom_bond" / "regression.csv") as f:
        rows = list(csv.DictReader(f))
    def f(v):
        return float(v) if v not in ("", None) else np.nan

    dps = []
    for r in rows:
        mol_y = np.array([f(r["mol_y1"]), f(r["mol_y2"])])
        atom_y = np.array(
            list(zip(ast.literal_eval(r["atom_y1"]), ast.literal_eval(r["atom_y2"]))),
            dtype=float,
        )
        bond_y = np.array(
            list(zip(ast.literal_eval(r["bond_y1"]), ast.literal_eval(r["bond_y2"]))),
            dtype=float,
        )
        dps.append(
            MolAtomBondDatapoint.from_smi(
                r["smiles"],
                keep_h=True,
                y=mol_y,
                atom_y=atom_y,
                bond_y=bond_y if len(bond_y) else np.zeros((0, 2)),
                weight=float(r["weight"]),
            )
        )
    ds = MolAtomBondDataset(dps)
    for kind in ("mol", "atom", "bond"):
        ds.normalize_targets(kind)
    ds.cache = True
    return ds


@pytest.fixture(scope="module")
def mab_loader(mab_dataset):
    from chemprop_tpu.data.collate import collate_mol_atom_bond_batch

    class MABLoader(DataLoader):
        def _make_batch(self, idxs):
            data = [self.dataset[i] for i in idxs]
            from chemprop_tpu.data.collate import PadSpec

            pad = PadSpec.for_graphs([d.mg for d in data], n_graphs=self.batch_size)
            return collate_mol_atom_bond_batch(data, pad)

    return MABLoader(mab_dataset, batch_size=16, shuffle=False, prefetch=0)


@pytest.mark.integration
def test_mab_training(mab_dataset, mab_loader):
    d_h = 64
    model = MolAtomBondMPNN(
        message_passing=MABBondMessagePassing(d_h=d_h),
        agg=MeanAggregation(),
        mol_predictor=RegressionFFN(n_tasks=2, input_dim=d_h, hidden_dim=d_h),
        atom_predictor=RegressionFFN(n_tasks=2, input_dim=d_h, hidden_dim=d_h),
        bond_predictor=RegressionFFN(n_tasks=2, input_dim=2 * d_h, hidden_dim=d_h),
    )
    tr = MABTrainer(model, max_epochs=10, seed=0)
    tr.fit(mab_loader)
    assert tr.history[-1]["train_loss"] < tr.history[0]["train_loss"]

    mol_p, atom_p, bond_p = tr.predict(mab_loader)
    n_mols = len(mab_dataset)
    n_atoms = sum(d.mol.num_atoms for d in mab_dataset.data)
    n_bonds = sum(d.mol.num_bonds for d in mab_dataset.data)
    assert mol_p.shape == (n_mols, 2)
    assert atom_p.shape == (n_atoms, 2)
    assert bond_p.shape == (n_bonds, 2)
    assert np.isfinite(mol_p).all() and np.isfinite(atom_p).all() and np.isfinite(bond_p).all()


@pytest.mark.integration
def test_mab_heads_optional(mab_dataset, mab_loader):
    d_h = 32
    model = MolAtomBondMPNN(
        message_passing=MABBondMessagePassing(d_h=d_h, return_vertex_embeddings=True),
        agg=None,
        mol_predictor=None,
        atom_predictor=RegressionFFN(n_tasks=2, input_dim=d_h, hidden_dim=d_h),
        bond_predictor=None,
    )
    tr = MABTrainer(model, max_epochs=3, seed=0)
    tr.fit(mab_loader)
    mol_p, atom_p, bond_p = tr.predict(mab_loader)
    assert mol_p is None and bond_p is None
    assert atom_p is not None and np.isfinite(atom_p).all()


@pytest.mark.integration
def test_mab_bounded_masks_collate_and_train(data_dir):
    """Bounded (censored) per-kind targets flow datapoint -> datum -> collate
    -> loss (cf. reference ``tests/integration/test_bounded_MAB.py``)."""
    from chemprop_tpu.data.collate import PadSpec, collate_mol_atom_bond_batch
    from chemprop_tpu.nn.metrics import BoundedMSE

    smis = ["CCO", "CC(=O)O", "c1ccccc1", "CCN"]
    dps = []
    rng = np.random.default_rng(0)
    for s in smis:
        dp0 = MolAtomBondDatapoint.from_smi(s, keep_h=False)
        n_atoms = dp0.mol.num_atoms
        n_bonds = dp0.mol.num_bonds
        dps.append(
            MolAtomBondDatapoint.from_smi(
                s,
                keep_h=False,
                y=np.array([1.0]),
                atom_y=rng.normal(size=(n_atoms, 1)),
                bond_y=rng.normal(size=(n_bonds, 1)),
                lt_mask=np.array([True]),
                gt_mask=np.array([False]),
                atom_lt_mask=np.zeros((n_atoms, 1), dtype=bool),
                atom_gt_mask=np.ones((n_atoms, 1), dtype=bool),
                bond_lt_mask=np.ones((n_bonds, 1), dtype=bool),
                bond_gt_mask=np.zeros((n_bonds, 1), dtype=bool),
            )
        )
    ds = MolAtomBondDataset(dps)
    data = [ds[i] for i in range(len(ds))]
    pad = PadSpec.for_graphs([d.mg for d in data], n_graphs=len(data))
    batch = collate_mol_atom_bond_batch(data, pad)

    mol_lt, atom_lt, bond_lt = batch.lt_masks
    mol_gt, atom_gt, bond_gt = batch.gt_masks
    assert mol_lt.shape == (len(data), 1) and mol_lt[:, 0].all()
    assert not mol_gt.any()
    # atom masks align to node rows: real nodes all-gt, padding all-False
    node_mask = np.asarray(batch.bmg.node_mask)
    assert atom_gt[node_mask].all() and not atom_gt[~node_mask].any()
    assert not atom_lt.any()
    # bond masks follow the dst-sorted edge permutation like bond targets
    edge_mask = np.asarray(batch.bmg.edge_mask)
    assert bond_lt[edge_mask].all() and not bond_lt[~edge_mask].any()
    assert not bond_gt.any()

    # bounded training step runs and decreases loss
    d_h = 32
    model = MolAtomBondMPNN(
        message_passing=MABBondMessagePassing(d_h=d_h),
        agg=MeanAggregation(),
        mol_predictor=RegressionFFN(n_tasks=1, input_dim=d_h, criterion=BoundedMSE()),
        atom_predictor=RegressionFFN(n_tasks=1, input_dim=d_h, criterion=BoundedMSE()),
        bond_predictor=RegressionFFN(n_tasks=1, input_dim=2 * d_h, criterion=BoundedMSE()),
    )

    class L(DataLoader):
        def _make_batch(self, idxs):
            rows = [self.dataset[i] for i in idxs]
            p = PadSpec.for_graphs([r.mg for r in rows], n_graphs=self.batch_size)
            return collate_mol_atom_bond_batch(rows, p)

    loader = L(ds, batch_size=len(ds), shuffle=False, prefetch=0)
    tr = MABTrainer(model, max_epochs=8, seed=0)
    tr.fit(loader)
    assert tr.history[-1]["train_loss"] < tr.history[0]["train_loss"]
