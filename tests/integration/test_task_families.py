"""Integration tests across task families: reactions (CGR), multicomponent,
classification, multiclass, and uncertainty heads (cf. reference
``tests/integration/``)."""

import csv

import numpy as np
import pytest

from chemprop_tpu.data import (
    DataLoader,
    MoleculeDatapoint,
    MoleculeDataset,
    MulticomponentDataset,
    ReactionDatapoint,
    ReactionDataset,
)
from chemprop_tpu.featurizers import CondensedGraphOfReactionFeaturizer, RxnMode
from chemprop_tpu.models import MPNN, MulticomponentMPNN
from chemprop_tpu.nn import (
    BinaryClassificationFFN,
    BondMessagePassing,
    EvidentialFFN,
    MeanAggregation,
    MulticlassClassificationFFN,
    MulticomponentMessagePassing,
    MveFFN,
    RegressionFFN,
    SumAggregation,
)
from chemprop_tpu.train import Trainer


def _read_csv(path, n=None):
    with open(path) as f:
        rows = list(csv.reader(f))
    return rows[1 : None if n is None else n + 1]


@pytest.mark.integration
def test_reaction_regression(data_dir):
    rows = _read_csv(data_dir / "regression" / "rxn" / "rxn.csv", 40)
    dps = [
        ReactionDatapoint.from_smi(smi, y=np.array([float(y)]), keep_h=True)
        for smi, y in rows
    ]
    feat = CondensedGraphOfReactionFeaturizer()
    ds = ReactionDataset(dps, feat)
    ds.normalize_targets()
    ds.cache = True
    loader = DataLoader(ds, batch_size=16, shuffle=False)
    model = MPNN(
        message_passing=BondMessagePassing(d_h=128),
        agg=MeanAggregation(),
        predictor=RegressionFFN(input_dim=128, hidden_dim=128),
    )
    tr = Trainer(model, max_epochs=8, seed=0)
    tr.fit(loader)
    assert tr.history[-1]["train_loss"] < tr.history[0]["train_loss"]
    preds = tr.predict(DataLoader(ds, batch_size=16))
    assert preds.shape == (40, 1) and np.isfinite(preds).all()


@pytest.mark.parametrize("mode", ["reac_prod", "reac_diff", "prod_diff", "reac_diff_balance"])
def test_cgr_modes_shapes(data_dir, mode):
    rows = _read_csv(data_dir / "regression" / "rxn" / "rxn.csv", 5)
    feat = CondensedGraphOfReactionFeaturizer(mode_=mode)
    for smi, _ in rows:
        dp = ReactionDatapoint.from_smi(smi, y=np.array([0.0]), keep_h=True)
        mg = feat((dp.rct, dp.pdt))
        assert mg.V.shape[1] == feat.atom_fdim
        assert mg.E.shape[1] == feat.bond_fdim == 28
        assert mg.V.shape[0] >= dp.rct.num_atoms
        # two directed edges per undirected pair
        assert mg.E.shape[0] % 2 == 0


@pytest.mark.integration
def test_multicomponent_regression(data_dir):
    rows = _read_csv(data_dir / "regression" / "mol+mol" / "mol+mol.csv", 32)
    dps0, dps1 = [], []
    for smi0, smi1, y in rows:
        y = np.array([float(y)])
        dps0.append(MoleculeDatapoint.from_smi(smi0, y=y))
        dps1.append(MoleculeDatapoint.from_smi(smi1, y=y))
    ds = MulticomponentDataset([MoleculeDataset(dps0), MoleculeDataset(dps1)])
    ds.normalize_targets()
    ds.cache = True
    loader = DataLoader(ds, batch_size=16, shuffle=False)
    mcmp = MulticomponentMessagePassing(
        blocks=[BondMessagePassing(d_h=64), BondMessagePassing(d_h=64)], n_components=2
    )
    model = MulticomponentMPNN(
        message_passing=mcmp,
        agg=SumAggregation(),
        predictor=RegressionFFN(input_dim=128, hidden_dim=64),
    )
    tr = Trainer(model, max_epochs=8, seed=0)
    tr.fit(loader)
    assert tr.history[-1]["train_loss"] < tr.history[0]["train_loss"]
    preds = tr.predict(DataLoader(ds, batch_size=16))
    assert preds.shape == (32, 1) and np.isfinite(preds).all()


@pytest.mark.integration
def test_multitask_classification_with_missing_targets(data_dir):
    rows = _read_csv(data_dir / "classification" / "mol.csv", 64)
    dps = [
        MoleculeDatapoint.from_smi(
            r[0], y=np.array([float(v) if v != "" else np.nan for v in r[1:]])
        )
        for r in rows
    ]
    ds = MoleculeDataset(dps)
    ds.cache = True
    loader = DataLoader(ds, batch_size=32, shuffle=False)
    model = MPNN(
        message_passing=BondMessagePassing(d_h=64),
        agg=MeanAggregation(),
        predictor=BinaryClassificationFFN(n_tasks=4, input_dim=64, hidden_dim=64),
    )
    tr = Trainer(model, max_epochs=6, seed=0)
    tr.fit(loader)
    assert np.isfinite(tr.history[-1]["train_loss"])
    probs = tr.predict(DataLoader(ds, batch_size=32))
    assert probs.shape == (64, 4)
    assert (probs >= 0).all() and (probs <= 1).all()


@pytest.mark.integration
def test_multiclass(data_dir):
    rows = _read_csv(data_dir / "classification" / "mol_multiclass.csv", 48)
    dps = [MoleculeDatapoint.from_smi(smi, y=np.array([float(y)])) for smi, y in rows]
    ds = MoleculeDataset(dps)
    ds.cache = True
    loader = DataLoader(ds, batch_size=16, shuffle=False)
    model = MPNN(
        message_passing=BondMessagePassing(d_h=64),
        agg=MeanAggregation(),
        predictor=MulticlassClassificationFFN(n_classes=3, input_dim=64, hidden_dim=64),
    )
    tr = Trainer(model, max_epochs=6, seed=0)
    tr.fit(loader)
    probs = tr.predict(DataLoader(ds, batch_size=16))
    assert probs.shape == (48, 1, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


@pytest.mark.integration
@pytest.mark.parametrize("head", ["mve", "evidential"])
def test_uncertainty_heads(data_dir, head):
    rows = _read_csv(data_dir / "regression" / "mol" / "mol.csv", 32)
    dps = [MoleculeDatapoint.from_smi(smi, y=np.array([float(y)])) for smi, y in rows]
    ds = MoleculeDataset(dps)
    ds.normalize_targets()
    ds.cache = True
    loader = DataLoader(ds, batch_size=16, shuffle=False)
    predictor = (
        MveFFN(input_dim=64, hidden_dim=64)
        if head == "mve"
        else EvidentialFFN(input_dim=64, hidden_dim=64)
    )
    model = MPNN(
        message_passing=BondMessagePassing(d_h=64),
        agg=SumAggregation(),
        predictor=predictor,
    )
    tr = Trainer(model, max_epochs=6, seed=0)
    tr.fit(loader)
    assert np.isfinite(tr.history[-1]["train_loss"])
    preds = tr.predict(DataLoader(ds, batch_size=16))
    n_targets = 2 if head == "mve" else 4
    assert preds.shape == (32, 1, n_targets)
    assert (preds[..., 1] >= 0).all()  # var / v nonnegative


@pytest.mark.integration
def test_classification_auc_overfit_bar(data_dir):
    """Accuracy bar for the classification loop (analog of the reference's
    regression overfit MSE bar): train AUROC >= 0.95 after overfitting the
    single-task NR-AhR subset."""
    from sklearn.metrics import roc_auc_score

    rows = _read_csv(data_dir / "classification" / "mol.csv", 100)
    dps = [
        MoleculeDatapoint.from_smi(r[0], y=np.array([float(r[1])]))
        for r in rows
        if r[1] != ""
    ]
    ds = MoleculeDataset(dps)
    ds.cache = True
    loader = DataLoader(ds, batch_size=32, shuffle=False)
    model = MPNN(
        message_passing=BondMessagePassing(),
        agg=MeanAggregation(),
        predictor=BinaryClassificationFFN(input_dim=300, hidden_dim=300),
    )
    tr = Trainer(model, max_epochs=40, warmup_epochs=2, seed=0)
    tr.fit(loader)
    probs = tr.predict(DataLoader(ds, batch_size=32))
    auc = roc_auc_score(ds.Y[:, 0], probs[:, 0])
    assert auc >= 0.95, f"train AUROC {auc} < 0.95"
