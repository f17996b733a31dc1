"""Overfit integration test — the de-facto correctness bar for the whole
training loop (cf. reference ``tests/integration/test_regression_mol.py:67-89``:
train MSE <= 0.05 after 50 epochs on the 100-molecule lipo set)."""

import csv

import numpy as np
import pytest

from chemprop_tpu.data import (
    DataLoader,
    MoleculeDatapoint,
    MoleculeDataset,
    collate_batch,
)
from chemprop_tpu.models import MPNN
from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, NormAggregation, RegressionFFN
from chemprop_tpu.train import Trainer


@pytest.fixture(scope="module")
def lipo_dataset(data_dir):
    with open(data_dir / "regression" / "mol" / "mol.csv") as f:
        rows = list(csv.reader(f))[1:]
    dps = [MoleculeDatapoint.from_smi(smi, y=np.array([float(y)])) for smi, y in rows]
    return MoleculeDataset(dps)


@pytest.mark.integration
def test_quick_train_smoke(lipo_dataset):
    """One epoch end-to-end: loss is finite, predictions have the right shape."""
    lipo_dataset.reset()
    scaler = lipo_dataset.normalize_targets()
    lipo_dataset.cache = True
    loader = DataLoader(lipo_dataset, batch_size=32, shuffle=True, seed=0)
    model = MPNN(
        message_passing=BondMessagePassing(depth=2, d_h=64),
        agg=MeanAggregation(),
        predictor=RegressionFFN(input_dim=64, hidden_dim=64),
    )
    trainer = Trainer(model, max_epochs=1, seed=0)
    trainer.fit(loader)
    assert np.isfinite(trainer.history[-1]["train_loss"])
    preds = trainer.predict(DataLoader(lipo_dataset, batch_size=32))
    assert preds.shape == (100, 1)
    assert np.isfinite(preds).all()


@pytest.mark.integration
def test_overfit(lipo_dataset):
    """The reference overfit bar: train MSE <= 0.05 on normalized targets."""
    lipo_dataset.reset()
    lipo_dataset.normalize_targets()
    lipo_dataset.cache = True
    # the reference's overfit run is unshuffled (Lightning overfit_batches
    # swaps in a SequentialSampler), so batch compositions are fixed
    loader = DataLoader(lipo_dataset, batch_size=32, shuffle=False)
    model = MPNN(
        message_passing=BondMessagePassing(),
        agg=MeanAggregation(),
        predictor=RegressionFFN(),
        batch_norm=True,  # the reference overfit fixture uses batch norm
    )
    trainer = Trainer(model, max_epochs=50, warmup_epochs=2, seed=12)
    trainer.fit(loader)

    eval_loader = DataLoader(lipo_dataset, batch_size=32)
    # the reference measures with the module left in train mode (batch stats)
    preds = trainer.predict(eval_loader, use_batch_statistics=True)
    mse = float(np.mean((preds[:, 0] - lipo_dataset.Y[:, 0]) ** 2))
    assert mse <= 0.05, f"overfit MSE {mse} > 0.05"
    # and the deployable eval path (running statistics) must be close too
    preds_eval = trainer.predict(eval_loader)
    mse_eval = float(np.mean((preds_eval[:, 0] - lipo_dataset.Y[:, 0]) ** 2))
    assert mse_eval <= 0.10, f"running-stats MSE {mse_eval} > 0.10"
