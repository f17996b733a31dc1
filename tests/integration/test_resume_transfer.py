"""Resume + transfer-learning integration tests (the reference cannot resume:
``cli/train.py:187-192`` is a commented-out TODO — we can)."""

import csv

import numpy as np
import pytest

from chemprop_tpu.data import DataLoader, MoleculeDatapoint, MoleculeDataset
from chemprop_tpu.models import MPNN
from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN
from chemprop_tpu.train import Trainer


@pytest.fixture()
def dataset(data_dir):
    rows = list(csv.reader(open(data_dir / "regression" / "mol" / "mol.csv")))[1:33]
    dps = [MoleculeDatapoint.from_smi(s, y=np.array([float(y)])) for s, y in rows]
    ds = MoleculeDataset(dps)
    ds.normalize_targets()
    ds.cache = True
    return ds


def _model(d_h=32):
    return MPNN(
        message_passing=BondMessagePassing(d_h=d_h, depth=2),
        agg=MeanAggregation(),
        predictor=RegressionFFN(input_dim=d_h, hidden_dim=d_h),
    )


@pytest.mark.integration
def test_resume_matches_uninterrupted(dataset, tmp_path):
    loader = DataLoader(dataset, batch_size=16, shuffle=False, prefetch=0)

    # uninterrupted 6 epochs
    t_full = Trainer(_model(), max_epochs=6, seed=7)
    t_full.fit(loader)
    p_full = t_full.predict(DataLoader(dataset, batch_size=16))

    # 3 epochs -> checkpoint -> resume for 3 more
    t_a = Trainer(_model(), max_epochs=6, seed=7, checkpoint_dir=tmp_path)
    first = next(iter(loader))
    t_a.state = t_a.init_state(first, len(loader))
    step = t_a._make_train_step()
    import jax

    for _ in range(3):
        for batch in loader:
            t_a.state, _ = step(t_a.state, jax.device_put(batch))
    t_a.history = [{"epoch": i} for i in range(3)]
    t_a._save_checkpoint("last")

    t_b = Trainer(_model(), max_epochs=6, seed=7)
    t_b.start_epoch = t_b.resume_from(tmp_path / "last.ckpt", first, len(loader))
    assert t_b.start_epoch == 3
    assert int(t_b.state.step) == 3 * len(loader)
    t_b.fit(loader)
    p_resumed = t_b.predict(DataLoader(dataset, batch_size=16))

    # Adam moments + step + rng restored => same trajectory as uninterrupted
    np.testing.assert_allclose(p_resumed, p_full, atol=1e-4)


@pytest.mark.integration
def test_freeze_encoder(dataset):
    import jax

    loader = DataLoader(dataset, batch_size=16, shuffle=False, prefetch=0)
    trainer = Trainer(
        _model(),
        max_epochs=3,
        seed=0,
        freeze=lambda path: path.startswith("message_passing"),
    )
    first = next(iter(loader))
    trainer.state = trainer.init_state(first, len(loader))
    before = jax.device_get(trainer.state.params)
    trainer.fit(loader)
    after = jax.device_get(trainer.state.params)

    # frozen encoder params identical; predictor params moved
    for k, v in before["message_passing"].items():
        for name, arr in v.items():
            np.testing.assert_array_equal(arr, after["message_passing"][k][name])
    moved = np.abs(
        before["predictor"]["ffn"]["block0"]["kernel"]
        - after["predictor"]["ffn"]["block0"]["kernel"]
    ).max()
    assert moved > 0
