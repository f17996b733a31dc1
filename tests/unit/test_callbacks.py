"""``chemprop_tpu.callbacks`` (cf. reference ``chemprop/callbacks``)."""

import numpy as np

from chemprop_tpu.callbacks import CallbackRegistry, MyersonExplainerCallback


def test_registry_has_myerson():
    assert "myerson" in CallbackRegistry
    assert CallbackRegistry["myerson"] is MyersonExplainerCallback


def test_myerson_callback_explains(monkeypatch):
    import jax

    from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset
    from chemprop_tpu.models import MPNN
    from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN

    model = MPNN(
        message_passing=BondMessagePassing(depth=2, d_h=16),
        agg=MeanAggregation(),
        predictor=RegressionFFN(input_dim=16, hidden_dim=16),
    )
    ds = MoleculeDataset([MoleculeDatapoint.from_smi(s, y=np.zeros(1)) for s in ["CCO", "CC"]])
    datum = ds[0]
    variables = model.init(jax.random.PRNGKey(0), _tiny_batch(datum), is_training=False)

    cb = MyersonExplainerCallback(sampling_threshold=20, n_samples=4)
    out = cb.explain(model, variables, ds)
    assert len(out) == 2
    assert out[0].shape[0] == 3  # CCO heavy atoms
    assert out[1].shape[0] == 2


def test_mcts_callback_extracts_rationales():
    import jax

    from chemprop_tpu.callbacks import MCTSRationaleCallback
    from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset
    from chemprop_tpu.models import MPNN
    from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN

    assert "mcts" in CallbackRegistry
    model = MPNN(
        message_passing=BondMessagePassing(depth=2, d_h=16),
        agg=MeanAggregation(),
        predictor=RegressionFFN(input_dim=16, hidden_dim=16),
    )
    ds = MoleculeDataset(
        [MoleculeDatapoint.from_smi("CCc1ccccc1O", y=np.zeros(1))]
    )
    variables = model.init(jax.random.PRNGKey(0), _tiny_batch(ds[0]), is_training=False)
    cb = MCTSRationaleCallback(n_rollout=3, max_atoms=6, min_atoms=2, prop_delta=-1e9)
    out = cb.explain(model, variables, ds)
    assert len(out) == 1 and out[0]
    assert all(r["n_atoms"] <= 6 and np.isfinite(r["score"]) for r in out[0])


def _tiny_batch(datum):
    from chemprop_tpu.data import PadSpec, collate_batch

    return collate_batch([datum], PadSpec(16, 32, 1)).bmg
