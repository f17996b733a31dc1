"""Message-passing invariants (cf. reference
``tests/unit/nn/test_message_passing.py``): edge-order invariance (the
sorted-edge fast path must equal the unsorted path), zero-edge molecules,
undirected averaging, and the gather identities the fast path relies on."""

import numpy as np
import pytest

import jax

from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset
from chemprop_tpu.data.collate import PadSpec, batch_mol_graphs
from chemprop_tpu.nn import AtomMessagePassing, BondMessagePassing

SMIS = ["CCO", "c1ccccc1", "CC(=O)Nc1ccc(O)cc1", "C"]


def _mgs():
    dps = [MoleculeDatapoint.from_smi(s, y=np.zeros(1)) for s in SMIS]
    ds = MoleculeDataset(dps)
    return [ds[i].mg for i in range(len(ds))]


@pytest.mark.parametrize("mp_cls", [BondMessagePassing, AtomMessagePassing])
@pytest.mark.parametrize("undirected", [False, True])
def test_sorted_equals_unsorted(mp_cls, undirected):
    """Sorting edges by destination at collate is a pure layout change."""
    mgs = _mgs()
    pad = PadSpec(128, 128, 4)
    bmg_sorted = batch_mol_graphs(mgs, pad, sort_edges=True)
    bmg_unsorted = batch_mol_graphs(mgs, pad, sort_edges=False)

    model = mp_cls(d_h=32, undirected=undirected)
    variables = model.init(jax.random.PRNGKey(0), bmg_sorted, None, False)
    out_sorted = np.asarray(model.apply(variables, bmg_sorted, None, False))
    out_unsorted = np.asarray(model.apply(variables, bmg_unsorted, None, False))
    np.testing.assert_allclose(out_sorted, out_unsorted, rtol=1e-5, atol=1e-5)


def test_gather_identities():
    """src[e] == dst[rev[e]] and rev is an involution — the identities the
    scatter-free backward and the streamed src-gather depend on."""
    mgs = _mgs()
    bmg = batch_mol_graphs(mgs, PadSpec(128, 128, 4))
    src, dst, rev = np.asarray(bmg.src), np.asarray(bmg.dst), np.asarray(bmg.rev)
    np.testing.assert_array_equal(rev[rev], np.arange(len(rev)))
    np.testing.assert_array_equal(src, dst[rev])
    # sorted layout: dst ascending
    assert (np.diff(dst) >= 0).all()


def test_zero_edge_molecule():
    """A single-atom molecule (no bonds) must produce a finite embedding
    (cf. reference ``tests/integration/test_export.py:19`` zero-edge case)."""
    dps = [MoleculeDatapoint.from_smi("C", y=np.zeros(1))]
    ds = MoleculeDataset(dps)
    bmg = batch_mol_graphs([ds[0].mg], PadSpec(16, 16, 1))
    model = BondMessagePassing(d_h=16)
    variables = model.init(jax.random.PRNGKey(0), bmg, None, False)
    out = np.asarray(model.apply(variables, bmg, None, False))
    assert np.isfinite(out).all()


def test_undirected_symmetrizes_hidden_states():
    """With undirected=True both directions of an edge carry equal hidden
    state going into the message op (reference base.py:201-206)."""
    mgs = _mgs()
    bmg = batch_mol_graphs(mgs, PadSpec(128, 128, 4))
    model = BondMessagePassing(d_h=16, undirected=True, depth=2)
    variables = model.init(jax.random.PRNGKey(0), bmg, None, False)
    out_u = np.asarray(model.apply(variables, bmg, None, False))
    assert np.isfinite(out_u).all()
    # and it differs from the directed variant with identical weights
    model_d = BondMessagePassing(d_h=16, undirected=False, depth=2)
    out_d = np.asarray(model_d.apply(variables, bmg, None, False))
    assert not np.allclose(out_u, out_d)


def test_depth_one_skips_message_loop():
    mgs = _mgs()
    bmg = batch_mol_graphs(mgs, PadSpec(128, 128, 4))
    model = BondMessagePassing(d_h=16, depth=1)
    variables = model.init(jax.random.PRNGKey(0), bmg, None, False)
    out = np.asarray(model.apply(variables, bmg, None, False))
    assert np.isfinite(out).all()


def test_padded_dense_weights_only_and_overrides():
    """PaddedDense: weights_only returns the zero-padded (kernel, bias) pair
    with unchanged param shapes; d_in/out_width overrides widen the apply
    without touching the params."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from chemprop_tpu.nn.message_passing.base import PaddedDense

    layer = PaddedDense(10, pad_to=16, use_bias=True, in_features=6)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["kernel"].shape == (6, 10)
    assert variables["params"]["bias"].shape == (10,)

    y = layer.apply(variables, x)
    assert y.shape == (4, 16)
    np.testing.assert_array_equal(np.asarray(y[:, 10:]), 0)
    # the padded input columns (6:8) must not affect the real block
    y2 = layer.apply(variables, x.at[:, 6:].set(123.0))
    np.testing.assert_allclose(np.asarray(y2[:, :10]), np.asarray(y[:, :10]))

    k, b = layer.apply(variables, weights_only=True, in_width=8)
    assert k.shape == (8, 16) and b.shape == (16,)
    np.testing.assert_array_equal(np.asarray(k[6:, :]), 0)
    np.testing.assert_array_equal(np.asarray(k[:, 10:]), 0)
    np.testing.assert_allclose(np.asarray(x @ k + b), np.asarray(y), rtol=1e-6)

    # per-call d_in/out_width: zero tail block covered by zero kernel rows
    wide = PaddedDense(10, use_bias=True)
    xw = jnp.concatenate([x[:, :6], jnp.zeros((4, 4))], axis=1)
    vw = wide.init(jax.random.PRNGKey(1), xw, d_in=6, out_width=16)
    assert vw["params"]["kernel"].shape == (6, 10)
    yw = wide.apply(vw, xw, d_in=6, out_width=16)
    assert yw.shape == (4, 16)
    np.testing.assert_array_equal(np.asarray(yw[:, 10:]), 0)


def test_wide_readout_matches_classic(lipo_bmg=None):
    """MPNN forward is identical whether the MP block keeps the lane-aligned
    width through a columnwise readout or slices at node level."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset, PadSpec, collate_batch
    from chemprop_tpu.models import MPNN
    from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, AttentiveAggregation, RegressionFFN

    dps = [MoleculeDatapoint.from_smi(s, y=np.zeros(1)) for s in ["CCO", "c1ccccc1", "CC(=O)O"]]
    ds = MoleculeDataset(dps)
    batch = collate_batch([ds[i] for i in range(3)], PadSpec(128, 512, 3))

    mp = BondMessagePassing(d_h=192, depth=3)
    outs = {}
    for agg in [MeanAggregation(), AttentiveAggregation(output_size=192)]:
        model = MPNN(message_passing=mp, agg=agg, predictor=RegressionFFN(input_dim=192))
        variables = model.init(jax.random.PRNGKey(0), batch.bmg, None, None)
        Z = model.apply(variables, batch.bmg, None, None, method="fingerprint")
        assert Z.shape == (3, 192)
        outs[type(agg).__name__] = np.asarray(Z)
    # the columnwise (wide) mean path must agree with a forced-classic pass
    model = MPNN(message_passing=mp, agg=MeanAggregation(), predictor=RegressionFFN(input_dim=192))
    variables = model.init(jax.random.PRNGKey(0), batch.bmg, None, None)
    Z_wide = model.apply(variables, batch.bmg, None, None, method="fingerprint")
    H_cls = mp.apply({"params": variables["params"]["message_passing"]}, batch.bmg, None, False)
    nm = np.asarray(batch.bmg.node_mask)
    bat = np.asarray(batch.bmg.batch)
    want = np.stack([np.asarray(H_cls)[nm & (bat == g)].mean(0) for g in range(3)])
    np.testing.assert_allclose(np.asarray(Z_wide), want, atol=1e-4)
