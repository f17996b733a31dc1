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
