"""Padded-batching invariants: offsets, reverse edges, masks, bucketing."""

import numpy as np
import pytest

from chemprop_tpu.data import (
    MoleculeDatapoint,
    MoleculeDataset,
    PadSpec,
    collate_batch,
    pad_to_bucket,
)


@pytest.fixture
def batch():
    smis = ["CCO", "c1ccccc1", "CC(=O)O"]
    dps = [MoleculeDatapoint.from_smi(s, y=np.array([float(i)])) for i, s in enumerate(smis)]
    ds = MoleculeDataset(dps)
    return collate_batch([ds[i] for i in range(3)]), ds


def test_shapes_and_masks(batch):
    tb, ds = batch
    bmg = tb.bmg
    n_atoms = sum(d.mol.num_atoms for d in ds.data)
    n_edges = sum(2 * d.mol.num_bonds for d in ds.data)
    assert bmg.node_mask.sum() == n_atoms
    assert bmg.edge_mask.sum() == n_edges
    assert bmg.V.shape[0] % 128 == 0 and bmg.E.shape[0] % 128 == 0
    # padded nodes assigned to the sacrificial graph segment
    assert (np.asarray(bmg.batch)[~np.asarray(bmg.node_mask)] == bmg.n_graphs).all()
    # padding edges point at the padding node
    pad_edges = ~np.asarray(bmg.edge_mask)
    assert (np.asarray(bmg.src)[pad_edges] == bmg.V.shape[0] - 1).all()


def test_rev_edge_involution(batch):
    tb, _ = batch
    bmg = tb.bmg
    rev = np.asarray(bmg.rev)
    # rev is an involution and swaps src/dst on real edges
    np.testing.assert_array_equal(rev[rev], np.arange(len(rev)))
    em = np.asarray(bmg.edge_mask)
    np.testing.assert_array_equal(np.asarray(bmg.src)[rev[em]], np.asarray(bmg.dst)[em])
    np.testing.assert_array_equal(np.asarray(bmg.dst)[rev[em]], np.asarray(bmg.src)[em])


def test_targets_and_weights_padding():
    smis = ["CCO", "CC"]
    dps = [MoleculeDatapoint.from_smi(s, y=np.array([1.0, np.nan])) for s in smis]
    ds = MoleculeDataset(dps)
    tb = collate_batch([ds[0], ds[1]], PadSpec(64, 64, 5))
    assert tb.Y.shape == (5, 2)
    assert np.isnan(tb.Y[2:]).all()  # padded rows fully NaN
    assert np.isnan(tb.Y[0, 1]) and tb.Y[0, 0] == 1.0
    assert (tb.w[:2] == 1).all() and (tb.w[2:] == 0).all()
    assert tb.pad_mask.tolist() == [True, True, False, False, False]


def test_pad_spec_rejects_too_small():
    dps = [MoleculeDatapoint.from_smi("CCCCCCCC", y=np.array([0.0]))]
    ds = MoleculeDataset(dps)
    with pytest.raises(ValueError):
        collate_batch([ds[0]], PadSpec(4, 64, 1))
    with pytest.raises(ValueError):
        collate_batch([ds[0]], PadSpec(64, 2, 1))


def test_bucket_ladder():
    assert pad_to_bucket(1) == 128
    assert pad_to_bucket(128) == 128
    assert pad_to_bucket(129) == 256
    assert pad_to_bucket(513) >= 513
    # ladder is monotone and bounded waste
    prev = 0
    for n in range(1, 5000, 37):
        b = pad_to_bucket(n)
        assert b >= n and b >= prev
        assert b <= max(128, int(n * 1.3) + 128)
        prev = b


def test_zero_bond_molecule():
    dps = [
        MoleculeDatapoint.from_smi("[He]", y=np.array([0.0])),
        MoleculeDatapoint.from_smi("CC", y=np.array([1.0])),
    ]
    ds = MoleculeDataset(dps)
    tb = collate_batch([ds[0], ds[1]])
    assert tb.bmg.node_mask.sum() == 3  # He + 2 C
    assert tb.bmg.edge_mask.sum() == 2


def test_padspec_edges_align_to_512():
    """Edge buckets follow the 128-granular ladder then align up to 512 so
    whole-kernel-step tables need no ragged-tail slice."""
    from chemprop_tpu.data.collate import PadSpec
    from chemprop_tpu.data.molgraph import MolGraph
    import numpy as np

    def mg(n_atoms, n_bonds):
        return MolGraph(
            V=np.zeros((n_atoms, 4), np.float32),
            E=np.zeros((2 * n_bonds, 3), np.float32),
            edge_index=np.zeros((2, 2 * n_bonds), np.int64),
            rev_edge_index=np.arange(2 * n_bonds),
        )

    # small: one 512 bucket
    spec = PadSpec.for_graphs([mg(5, 4)])
    assert spec.n_edges == 512
    # large: ladder value rounded up to a 512-multiple, within +512 of the
    # 128-ladder (tight, not the coarse 512-ladder)
    big = [mg(30, 32)] * 2000  # 128000 directed edges
    spec = PadSpec.for_graphs(big)
    assert spec.n_edges % 512 == 0
    from chemprop_tpu.data.collate import pad_to_bucket
    assert spec.n_edges <= pad_to_bucket(2 * 32 * 2000) + 512


def test_fused_window_stamping_and_fallback_telemetry(caplog):
    """VERDICT r1 item 9: a ~150-bond molecule (300 directed edges) keeps the
    batch on the fused fast path (window widens to kw=3 instead of dropping
    the whole batch to the composed ops); only a >192-bond molecule loses the
    path, and that demotion is logged once."""
    import logging

    from chemprop_tpu.data import collate as collate_mod
    from chemprop_tpu.data.collate import batch_mol_graphs
    from chemprop_tpu.ops.fused_message import SPAN_LIMIT

    dps = [
        MoleculeDatapoint.from_smi("C" * 151, y=np.zeros(1)),  # 150 bonds
        MoleculeDatapoint.from_smi("CCO", y=np.zeros(1)),
    ]
    ds = MoleculeDataset(dps)
    bmg = batch_mol_graphs([ds[i].mg for i in range(2)])
    assert bmg.fused_ok
    assert bmg.fused_window == 3
    # small-molecule batches stay on the cheapest window
    small = batch_mol_graphs([ds[1].mg])
    assert small.fused_ok and small.fused_window == 1

    # a molecule exceeding the widest window demotes the batch, with one
    # warning (not one per batch)
    n_c = SPAN_LIMIT[max(SPAN_LIMIT)] // 2 + 3
    giant = MoleculeDataset([MoleculeDatapoint.from_smi("C" * (n_c + 1), y=np.zeros(1))])
    collate_mod._fused_fallback_warned = False
    with caplog.at_level(logging.WARNING, logger="chemprop_tpu.data.collate"):
        b1 = batch_mol_graphs([giant[0].mg, ds[1].mg])
        b2 = batch_mol_graphs([giant[0].mg])
    assert not b1.fused_ok and not b2.fused_ok
    warnings = [r for r in caplog.records if "fused message kernel" in r.message]
    assert len(warnings) == 1
    collate_mod._fused_fallback_warned = False
