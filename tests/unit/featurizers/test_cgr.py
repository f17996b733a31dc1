"""CGR featurizer mode matrix — the atom-map correspondence and
imbalanced-vs-balanced bond expectations replicated from the reference test
matrix (``/root/reference/tests/unit/featurizers/test_cgr.py``), run against
the in-repo chemistry substrate."""

from typing import NamedTuple

import numpy as np
import pytest

from chemprop_tpu.chem import make_mol
from chemprop_tpu.featurizers.molgraph.reaction import CGRFeaturizer, RxnMode

MODE_NAMES = [
    "REAC_PROD",
    "REAC_PROD_BALANCE",
    "REAC_DIFF",
    "REAC_DIFF_BALANCE",
    "PROD_DIFF",
    "PROD_DIFF_BALANCE",
]

RXN_SMIS = [
    "[CH3:1][H:2]>>[CH3:1].[H:2]",
    "[CH3:2][H:1]>>[H:1].[CH3:2]",
    "[CH3:1][H]>>[CH3:1].[H:2]",
    "[CH3:1][H:2]>>[H].[CH3:1]",
    "[CH4:1]>>[CH2:1].[H:2][H:3]",
    "[H:1].[CH2:2][H:3]>>[CH3:2][H:3]",
    "[CH4:1]>>[CH3:1].[H:2]",
]

# (reactant->product map, product-only idxs, reactant-only idxs)
REAC_PROD_MAPS = {
    "[CH3:1][H:2]>>[CH3:1].[H:2]": ({0: 0, 1: 1}, [], []),
    "[CH3:2][H:1]>>[H:1].[CH3:2]": ({0: 1, 1: 0}, [], []),
    "[CH3:1][H]>>[CH3:1].[H:2]": ({0: 0}, [1], [1]),
    "[CH3:1][H:2]>>[H].[CH3:1]": ({0: 1}, [0], [1]),
    "[CH4:1]>>[CH2:1].[H:2][H:3]": ({0: 0}, [1, 2], []),
    "[H:1].[CH2:2][H:3]>>[CH3:2][H:3]": ({1: 0, 2: 1}, [], [0]),
    "[CH4:1]>>[CH3:1].[H:2]": ({0: 0}, [1], []),
}


class BondExpectation(NamedTuple):
    bond: tuple
    bond_reac_none: bool
    bond_prod_none: bool


BOND_EXPECT_IMBALANCED = {
    "[CH3:1][H:2]>>[CH3:1].[H:2]": [BondExpectation((0, 1), False, True)],
    "[CH3:2][H:1]>>[H:1].[CH3:2]": [BondExpectation((0, 1), False, True)],
    "[CH3:1][H]>>[CH3:1].[H:2]": [
        BondExpectation((0, 1), False, True),
        BondExpectation((0, 2), True, True),
        BondExpectation((1, 2), True, True),
    ],
    "[CH3:1][H:2]>>[H].[CH3:1]": [
        BondExpectation((0, 1), False, True),
        BondExpectation((0, 2), True, True),
        BondExpectation((1, 2), True, True),
    ],
    "[CH4:1]>>[CH2:1].[H:2][H:3]": [
        BondExpectation((0, 1), True, True),
        BondExpectation((0, 2), True, True),
        BondExpectation((1, 2), True, False),
    ],
    "[H:1].[CH2:2][H:3]>>[CH3:2][H:3]": [
        BondExpectation((0, 1), True, True),
        BondExpectation((0, 2), True, True),
        BondExpectation((1, 2), False, False),
    ],
    "[CH4:1]>>[CH3:1].[H:2]": [BondExpectation((0, 0), True, True)],
}
BOND_EXPECT_BALANCED = dict(
    BOND_EXPECT_IMBALANCED,
    **{
        "[CH4:1]>>[CH2:1].[H:2][H:3]": [
            BondExpectation((0, 1), True, True),
            BondExpectation((0, 2), True, True),
            BondExpectation((1, 2), False, False),
        ]
    },
)


def get_reac_prod(rxn_smi):
    return [make_mol(smi, keep_h=True) for smi in rxn_smi.split(">>")]


class TestRxnMode:
    def test_len_and_names(self):
        assert len(RxnMode) == 6
        assert {m.name for m in RxnMode} == set(MODE_NAMES)

    @pytest.mark.parametrize("name", MODE_NAMES)
    def test_get_case_insensitive(self, name):
        assert RxnMode.get(name.lower()) == RxnMode[name]
        assert RxnMode.get(name.upper()) == RxnMode[name]

    def test_get_invalid(self):
        with pytest.raises(KeyError):
            RxnMode.get("not-a-mode")


@pytest.mark.parametrize("rxn_smi", RXN_SMIS)
def test_map_reac_to_prod(rxn_smi):
    rct, pdt = get_reac_prod(rxn_smi)
    r2p, pdt_only, rct_only = CGRFeaturizer.map_reac_to_prod(rct, pdt)
    exp_map, exp_pdt_only, exp_rct_only = REAC_PROD_MAPS[rxn_smi]
    assert r2p == exp_map
    assert list(pdt_only) == exp_pdt_only
    assert list(rct_only) == exp_rct_only


@pytest.mark.parametrize("rxn_smi", RXN_SMIS)
@pytest.mark.parametrize("mode", MODE_NAMES)
def test_get_bonds_matrix(rxn_smi, mode):
    rct, pdt = get_reac_prod(rxn_smi)
    feat = CGRFeaturizer(mode_=mode)
    r2p, pdt_only, rct_only = feat.map_reac_to_prod(rct, pdt)
    expect = (BOND_EXPECT_BALANCED if feat.mode.balanced else BOND_EXPECT_IMBALANCED)[rxn_smi]
    for exp in expect:
        u, v = exp.bond
        if u == v:
            continue  # placeholder row for the zero-edge reaction
        b_r, b_p = feat._get_bonds(rct, pdt, r2p, pdt_only, rct.num_atoms, u, v)
        assert (b_r is None) == exp.bond_reac_none, (rxn_smi, mode, exp.bond, "reac")
        assert (b_p is None) == exp.bond_prod_none, (rxn_smi, mode, exp.bond, "prod")


@pytest.mark.parametrize("rxn_smi", RXN_SMIS)
@pytest.mark.parametrize("mode", MODE_NAMES)
def test_featurize_shapes_and_invariants(rxn_smi, mode):
    rct, pdt = get_reac_prod(rxn_smi)
    feat = CGRFeaturizer(mode_=mode)
    mg = feat((rct, pdt))
    d_v, d_e = feat.shape
    n_union = max(
        rct.num_atoms, rct.num_atoms + len(CGRFeaturizer.map_reac_to_prod(rct, pdt)[1])
    )
    assert mg.V.shape == (n_union, d_v)
    assert mg.E.shape[1] == d_e
    assert mg.E.shape[0] % 2 == 0  # directed pairs
    assert mg.edge_index.shape == (2, mg.E.shape[0])
    # rev is a pair-swap involution
    rev = mg.rev_edge_index
    assert (rev[rev] == np.arange(len(rev))).all()
    # both directions of an edge carry identical features
    if len(rev):
        np.testing.assert_array_equal(mg.E, mg.E[rev])


def test_reac_prod_vs_diff_feature_relation():
    """REAC_DIFF node features = reactant block + (product - reactant) tail,
    consistent with REAC_PROD's blocks."""
    rxn = get_reac_prod(RXN_SMIS[0])
    f_rp = CGRFeaturizer(mode_="REAC_PROD")
    f_rd = CGRFeaturizer(mode_="REAC_DIFF")
    V_rp = f_rp(tuple(rxn)).V
    V_rd = f_rd(tuple(rxn)).V
    d = len(f_rp.atom_featurizer)
    k = f_rp._n_atomic_block
    # first block identical (reactant side)
    np.testing.assert_array_equal(V_rp[:, :d], V_rd[:, :d])
    # diff tail = prod tail - reac tail
    np.testing.assert_allclose(V_rd[:, d:], V_rp[:, d:] - V_rp[:, k:d])
