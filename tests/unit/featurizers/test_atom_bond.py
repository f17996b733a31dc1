"""Featurizer golden tests: bit layout matches the reference scheme
(``chemprop/featurizers/atom.py`` / ``bond.py``) over this framework's own
perception substrate."""

import numpy as np
import pytest

from chemprop_tpu.chem import make_mol
from chemprop_tpu.featurizers import (
    MultiHotAtomFeaturizer,
    MultiHotBondFeaturizer,
    RIGRAtomFeaturizer,
    RIGRBondFeaturizer,
    get_multi_hot_atom_featurizer,
)


def test_preset_sizes():
    assert len(MultiHotAtomFeaturizer.v2()) == 72
    assert len(MultiHotAtomFeaturizer.v1()) == 133
    assert len(MultiHotAtomFeaturizer.organic()) == 44
    assert len(RIGRAtomFeaturizer()) == 52
    assert len(MultiHotBondFeaturizer()) == 14
    assert len(RIGRBondFeaturizer()) == 2


def test_mode_lookup():
    for mode, size in [("v1", 133), ("V2", 72), ("organic", 44), ("RIGR", 52)]:
        assert len(get_multi_hot_atom_featurizer(mode)) == size


def test_carbon_v2_bits():
    f = MultiHotAtomFeaturizer.v2()
    mol = make_mol("C")
    x = f.featurize(mol, mol.atoms[0])
    # atomic num 6 -> one-hot index 5 in block at offset 0
    assert x[5] == 1 and x.sum() == pytest.approx(6 + 0.01 * 12.011)  # 6 one-hot blocks + mass
    # degree block offset 38: total degree 4 (CH4) -> index 4
    assert x[38 + 4] == 1
    # formal charge block offset 45: charge 0 -> index 4 of [-1,-2,1,2,0]
    assert x[45 + 4] == 1
    # chiral tag block offset 51: tag 0 -> index 0
    assert x[51 + 0] == 1
    # num H block offset 56: 4 Hs -> index 4
    assert x[56 + 4] == 1
    # hybridization block offset 62: SP3 -> index 4 of [S,SP,SP2,SP2D,SP3,...]
    assert x[62 + 4] == 1
    # aromatic flag and mass
    assert x[70] == 0
    assert x[71] == pytest.approx(0.01 * 12.011)


def test_unknown_pads():
    f = MultiHotAtomFeaturizer.v2()
    mol = make_mol("[U]")  # Z=92 not in v2 vocabulary
    x = f.featurize(mol, mol.atoms[0])
    assert x[37] == 1  # unknown slot of atomic-num block


def test_aromatic_atom():
    f = MultiHotAtomFeaturizer.v2()
    mol = make_mol("c1ccccc1")
    x = f.featurize(mol, mol.atoms[0])
    assert x[70] == 1  # aromatic flag
    assert x[62 + 2] == 1  # SP2


def test_featurize_mol_matches_per_atom(smis):
    f = MultiHotAtomFeaturizer.v2()
    for smi in smis[:20]:
        mol = make_mol(smi)
        X = f.featurize_mol(mol)
        rows = np.stack([f.featurize(mol, a) for a in mol.atoms])
        np.testing.assert_array_equal(X, rows)


def test_bond_features():
    f = MultiHotBondFeaturizer()
    mol = make_mol("C=CC")
    db = mol.bonds[0]  # double bond
    x = f.featurize(mol, db)
    assert x[0] == 0  # not null
    assert x[2] == 1  # DOUBLE at index 1 of bond type block starting at 1
    assert x[5] == 0  # propene's C=C is not conjugated
    assert x[6] == 0  # not in ring
    assert x[7] == 1  # stereo NONE -> index 0 of stereo block at offset 7
    # null bond
    xn = f.featurize(mol, None)
    assert xn[0] == 1 and xn.sum() == 1


def test_aromatic_ring_bond():
    f = MultiHotBondFeaturizer()
    mol = make_mol("c1ccccc1")
    x = f.featurize(mol, mol.bonds[0])
    assert x[4] == 1  # AROMATIC at index 3
    assert x[5] == 1  # conjugated
    assert x[6] == 1  # in ring
