"""Morgan ``include_chirality`` (reference default: ``GetMorganGenerator(
includeChirality=True)``, ``chemprop/featurizers/molecule.py:19-27``).

No RDKit and no chiral RDKit Morgan golden exist in this environment (the
reference's pinned fixture molecule is achiral), so these tests pin
PROPERTIES guaranteed by RDKit's algorithm plus self-generated fixtures for
stability:

* achiral molecules are bit-identical with the flag on or off;
* enantiomers (R vs S) and double-bond stereoisomers (Z vs E) produce
  different fingerprints with the flag on, identical with it off;
* CIP codes match hand-derived assignments for textbook stereocenters;
* exact bit positions are pinned (self-fixtures) so the implementation
  cannot drift silently.
"""

from __future__ import annotations

import numpy as np
import pytest

from chemprop_tpu.chem import make_mol
from chemprop_tpu.chem.morgan_rdkit import rdkit_morgan_binary, rdkit_morgan_count
from chemprop_tpu.chem.perception import atom_cip_code


@pytest.mark.parametrize(
    "smi, idx, code",
    [
        ("N[C@@H](C)C(=O)O", 1, "S"),  # L-alanine
        ("N[C@H](C)C(=O)O", 1, "R"),  # D-alanine
        ("OC[C@@H](O)C=O", 2, "R"),  # (R)-glyceraldehyde
        ("OC[C@H](O)C=O", 2, "S"),
        ("F[C@@H](Cl)Br", 1, "S"),
        ("F[C@H](Cl)Br", 1, "R"),
        # stereocenter first in the SMILES: implicit H takes position 0
        ("[C@H](N)(C)C(=O)O", 0, "S"),
        # tagged but NOT a CIP stereocenter (two identical ring branches)
        ("C[C@H]1CCCCC1", 1, None),
        # no tag at all
        ("CC(C)C", 1, None),
    ],
)
def test_atom_cip_code(smi, idx, code):
    mol = make_mol(smi, keep_h=False, add_h=False)
    assert atom_cip_code(mol, idx) == code


def test_achiral_invariant_under_flag():
    for smi in ["NC(C)C(=O)O", "c1ccccc1O", "CC(=O)OC1=CC=CC=C1C(=O)O"]:
        mol = make_mol(smi, keep_h=False, add_h=False)
        on = rdkit_morgan_binary(mol, 2, 2048, include_chirality=True)
        off = rdkit_morgan_binary(mol, 2, 2048, include_chirality=False)
        assert (on == off).all()
        on_c = rdkit_morgan_count(mol, 2, 2048, include_chirality=True)
        off_c = rdkit_morgan_count(mol, 2, 2048, include_chirality=False)
        assert (on_c == off_c).all()


def test_enantiomers_differ_only_with_flag():
    mR = make_mol("N[C@H](C)C(=O)O", False, False)
    mS = make_mol("N[C@@H](C)C(=O)O", False, False)
    assert (
        rdkit_morgan_binary(mR, 2, 2048, True) != rdkit_morgan_binary(mS, 2, 2048, True)
    ).any()
    assert (
        rdkit_morgan_binary(mR, 2, 2048, False)
        == rdkit_morgan_binary(mS, 2, 2048, False)
    ).all()


def test_bond_stereo_differs_only_with_flag():
    mZ = make_mol("F/C=C\\F", False, False)
    mE = make_mol("F/C=C/F", False, False)
    assert (
        rdkit_morgan_binary(mZ, 2, 2048, True) != rdkit_morgan_binary(mE, 2, 2048, True)
    ).any()
    assert (
        rdkit_morgan_binary(mZ, 2, 2048, False)
        == rdkit_morgan_binary(mE, 2, 2048, False)
    ).all()


# self-pinned bit positions (radius 2, 2048 bits, include_chirality=True):
# stability fixtures — regenerate ONLY for a deliberate algorithm change
_PINNED = [
    ("N[C@@H](C)C(=O)O",
     [1, 134, 283, 389, 650, 786, 807, 1057, 1105, 1171, 1844, 1917]),
    ("N[C@H](C)C(=O)O",
     [1, 133, 283, 389, 650, 786, 807, 1040, 1057, 1171, 1844, 1917]),
    ("OC[C@@H](O)C=O",
     [1, 80, 222, 227, 482, 508, 650, 694, 807, 931, 1004, 1297, 1488, 1565]),
    ("C[C@H](N)C(=O)N[C@@H](CC1=CC=CC=C1)C(O)=O",
     [1, 79, 80, 117, 134, 283, 389, 508, 573, 646, 650, 738, 786, 807, 857,
      953, 1057, 1066, 1088, 1152, 1171, 1199, 1380, 1750, 1754, 1833, 1844,
      1873, 1917, 1984, 2030]),
    ("F/C=C\\F", [532, 694, 1317, 1649, 1928]),
    ("F/C=C/F", [565, 694, 724, 1649, 1928]),
]


@pytest.mark.parametrize("smi, bits", _PINNED)
def test_pinned_chiral_bits(smi, bits):
    mol = make_mol(smi, keep_h=False, add_h=False)
    fp = rdkit_morgan_binary(mol, 2, 2048, include_chirality=True)
    assert np.flatnonzero(fp).tolist() == bits


def test_featurizer_default_includes_chirality():
    from chemprop_tpu.featurizers.molecule import (
        MorganBinaryFeaturizer,
        MorganCountFeaturizer,
    )

    mR = make_mol("N[C@H](C)C(=O)O", False, False)
    mS = make_mol("N[C@@H](C)C(=O)O", False, False)
    f = MorganBinaryFeaturizer()
    assert (f(mR) != f(mS)).any()
    fc = MorganCountFeaturizer()
    assert (fc(mR) != fc(mS)).any()
    f_off = MorganBinaryFeaturizer(include_chirality=False)
    assert (f_off(mR) == f_off(mS)).all()
