"""SMARTS engine tests.

Expected counts are hand-derived from the published SMARTS semantics
(Daylight theory manual) and cross-checked against RDKit
``GetSubstructMatches(..., uniquify=True)`` behavior documented in the
reference stack (reference ``chemprop/featurizers/molecule.py`` relies on
RDKit fragment counting for its descriptor vector).
"""

import pytest

from chemprop_tpu.chem import make_mol
from chemprop_tpu.chem.smarts import SmartsError, count_matches, has_match, smarts


def mol(smi):
    return make_mol(smi, keep_h=False, add_h=False)


BENZENE = mol("c1ccccc1")
PHENOL = mol("c1ccccc1O")
ASPIRIN = mol("CC(=O)Oc1ccccc1C(=O)O")
NAPHTHALENE = mol("c1ccc2ccccc2c1")
ACETAMIDE = mol("CC(=O)N")
TOLUENE = mol("Cc1ccccc1")


class TestAtomPrimitives:
    def test_element_aliphatic_vs_aromatic(self):
        assert count_matches(PHENOL, "[#6]") == 6
        assert count_matches(PHENOL, "c") == 6
        assert count_matches(PHENOL, "C") == 0
        assert count_matches(TOLUENE, "C") == 1

    def test_two_letter_elements(self):
        m = mol("ClCCBr")
        assert count_matches(m, "Cl") == 1
        assert count_matches(m, "Br") == 1
        assert count_matches(m, "[Cl,Br]") == 2

    def test_degree_and_connectivity(self):
        # toluene methyl: D1 (one explicit neighbor), X4 (3 H + 1 C)
        assert count_matches(TOLUENE, "[CX4]") == 1
        assert count_matches(TOLUENE, "[CD1]") == 1
        assert count_matches(TOLUENE, "[cD3]") == 1  # ipso carbon

    def test_h_count(self):
        assert count_matches(PHENOL, "[OH]") == 1
        assert count_matches(PHENOL, "[OH0]") == 0
        assert count_matches(ACETAMIDE, "[NH2]") == 1
        assert count_matches(TOLUENE, "[CH3]") == 1

    def test_valence(self):
        assert count_matches(ASPIRIN, "[Cv4]") == 3  # all aliphatic C are v4

    def test_charge(self):
        m = mol("[O-]C(=O)C[NH3+]")
        assert count_matches(m, "[O-]") == 1
        assert count_matches(m, "[OX1-]") == 1
        assert count_matches(m, "[N+]") == 1
        assert count_matches(m, "[NH3+]") == 1
        assert count_matches(m, "[O+]") == 0

    def test_ring_membership(self):
        assert count_matches(NAPHTHALENE, "[cR2]") == 2  # fusion atoms
        assert count_matches(NAPHTHALENE, "[cR1]") == 8
        assert count_matches(TOLUENE, "[CR0]") == 1
        assert count_matches(ASPIRIN, "[r6]") == 6

    def test_aromatic_aliphatic_any(self):
        assert count_matches(PHENOL, "[a]") == 6
        assert count_matches(PHENOL, "[A]") == 1
        assert count_matches(PHENOL, "[*]") == 7
        assert count_matches(PHENOL, "*") == 7


class TestLogic:
    def test_negation(self):
        assert count_matches(PHENOL, "[!c]") == 1
        assert count_matches(ASPIRIN, "[C!H3]") == 2  # carbonyl carbons

    def test_or_and_semicolon(self):
        assert count_matches(ASPIRIN, "[OX2H1,OX1]") == 3  # OH + 2 carbonyl O
        assert count_matches(ASPIRIN, "[#8;X2]") == 2  # ester O + acid OH
        # precedence: ',' binds tighter than ';'
        assert count_matches(ASPIRIN, "[O;X1,X2H1]") == 3

    def test_ampersand(self):
        assert count_matches(PHENOL, "[c&D3]") == 1


class TestBonds:
    def test_explicit_bond_orders(self):
        assert count_matches(ASPIRIN, "C=O") == 2
        assert count_matches(ASPIRIN, "C-O") == 2  # C(=O)-O ester + acid C-OH
        assert count_matches(mol("C#N"), "C#N") == 1
        assert count_matches(BENZENE, "c:c") == 6
        assert count_matches(BENZENE, "c-c") == 0

    def test_any_bond(self):
        assert count_matches(ASPIRIN, "C~O") == 4

    def test_default_bond_single_or_aromatic(self):
        assert count_matches(BENZENE, "cc") == 6
        assert count_matches(TOLUENE, "Cc") == 1

    def test_bond_or(self):
        m = mol("C=CC#C")
        assert count_matches(m, "C=,#C") == 2

    def test_ring_bond(self):
        assert count_matches(NAPHTHALENE, "c@c") == 11
        assert count_matches(TOLUENE, "C@c") == 0


class TestTopology:
    def test_branches(self):
        assert count_matches(ASPIRIN, "CC(=O)O") == 1  # acetyl only (methyl C)
        assert count_matches(ASPIRIN, "[CX3](=O)[OX2H1]") == 1

    def test_ring_closure(self):
        assert count_matches(BENZENE, "c1ccccc1") == 1
        assert count_matches(NAPHTHALENE, "c1ccccc1") == 2
        assert count_matches(NAPHTHALENE, "c1ccc2ccccc2c1") == 1
        assert count_matches(mol("C1CC1"), "C1CC1") == 1

    def test_uniquify(self):
        p = smarts("c1ccccc1")
        assert len(p.get_matches(BENZENE, uniquify=False)) == 12  # 6 rot × 2 refl
        assert len(p.get_matches(BENZENE, uniquify=True)) == 1


class TestRecursive:
    def test_anchored(self):
        assert count_matches(ASPIRIN, "[$([CX3]=[OX1])]") == 2

    def test_negated_recursive(self):
        # carbonyl O neighbors that are not the acid OH
        assert count_matches(ASPIRIN, "[CX3](=O)[!$([OX2H1])]") == 3

    def test_nested(self):
        # aromatic C bearing an acetoxy group
        assert count_matches(ASPIRIN, "[c$(cOC(C)=O)]") == 1


class TestErrors:
    def test_unbalanced(self):
        with pytest.raises(SmartsError):
            smarts("C(C")
        with pytest.raises(SmartsError):
            smarts("C1CC")

    def test_disconnected_rejected(self):
        with pytest.raises(SmartsError):
            smarts("C.C")

    def test_empty(self):
        with pytest.raises(SmartsError):
            smarts("")


class TestHasMatch:
    def test_has_match(self):
        assert has_match(ASPIRIN, "c1ccccc1")
        assert not has_match(ASPIRIN, "[#7]")
