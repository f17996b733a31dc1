"""Unit tests for the self-contained SMILES parser + perception pipeline.

Golden values are hand-derived from standard organic chemistry; they define
this framework's chemistry model (there is no RDKit in this stack to compare
against — the perception rules in chemprop_tpu/chem/perception.py are the
single source of truth)."""

import pytest

from chemprop_tpu.chem import make_mol, parse_smiles
from chemprop_tpu.chem.mol import BondStereo, BondType, ChiralType, HybridizationType
from chemprop_tpu.chem.morgan import canonical_key, morgan_binary_fingerprint
from chemprop_tpu.chem.scaffold import murcko_scaffold_key
from chemprop_tpu.chem.smiles import SmilesParseError


def test_ethanol():
    m = make_mol("CCO")
    assert m.num_atoms == 3 and m.num_bonds == 2
    assert [a.symbol for a in m.atoms] == ["C", "C", "O"]
    assert [a.total_num_hs for a in m.atoms] == [3, 2, 1]
    assert all(a.hybridization == HybridizationType.SP3 for a in m.atoms)


def test_benzene_aromatic_and_kekule_match():
    arom = make_mol("c1ccccc1")
    kek = make_mol("C1=CC=CC=C1")
    for m in (arom, kek):
        assert m.num_atoms == 6
        assert all(a.is_aromatic for a in m.atoms)
        assert all(a.total_num_hs == 1 for a in m.atoms)
        assert all(b.bond_type == BondType.AROMATIC for b in m.bonds)
        assert all(a.hybridization == HybridizationType.SP2 for a in m.atoms)
    assert canonical_key(arom) == canonical_key(kek)


def test_cyclohexane_not_aromatic():
    m = make_mol("C1CCCCC1")
    assert not any(a.is_aromatic for a in m.atoms)
    assert all(a.is_in_ring for a in m.atoms)
    assert all(a.total_num_hs == 2 for a in m.atoms)


def test_cyclobutadiene_not_aromatic():
    m = make_mol("C1=CC=C1")  # 4 pi electrons, anti-aromatic
    assert not any(a.is_aromatic for a in m.atoms)


def test_pyridine_vs_pyrrole_h_counts():
    pyridine = make_mol("c1ccncc1")
    n = next(a for a in pyridine.atoms if a.atomic_num == 7)
    assert n.total_num_hs == 0
    pyrrole = make_mol("c1cc[nH]c1")
    n = next(a for a in pyrrole.atoms if a.atomic_num == 7)
    assert n.total_num_hs == 1
    # pyrrole written in Kekulé form: bare N picks up its H by valence
    pyrrole_k = make_mol("C1=CC=CN1")
    n = next(a for a in pyrrole_k.atoms if a.atomic_num == 7)
    assert n.total_num_hs == 1 and n.is_aromatic


def test_thiophene_furan():
    for smi, z in (("c1ccsc1", 16), ("c1ccoc1", 8)):
        m = make_mol(smi)
        het = next(a for a in m.atoms if a.atomic_num == z)
        assert het.total_num_hs == 0
        assert het.is_aromatic


def test_biphenyl_linker_single():
    m = make_mol("c1ccccc1c1ccccc1")
    linker = [b for b in m.bonds if not b.is_in_ring]
    assert len(linker) == 1
    assert linker[0].bond_type == BondType.SINGLE


def test_charges():
    m = make_mol("[NH4+].[O-]C(=O)C")
    n = next(a for a in m.atoms if a.atomic_num == 7)
    assert n.formal_charge == 1 and n.total_num_hs == 4
    o_minus = next(a for a in m.atoms if a.atomic_num == 8 and a.formal_charge == -1)
    assert o_minus.total_num_hs == 0
    m2 = make_mol("[Fe+2]")
    assert m2.atoms[0].formal_charge == 2
    m3 = make_mol("[O--]")
    assert m3.atoms[0].formal_charge == -2


def test_isotope_and_map():
    m = make_mol("[13CH4]")
    assert m.atoms[0].isotope == 13
    assert m.atoms[0].mass == 13.0
    m = make_mol("[CH3:2][OH:1]", reorder_atoms=True)
    assert m.atoms[0].atomic_num == 8  # map 1 first after reorder
    assert m.atoms[1].atomic_num == 6


def test_chirality_tags():
    m = make_mol("C[C@H](N)C(=O)O")
    c = m.atoms[1]
    assert c.chiral_tag == ChiralType.CHI_TETRAHEDRAL_CCW
    m = make_mol("C[C@@H](N)C(=O)O")
    assert m.atoms[1].chiral_tag == ChiralType.CHI_TETRAHEDRAL_CW
    m = make_mol("C[C@H](N)C(=O)O", ignore_stereo=True)
    assert m.atoms[1].chiral_tag == ChiralType.CHI_UNSPECIFIED


def test_cis_trans():
    e = make_mol("F/C=C/F")
    db = next(b for b in e.bonds if b.bond_type == BondType.DOUBLE)
    assert db.stereo == BondStereo.STEREOE
    z = make_mol("F/C=C\\F")
    db = next(b for b in z.bonds if b.bond_type == BondType.DOUBLE)
    assert db.stereo == BondStereo.STEREOZ


def test_ring_closure_percent():
    m = make_mol("C%10CCCCC%10")
    assert m.num_bonds == 6
    assert all(a.is_in_ring for a in m.atoms)


def test_explicit_h_removal_and_addition():
    m = make_mol("[H]C([H])([H])[H]")
    assert m.num_atoms == 1 and m.atoms[0].total_num_hs == 4
    kept = make_mol("[H]C([H])([H])[H]", keep_h=True)
    assert kept.num_atoms == 5
    added = make_mol("CO", add_h=True)
    assert added.num_atoms == 6  # C + O + 4 H
    assert sum(a.atomic_num == 1 for a in added.atoms) == 4
    # deuterium survives removal
    d = make_mol("[2H]C")
    assert d.num_atoms == 2


def test_parse_errors():
    for bad in ["C(", "C)", "C1CC", "[C", "C%1", "Xx", "c1ccc1("]:
        with pytest.raises(SmilesParseError):
            parse_smiles(bad)


def test_amide_conjugation_and_hybridization():
    m = make_mol("CC(=O)NC")
    cn = m.get_bond_between(1, 3)
    assert cn.is_conjugated
    n = m.atoms[3]
    assert n.hybridization == HybridizationType.SP2
    carbonyl_o = m.atoms[2]
    assert carbonyl_o.hybridization == HybridizationType.SP2


def test_sulfonamide_valence():
    m = make_mol("CS(=O)(=O)N")
    s = m.atoms[1]
    assert s.total_num_hs == 0
    assert m.total_valence(1) == 6


def test_canonical_key_permutation_invariant():
    a = make_mol("c1ccccc1CCN")
    b = make_mol("NCCc1ccccc1")
    assert canonical_key(a) == canonical_key(b)
    c = make_mol("NCCCc1ccccc1")
    assert canonical_key(a) != canonical_key(c)


def test_scaffold_keys():
    # same ring system, different substituents -> same scaffold
    tol = make_mol("Cc1ccccc1")
    eb = make_mol("CCc1ccccc1")
    benz = make_mol("c1ccccc1")
    assert murcko_scaffold_key(tol) == murcko_scaffold_key(benz)
    assert murcko_scaffold_key(eb) == murcko_scaffold_key(benz)
    # acyclic molecules -> empty scaffold
    assert murcko_scaffold_key(make_mol("CCO")) == ""
    # different ring systems differ
    assert murcko_scaffold_key(make_mol("c1ccncc1")) != murcko_scaffold_key(benz)


def test_morgan_fingerprint_properties(smis):
    from chemprop_tpu.chem import make_mol as mk

    fp1 = morgan_binary_fingerprint(mk(smis[0]))
    fp1_again = morgan_binary_fingerprint(mk(smis[0]))
    fp2 = morgan_binary_fingerprint(mk(smis[1]))
    assert fp1.shape == (2048,)
    assert (fp1 == fp1_again).all()
    assert (fp1 != fp2).any()
    assert fp1.sum() > 0


def test_full_dataset_parses(smis):
    for smi in smis:
        m = make_mol(smi)
        assert m.num_atoms > 0
