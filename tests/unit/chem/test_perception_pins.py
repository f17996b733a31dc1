"""Hand-pinned RDKit outcomes for the tricky perception classes named in
docs/chemistry_divergences.md (VERDICT r2 next-step #5c): aromaticity and
hybridization regressions for the cases where a simplified model is most
likely to drift. Expected values are RDKit's default-sanitization behavior
(pinned from the RDKit aromaticity model documentation and cross-checked
against the non-circular prediction goldens of
``tests/cli/test_predict_all_checkpoints.py``)."""

from __future__ import annotations

import pytest

from chemprop_tpu.chem import make_mol
from chemprop_tpu.chem.mol import HybridizationType


def _arom_count(smi: str) -> int:
    return sum(a.is_aromatic for a in make_mol(smi).atoms)


class TestAromaticityPins:
    def test_benzene_kekule(self):
        assert _arom_count("C1=CC=CC=C1") == 6

    def test_azulene(self):
        # 10 pi electrons over the fused 5-7 envelope: fully aromatic
        assert _arom_count("c1ccc2cccc2cc1") == 10

    def test_2_pyridone_kekule(self):
        # RDKit aromatizes 2-pyridone (exocyclic C=O contributes 0): the
        # six ring atoms are aromatic, the carbonyl O is not
        assert _arom_count("O=C1C=CC=CN1") == 6

    def test_fulvene_not_aromatic(self):
        # exocyclic C=C disqualifies the ring (RDKit getAtomContrib)
        assert _arom_count("C=C1C=CC=C1") == 0

    def test_exocyclic_into_fused_ring_not_aromatic(self):
        # r3 rule: a multiple bond INTO another ring of the fused system
        # (cyclic bond) disqualifies the candidate ring — the divergent
        # class found via the prediction goldens (mol 302 analog)
        smi = "CC1=CC2=NC(C)(C)N(C)C(=O)N2C=C1"
        m = make_mol(smi)
        assert sum(a.is_aromatic for a in m.atoms) == 0

    def test_pyrrole_furan_thiophene(self):
        for smi in ("c1cc[nH]1", "c1ccoc1", "c1ccsc1"):
            m = make_mol(smi)
            ring_atoms = [a for a in m.atoms if a.is_in_ring]
            assert all(a.is_aromatic for a in ring_atoms), smi

    def test_cyclobutadiene_not_aromatic(self):
        assert _arom_count("C1=CC=C1") == 0

    def test_pyridine_kekule(self):
        assert _arom_count("C1=CC=NC=C1") == 6

    def test_imidazole_kekule(self):
        assert _arom_count("C1=CN=CN1") == 5


class TestHybridizationPins:
    @pytest.mark.parametrize(
        "smi, idx, hyb",
        [
            ("CC(=O)N", 3, HybridizationType.SP2),  # amide N: conjugated -> SP2
            ("CCN", 2, HybridizationType.SP3),  # plain amine N
            ("CS(=O)(=O)C", 1, HybridizationType.SP3),  # sulfone S (RDKit: SP3)
            ("FP(F)(F)(F)F", 1, HybridizationType.SP3D),  # PF5
            ("FS(F)(F)(F)(F)F", 1, HybridizationType.SP3D2),  # SF6
            ("C#N", 0, HybridizationType.SP),
            ("C=C", 0, HybridizationType.SP2),
            ("c1ccccc1", 0, HybridizationType.SP2),  # aromatic C
        ],
    )
    def test_cases(self, smi, idx, hyb):
        m = make_mol(smi)
        assert m.atoms[idx].hybridization == hyb, (
            smi,
            m.atoms[idx].hybridization,
        )


class TestLegacyCipRanks:
    """RDKit legacy-CIP-rank reproduction (``legacy_cip_ranks``): on a fully
    atom-mapped molecule the seed invariants are all distinct (map numbers
    dominate structural ties) so the rank order is exactly
    (atomic number, isotope delta, map number) — the property that closed
    golden-corpus molecule 461 (the stereo-bond reference substituent at
    C6=C7 is picked by MAP NUMBER in RDKit's legacy assignStereochemistry,
    not by true-CIP branch comparison)."""

    def test_fully_mapped_ranks_are_element_then_map(self):
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.chem.perception import legacy_cip_ranks

        mol = make_mol("[C:3]([O:1])([N:2])[C:4]", keep_h=True)
        ranks = legacy_cip_ranks(mol)
        # order: C:3 < C:4 < N:2 < O:1 (element first, then map number)
        by_map = {a.atom_map_num: ranks[i] for i, a in enumerate(mol.atoms)}
        assert by_map[3] < by_map[4] < by_map[2] < by_map[1]

    def test_unmapped_refinement_separates_environments(self):
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.chem.perception import legacy_cip_ranks

        # propanol: C(0)-C(1)-C(2)-O(3); the three carbons start tied and
        # the neighbor-rank refinement must separate all of them
        mol = make_mol("CCCO")
        ranks = legacy_cip_ranks(mol)
        assert len(set(ranks)) == 4
        assert ranks[3] == max(ranks)  # O outranks every C

    def test_mapped_stereo_bond_reference_uses_map_number(self):
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.chem.mol import BondStereo, BondType

        # 2-butene with both methyls distinguished ONLY by map number: the
        # legacy rank picks the higher-mapped substituent as reference on
        # the doubly-substituted end
        for hi, lo, want in ((9, 1, BondStereo.STEREOZ), (1, 9, BondStereo.STEREOE)):
            smi = f"[CH3:{hi}]/[C:2](=[C:3](/[H:5])[CH3:4])[CH3:{lo}]"
            mol = make_mol(smi, keep_h=True)
            dbl = [b for b in mol.bonds if b.bond_type == BondType.DOUBLE][0]
            assert dbl.stereo in (BondStereo.STEREOZ, BondStereo.STEREOE)
            assert dbl.stereo == want, smi

    def test_aromatic_ring_bond_promotion_and_stereo(self):
        """RDKit normalization (golden mol 391, verified against the
        reference's own predictions): a ``/``-written ring bond inside a
        fiat-aromatic ring is retyped AROMATIC, and its direction marker
        still orients the exocyclic C=N — whose Z/E label re-references to
        the higher-LEGACY-rank ring nitrogen (map number tie-break)."""
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.chem.mol import BondStereo, BondType

        smi = ("[c:5]1[c:6]([H:25])[c:7]([H:26])[c:8]([H:27])[c:9]2[n:10]"
               "([H:28])/[c:11](=[N:12]/[C:13]([H:29])([H:30])[H:31])"
               "[n:20]([H:38])[c:21]12")
        mol = make_mol(smi, keep_h=True)
        bmap = {}
        for b in mol.bonds:
            key = frozenset((mol.atoms[b.begin_atom_idx].atom_map_num,
                             mol.atoms[b.end_atom_idx].atom_map_num))
            bmap[key] = b
        ring_bond = bmap[frozenset((10, 11))]
        assert ring_bond.bond_type == BondType.AROMATIC
        assert ring_bond.is_aromatic
        dbl = bmap[frozenset((11, 12))]
        assert dbl.stereo == BondStereo.STEREOZ  # n20 (higher map) is the ref

    def test_fusion_linker_single_bond_not_promoted(self):
        """The promotion must NOT touch explicit single ring bonds of rings
        that are only aromatic because every atom is shared with other
        aromatic rings (biphenylene's 4-ring)."""
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.chem.mol import BondType

        mol = make_mol("c1ccc2-c3ccccc3-c2c1")  # biphenylene
        singles = [b for b in mol.bonds if b.bond_type == BondType.SINGLE and b.is_in_ring]
        assert len(singles) == 2  # the two linker bonds stay single
        assert not any(b.is_aromatic for b in singles)
