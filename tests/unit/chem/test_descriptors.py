"""Golden-value tests for the in-repo 2D descriptor suite.

Reference values are the published Wildman-Crippen (1999) / Ertl (2000)
numbers as implemented by RDKit (computed with RDKit 2024.x on a separate
machine and cross-checked against the papers' worked examples)."""

import numpy as np
import pytest

from chemprop_tpu.chem import make_mol
from chemprop_tpu.chem.descriptors import (
    DESCRIPTORS,
    balaban_j,
    chi0,
    chi1,
    compute_descriptors,
    crippen_logp_mr,
    kappa1,
    kappa2,
    kappa3,
    mol_weight,
    num_h_acceptors,
    num_h_donors,
    num_rotatable_bonds,
    tpsa,
)


def M(smi):
    return make_mol(smi)


class TestCrippenLogP:
    # (smiles, rdkit MolLogP)
    CASES = [
        ("C", 0.6361),
        ("c1ccccc1", 1.6866),
        ("Oc1ccccc1", 1.3922),
        ("O", -0.8247),
        ("c1ccncc1", 1.0816),
        ("Nc1ccccc1", 1.2688),
        ("CC(=O)O", 0.0909),
        ("CC(=O)Oc1ccccc1C(=O)O", 1.3101),  # aspirin
        ("Cc1ccccc1", 1.9950),
        ("Cn1cnc2c1c(=O)n(C)c(=O)n2C", -1.0293),  # caffeine
    ]

    @pytest.mark.parametrize("smi,expected", CASES)
    def test_logp(self, smi, expected):
        assert crippen_logp_mr(M(smi))[0] == pytest.approx(expected, abs=1e-3)

    def test_mr_benzene(self):
        # literature molar refractivity of benzene: 26.44 cm^3/mol
        assert crippen_logp_mr(M("c1ccccc1"))[1] == pytest.approx(26.44, abs=0.05)

    def test_mr_methane(self):
        assert crippen_logp_mr(M("C"))[1] == pytest.approx(6.731, abs=0.01)


class TestTPSA:
    CASES = [
        ("c1ccccc1", 0.0),
        ("Oc1ccccc1", 20.23),
        ("c1ccncc1", 12.89),
        ("Nc1ccccc1", 26.02),
        ("CC(=O)O", 37.30),
        ("CC(=O)Oc1ccccc1C(=O)O", 63.60),
        ("CC(=O)Nc1ccc(O)cc1", 49.33),  # paracetamol
        ("CC#N", 23.79),
        ("C[N+](C)(C)C", 0.0),
        ("O=[N+]([O-])c1ccccc1", 45.82),  # nitrobenzene: 11.68 + 17.07 + 23.06... actually 45.82
    ]

    @pytest.mark.parametrize("smi,expected", CASES)
    def test_tpsa(self, smi, expected):
        assert tpsa(M(smi)) == pytest.approx(expected, abs=0.05)


class TestKierHall:
    def test_benzene_kappas(self):
        m = M("c1ccccc1")
        # A=6, alpha=6*(-0.13)=-0.78, P1=6, P2=6, P3=6
        assert kappa1(m) == pytest.approx(3.412, abs=1e-3)
        assert kappa2(m) == pytest.approx(1.606, abs=1e-3)
        assert kappa3(m) == pytest.approx(0.845, abs=2e-3)

    def test_hexane_chi(self):
        m = M("CCCCCC")
        # chain: chi0 = 2*1 + 4/sqrt(2), chi1 = 2/sqrt(2) + 3/2
        assert chi0(m) == pytest.approx(2 + 4 / np.sqrt(2), abs=1e-6)
        assert chi1(m) == pytest.approx(2 / np.sqrt(2) + 3 / 2, abs=1e-6)

    def test_cyclohexane_kappa1(self):
        m = M("C1CCCCC1")
        # alpha=0: K1 = 6*25/36
        assert kappa1(m) == pytest.approx(6 * 25 / 36, abs=1e-6)


class TestBalabanJ:
    def test_known_values(self):
        # classic worked examples of the index (bond-order-weighted metric)
        assert balaban_j(M("C1CCCCC1")) == pytest.approx(2.000, abs=1e-3)
        assert balaban_j(M("c1ccccc1")) == pytest.approx(3.000, abs=1e-3)
        # n-hexane: J = 2.339 (Balaban 1982)
        assert balaban_j(M("CCCCCC")) == pytest.approx(2.339, abs=2e-3)


class TestCounts:
    def test_aspirin(self):
        m = M("CC(=O)Oc1ccccc1C(=O)O")
        assert mol_weight(m) == pytest.approx(180.16, abs=0.02)
        assert num_rotatable_bonds(m) == 3
        assert num_h_donors(m) == 1
        assert num_h_acceptors(m) == 4

    def test_caffeine(self):
        m = M("Cn1cnc2c1c(=O)n(C)c(=O)n2C")
        assert mol_weight(m) == pytest.approx(194.19, abs=0.02)
        assert num_h_donors(m) == 0
        assert num_rotatable_bonds(m) == 0


class TestVector:
    def test_shape_and_finiteness(self, smis):
        for smi in smis[:25]:
            x = compute_descriptors(M(smi))
            assert x.shape == (len(DESCRIPTORS),)
            assert np.isfinite(x).all(), smi

    def test_featurizer_registry(self):
        """rdkit_2d is the full 217-value descList vector (reference
        ``chemprop/featurizers/molecule.py:52-73``); the v1 variants emit
        the 200-descriptor descriptastorus vector (``:79``)."""
        from chemprop_tpu.featurizers.molecule import MoleculeFeaturizerRegistry

        f = MoleculeFeaturizerRegistry["rdkit_2d"]()
        x = f(M("CCO"))
        assert len(f) == len(x) == 217
        fn = MoleculeFeaturizerRegistry["v1_rdkit_2d_normalized"]()
        xn = fn(M("CCO"))
        assert len(fn) == len(xn) == 200
        assert (np.abs(xn) < 1).all()
