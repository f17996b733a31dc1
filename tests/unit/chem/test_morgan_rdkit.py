"""RDKit-bit-exact Morgan fingerprints: pinned against the reference's RDKit
fixtures (``/root/reference/tests/unit/featurizers/test_molecule.py``) —
same molecule, same bit positions, same counts, same custom radius/length."""

import numpy as np
import pytest

from chemprop_tpu.chem import make_mol
from chemprop_tpu.chem.morgan_rdkit import rdkit_morgan_binary, rdkit_morgan_count
from chemprop_tpu.featurizers import MorganBinaryFeaturizer, MorganCountFeaturizer

SMI = "Fc1cccc(C2(c3nnc(Cc4cccc5ccccc45)o3)CCOCC2)c1"

REF_BITS_2_2048 = [
    80, 230, 332, 378, 429, 450, 502, 503, 523, 544, 556, 645, 649, 656, 663,
    699, 772, 875, 917, 926, 950, 1039, 1060, 1087, 1088, 1104, 1136, 1162,
    1164, 1199, 1349, 1357, 1380, 1405, 1430, 1487, 1510, 1561, 1573, 1597,
    1604, 1670, 1742, 1747, 1750, 1824, 1855, 1873, 1928,
]
REF_COUNTS = [
    1, 1, 1, 2, 1, 1, 1, 1, 1, 1, 1, 2, 1, 2, 1, 1, 1, 1, 1, 4, 2, 2, 1, 2,
    4, 1, 1, 2, 2, 2, 1, 1, 7, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 6, 2, 1, 11, 1,
]
REF_BITS_3_1024 = [
    15, 36, 49, 63, 64, 80, 112, 138, 140, 175, 230, 275, 301, 325, 332, 333,
    339, 356, 378, 381, 406, 429, 450, 463, 465, 478, 486, 502, 503, 517, 523,
    524, 537, 544, 549, 554, 556, 573, 579, 580, 645, 646, 647, 649, 652, 656,
    663, 699, 718, 721, 723, 726, 731, 772, 773, 800, 818, 821, 828, 831, 836,
    849, 865, 875, 887, 894, 904, 917, 926, 950, 951, 989,
]


@pytest.fixture(scope="module")
def mol():
    return make_mol(SMI, keep_h=False, add_h=False)


def test_binary_bits_match_rdkit(mol):
    np.testing.assert_array_equal(
        np.nonzero(MorganBinaryFeaturizer()(mol))[0], REF_BITS_2_2048
    )


def test_count_values_match_rdkit(mol):
    fp = MorganCountFeaturizer()(mol)
    np.testing.assert_array_equal(fp[np.nonzero(fp)], REF_COUNTS)
    np.testing.assert_array_equal(np.nonzero(fp)[0], REF_BITS_2_2048)


def test_custom_radius_length_match_rdkit(mol):
    np.testing.assert_array_equal(
        np.nonzero(MorganBinaryFeaturizer(radius=3, length=1024)(mol))[0],
        REF_BITS_3_1024,
    )


def test_atom_order_invariance():
    """The same molecule written from a different atom ordering must emit the
    identical fingerprint (environment hashing is order-free)."""
    a = make_mol("CC(=O)Nc1ccc(O)cc1", keep_h=False, add_h=False)
    b = make_mol("Oc1ccc(NC(C)=O)cc1", keep_h=False, add_h=False)
    np.testing.assert_array_equal(rdkit_morgan_binary(a), rdkit_morgan_binary(b))
    np.testing.assert_array_equal(rdkit_morgan_count(a), rdkit_morgan_count(b))


def test_radius_zero_is_atom_invariants_only():
    mol = make_mol("CCO", keep_h=False, add_h=False)
    fp0 = rdkit_morgan_binary(mol, radius=0)
    fp2 = rdkit_morgan_binary(mol, radius=2)
    assert fp0.sum() == 3  # C(H3), C(H2), O all distinct environments
    assert (fp2.astype(bool) & fp0.astype(bool)).sum() == fp0.sum()


def test_symmetric_duplicate_environments_collapse():
    """In ethane both carbons' radius-1 environments are the same bond set:
    RDKit emits the environment once (the duplicate atom goes dead)."""
    mol = make_mol("CC", keep_h=False, add_h=False)
    cnt = rdkit_morgan_count(mol, radius=1)
    # 2 identical atom invariants (count 2) + ONE environment bit (count 1)
    assert sorted(cnt[np.nonzero(cnt)].tolist()) == [1, 2]


def test_charged_atoms_distinct_isotope_defect_truncates():
    plain = rdkit_morgan_binary(make_mol("CO", keep_h=False, add_h=False))
    anion = rdkit_morgan_binary(make_mol("C[O-]", keep_h=False, add_h=False))
    assert not np.array_equal(plain, anion)
    # RDKit's mass-defect invariant C-truncates: 13C - C weight = 0.99 -> 0,
    # so 13C is NOT distinguished from 12C (known RDKit behavior); deuterium
    # (2.014 - 1.008 -> 1) IS when explicit
    heavy = rdkit_morgan_binary(make_mol("[13CH3]O", keep_h=False, add_h=False))
    assert np.array_equal(plain, heavy)


class TestZeroDegreeAtoms:
    """RDKit kills zero-degree atoms before the first layer
    (MorganFingerprints.cpp), so isolated atoms emit exactly ONE invariant:
    the radius-0 connectivity invariant (ADVICE r2: 'C'/'O' emitted 2)."""

    @pytest.mark.parametrize("smi, n_bits", [("C", 1), ("O", 1), ("[Na+].[Cl-]", 2)])
    def test_single_invariant(self, smi, n_bits):
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.chem.morgan_rdkit import (
            morgan_environment_invariants,
            rdkit_morgan_binary,
        )

        mol = make_mol(smi)
        invs = morgan_environment_invariants(mol, radius=2)
        assert len(invs) == n_bits
        assert rdkit_morgan_binary(mol).sum() == n_bits
