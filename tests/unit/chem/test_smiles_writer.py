"""Canonical SMILES writer: round-trip, idempotence, permutation
invariance, and corpus-scale coverage (chem/smiles_writer.py)."""

from __future__ import annotations

import csv
import glob
import os

import pytest

from chemprop_tpu.chem import make_mol
from chemprop_tpu.chem.mol import BondType
from chemprop_tpu.chem.morgan import canonical_key
from chemprop_tpu.chem.smiles_writer import write_smiles


def _norm_key(mol):
    """canonical_key modulo the one non-SMILES-representable state: an
    aromatic atom FLAG on an atom with no aromatic bonds (lowercase input
    rings this substrate's perception kekulized). The writer must preserve
    everything else exactly."""
    for a in mol.atoms:
        if a.is_aromatic and not any(
            b.bond_type == BondType.AROMATIC for b in mol.atom_bonds(a.idx)
        ):
            a.is_aromatic = False
    return canonical_key(mol)

CASES = [
    "CCO",
    "c1ccccc1",
    "CC(=O)Oc1ccccc1C(=O)O",
    "C1CC1",
    "[Na+].[Cl-]",
    "c1ccc2[nH]ccc2c1",
    "O=C(O)c1ccccc1",
    "C#N",
    "CC(C)(C)c1ccc(O)cc1",
    "c1ccc(-c2ccccc2)cc1",  # biphenyl: explicit '-' linker
    "O=S(=O)(N)c1ccccc1",
    "C1CC2CCC1CC2",  # bicyclo: two ring digits on one atom
    "[NH4+]",
    "[13CH4]",
    "O=[N+]([O-])c1ccccc1",
]


class TestWriter:
    @pytest.mark.parametrize("smi", CASES)
    def test_round_trip_isomorphic(self, smi):
        m = make_mol(smi)
        out = write_smiles(m)
        m2 = make_mol(out)
        assert _norm_key(m2) == _norm_key(m), out
        # idempotent canonical form (also proves permutation invariance:
        # the reparse orders atoms differently than the input did)
        assert write_smiles(m2) == out

    def test_empty(self):
        from chemprop_tpu.chem.mol import Mol

        assert write_smiles(Mol()) == ""


REF_DATA = "/root/reference/tests/data"


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference corpus absent")
class TestCorpus:
    def test_full_corpus_round_trips(self):
        """Every molecule in the reference corpus writes a canonical SMILES
        that reparses isomorphic and re-writes byte-identically."""
        smiles = set()
        for path in glob.glob(REF_DATA + "/**/*.csv", recursive=True):
            with open(path, newline="") as f:
                for row in csv.DictReader(f):
                    for k, v in row.items():
                        if k and v and ("smiles" in k.lower() or k.lower() == "solvent"):
                            v = v.strip()
                            if v and ">>" not in v:
                                smiles.add(v)
        assert len(smiles) > 2900
        bad = []
        for smi in sorted(smiles):
            m = make_mol(smi)
            out = write_smiles(m)
            try:
                # keep_h: mapped explicit Hs survive the first parse (they
                # carry reaction info), so the reparse must keep them too
                m2 = make_mol(out, keep_h=True)
            except Exception as e:  # noqa: BLE001
                bad.append((smi, out, repr(e)))
                continue
            if _norm_key(m2) != _norm_key(m) or write_smiles(m2) != out:
                bad.append((smi, out, "not canonical/isomorphic"))
        # one corpus molecule (the 2-imino-benzimidazoline of
        # docs/chemistry_divergences.md "known divergent" mol 391) is
        # aromatic-by-fiat on input but kekulized on re-perception (the r3
        # RDKit-matched exocyclic rule rejects its 5-ring), so its written
        # form round-trips to the Kekulé graph — a real, documented
        # perception asymmetry, not a writer defect
        assert len(bad) <= 1, bad[:5]


class TestScaffoldKeys:
    def test_scaffold_keys_are_smiles(self):
        from chemprop_tpu.chem.scaffold import murcko_scaffold_key

        m = make_mol("CCc1ccccc1CC(=O)O")
        key = murcko_scaffold_key(m)
        assert key == write_smiles(make_mol("c1ccccc1"))

    def test_same_scaffold_groups_together(self):
        from chemprop_tpu.chem.scaffold import murcko_scaffold_key

        a = murcko_scaffold_key(make_mol("CCc1ccc(O)cc1"))
        b = murcko_scaffold_key(make_mol("NCc1ccc(Cl)cc1"))
        assert a == b  # both strip to benzene
