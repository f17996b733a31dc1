"""Morgan (ECFP-style) circular fingerprints and canonical graph hashing.

The reference framework gets these from RDKit (``GetMorganGenerator``, used by
``chemprop/featurizers/molecule.py:43-50`` for extra-descriptor featurization)
and uses Murcko-scaffold SMILES strings as scaffold-split keys
(``chemprop/data/splitting.py``). This module implements both primitives
natively on the in-repo :class:`Mol`: a hashed circular fingerprint and a
canonical Weisfeiler-Lehman style graph key. Bit positions are NOT
RDKit-compatible (different hash), but the fingerprints have the same
structure-sensitivity properties; they are this framework's own vocabulary.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from chemprop_tpu.chem.mol import BondType, Mol


def _hash_ints(*vals: int) -> int:
    """Stable 64-bit hash of an integer tuple (endianness-independent)."""
    raw = struct.pack(f"<{len(vals)}q", *[v & 0x7FFFFFFFFFFFFFFF for v in vals])
    return int.from_bytes(hashlib.blake2b(raw, digest_size=8).digest(), "little")


def _initial_invariants(mol: Mol) -> list[int]:
    inv = []
    for a in mol.atoms:
        inv.append(
            _hash_ints(
                a.atomic_num,
                mol.degree(a.idx),
                a.total_num_hs,
                a.formal_charge,
                int(a.is_in_ring),
                int(a.is_aromatic),
                a.isotope,
            )
        )
    return inv


_BOND_CODE = {
    BondType.SINGLE: 1,
    BondType.DOUBLE: 2,
    BondType.TRIPLE: 3,
    BondType.AROMATIC: 4,
}


def morgan_identifiers(mol: Mol, radius: int = 2) -> list[int]:
    """All (atom, radius<=r) environment identifiers."""
    inv = _initial_invariants(mol)
    ids = list(inv)
    for _ in range(radius):
        new_inv = []
        for a in mol.atoms:
            nbrs = sorted(
                (_BOND_CODE.get(b.bond_type, 5), inv[b.other_atom_idx(a.idx)])
                for b in mol.atom_bonds(a.idx)
            )
            flat = [inv[a.idx]]
            for code, ninv in nbrs:
                flat += [code, ninv]
            new_inv.append(_hash_ints(*flat))
        inv = new_inv
        ids.extend(inv)
    return ids


def morgan_binary_fingerprint(mol: Mol, radius: int = 2, length: int = 2048) -> np.ndarray:
    """Hashed binary circular fingerprint (cf. reference
    ``MorganBinaryFeaturizer``, ``chemprop/featurizers/molecule.py:43-47``)."""
    fp = np.zeros(length, dtype=np.int32)
    for ident in morgan_identifiers(mol, radius):
        fp[ident % length] = 1
    return fp


def morgan_count_fingerprint(mol: Mol, radius: int = 2, length: int = 2048) -> np.ndarray:
    """Hashed count circular fingerprint (cf. reference
    ``MorganCountFeaturizer``, ``chemprop/featurizers/molecule.py:48-52``)."""
    fp = np.zeros(length, dtype=np.int32)
    for ident in morgan_identifiers(mol, radius):
        fp[ident % length] += 1
    return fp


def canonical_key(mol: Mol, iterations: int = 8) -> str:
    """A canonical, permutation-invariant key for a molecular graph
    (Weisfeiler-Lehman refinement + sorted multiset hash). Used where the
    reference uses canonical SMILES strings as dictionary keys (e.g. scaffold
    grouping)."""
    if mol.num_atoms == 0:
        return "empty"
    inv = _initial_invariants(mol)
    for _ in range(iterations):
        new_inv = []
        for a in mol.atoms:
            nbrs = sorted(
                _hash_ints(_BOND_CODE.get(b.bond_type, 5), inv[b.other_atom_idx(a.idx)])
                for b in mol.atom_bonds(a.idx)
            )
            new_inv.append(_hash_ints(inv[a.idx], *nbrs))
        if sorted(new_inv) == sorted(inv):
            break
        inv = new_inv
    bond_codes = sorted(
        _hash_ints(
            _BOND_CODE.get(b.bond_type, 5),
            *sorted((inv[b.begin_atom_idx], inv[b.end_atom_idx])),
        )
        for b in mol.bonds
    )
    final = _hash_ints(mol.num_atoms, mol.num_bonds, *sorted(inv), *bond_codes)
    return f"{final:016x}"
