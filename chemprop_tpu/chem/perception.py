"""Perception passes that "sanitize" a freshly parsed :class:`Mol`.

RDKit performs these steps in C++ during ``MolFromSmiles`` sanitization; this
framework implements the subset the featurizers depend on (reference
``chemprop/featurizers/atom.py`` / ``bond.py`` consume: ring membership,
aromaticity, implicit H counts, conjugation, hybridization, chiral tags, and
double-bond stereo):

1. ring perception (bridge detection + smallest-ring enumeration)
2. resolution of implicit bonds between aromatic atoms (aromatic iff in ring)
3. implicit hydrogen counting (Daylight valence model)
4. aromatization of rings written in Kekulé form (simplified Hückel model)
5. conjugation perception
6. hybridization perception
7. double-bond stereo assignment from ``/`` and ``\\`` directions

The aromaticity/conjugation/hybridization models are deterministic,
documented approximations of RDKit's default models; they agree on common
organic chemistry and are the single source of truth for this framework (all
featurization goldens are defined against *these* rules).
"""

from __future__ import annotations

import math
from collections import deque

from chemprop_tpu.chem.mol import (
    Atom,
    Bond,
    BondDir,
    BondStereo,
    BondType,
    HybridizationType,
    Mol,
)
from chemprop_tpu.chem.periodic_table import DEFAULT_VALENCES, n_outer_electrons

MAX_AROMATIC_RING = 7
MIN_AROMATIC_RING = 5

# divalent chalcogens contribute a lone pair (never a double bond) to an
# aromatic system, so their aromatic bonds count 1.0 toward valence, not 1.5
_CHALCOGENS = {8, 16, 34, 52}


def sanitize(mol: Mol) -> Mol:
    perceive_rings(mol)
    _resolve_implicit_aromatic_bonds(mol)
    assign_implicit_hydrogens(mol)
    perceive_kekule_aromaticity(mol)
    perceive_conjugation(mol)
    perceive_hybridization(mol)
    assign_bond_stereo(mol)
    return mol


# --------------------------------------------------------------------- rings
def perceive_rings(mol: Mol) -> list[list[int]]:
    """Mark ring bonds/atoms (a bond is in a ring iff it is not a bridge) and
    enumerate a smallest-ring set (one smallest cycle through every ring bond,
    deduplicated) stored on ``mol.rings`` as lists of atom indices."""
    n = mol.num_atoms
    bridges = _find_bridges(mol)

    for b in mol.bonds:
        b.is_in_ring = b.idx not in bridges
    for a in mol.atoms:
        a.is_in_ring = False
    for b in mol.bonds:
        if b.is_in_ring:
            mol.atoms[b.begin_atom_idx].is_in_ring = True
            mol.atoms[b.end_atom_idx].is_in_ring = True

    rings: list[list[int]] = []
    seen: set[frozenset[int]] = set()
    for b in mol.bonds:
        if not b.is_in_ring:
            continue
        ring = _smallest_ring_through(mol, b)
        if ring is not None:
            key = frozenset(ring)
            if key not in seen:
                seen.add(key)
                rings.append(ring)
    mol.rings = rings
    mol.ring_sizes_by_atom = [[] for _ in range(n)]
    for ring in rings:
        for idx in ring:
            mol.ring_sizes_by_atom[idx].append(len(ring))
    return rings


def _find_bridges(mol: Mol) -> set[int]:
    """Iterative Tarjan bridge-finding; returns bond indices that are bridges."""
    n = mol.num_atoms
    disc = [-1] * n
    low = [0] * n
    bridges: set[int] = set()
    timer = 0

    for root in range(n):
        if disc[root] != -1:
            continue
        # stack entries: (atom, parent_bond_idx, iterator position)
        stack = [(root, -1, iter(mol._adj[root]))]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            u, pbond, it = stack[-1]
            advanced = False
            for bi in it:
                if bi == pbond:
                    continue
                v = mol.bonds[bi].other_atom_idx(u)
                if disc[v] == -1:
                    disc[v] = low[v] = timer
                    timer += 1
                    stack.append((v, bi, iter(mol._adj[v])))
                    advanced = True
                    break
                low[u] = min(low[u], disc[v])
            if not advanced:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[u])
                    if low[u] > disc[p]:
                        bridges.add(pbond)
    return bridges


def _smallest_ring_through(mol: Mol, bond: Bond, max_size: int = 24) -> list[int] | None:
    """BFS shortest path begin->end avoiding ``bond`` => smallest cycle."""
    src, dst = bond.begin_atom_idx, bond.end_atom_idx
    prev: dict[int, int] = {src: -1}
    q = deque([src])
    while q:
        u = q.popleft()
        if u == dst:
            break
        for bi in mol._adj[u]:
            if bi == bond.idx:
                continue
            v = mol.bonds[bi].other_atom_idx(u)
            if v not in prev:
                prev[v] = u
                q.append(v)
    if dst not in prev:
        return None
    path = [dst]
    while path[-1] != src:
        path.append(prev[path[-1]])
    if len(path) > max_size:
        return None
    return path


def _resolve_implicit_aromatic_bonds(mol: Mol) -> None:
    """A bond written with no symbol between two aromatic atoms is aromatic
    only if it lies in a ring (OpenSMILES); demote e.g. the biphenyl linker."""
    for bi in getattr(mol, "_implicit_bond_idxs", ()):
        b = mol.bonds[bi]
        if not b.is_in_ring:
            b.bond_type = BondType.SINGLE


# ----------------------------------------------------------------- valence/H
def effective_bond_order_sum(mol: Mol, idx: int) -> float:
    atom = mol.atoms[idx]
    chalcogen_aromatic = atom.is_aromatic and atom.atomic_num in _CHALCOGENS
    total = 0.0
    for b in mol.atom_bonds(idx):
        if b.bond_type == BondType.AROMATIC:
            total += 1.0 if chalcogen_aromatic else 1.5
        else:
            total += b.bond_type.order
    return total


def assign_implicit_hydrogens(mol: Mol) -> None:
    """Daylight model: organic-subset atoms written without brackets receive
    enough Hs to reach their lowest default valence >= current bond-order sum.
    Bracket atoms never receive implicit Hs."""
    for atom in mol.atoms:
        if atom.num_explicit_hs is not None:  # bracket atom: H count is explicit
            atom.num_implicit_hs = 0
            continue
        valences = DEFAULT_VALENCES.get(atom.atomic_num)
        if not valences:
            atom.num_implicit_hs = 0
            continue
        v = int(math.ceil(effective_bond_order_sum(mol, atom.idx)))
        for dv in valences:
            if dv >= v:
                atom.num_implicit_hs = dv - v
                break
        else:
            atom.num_implicit_hs = 0


# ------------------------------------------------------------- aromatization
def perceive_kekule_aromaticity(mol: Mol) -> None:
    """Aromatize rings written in Kekulé form (e.g. ``C1=CC=CC=C1``) using a
    simplified Hückel model over the smallest-ring set: every ring atom must be
    sp2-capable with a defined pi-electron contribution, and the ring total
    must equal 4n+2. Iterates to a fixpoint so that fused systems whose
    aromaticity depends on an already-aromatized neighbor ring resolve."""
    changed = True
    while changed:
        changed = False
        for ring in getattr(mol, "rings", []):
            if not (MIN_AROMATIC_RING <= len(ring) <= MAX_AROMATIC_RING):
                continue
            if all(mol.atoms[i].is_aromatic for i in ring):
                continue
            pi = _ring_pi_electrons(mol, ring)
            if pi is None or pi < 2 or (pi - 2) % 4 != 0:
                continue
            ring_set = set(ring)
            for i in ring:
                mol.atoms[i].is_aromatic = True
            for i in ring:
                for b in mol.atom_bonds(i):
                    if b.other_atom_idx(i) in ring_set and b.is_in_ring:
                        b.bond_type = BondType.AROMATIC
                        b.is_aromatic = True
            changed = True
    # ensure aromatic flags are consistent for rings given in aromatic form
    for b in mol.bonds:
        if b.bond_type == BondType.AROMATIC:
            b.is_aromatic = True


def _ring_pi_electrons(mol: Mol, ring: list[int]) -> int | None:
    ring_set = set(ring)
    total = 0
    for i in ring:
        atom = mol.atoms[i]
        if mol.total_degree(i) > 3:
            return None
        contrib = _pi_contribution(mol, atom, ring_set)
        if contrib is None:
            return None
        total += contrib
    return total


def _pi_contribution(mol: Mol, atom: Atom, ring_set: set[int]) -> int | None:
    z = atom.atomic_num
    q = atom.formal_charge
    in_ring_multiple = False
    exo_multiple = False
    for b in mol.atom_bonds(atom.idx):
        if b.bond_type in (BondType.DOUBLE, BondType.TRIPLE) or b.bond_type == BondType.AROMATIC:
            if b.other_atom_idx(atom.idx) in ring_set:
                in_ring_multiple = True
            else:
                exo_multiple = True
    if in_ring_multiple:
        return 1
    if exo_multiple:
        # sp2 atom whose pi bond points out of the ring (e.g. pyridinone C=O):
        # participates geometrically but contributes no electrons
        return 0
    # saturated atom: must supply a lone pair (or be a carbanion/carbocation)
    if z == 6:
        if q == -1:
            return 2
        if q == 1:
            return 0
        return None
    if z in (7, 15):  # pyrrole-type N/P: lone pair in the ring plane
        return 2 if q == 0 or q == -1 else None
    if z in _CHALCOGENS:
        return 2 if q in (0, 1) else None
    if z == 5:  # borole-type B: empty p orbital
        return 0
    return None


# -------------------------------------------------------------- conjugation
def _lone_pairs(mol: Mol, idx: int) -> int:
    atom = mol.atoms[idx]
    ne = n_outer_electrons(atom.atomic_num)
    if ne == 0:
        return 0
    used = int(round(effective_bond_order_sum(mol, idx))) + atom.total_num_hs
    return max(0, (ne - atom.formal_charge - used) // 2)


def perceive_conjugation(mol: Mol) -> None:
    """A deterministic approximation of RDKit's conjugation model:

    * aromatic bonds are conjugated;
    * a single bond is conjugated iff one end has a multiple bond and the
      other end has a multiple bond or a lone pair;
    * a multiple bond is conjugated iff an adjacent bond is a multiple bond or
      a conjugated single bond.
    """
    has_multiple = [False] * mol.num_atoms
    for b in mol.bonds:
        if b.bond_type in (BondType.DOUBLE, BondType.TRIPLE, BondType.AROMATIC):
            has_multiple[b.begin_atom_idx] = True
            has_multiple[b.end_atom_idx] = True
    # only N/O/P/S/Se/Te lone pairs conjugate (halogen lone pairs do not)
    lp = [
        mol.atoms[i].atomic_num in (7, 8, 15, 16, 34, 52) and _lone_pairs(mol, i) > 0
        for i in range(mol.num_atoms)
    ]

    for b in mol.bonds:
        b.is_conjugated = False
        if b.bond_type == BondType.AROMATIC:
            b.is_conjugated = True
        elif b.bond_type == BondType.SINGLE:
            u, v = b.begin_atom_idx, b.end_atom_idx
            if (has_multiple[u] and (has_multiple[v] or lp[v])) or (
                has_multiple[v] and lp[u]
            ):
                b.is_conjugated = True

    for b in mol.bonds:
        if b.bond_type in (BondType.DOUBLE, BondType.TRIPLE):
            for end in (b.begin_atom_idx, b.end_atom_idx):
                for nb in mol.atom_bonds(end):
                    if nb.idx == b.idx:
                        continue
                    if nb.bond_type in (BondType.DOUBLE, BondType.TRIPLE, BondType.AROMATIC):
                        b.is_conjugated = True
                    elif nb.bond_type == BondType.SINGLE and nb.is_conjugated:
                        b.is_conjugated = True


# ------------------------------------------------------------ hybridization
def perceive_hybridization(mol: Mol) -> None:
    """VSEPR-style: steric number = sigma framework (graph degree + H count)
    plus lone pairs; conjugated lone-pair atoms are demoted one step (amide N,
    ester O -> SP2), and aromatic atoms are SP2."""
    steric_to_hyb = {
        1: HybridizationType.S,
        2: HybridizationType.SP,
        3: HybridizationType.SP2,
        4: HybridizationType.SP3,
        5: HybridizationType.SP3D,
        6: HybridizationType.SP3D2,
    }
    for atom in mol.atoms:
        i = atom.idx
        if atom.is_aromatic:
            atom.hybridization = HybridizationType.SP2
            continue
        sigma = mol.degree(i) + atom.total_num_hs
        lp = _lone_pairs(mol, i)
        steric = sigma + lp
        has_multiple = any(
            b.bond_type in (BondType.DOUBLE, BondType.TRIPLE, BondType.AROMATIC)
            for b in mol.atom_bonds(i)
        )
        # a saturated lone-pair atom in a conjugated system flattens (amide N,
        # ester/phenol O -> SP2); atoms with their own pi bond keep steric count
        if lp > 0 and not has_multiple and any(b.is_conjugated for b in mol.atom_bonds(i)):
            steric -= 1
        if steric <= 0:
            atom.hybridization = (
                HybridizationType.S if sigma + atom.total_num_hs > 0 else HybridizationType.UNSPECIFIED
            )
        elif steric in steric_to_hyb:
            atom.hybridization = steric_to_hyb[steric]
        else:
            atom.hybridization = HybridizationType.OTHER


# -------------------------------------------------------------------- stereo
def assign_bond_stereo(mol: Mol) -> None:
    """Assign STEREOZ/STEREOE to double bonds flanked by directional single
    bonds (``/`` ``\\``). The reference atoms (``stereo_atoms``) are the
    directional neighbors; Z = same side ("cis"), E = opposite sides."""
    for b in mol.bonds:
        if b.bond_type != BondType.DOUBLE:
            continue
        ref = []
        for end in (b.begin_atom_idx, b.end_atom_idx):
            found = None
            for nb in mol.atom_bonds(end):
                if nb.direction != BondDir.NONE and nb.idx != b.idx:
                    # sign: +1 if the far atom is "up" relative to this end
                    sign = 1 if nb.direction == BondDir.ENDUPRIGHT else -1
                    if nb.begin_atom_idx == end:
                        # written end->far: direction describes far relative to end
                        pass
                    else:
                        # written far->end: invert to get far relative to end
                        sign = -sign
                    found = (nb.other_atom_idx(end), sign)
                    break
            ref.append(found)
        if ref[0] is None or ref[1] is None:
            continue
        (a, sa), (c, sc) = ref
        b.stereo_atoms = (a, c)
        # equal signs => both reference neighbors on the same side => cis (Z);
        # e.g. F/C=C/F gives signs (-1, +1) => E (trans)
        b.stereo = BondStereo.STEREOZ if sa == sc else BondStereo.STEREOE
