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
    cleanup_hypervalent(mol)
    perceive_rings(mol)
    _resolve_implicit_aromatic_bonds(mol)
    assign_implicit_hydrogens(mol)
    perceive_kekule_aromaticity(mol)
    perceive_conjugation(mol)
    perceive_hybridization(mol)
    assign_bond_stereo(mol)
    return mol


# ------------------------------------------------------------------ clean-up
def cleanup_hypervalent(mol: Mol) -> None:
    """RDKit ``MolOps::cleanUp`` equivalent: charge-separate the common
    hypervalent neutral groups so perception (charges, H counts, conjugation)
    matches what the reference sees after RDKit sanitization:

    * nitro / N-oxide   R-N(=O)=O -> R-[N+](=O)[O-]
    * azide             R-N=N=N   -> R-N=[N+]=[N-]
    * halogen oxides    X(=O)n    -> [X+n] with [O-] (X = Cl/Br/I)

    Datasets (ESOL, Tox21, ...) routinely write these groups in neutral
    hypervalent form; RDKit normalizes them during sanitization, so the
    reference's featurizers never see a 5-valent neutral N.
    """

    def terminal_dbl_O(i):
        return [
            b
            for b in mol.atom_bonds(i)
            if b.bond_type == BondType.DOUBLE
            and mol.atoms[b.other_atom_idx(i)].atomic_num == 8
            and mol.degree(b.other_atom_idx(i)) == 1
            and mol.atoms[b.other_atom_idx(i)].formal_charge == 0
        ]

    for atom in mol.atoms:
        if atom.formal_charge != 0:
            continue
        i, z = atom.idx, atom.atomic_num
        if z == 7:
            # nitro/N-oxide: shed excess valence onto terminal =O
            dbl_O = terminal_dbl_O(i)
            while mol.bond_order_sum(i) > 3 + atom.formal_charge and dbl_O:
                b = dbl_O.pop()
                b.bond_type = BondType.SINGLE
                mol.atoms[b.other_atom_idx(i)].formal_charge = -1
                atom.formal_charge += 1
            # azide middle N: N=[N+]=[N-] (bond orders unchanged)
            if atom.formal_charge == 0 and mol.degree(i) == 2:
                nbs = mol.atom_bonds(i)
                if all(
                    b.bond_type == BondType.DOUBLE
                    and mol.atoms[b.other_atom_idx(i)].atomic_num == 7
                    for b in nbs
                ):
                    term = [
                        b
                        for b in nbs
                        if mol.degree(b.other_atom_idx(i)) == 1
                        and mol.atoms[b.other_atom_idx(i)].formal_charge == 0
                    ]
                    if term:
                        atom.formal_charge = 1
                        mol.atoms[term[-1].other_atom_idx(i)].formal_charge = -1
        elif z in (17, 35, 53):
            dbl_O = terminal_dbl_O(i)
            while mol.bond_order_sum(i) > 1 + atom.formal_charge and dbl_O:
                b = dbl_O.pop()
                b.bond_type = BondType.SINGLE
                mol.atoms[b.other_atom_idx(i)].formal_charge = -1
                atom.formal_charge += 1


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
        # charge shifts the allowed valence (RDKit Atom::calcImplicitValence):
        # group >= 15 gains with positive charge (N+ -> 4, O- -> 1); carbon
        # loses with |charge| (C+ and C- -> 3); boron loses with charge
        chg = atom.formal_charge
        if chg:
            z = atom.atomic_num
            if z == 6:
                shift = -abs(chg)
            elif z == 5:
                shift = -chg
            else:
                shift = chg
            valences = tuple(max(0, dv + shift) for dv in valences)
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
    # An AROMATIC-typed bond must belong to a ring whose bonds are all
    # aromatic. A ring bond between two aromatic systems that is itself part
    # of a non-aromatic ring (e.g. the c-n linker inside triazolam's
    # 7-membered ring, written lowercase in SMILES) kekulizes to SINGLE —
    # matching RDKit, where kekulization assigns such linkers order 1.
    aromatic_ring_bonds: set[int] = set()
    for ring in getattr(mol, "rings", []):
        ring_set = set(ring)
        bonds = [
            b
            for i in ring
            for b in mol.atom_bonds(i)
            if b.other_atom_idx(i) in ring_set and b.is_in_ring
        ]
        if bonds and all(b.bond_type == BondType.AROMATIC for b in bonds):
            aromatic_ring_bonds.update(b.idx for b in bonds)
    for b in mol.bonds:
        if b.bond_type == BondType.AROMATIC and b.idx not in aromatic_ring_bonds:
            b.bond_type = BondType.SINGLE
            b.is_aromatic = False
    # ensure aromatic flags are consistent for rings given in aromatic form
    for b in mol.bonds:
        if b.bond_type == BondType.AROMATIC:
            b.is_aromatic = True
    # RDKit normalization: an EXPLICITLY-written single bond (``-``, ``/``,
    # ``\``) inside an aromatic ring becomes an AROMATIC bond — RDKit's
    # setAromaticity retypes every bond of an aromatic ring, so the written
    # form does not demote it (golden-corpus molecule 391: the n-c ring bond
    # of a lowercase 2-imino-benzimidazoline written ``/`` for the exocyclic
    # C=N stereo). Promote only when the ring is an aromatic system in its
    # OWN right: all atoms aromatic, every other ring bond aromatic, and at
    # least one atom exclusive to this ring (so its aromatic flag can only
    # come from this ring) — fusion-bond-only rings like biphenylene's
    # 4-ring or triazolam's 7-ring linker keep their single bonds.
    ring_membership: dict[int, int] = {}
    for ring in getattr(mol, "rings", []):
        for i in ring:
            ring_membership[i] = ring_membership.get(i, 0) + 1
    for ring in getattr(mol, "rings", []):
        if not all(mol.atoms[i].is_aromatic for i in ring):
            continue
        if not any(ring_membership.get(i, 0) == 1 for i in ring):
            continue
        ring_set = set(ring)
        bonds = [
            b
            for i in ring
            for b in mol.atom_bonds(i)
            if b.other_atom_idx(i) in ring_set and b.is_in_ring and b.begin_atom_idx == i
        ]
        singles = [b for b in bonds if b.bond_type == BondType.SINGLE]
        if singles and all(
            b.bond_type in (BondType.AROMATIC, BondType.SINGLE) for b in bonds
        ) and any(b.bond_type == BondType.AROMATIC for b in bonds):
            for b in singles:
                b.bond_type = BondType.AROMATIC
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
    exo = None  # (bond, partner idx) of a multiple bond leaving the ring
    for b in mol.atom_bonds(atom.idx):
        if b.bond_type in (BondType.DOUBLE, BondType.TRIPLE) or b.bond_type == BondType.AROMATIC:
            j = b.other_atom_idx(atom.idx)
            if j in ring_set:
                in_ring_multiple = True
            else:
                exo = (b, j)
    if in_ring_multiple:
        return 1
    if exo is not None:
        # RDKit semantics (Aromaticity.cpp getAtomContrib): an exocyclic
        # multiple bond leaves the atom an aromaticity candidate — with zero
        # electron contribution — ONLY when the bond itself is acyclic and
        # goes from carbon to a more electronegative heteroatom (2-pyridone's
        # C=O). A multiple bond into another ring of the fused system (the
        # bond is cyclic: e.g. the C=N bridge of a dihydro-imidazopyridinone)
        # or to a carbon partner (fulvene) disqualifies the whole ring.
        b, j = exo
        if b.is_in_ring:
            return None
        if z == 6 and mol.atoms[j].atomic_num in (7, 8, 15, 16, 34):
            return 0
        return None
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
    """RDKit's conjugation model (``MolOps::setConjugation`` /
    ``markConjAtomBonds``): around every *candidate* atom (B/C/N/O — heavier
    atoms like P and S never conjugate, RDKit Issue211) whose sigma framework
    (degree + H count) is 2 or 3 and that carries a multiple/aromatic bond,
    every other bond whose far end is also a candidate with sigma framework
    <= 3 is marked conjugated together with the multiple bond. Aromatic bonds
    are always conjugated."""
    for b in mol.bonds:
        b.is_conjugated = b.bond_type == BondType.AROMATIC

    def cand(i: int) -> bool:
        return mol.atoms[i].atomic_num in (5, 6, 7, 8)

    def sbo(i: int) -> int:
        return mol.degree(i) + mol.atoms[i].total_num_hs

    multiple = (BondType.DOUBLE, BondType.TRIPLE, BondType.AROMATIC)
    for atom in mol.atoms:
        i = atom.idx
        if not cand(i) or not 2 <= sbo(i) <= 3:
            continue
        bonds = mol.atom_bonds(i)
        multi = [b for b in bonds if b.bond_type in multiple]
        if not multi:
            continue
        for b2 in bonds:
            j = b2.other_atom_idx(i)
            if not cand(j) or sbo(j) > 3:
                continue
            for b1 in multi:
                if b1.idx != b2.idx:
                    b1.is_conjugated = True
                    b2.is_conjugated = True


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
def _cip_branch_gt(mol: Mol, root: int, x: int, y: int, max_depth: int = 8) -> bool | None:
    """CIP rule-1a comparison of root's substituent branches ``x`` vs ``y``:
    True if x outranks y, False if y outranks x, None on a tie within
    ``max_depth`` spheres. Hierarchical-digraph exploration: a multiple bond
    u~v adds a phantom CHILD of u duplicating v (and vice versa) — phantoms
    count at the sphere where the DUPLICATE sits, i.e. one past its origin
    (r3 code review: mixing them into the origin's sphere let a C(=O) branch
    outrank an N branch, inverting rule 1a's sphere-by-sphere order). Each
    sphere compares descending atomic-number tuples; first difference wins —
    the comparison RDKit's assignStereochemistry makes for STEREOZ/E."""

    def expand(frontier):
        """Next sphere: real children (excluding the tree parent) plus
        phantom children for every multiple bond (INCLUDING back toward the
        parent — CIP duplicates both directions). Phantoms ('p', z) have no
        children of their own."""
        out = []
        for entry in frontier:
            if entry[0] == "p":
                continue
            _, u, parent = entry
            for b in mol.atom_bonds(u):
                v = b.other_atom_idx(u)
                if v != parent:
                    out.append(("a", v, u))
                extra = 0
                if b.bond_type in (BondType.DOUBLE, BondType.AROMATIC):
                    extra = 1
                elif b.bond_type == BondType.TRIPLE:
                    extra = 2
                out.extend(("p", mol.atoms[v].atomic_num) for _ in range(extra))
        return out

    def level_key(frontier) -> tuple:
        vals = [
            mol.atoms[e[1]].atomic_num if e[0] == "a" else e[1] for e in frontier
        ]
        return tuple(sorted(vals, reverse=True))

    fx = [("a", x, root)]
    fy = [("a", y, root)]
    for _ in range(max_depth):
        kx, ky = level_key(fx), level_key(fy)
        if kx != ky:
            return kx > ky
        fx, fy = expand(fx), expand(fy)
        if not fx and not fy:
            return None
    return None


def legacy_cip_ranks(mol: Mol) -> list[int]:
    """RDKit's LEGACY CIP ranks (``Chirality.cpp:assignAtomCIPRanks`` —
    what legacy ``assignStereochemistry`` uses for stereo-bond reference
    atoms and ``_CIPCode``). NOT true CIP: the seed invariant packs
    ``(atomic number << 10 | isotope-delta field) << 10 | map-number
    field`` — so the ATOM MAP NUMBER breaks ties between structurally
    equivalent substituents — and refinement iterates sorted neighbor-rank
    lists (each neighbor repeated at twice its bond order, implicit Hs as
    0s, descending, accumulated across rounds, -1-padded, re-ranked
    lexicographically) until the classes stop splitting.

    For a fully atom-mapped molecule (the MAB corpus convention:
    ``tests/data/mol_atom_bond/atomic_regression_atom_mapped.csv``) every
    seed invariant is distinct, the refinement loop never runs, and this
    reproduction is EXACT by construction: rank order = (atomic number,
    isotope delta, map number)."""
    n = mol.num_atoms
    if n == 0:
        return []
    invars: list[int] = []
    for a in mol.atoms:
        num = a.atomic_num % 10000
        mass = 0
        if a.isotope:
            from chemprop_tpu.chem.periodic_table import MASSES

            mass = a.isotope - int(round(MASSES[a.atomic_num]))
            if mass > 0:
                mass += 1
        mass += 512
        mass = 0 if mass < 0 else mass % 1024
        mapf = ((a.atom_map_num + 1) % 1024) if a.atom_map_num else 0
        invars.append(((num << 10) | mass) << 10 | mapf)

    def dense_rank(keys: list) -> list[int]:
        order = {k: i for i, k in enumerate(sorted(set(keys)))}
        return [order[k] for k in keys]

    ranks = dense_rank(invars)
    entries: list[list[int]] = [[] for _ in range(n)]
    num_ranks = len(set(ranks))
    last = -1
    its = 0
    while num_ranks < n and num_ranks != last and its < n:
        longest = 0
        for i in range(n):
            local: list[int] = []
            for b in mol.atom_bonds(i):
                count = int(2.0 * (b.bond_type.order or 1.0) + 0.1)
                local.extend([ranks[b.other_atom_idx(i)] + 1] * count)
            local.extend([0] * mol.atoms[i].total_num_hs)
            local.sort(reverse=True)
            entries[i].append(ranks[i])
            entries[i].extend(local)
            longest = max(longest, len(entries[i]))
        for i in range(n):
            entries[i].extend([-1] * (longest - len(entries[i])))
        last = num_ranks
        ranks = dense_rank([tuple(e) for e in entries])
        num_ranks = len(set(ranks))
        its += 1
    return ranks


def atom_cip_code(mol: Mol, idx: int) -> str | None:
    """CIP ``R``/``S`` code of a tagged tetrahedral stereocenter, or None
    when the atom carries no tag or its four substituents cannot be strictly
    ranked (RDKit's ``_CIPCode`` property is likewise absent for
    unresolvable centers, so downstream consumers — e.g. Morgan
    ``includeChirality`` — skip them the same way).

    Substituent ranking reuses :func:`_cip_branch_gt` (CIP rule 1a,
    hierarchical digraph); the implicit H (or the lone pair of a
    3-coordinate center) takes the neighbor-list position the SMILES
    convention assigns it — directly after the preceding-atom bond, or first
    when the stereocenter opens the SMILES — which is the same normalization
    the parser's tag adjustment assumes (chem/smiles.py:161-179)."""
    from chemprop_tpu.chem.mol import ChiralType

    a = mol.atoms[idx]
    if a.chiral_tag not in (
        ChiralType.CHI_TETRAHEDRAL_CW,
        ChiralType.CHI_TETRAHEDRAL_CCW,
    ):
        return None
    nbrs = [b.other_atom_idx(idx) for b in mol.atom_bonds(idx)]
    if len(nbrs) < 3 or len(nbrs) > 4:
        return None
    tokens: list = list(nbrs)
    if len(nbrs) == 3:
        pad = "H" if a.total_num_hs >= 1 else "LP"
        pos = 1 if nbrs and nbrs[0] < idx else 0
        tokens.insert(pos, pad)
    elif a.total_num_hs:
        return None  # 4 explicit neighbors + implicit H: not tetrahedral

    def gt(x, y) -> bool | None:
        """True if substituent x outranks y; None = tie (unresolvable)."""
        if x == "LP":
            return False if y != "LP" else None
        if y == "LP":
            return True
        if x == "H":
            if isinstance(y, int) and mol.atoms[y].atomic_num > 1:
                return False
            return None  # implicit H vs explicit H: tie
        if y == "H":
            if isinstance(x, int) and mol.atoms[x].atomic_num > 1:
                return True
            return None
        return _cip_branch_gt(mol, idx, x, y)

    wins = [0] * 4
    for i in range(4):
        for j in range(i + 1, 4):
            r = gt(tokens[i], tokens[j])
            if r is None:
                return None
            wins[i if r else j] += 1
    # wins are a permutation of {3,2,1,0}: rank 0 = highest priority
    rank = [3 - w for w in wins]
    # re-order to (lowest, 1st, 2nd, 3rd): "from the lowest-priority
    # substituent, the remaining three in descending priority" — CCW
    # handedness of that view is R (the viewer looks from lowest, so from
    # the OPPOSITE side of "lowest pointing away" the rotation inverts)
    target = [rank.index(3), rank.index(0), rank.index(1), rank.index(2)]
    swaps = 0
    seen = [False] * 4
    for start in range(4):
        if seen[start]:
            continue
        k, cycle = start, 0
        while not seen[k]:
            seen[k] = True
            k = target[k]
            cycle += 1
        swaps += cycle - 1
    ccw = a.chiral_tag == ChiralType.CHI_TETRAHEDRAL_CCW
    if swaps % 2:
        ccw = not ccw
    return "R" if ccw else "S"


def assign_bond_stereo(mol: Mol) -> None:
    """Assign STEREOZ/STEREOE to double bonds flanked by directional single
    bonds (``/`` ``\\``). RDKit semantics: the Z/E label refers to the
    HIGHER-CIP-PRIORITY substituent on each end (legacy assignStereochemistry
    CIP-ranked labels), not to the directional atoms themselves — Z = the two
    high-priority substituents on the same side.

    Priority: on an ATOM-MAPPED molecule RDKit's legacy ranks are exactly
    reconstructible (:func:`legacy_cip_ranks` — map numbers break all
    structural ties and the refinement loop never runs), so they are used
    verbatim; unmapped molecules keep the hierarchical-digraph rule-1a
    comparison (:func:`_cip_branch_gt`), corpus-validated. This closed the
    last stereo divergence of the atom-mapped golden corpus (molecule 461:
    RDKit picked the C6=C7 reference substituent by map number, not true
    CIP)."""
    # the exactness argument (map numbers break all ties, refinement loop
    # never runs) and the corpus validation cover FULLY-mapped molecules
    # only; on partially-mapped inputs the refinement loop would run over
    # unverified invariant packing, so fall back to the digraph comparison.
    lranks = (
        legacy_cip_ranks(mol) if all(a.atom_map_num for a in mol.atoms) else None
    )
    for b in mol.bonds:
        if b.bond_type != BondType.DOUBLE:
            continue
        ref = []
        for end in (b.begin_atom_idx, b.end_atom_idx):
            found = None
            for nb in mol.atom_bonds(end):
                # direction markers are honored regardless of the bond's
                # final perceived type: a ``/`` ring bond that aromaticity
                # normalization retypes AROMATIC still orients the exocyclic
                # double bond (verified against the reference's own
                # predictions on golden-corpus molecule 391)
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
        # re-reference each end to its higher-CIP-priority substituent: the
        # other substituent (if any) sits on the opposite side, so the sign
        # flips when it outranks the directional atom
        ends = (b.begin_atom_idx, b.end_atom_idx)
        refs, signs = [a, c], [sa, sc]
        for k, end in enumerate(ends):
            others = [
                nb.other_atom_idx(end)
                for nb in mol.atom_bonds(end)
                if nb.idx != b.idx and nb.other_atom_idx(end) != refs[k]
            ]
            if others:
                if lranks is not None:
                    outranked = lranks[others[0]] > lranks[refs[k]]
                else:
                    outranked = _cip_branch_gt(mol, end, others[0], refs[k]) is True
                if outranked:
                    refs[k] = others[0]
                    signs[k] = -signs[k]
        b.stereo_atoms = (refs[0], refs[1])
        # equal signs => both reference neighbors on the same side => cis (Z);
        # e.g. F/C=C/F gives signs (-1, +1) => E (trans)
        b.stereo = BondStereo.STEREOZ if signs[0] == signs[1] else BondStereo.STEREOE
