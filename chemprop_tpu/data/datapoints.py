"""Datapoint records (cf. reference ``chemprop/data/datapoints.py:14-344``):
one sample = molecule(s) + targets ``y`` + sample ``weight`` + bounded-loss
masks + optional extra descriptors/features. NaNs in feature arrays are
sanitized to 0 (targets keep NaN: it encodes "missing task")."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from chemprop_tpu.chem import make_mol
from chemprop_tpu.chem.mol import Mol


def _nan_to_zero(x: np.ndarray | None) -> np.ndarray | None:
    if x is not None:
        x = np.asarray(x, dtype=np.float64)
        if not x.flags.writeable:
            x = x.copy()
        x[np.isnan(x)] = 0
    return x


@dataclass
class _DatapointMixin:
    y: np.ndarray | None = None
    weight: float = 1.0
    gt_mask: np.ndarray | None = None
    lt_mask: np.ndarray | None = None
    x_d: np.ndarray | None = None
    x_phase: list[float] | None = None
    name: str | None = None

    def __post_init__(self):
        self.x_d = _nan_to_zero(self.x_d)
        if self.y is not None:
            self.y = np.asarray(self.y, dtype=np.float64)

    @property
    def t(self) -> int | None:
        return len(self.y) if self.y is not None else None


@dataclass
class MoleculeDatapoint(_DatapointMixin):
    mol: Mol = None
    V_f: np.ndarray | None = None
    """extra atom features, concatenated before message passing"""
    E_f: np.ndarray | None = None
    """extra bond features, concatenated before message passing"""
    V_d: np.ndarray | None = None
    """extra atom descriptors, concatenated after message passing"""

    def __post_init__(self):
        if self.mol is None:
            raise ValueError("mol is required")
        self.V_f = _nan_to_zero(self.V_f)
        self.E_f = _nan_to_zero(self.E_f)
        self.V_d = _nan_to_zero(self.V_d)
        super().__post_init__()

    @classmethod
    def from_smi(
        cls,
        smi: str,
        *,
        keep_h: bool = False,
        add_h: bool = False,
        ignore_stereo: bool = False,
        reorder_atoms: bool = False,
        **kwargs,
    ) -> "MoleculeDatapoint":
        mol = make_mol(smi, keep_h, add_h, ignore_stereo, reorder_atoms)
        kwargs.setdefault("name", smi)
        return cls(mol=mol, **kwargs)

    def __len__(self) -> int:
        return 1


@dataclass
class LazyMoleculeDatapoint(MoleculeDatapoint):
    """SMILES-lazy datapoint: the Mol is parsed on first ``.mol`` access and
    cached (cf. reference ``LazyMoleculeDatapoint``, ``data/datapoints.py:154``).
    Keeps host memory flat for very large datasets whose featurization runs
    through the native C++ batch path (which re-parses SMILES itself)."""

    smiles: str = ""
    keep_h: bool = False
    add_h: bool = False
    ignore_stereo: bool = False
    reorder_atoms: bool = False

    def __post_init__(self):
        if not self.smiles:
            raise ValueError("smiles is required")
        if self.name is None:
            self.name = self.smiles
        self.V_f = _nan_to_zero(self.V_f)
        self.E_f = _nan_to_zero(self.E_f)
        self.V_d = _nan_to_zero(self.V_d)
        _DatapointMixin.__post_init__(self)

    @classmethod
    def from_smi(cls, smi: str, **kwargs) -> "LazyMoleculeDatapoint":
        kwargs.pop("name", None)
        return cls(smiles=smi, **kwargs)


def _lazy_mol_get(self) -> Mol:
    m = self.__dict__.get("_mol")
    if m is None:
        m = make_mol(
            self.smiles, self.keep_h, self.add_h, self.ignore_stereo, self.reorder_atoms
        )
        self.__dict__["_mol"] = m
    return m


def _lazy_mol_set(self, value) -> None:
    # the dataclass-generated __init__ assigns the field default here; only a
    # real Mol is worth caching
    if value is not None and not isinstance(value, property):
        self.__dict__["_mol"] = value


# installed after dataclass processing so the property does not read as the
# inherited ``mol`` field's default value
LazyMoleculeDatapoint.mol = property(_lazy_mol_get, _lazy_mol_set)


@dataclass
class ReactionDatapoint(_DatapointMixin):
    rct: Mol = None
    pdt: Mol = None

    def __post_init__(self):
        if self.rct is None or self.pdt is None:
            raise ValueError("both reactant and product are required")
        super().__post_init__()

    @classmethod
    def from_smi(
        cls,
        rxn_or_smis: str | tuple[str, str],
        *,
        keep_h: bool = False,
        add_h: bool = False,
        ignore_stereo: bool = False,
        reorder_atoms: bool = False,
        **kwargs,
    ) -> "ReactionDatapoint":
        match rxn_or_smis:
            case str():
                parts = rxn_or_smis.split(">")
                if len(parts) == 3:
                    rct_smi, agt_smi, pdt_smi = parts
                    if agt_smi:
                        rct_smi = f"{rct_smi}.{agt_smi}"
                elif len(parts) == 2:
                    rct_smi, pdt_smi = parts
                else:
                    raise ValueError(f"invalid reaction SMILES {rxn_or_smis!r}")
                name = rxn_or_smis
            case (str(), str()):
                rct_smi, pdt_smi = rxn_or_smis
                name = ">>".join(rxn_or_smis)
            case _:
                raise TypeError("must provide either a reaction SMARTS string or 2 SMILES")
        rct = make_mol(rct_smi, keep_h, add_h, ignore_stereo, reorder_atoms)
        pdt = make_mol(pdt_smi, keep_h, add_h, ignore_stereo, reorder_atoms)
        kwargs.setdefault("name", name)
        return cls(rct=rct, pdt=pdt, **kwargs)

    def __len__(self) -> int:
        return 2


@dataclass
class LazyReactionDatapoint(ReactionDatapoint):
    """Reaction-SMILES-lazy datapoint: rct/pdt Mols are parsed on first
    access (cf. reference ``LazyReactionDatapoint``, ``data/datapoints.py``).
    Pairs with the native C++ CGR batch path, which re-parses the strings."""

    rxn_smiles: str = ""
    keep_h: bool = False
    add_h: bool = False
    ignore_stereo: bool = False
    reorder_atoms: bool = False

    def __post_init__(self):
        if not self.rxn_smiles:
            raise ValueError("rxn_smiles is required")
        if self.name is None:
            self.name = self.rxn_smiles
        _DatapointMixin.__post_init__(self)

    @classmethod
    def from_smi(cls, rxn_or_smis, **kwargs):
        if isinstance(rxn_or_smis, tuple):
            rxn_or_smis = ">>".join(rxn_or_smis)
        kwargs.pop("name", None)
        return cls(rxn_smiles=rxn_or_smis, **kwargs)

    def _split(self):
        parts = self.rxn_smiles.split(">")
        if len(parts) == 3:
            rct, agt, pdt = parts
            return (f"{rct}.{agt}" if agt else rct), pdt
        if len(parts) == 2:
            return parts[0], parts[1]
        raise ValueError(f"invalid reaction SMILES {self.rxn_smiles!r}")


def _lazy_rxn_get(which):
    def get(self):
        m = self.__dict__.get(f"_{which}")
        if m is None:
            rct_smi, pdt_smi = self._split()
            smi = rct_smi if which == "rct" else pdt_smi
            m = make_mol(smi, self.keep_h, self.add_h, self.ignore_stereo, self.reorder_atoms)
            self.__dict__[f"_{which}"] = m
        return m

    return get


def _lazy_rxn_set(which):
    def set_(self, value):
        if value is not None and not isinstance(value, property):
            self.__dict__[f"_{which}"] = value

    return set_


LazyReactionDatapoint.rct = property(_lazy_rxn_get("rct"), _lazy_rxn_set("rct"))
LazyReactionDatapoint.pdt = property(_lazy_rxn_get("pdt"), _lazy_rxn_set("pdt"))


@dataclass
class MolAtomBondDatapoint(MoleculeDatapoint):
    """Adds per-atom and per-bond targets and optional molecule-level
    constraints (cf. reference ``datapoints.py:246-344``)."""

    E_d: np.ndarray | None = None
    atom_y: np.ndarray | None = None
    bond_y: np.ndarray | None = None
    atom_constraints: np.ndarray | None = None
    bond_constraints: np.ndarray | None = None
    # per-kind bounded-loss masks (cf. reference ``datapoints.py:163-173``);
    # the mol-level lt_mask/gt_mask are inherited from MoleculeDatapoint
    atom_lt_mask: np.ndarray | None = None
    atom_gt_mask: np.ndarray | None = None
    bond_lt_mask: np.ndarray | None = None
    bond_gt_mask: np.ndarray | None = None

    def __post_init__(self):
        self.E_d = _nan_to_zero(self.E_d)
        if self.atom_y is not None:
            self.atom_y = np.asarray(self.atom_y, dtype=np.float64)
        if self.bond_y is not None:
            self.bond_y = np.asarray(self.bond_y, dtype=np.float64)
        super().__post_init__()
