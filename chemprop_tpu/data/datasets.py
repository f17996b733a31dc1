"""Datasets: index -> featurized ``Datum``; target/feature normalization.

Fresh implementation with the semantics of the reference datasets
(``chemprop/data/datasets.py:77-860``): raw vs scaled views of targets and
extra features (StandardScaler per key), optional precomputed MolGraph cache,
and per-index ``Datum`` tuples consumed by the padded collate
(:mod:`chemprop_tpu.data.collate`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
from sklearn.preprocessing import StandardScaler

from chemprop_tpu.chem.mol import Mol
from chemprop_tpu.chem.morgan import canonical_key
from chemprop_tpu.data.datapoints import (
    MolAtomBondDatapoint,
    MoleculeDatapoint,
    ReactionDatapoint,
)
from chemprop_tpu.types import MolGraph
from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer
from chemprop_tpu.utils.utils import parallel_execute


class Datum(NamedTuple):
    mg: MolGraph
    V_d: np.ndarray | None
    x_d: np.ndarray | None
    y: np.ndarray | None
    weight: float
    lt_mask: np.ndarray | None
    gt_mask: np.ndarray | None


class _DatasetMixin:
    def __len__(self) -> int:
        return len(self.data)

    @property
    def _Y(self) -> np.ndarray:
        return np.array([d.y for d in self.data], dtype=float)

    @property
    def Y(self) -> np.ndarray:
        return self._scaled_Y

    @Y.setter
    def Y(self, Y) -> None:
        Y = np.array(Y, dtype=float)
        self._check_len(Y, "targets")
        self._scaled_Y = Y

    @property
    def _X_d(self) -> np.ndarray:
        return np.array([d.x_d for d in self.data])

    @property
    def X_d(self) -> np.ndarray:
        return self._scaled_X_d

    @X_d.setter
    def X_d(self, X_d) -> None:
        X_d = np.array(X_d)
        self._check_len(X_d, "extra descriptors")
        self._scaled_X_d = X_d

    @property
    def weights(self) -> np.ndarray:
        return np.array([d.weight for d in self.data])

    @property
    def lt_mask(self) -> np.ndarray:
        return np.array([d.lt_mask for d in self.data])

    @property
    def gt_mask(self) -> np.ndarray:
        return np.array([d.gt_mask for d in self.data])

    @property
    def names(self) -> list[str | None]:
        return [d.name for d in self.data]

    @property
    def t(self) -> int | None:
        return self.data[0].t if len(self.data) else None

    @property
    def d_xd(self) -> int:
        return 0 if self.X_d[0] is None else self.X_d.shape[1]

    def normalize_targets(self, scaler: StandardScaler | None = None) -> StandardScaler:
        if scaler is None:
            scaler = StandardScaler().fit(self._Y)
        self.Y = scaler.transform(self._Y)
        return scaler

    def reset(self) -> None:
        self._scaled_Y = self._Y
        self._scaled_X_d = self._X_d

    def _check_len(self, X, label: str) -> None:
        if len(X) != len(self.data):
            raise ValueError(
                f"number of datapoints ({len(self.data)}) and {label} ({len(X)}) must match"
            )


@dataclass
class MoleculeDataset(_DatasetMixin):
    data: list[MoleculeDatapoint]
    featurizer: SimpleMoleculeMolGraphFeaturizer = field(
        default_factory=SimpleMoleculeMolGraphFeaturizer
    )
    n_workers: int = 0

    def __post_init__(self):
        if self.data is None:
            raise ValueError("data cannot be None")
        self.reset()
        self._cache: list[MolGraph] | None = None

    # -------------------------------------------------------------- access
    def __getitem__(self, idx: int) -> Datum:
        d = self.data[idx]
        mg = self._cache[idx] if self._cache is not None else self._featurize(idx)
        return Datum(mg, self.V_ds[idx], self.X_d[idx], self.Y[idx], d.weight, d.lt_mask, d.gt_mask)

    def _featurize(self, idx: int) -> MolGraph:
        return self.featurizer(self.data[idx].mol, self.V_fs[idx], self.E_fs[idx])

    @property
    def cache(self) -> bool:
        return self._cache is not None

    @cache.setter
    def cache(self, cache: bool) -> None:
        if cache:
            self._cache = parallel_execute(self._featurize, range(len(self)), self.n_workers)
        else:
            self._cache = None

    def populate_cache_native(self, smiles: list[str] | None = None, keep_h: bool = False) -> bool:
        """Fill the MolGraph cache via the C++ batch featurizer (13x the
        Python path; only valid for the default V2 featurizer without extra
        atom/bond features). Returns False (and leaves the cache unset) if
        the native path does not apply."""
        from chemprop_tpu.featurizers.native import (
            featurize_batch_native,
            molgraphs_from_native,
            native_available,
        )

        if self.featurizer.extra_atom_fdim or self.featurizer.extra_bond_fdim:
            return False
        if self.featurizer.shape != (72, 14) or not native_available():
            return False
        if smiles is None:
            if any(d.name is None for d in self.data):
                return False
            smiles = [d.name for d in self.data]
        nb = featurize_batch_native(smiles, keep_h=keep_h)
        self._cache = molgraphs_from_native(nb)
        return True

    @property
    def mols(self) -> list[Mol]:
        return [d.mol for d in self.data]

    @property
    def smiles(self) -> list[str]:
        """Identifier strings: the datapoint name (= input SMILES) when
        available, else the canonical graph key (this framework has no SMILES
        writer yet)."""
        return [d.name if d.name is not None else canonical_key(d.mol) for d in self.data]

    # ----------------------------------------------- extra feature plumbing
    @property
    def _V_fs(self) -> list[np.ndarray | None]:
        return [d.V_f for d in self.data]

    @property
    def V_fs(self) -> list[np.ndarray | None]:
        return self._scaled_V_fs

    @V_fs.setter
    def V_fs(self, V_fs) -> None:
        self._check_len(V_fs, "atom features")
        self._scaled_V_fs = V_fs
        self._cache = None

    @property
    def _E_fs(self) -> list[np.ndarray | None]:
        return [d.E_f for d in self.data]

    @property
    def E_fs(self) -> list[np.ndarray | None]:
        return self._scaled_E_fs

    @E_fs.setter
    def E_fs(self, E_fs) -> None:
        self._check_len(E_fs, "bond features")
        self._scaled_E_fs = E_fs
        self._cache = None

    @property
    def _V_ds(self) -> list[np.ndarray | None]:
        return [d.V_d for d in self.data]

    @property
    def V_ds(self) -> list[np.ndarray | None]:
        return self._scaled_V_ds

    @V_ds.setter
    def V_ds(self, V_ds) -> None:
        self._check_len(V_ds, "atom descriptors")
        self._scaled_V_ds = V_ds

    @property
    def d_vf(self) -> int:
        return 0 if self.V_fs[0] is None else self.V_fs[0].shape[1]

    @property
    def d_ef(self) -> int:
        return 0 if self.E_fs[0] is None else self.E_fs[0].shape[1]

    @property
    def d_vd(self) -> int:
        return 0 if self.V_ds[0] is None else self.V_ds[0].shape[1]

    def normalize_inputs(
        self, key: str = "X_d", scaler: StandardScaler | None = None
    ) -> StandardScaler | None:
        match key:
            case "X_d":
                X = None if self.d_xd == 0 else self._X_d
            case "V_f":
                X = None if self.d_vf == 0 else np.concatenate(self._V_fs, axis=0)
            case "E_f":
                X = None if self.d_ef == 0 else np.concatenate(self._E_fs, axis=0)
            case "V_d":
                X = None if self.d_vd == 0 else np.concatenate(self._V_ds, axis=0)
            case _:
                raise ValueError(
                    f"invalid feature key {key!r}; expected one of X_d/V_f/E_f/V_d"
                )
        if X is None:
            return scaler
        if scaler is None:
            scaler = StandardScaler().fit(X)
        match key:
            case "X_d":
                self.X_d = scaler.transform(X)
            case "V_f":
                self.V_fs = [scaler.transform(x) if x.size else x for x in self._V_fs]
            case "E_f":
                self.E_fs = [scaler.transform(x) if x.size else x for x in self._E_fs]
            case "V_d":
                self.V_ds = [scaler.transform(x) if x.size else x for x in self._V_ds]
        return scaler

    def reset(self) -> None:
        super().reset()
        self._scaled_V_fs = self._V_fs
        self._scaled_E_fs = self._E_fs
        self._scaled_V_ds = self._V_ds
        self._cache = None

    # ------------------------------------------------------- shape metadata
    @property
    def max_atoms(self) -> int:
        return max((max(1, d.mol.num_atoms) for d in self.data), default=0)

    @property
    def max_edges(self) -> int:
        return max((2 * d.mol.num_bonds for d in self.data), default=0)


@dataclass
class ReactionDataset(_DatasetMixin):
    """Datapoints are atom-mapped (reactant, product) pairs featurized with
    the CGR featurizer (cf. reference ``chemprop/data/datasets.py:651-782``)."""

    data: list[ReactionDatapoint] = None
    featurizer: "CondensedGraphOfReactionFeaturizer" = None

    def __post_init__(self):
        if self.data is None:
            raise ValueError("data cannot be None")
        if self.featurizer is None:
            from chemprop_tpu.featurizers.molgraph.reaction import (
                CondensedGraphOfReactionFeaturizer,
            )

            self.featurizer = CondensedGraphOfReactionFeaturizer()
        self.reset()
        self._cache = None

    def __getitem__(self, idx: int) -> Datum:
        d = self.data[idx]
        mg = self._cache[idx] if self._cache is not None else self._featurize(idx)
        return Datum(mg, None, self.X_d[idx], self.Y[idx], d.weight, d.lt_mask, d.gt_mask)

    def _featurize(self, idx: int) -> MolGraph:
        d = self.data[idx]
        return self.featurizer((d.rct, d.pdt))

    @property
    def cache(self) -> bool:
        return self._cache is not None

    @cache.setter
    def cache(self, cache: bool) -> None:
        self._cache = (
            parallel_execute(self._featurize, range(len(self)), getattr(self, "n_workers", 0))
            if cache
            else None
        )

    def populate_cache_native(self, rxns: list[str] | None = None, keep_h: bool = False) -> bool:
        """Fill the CGR MolGraph cache via the C++ batch featurizer (the cuik
        ``batch_reaction_featurizer`` equivalent). Only valid for the default
        V2 atom / 14-dim bond featurizers; returns False when inapplicable."""
        from chemprop_tpu.featurizers.native import (
            featurize_rxn_batch_native,
            molgraphs_from_native,
            native_available,
        )

        f = self.featurizer
        if len(f.atom_featurizer) != 72 or len(f.bond_featurizer) != 14:
            return False
        if not native_available():
            return False
        if rxns is None:
            if any(d.name is None or ">" not in (d.name or "") for d in self.data):
                return False
            rxns = [d.name for d in self.data]
        nb = featurize_rxn_batch_native(rxns, keep_h=keep_h, mode=f.mode.name)
        self._cache = molgraphs_from_native(nb)
        return True

    @property
    def mols(self) -> list[Mol]:
        return [d.rct for d in self.data]

    @property
    def smiles(self) -> list[str | None]:
        return [d.name for d in self.data]

    @property
    def d_vf(self) -> int:
        return 0

    @property
    def d_ef(self) -> int:
        return 0

    @property
    def d_vd(self) -> int:
        return 0

    @property
    def V_ds(self) -> list[None]:
        return [None] * len(self.data)

    def normalize_inputs(self, key: str = "X_d", scaler=None):
        if key != "X_d":
            return scaler
        X = None if self.d_xd == 0 else self._X_d
        if X is None:
            return scaler
        if scaler is None:
            scaler = StandardScaler().fit(X)
        self.X_d = scaler.transform(X)
        return scaler


class MulticomponentDataset(_DatasetMixin):
    """Parallel per-component datasets sharing targets (cf. reference
    ``chemprop/data/datasets.py:782-860``). Indexing returns a list of
    per-component Datums; targets/weights come from the first component."""

    def __init__(self, datasets: list):
        sizes = {len(d) for d in datasets}
        if len(sizes) != 1:
            raise ValueError(f"component datasets have mismatched lengths: {sizes}")
        self.datasets = datasets

    def __len__(self) -> int:
        return len(self.datasets[0])

    @property
    def n_components(self) -> int:
        return len(self.datasets)

    def __getitem__(self, idx: int) -> list[Datum]:
        return [d[idx] for d in self.datasets]

    @property
    def data(self):
        return self.datasets[0].data

    @property
    def smiles(self) -> list[tuple]:
        return list(zip(*[d.smiles for d in self.datasets]))

    @property
    def names(self) -> list[tuple]:
        return list(zip(*[d.names for d in self.datasets]))

    def normalize_targets(self, scaler: StandardScaler | None = None) -> StandardScaler:
        return self.datasets[0].normalize_targets(scaler)

    def normalize_inputs(self, key: str = "X_d", scaler=None):
        return [d.normalize_inputs(key, scaler) for d in self.datasets]

    def reset(self) -> None:
        for d in self.datasets:
            d.reset()

    @property
    def _Y(self):
        return self.datasets[0]._Y

    @property
    def Y(self):
        return self.datasets[0].Y

    @property
    def weights(self):
        return self.datasets[0].weights

    @property
    def lt_mask(self):
        return self.datasets[0].lt_mask

    @property
    def gt_mask(self):
        return self.datasets[0].gt_mask

    @property
    def t(self):
        return self.datasets[0].t

    @property
    def d_xd(self) -> int:
        return self.datasets[0].d_xd

    @property
    def cache(self) -> bool:
        return all(d.cache for d in self.datasets)

    @cache.setter
    def cache(self, cache: bool) -> None:
        for d in self.datasets:
            d.cache = cache


class MABDatum(NamedTuple):
    mg: MolGraph
    V_d: np.ndarray | None
    E_d: np.ndarray | None
    x_d: np.ndarray | None
    ys: tuple  # (mol_y, atom_y, bond_y)
    weight: float
    constraints: tuple | None
    lt_masks: tuple = (None, None, None)  # per-kind (mol, atom, bond)
    gt_masks: tuple = (None, None, None)


@dataclass
class MolAtomBondDataset(MoleculeDataset):
    """Dataset over :class:`MolAtomBondDatapoint` with per-kind target
    normalization and constraint rescaling (cf. reference
    ``chemprop/data/datasets.py:436-651``)."""

    data: list[MolAtomBondDatapoint] = None

    def __getitem__(self, idx: int) -> MABDatum:
        d = self.data[idx]
        mg = self._cache[idx] if self._cache is not None else self._featurize(idx)
        constraints = None
        if d.atom_constraints is not None or d.bond_constraints is not None:
            constraints = (self._scaled_atom_c[idx], self._scaled_bond_c[idx])
        # target-less datapoints (predict time): np.array([None, ...]) yields
        # float64 NaN scalars, which must read as "no mol targets"
        y = self.Y[idx]
        if not isinstance(y, np.ndarray) or y.ndim == 0:
            y = None
        return MABDatum(
            mg,
            self.V_ds[idx],
            self.E_ds[idx],
            self.X_d[idx],
            (y, self.atom_Y[idx], self.bond_Y[idx]),
            d.weight,
            constraints,
            (d.lt_mask, d.atom_lt_mask, d.bond_lt_mask),
            (d.gt_mask, d.atom_gt_mask, d.bond_gt_mask),
        )

    # ------------------------------------------------------ per-kind views
    @property
    def _atom_Y(self):
        return [d.atom_y for d in self.data]

    @property
    def atom_Y(self):
        return self._scaled_atom_Y

    @property
    def _bond_Y(self):
        return [d.bond_y for d in self.data]

    @property
    def bond_Y(self):
        return self._scaled_bond_Y

    @property
    def _E_ds(self):
        return [d.E_d for d in self.data]

    @property
    def E_ds(self):
        return self._scaled_E_ds

    @property
    def d_ed(self) -> int:
        return 0 if self.E_ds[0] is None else self.E_ds[0].shape[1]

    def normalize_inputs(
        self, key: str = "X_d", scaler: StandardScaler | None = None
    ) -> StandardScaler | None:
        if key != "E_d":
            return super().normalize_inputs(key, scaler)
        X = None if self.d_ed == 0 else np.concatenate(self._E_ds, axis=0)
        if X is None:
            return scaler
        if scaler is None:
            scaler = StandardScaler().fit(X)
        self._scaled_E_ds = [scaler.transform(x) if x.size else x for x in self._E_ds]
        return scaler

    @property
    def names(self):
        return [d.name for d in self.data]

    def reset(self) -> None:
        super().reset()
        self._scaled_atom_Y = self._atom_Y
        self._scaled_bond_Y = self._bond_Y
        self._scaled_E_ds = self._E_ds
        self._scaled_atom_c = [d.atom_constraints for d in self.data]
        self._scaled_bond_c = [d.bond_constraints for d in self.data]

    def normalize_targets(self, kind: str = "mol", scaler: StandardScaler | None = None):
        """Per-kind target normalization; atom/bond constraints are rescaled
        consistently: if y' = (y-mu)/sigma then C' = (C - n*mu)/sigma where n
        is the number of atoms/bonds (reference ``datasets.py:576-592``)."""
        match kind:
            case "mol":
                return super().normalize_targets(scaler)
            case "atom":
                ys = self._atom_Y
            case "bond":
                ys = self._bond_Y
            case _:
                raise ValueError(f"invalid kind {kind!r}")
        if ys[0] is None:
            return scaler
        flat = np.concatenate([y for y in ys], axis=0)
        if scaler is None:
            scaler = StandardScaler().fit(flat)
        scaled = [scaler.transform(y) if y.size else y for y in ys]
        if kind == "atom":
            self._scaled_atom_Y = scaled
            self._scaled_atom_c = [
                None if c is None else (c - len(y) * scaler.mean_) / scaler.scale_
                for c, y in zip(self._scaled_atom_c, ys)
            ]
        else:
            self._scaled_bond_Y = scaled
            self._scaled_bond_c = [
                None if c is None else (c - len(y) * scaler.mean_) / scaler.scale_
                for c, y in zip(self._scaled_bond_c, ys)
            ]
        return scaler


@dataclass
class CuikmolmakerDataset(MoleculeDataset):
    """MoleculeDataset whose graphs are featurized through the in-repo C++
    batch featurizer at construction (the reference's cuik-backed
    ``CuikmolmakerDataset``, ``data/datasets.py:369-433``); falls back to the
    Python featurization cache when the native path does not apply."""

    keep_h: bool = False

    def __post_init__(self):
        super().__post_init__()
        if not self.populate_cache_native(keep_h=self.keep_h):
            self.cache = True


@dataclass
class CuikmolmakerReactionDataset(ReactionDataset):
    """ReactionDataset featurized through the C++ CGR batch featurizer (the
    reference's ``CuikmolmakerReactionDataset``, ``data/datasets.py:722``)."""

    keep_h: bool = False

    def __post_init__(self):
        super().__post_init__()
        if not self.populate_cache_native(keep_h=self.keep_h):
            self.cache = True
