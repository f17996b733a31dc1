"""CSV -> datapoints parsing for the CLI (cf. reference
``chemprop/cli/utils/parsing.py:38-618``): column inference, bounded-target
parsing ("<x"/">x"), molecule/reaction/multicomponent datapoint factories,
and dataset construction."""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd

from chemprop_tpu.data.datapoints import MoleculeDatapoint, ReactionDatapoint
from chemprop_tpu.data.datasets import MoleculeDataset, MulticomponentDataset, ReactionDataset
from chemprop_tpu.featurizers.atom import get_multi_hot_atom_featurizer
from chemprop_tpu.featurizers.bond import MultiHotBondFeaturizer, RIGRBondFeaturizer
from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer
from chemprop_tpu.featurizers.molgraph.reaction import CondensedGraphOfReactionFeaturizer

logger = logging.getLogger(__name__)


def parse_csv(
    path: str | Path,
    smiles_cols: list[str] | None,
    rxn_cols: list[str] | None,
    target_cols: list[str] | None,
    ignore_cols: list[str] | None = None,
    weight_col: str | None = None,
    bounded: bool = False,
    splits_col: str | None = None,
    no_header_row: bool = False,
):
    """Returns (smis_per_col: dict, rxns_per_col: dict, Y, weights, lt_mask,
    gt_mask, splits, input_cols, target_cols)."""
    df = pd.read_csv(path, header=None if no_header_row else 0, keep_default_na=False)
    if no_header_row:
        df.columns = [str(i) for i in range(df.shape[1])]
        smiles_cols = smiles_cols or [df.columns[0]]

    if smiles_cols is None and rxn_cols is None:
        smiles_cols = [df.columns[0]]
    smiles_cols = smiles_cols or []
    rxn_cols = rxn_cols or []

    input_cols = list(smiles_cols) + list(rxn_cols)
    reserved = set(input_cols) | set(ignore_cols or []) | {weight_col, splits_col} - {None}
    if target_cols is None:
        target_cols = [c for c in df.columns if c not in reserved]

    smis = {c: df[c].astype(str).tolist() for c in smiles_cols}
    rxns = {c: df[c].astype(str).tolist() for c in rxn_cols}

    raw = df[target_cols].astype(str).to_numpy()
    Y = np.empty(raw.shape, dtype=np.float64)
    lt = np.zeros(raw.shape, dtype=bool)
    gt = np.zeros(raw.shape, dtype=bool)
    for i in range(raw.shape[0]):
        for j in range(raw.shape[1]):
            v = raw[i, j].strip()
            if v in ("", "nan", "None", "NaN"):
                Y[i, j] = np.nan
                continue
            if bounded and v[0] in "<>":
                op = v[0]
                if op == "<":
                    lt[i, j] = True
                else:
                    gt[i, j] = True
                v = v.lstrip("<>=")
            Y[i, j] = float(v)

    weights = (
        df[weight_col].astype(float).to_numpy() if weight_col else np.ones(len(df))
    )
    splits = df[splits_col].astype(str).str.lower().tolist() if splits_col else None

    return smis, rxns, Y, weights, (lt if bounded else None), (gt if bounded else None), splits, input_cols, list(target_cols)


def parse_indexed_paths(value) -> dict[int, Path] | None:
    """``--atom-features-path [IDX PATH ...]`` or a bare ``PATH`` (component
    0) -> ``{component_index: path}`` — the reference's per-component
    extra-feature syntax (``chemprop/cli/common.py:194-231``)."""
    if value is None:
        return None
    if isinstance(value, (str, Path)):
        return {0: Path(value)}
    items = [str(v) for v in value]
    if len(items) == 1:
        return {0: Path(items[0])}
    if len(items) % 2 != 0:
        raise ValueError(
            f"expected a single path or (index, path) pairs, got {items}"
        )
    try:
        inds = [int(x) for x in items[::2]]
    except ValueError:
        raise ValueError(
            f"expected a single path or (index, path) pairs, got {items}"
        ) from None
    if len(set(inds)) != len(inds):
        raise ValueError(f"duplicate component index in {items}")
    return {i: Path(pth) for i, pth in zip(inds, items[1::2])}


def load_component_feats(value, n: int) -> dict[int, list] | None:
    """Per-component extra features: ``{component_index: per-row arrays}``."""
    paths = parse_indexed_paths(value)
    if paths is None:
        return None
    return {k: load_input_feats(pth, n) for k, pth in paths.items()}


def load_input_feats(path: str | Path | None, n: int):
    """Load per-datapoint extra features from .npz/.npy (cf. reference
    ``parsing.py:513-549``)."""
    if path is None:
        return None
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as f:
            arrays = [f[k] for k in f.files]
        if len(arrays) == 1 and arrays[0].ndim == 2 and len(arrays[0]) == n:
            return [np.asarray(a, dtype=np.float64) for a in arrays[0]]
        if len(arrays) != n:
            raise ValueError(f"{path} holds {len(arrays)} arrays for {n} datapoints")
        return [np.asarray(a, dtype=np.float64) for a in arrays]
    X = np.load(path)
    if len(X) != n:
        raise ValueError(f"{path} holds {len(X)} rows for {n} datapoints")
    return [np.asarray(x, dtype=np.float64) for x in X]


def make_datapoints(
    smis: dict[str, list[str]],
    rxns: dict[str, list[str]],
    Y: np.ndarray,
    weights: np.ndarray,
    lt_mask: np.ndarray | None,
    gt_mask: np.ndarray | None,
    keep_h: bool = False,
    add_h: bool = False,
    ignore_stereo: bool = False,
    molecule_featurizers: list | None = None,
    X_d: list | None = None,
    V_fs: list | None = None,
    E_fs: list | None = None,
    V_ds: list | None = None,
) -> list[list]:
    """One datapoint list per input column (multicomponent layout).

    ``V_fs``/``E_fs``/``V_ds`` may be plain per-row lists (applied to
    component 0 — backward compatible) or ``{component_index: per-row
    lists}`` dicts (the reference's indexed extra-feature semantics)."""

    def by_comp(v):
        if v is None or isinstance(v, dict):
            return v or {}
        return {0: v}

    V_fs, E_fs, V_ds = by_comp(V_fs), by_comp(E_fs), by_comp(V_ds)
    n = len(Y)
    components: list[list] = []
    first = True
    comp_idx = 0
    for col, col_smis in smis.items():
        dps = []
        for i, smi in enumerate(col_smis):
            x_d = None
            if first:
                x_d = X_d[i] if X_d is not None else None
                if molecule_featurizers:
                    from chemprop_tpu.chem import make_mol

                    mol = make_mol(smi, keep_h, add_h, ignore_stereo)
                    fps = [mf(mol) for mf in molecule_featurizers]
                    fp = np.concatenate(fps)
                    x_d = fp if x_d is None else np.concatenate([x_d, fp])
            dps.append(
                MoleculeDatapoint.from_smi(
                    smi,
                    keep_h=keep_h,
                    add_h=add_h,
                    ignore_stereo=ignore_stereo,
                    y=Y[i],
                    weight=float(weights[i]),
                    lt_mask=lt_mask[i] if lt_mask is not None else None,
                    gt_mask=gt_mask[i] if gt_mask is not None else None,
                    x_d=x_d,
                    V_f=V_fs[comp_idx][i] if comp_idx in V_fs else None,
                    E_f=E_fs[comp_idx][i] if comp_idx in E_fs else None,
                    V_d=V_ds[comp_idx][i] if comp_idx in V_ds else None,
                )
            )
        components.append(dps)
        first = False
        comp_idx += 1
    for col, col_rxns in rxns.items():
        if comp_idx in V_fs or comp_idx in E_fs or comp_idx in V_ds:
            raise NotImplementedError(
                f"extra atom/bond features for REACTION component {comp_idx} "
                "are not supported (molecule components only)"
            )
        dps = []
        for i, rxn in enumerate(col_rxns):
            dps.append(
                ReactionDatapoint.from_smi(
                    rxn,
                    keep_h=keep_h,
                    add_h=add_h,
                    ignore_stereo=ignore_stereo,
                    y=Y[i],
                    weight=float(weights[i]),
                    lt_mask=lt_mask[i] if lt_mask is not None else None,
                    gt_mask=gt_mask[i] if gt_mask is not None else None,
                )
            )
        components.append(dps)
        comp_idx += 1
        first = False
    return components


def make_dataset(
    data: list,
    multi_hot_atom_featurizer_mode: str = "v2",
    rxn_mode: str = "reac_diff",
):
    """Datapoint list -> the right dataset type (cf. reference
    ``parsing.py:552-618``)."""
    atom_featurizer = get_multi_hot_atom_featurizer(multi_hot_atom_featurizer_mode)
    bond_featurizer = (
        RIGRBondFeaturizer()
        if multi_hot_atom_featurizer_mode.lower() == "rigr"
        else MultiHotBondFeaturizer()
    )
    if data and isinstance(data[0], ReactionDatapoint):
        featurizer = CondensedGraphOfReactionFeaturizer(
            atom_featurizer=atom_featurizer, bond_featurizer=bond_featurizer, mode_=rxn_mode
        )
        return ReactionDataset(data, featurizer)
    extra_atom_fdim = data[0].V_f.shape[1] if data and data[0].V_f is not None else 0
    extra_bond_fdim = data[0].E_f.shape[1] if data and data[0].E_f is not None else 0
    featurizer = SimpleMoleculeMolGraphFeaturizer(
        atom_featurizer=atom_featurizer,
        bond_featurizer=bond_featurizer,
        extra_atom_fdim=extra_atom_fdim,
        extra_bond_fdim=extra_bond_fdim,
    )
    return MoleculeDataset(data, featurizer)


def build_datasets(components: list[list], **kwargs):
    """list-of-component datapoint lists -> dataset (multicomponent if >1)."""
    if len(components) == 1:
        return make_dataset(components[0], **kwargs)
    return MulticomponentDataset([make_dataset(c, **kwargs) for c in components])
