"""Reference-named parsing entry points (cf. reference
``cli/utils/parsing.py:98,451,552,621,635`` and ``MAB_parsing.py:14``),
delegating to :mod:`chemprop_tpu.cli.parsing` / :mod:`chemprop_tpu.cli.mab`.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd

from chemprop_tpu.cli.parsing import (  # noqa: F401 (re-exports)
    build_datasets,
    load_input_feats,
    make_datapoints,
    make_dataset,
    parse_csv,
)

__all__ = [
    "build_data_from_files",
    "build_MAB_data_from_files",
    "get_column_names",
    "make_datapoints",
    "make_dataset",
    "parse_activation",
    "parse_indices",
]


def get_column_names(
    path,
    smiles_cols=None,
    rxn_cols=None,
    target_cols=None,
    ignore_cols=None,
    splits_col=None,
    weight_col=None,
    no_header_row: bool = False,
) -> tuple[list[str], list[str]]:
    """Infer (input_cols, target_cols) from a CSV header (reference
    ``parsing.py:98-128``): inputs default to the first column; targets are
    everything not reserved by another role."""
    df_cols = pd.read_csv(path, index_col=False, nrows=0).columns.tolist()
    if no_header_row:
        return ["SMILES"], [f"pred_{i}" for i in range(len(df_cols) - 1)]

    input_cols = list(smiles_cols or []) + list(rxn_cols or [])
    if not input_cols:
        input_cols = [df_cols[0]]
    if target_cols is None:
        reserved = set(input_cols) | set(ignore_cols or []) | {splits_col, weight_col}
        target_cols = [c for c in df_cols if c not in reserved]
    return input_cols, list(target_cols)


def build_data_from_files(
    p_data,
    no_header_row: bool = False,
    smiles_cols=None,
    rxn_cols=None,
    target_cols=None,
    ignore_cols=None,
    splits_col=None,
    weight_col=None,
    bounded: bool = False,
    p_descriptors=None,
    p_atom_feats=None,
    p_bond_feats=None,
    p_atom_descs=None,
    **featurization_kwargs,
):
    """CSV + optional .npz side files -> per-component datapoint lists
    (reference ``parsing.py:451-549``). ``p_atom_feats``/``p_bond_feats``/
    ``p_atom_descs`` accept either a path (applied to component 0, the
    reference's single-molecule case) or a ``{component_index: path}`` dict."""
    smis, rxns, Y, weights, lt, gt, _, _, _ = parse_csv(
        p_data,
        list(smiles_cols) if smiles_cols else None,
        list(rxn_cols) if rxn_cols else None,
        list(target_cols) if target_cols else None,
        ignore_cols,
        weight_col,
        bounded,
        splits_col,
        no_header_row,
    )
    n = len(Y)

    def first_path(p):
        if p is None:
            return None
        if isinstance(p, dict):
            return p.get(0)
        return p

    X_d = load_input_feats(first_path(p_descriptors), n)
    V_fs = load_input_feats(first_path(p_atom_feats), n)
    E_fs = load_input_feats(first_path(p_bond_feats), n)
    V_ds = load_input_feats(first_path(p_atom_descs), n)
    return make_datapoints(
        smis,
        rxns,
        Y,
        weights,
        lt,
        gt,
        X_d=X_d,
        V_fs=V_fs,
        E_fs=E_fs,
        V_ds=V_ds,
        **featurization_kwargs,
    )


def build_MAB_data_from_files(
    p_data,
    smiles_cols=None,
    target_cols=None,
    atom_target_cols=None,
    bond_target_cols=None,
    weight_col=None,
    p_constraints=None,
    constraints_cols_to_target_cols=None,
    p_descriptors=None,
    p_atom_feats=None,
    p_bond_feats=None,
    p_atom_descs=None,
    p_bond_descs=None,
    keep_h: bool = False,
    add_h: bool = False,
    ignore_stereo: bool = False,
    reorder_atoms: bool = False,
    **_ignored,
):
    """CSV with per-atom/bond list-literal targets -> ``MolAtomBondDatapoint``
    list (reference ``MAB_parsing.py:14-260``)."""
    from chemprop_tpu.cli.mab import build_MAB_datapoints

    def first_path(p):
        if isinstance(p, dict):
            return p.get(0)
        return p

    args = argparse.Namespace(
        data_path=Path(p_data),
        smiles_columns=list(smiles_cols) if smiles_cols else None,
        target_columns=list(target_cols) if target_cols else None,
        atom_target_columns=list(atom_target_cols) if atom_target_cols else None,
        bond_target_columns=list(bond_target_cols) if bond_target_cols else None,
        weight_column=weight_col,
        constraints_path=p_constraints,
        constraints_to_targets=constraints_cols_to_target_cols,
        descriptors_path=first_path(p_descriptors),
        atom_features_path=first_path(p_atom_feats),
        bond_features_path=first_path(p_bond_feats),
        atom_descriptors_path=first_path(p_atom_descs),
        bond_descriptors_path=first_path(p_bond_descs),
        keep_h=keep_h,
        add_h=add_h,
        ignore_stereo=ignore_stereo,
        reorder_atoms=reorder_atoms,
    )
    dps, *_ = build_MAB_datapoints(args)
    return dps


def parse_indices(idxs) -> list[int]:
    """``"0,1,2-4"`` -> ``[0, 1, 2, 3, 4]`` (reference ``parsing.py:621``)."""
    if not isinstance(idxs, str):
        return idxs
    out: list[int] = []
    for part in idxs.split(","):
        if "-" in part:
            lo, hi = map(int, part.split("-"))
            out.extend(range(lo, hi + 1))
        else:
            out.append(int(part))
    return out


def parse_activation(cls, arguments=None):
    """Instantiate an activation from a class + mixed positional/keyword
    argument list as produced by :func:`activation_function_argument`
    (reference ``parsing.py:635``)."""
    posargs, kwargs = [], {}
    for item in arguments or ():
        if isinstance(item, dict):
            kwargs.update(item)
        else:
            posargs.append(item)
    return cls(*posargs, **kwargs)
