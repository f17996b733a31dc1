"""Mol/Atom/Bond CLI paths (cf. reference ``chemprop/cli/utils/
MAB_parsing.py:14-260`` + the MAB branches of ``cli/train.py`` and
``cli/predict.py``): per-atom/bond targets are list literals in CSV cells;
optional per-molecule sum constraints come from a parallel CSV whose columns
are named ``<target>_constraint``."""

from __future__ import annotations

import ast
import json
import logging
from pathlib import Path

import numpy as np
import pandas as pd

from chemprop_tpu.data import DataLoader, MolAtomBondDatapoint
from chemprop_tpu.data.datasets import MolAtomBondDataset
from chemprop_tpu.models.mol_atom_bond import MolAtomBondMPNN
from chemprop_tpu.models.serialize import save_model
from chemprop_tpu.nn import AggregationRegistry, PredictorRegistry
from chemprop_tpu.nn.ffn import ConstrainerFFN
from chemprop_tpu.nn.message_passing.mol_atom_bond import (
    MABAtomMessagePassing,
    MABBondMessagePassing,
)
from chemprop_tpu.nn.transforms import UnscaleTransform
from chemprop_tpu.train.mab_trainer import MABTrainer
from chemprop_tpu.utils.registry import Factory

logger = logging.getLogger(__name__)


def _comp0_feats(arg, n: int):
    """MAB inputs are single-component: component-0 slice of the (possibly
    indexed-pair) extra-feature argument (cf. cli/parsing.py helpers)."""
    from chemprop_tpu.cli.parsing import load_component_feats

    d = load_component_feats(arg, n)
    return d.get(0) if d else None


def _num(x) -> float:
    """Element of a target-list cell -> float (None/'' -> NaN; strips any
    ``<``/``>`` bound marker)."""
    if x is None:
        return float("nan")
    s = str(x).strip().lstrip("<>=")
    return float("nan") if s in ("", "nan", "None", "NaN") else float(s)


def _parse_list_cell(v) -> list[float]:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return []
    out = ast.literal_eval(str(v))
    out = list(out) if isinstance(out, (list, tuple)) else [out]
    return [_num(x) for x in out]


def _parse_bounded_list_cell(v) -> tuple[list[float], list[bool], list[bool]]:
    """List cell whose elements may carry ``<``/``>`` bound markers
    (reference bounded-target parsing, ``cli/utils/parsing.py:85-93``)."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return [], [], []
    out = ast.literal_eval(str(v))
    out = list(out) if isinstance(out, (list, tuple)) else [out]
    vals, lt, gt = [], [], []
    for x in out:
        s = "" if x is None else str(x).strip()
        lt.append(s.startswith("<"))
        gt.append(s.startswith(">"))
        vals.append(_num(x))
    return vals, lt, gt


def _parse_bounded_scalar(v) -> tuple[float, bool, bool]:
    s = str(v).strip()
    if s in ("", "nan", "None", "NaN"):
        return float("nan"), False, False
    lt, gt = s.startswith("<"), s.startswith(">")
    return float(s.lstrip("<>=")), lt, gt


def build_MAB_datapoints(args) -> tuple[list[MolAtomBondDatapoint], list[str], list[str], list[str]]:
    """CSV (+ optional constraints CSV) -> MolAtomBondDatapoints; returns
    (datapoints, mol_cols, atom_cols, bond_cols)."""
    df = pd.read_csv(args.data_path)
    smiles_col = (args.smiles_columns or [df.columns[0]])[0]
    mol_cols = list(args.target_columns or [])
    atom_cols = list(args.atom_target_columns or [])
    bond_cols = list(args.bond_target_columns or [])

    atom_con_df = bond_con_df = None
    if args.constraints_path is not None:
        con_df = pd.read_csv(args.constraints_path)
        c2t = getattr(args, "constraints_to_targets", None)
        if c2t:
            # k-th constraints-CSV column constrains the k-th named target
            # (reference --constraints-to-targets, common.py:173-177)
            col_for = {t: con_df.iloc[:, k] for k, t in enumerate(c2t)}
        else:
            col_for = {
                c[: -len("_constraint")]: con_df[c]
                for c in con_df.columns
                if c.endswith("_constraint")
            }
        atom_con_df = {c: col_for.get(c) for c in atom_cols}
        bond_con_df = {c: col_for.get(c) for c in bond_cols}

    from chemprop_tpu.cli.parsing import load_input_feats

    n = len(df)
    X_d = load_input_feats(getattr(args, "descriptors_path", None), n)
    V_fs = _comp0_feats(getattr(args, "atom_features_path", None), n)
    E_fs = _comp0_feats(getattr(args, "bond_features_path", None), n)
    V_ds = _comp0_feats(getattr(args, "atom_descriptors_path", None), n)
    E_ds = _comp0_feats(getattr(args, "bond_descriptors_path", None), n)

    bounded = args.loss_function is not None and "bounded" in args.loss_function

    dps = []
    for i, row in df.iterrows():
        smi = row[smiles_col]
        mol_y = lt_mask = gt_mask = None
        if mol_cols:
            if bounded:
                parsed = [_parse_bounded_scalar(row[c]) for c in mol_cols]
                mol_y = np.array([p[0] for p in parsed], dtype=np.float64)
                lt_mask = np.array([p[1] for p in parsed], dtype=bool)
                gt_mask = np.array([p[2] for p in parsed], dtype=bool)
            else:
                mol_y = np.array([float(row[c]) for c in mol_cols], dtype=np.float64)
        atom_y = bond_y = None
        atom_lt = atom_gt = bond_lt = bond_gt = None
        if atom_cols:
            if bounded:
                parsed = [_parse_bounded_list_cell(row[c]) for c in atom_cols]
                atom_y = np.array(
                    list(zip(*(p[0] for p in parsed))), dtype=np.float64
                ).reshape(-1, len(atom_cols))
                atom_lt = np.array(list(zip(*(p[1] for p in parsed))), dtype=bool).reshape(
                    -1, len(atom_cols)
                )
                atom_gt = np.array(list(zip(*(p[2] for p in parsed))), dtype=bool).reshape(
                    -1, len(atom_cols)
                )
            else:
                per_col = [_parse_list_cell(row[c]) for c in atom_cols]
                atom_y = np.array(list(zip(*per_col)), dtype=np.float64).reshape(
                    -1, len(atom_cols)
                )
        if bond_cols:
            if bounded:
                parsed = [_parse_bounded_list_cell(row[c]) for c in bond_cols]
                bond_y = np.array(
                    list(zip(*(p[0] for p in parsed))), dtype=np.float64
                ).reshape(-1, len(bond_cols))
                bond_lt = np.array(list(zip(*(p[1] for p in parsed))), dtype=bool).reshape(
                    -1, len(bond_cols)
                )
                bond_gt = np.array(list(zip(*(p[2] for p in parsed))), dtype=bool).reshape(
                    -1, len(bond_cols)
                )
            else:
                per_col = [_parse_list_cell(row[c]) for c in bond_cols]
                bond_y = np.array(list(zip(*per_col)), dtype=np.float64).reshape(
                    -1, len(bond_cols)
                )

        atom_c = bond_c = None
        if atom_con_df is not None and any(v is not None for v in atom_con_df.values()):
            atom_c = np.array(
                [np.nan if atom_con_df[c] is None else float(atom_con_df[c][i]) for c in atom_cols]
            )
        if bond_con_df is not None and any(v is not None for v in bond_con_df.values()):
            bond_c = np.array(
                [np.nan if bond_con_df[c] is None else float(bond_con_df[c][i]) for c in bond_cols]
            )

        # atom-mapped SMILES give targets in map order: reorder atoms to match
        reorder = getattr(args, "reorder_atoms", False) or (
            ":" in smi and any(ch.isdigit() for ch in smi.split(":")[-1][:3])
        )
        weight = float(row[args.weight_column]) if args.weight_column else 1.0
        dps.append(
            MolAtomBondDatapoint.from_smi(
                smi,
                keep_h=args.keep_h,
                add_h=args.add_h,
                ignore_stereo=args.ignore_stereo,
                reorder_atoms=reorder,
                y=mol_y,
                atom_y=atom_y,
                bond_y=bond_y,
                lt_mask=lt_mask,
                gt_mask=gt_mask,
                atom_lt_mask=atom_lt,
                atom_gt_mask=atom_gt,
                bond_lt_mask=bond_lt,
                bond_gt_mask=bond_gt,
                atom_constraints=atom_c,
                bond_constraints=bond_c,
                weight=weight,
                x_d=X_d[i] if X_d is not None else None,
                V_f=V_fs[i] if V_fs is not None else None,
                E_f=E_fs[i] if E_fs is not None else None,
                V_d=V_ds[i] if V_ds is not None else None,
                E_d=E_ds[i] if E_ds is not None else None,
            )
        )
    return dps, mol_cols, atom_cols, bond_cols


def normalize_MAB_inputs(train_dset, val_dset, args):
    """Fit input scalers on train, apply to train+val; returns
    (X_d_t, V_d_t, E_d_t, graph_t) eval-time transforms."""
    from chemprop_tpu.nn.transforms import GraphTransform, ScaleTransform

    transforms = {}
    specs = [
        ("X_d", "d_xd", "no_descriptor_scaling"),
        ("V_d", "d_vd", "no_atom_descriptor_scaling"),
        ("E_d", "d_ed", "no_bond_descriptor_scaling"),
        ("V_f", "d_vf", "no_atom_feature_scaling"),
        ("E_f", "d_ef", "no_bond_feature_scaling"),
    ]
    for key, dim_attr, toggle in specs:
        if getattr(train_dset, dim_attr, 0) <= 0 or getattr(args, toggle, False):
            continue
        scaler = train_dset.normalize_inputs(key)
        if scaler is None:
            continue
        if val_dset is not None:
            val_dset.normalize_inputs(key, scaler)
        if key == "V_f":
            pad = train_dset.featurizer.atom_fdim - train_dset.d_vf
        elif key == "E_f":
            pad = train_dset.featurizer.bond_fdim - train_dset.d_ef
        else:
            pad = 0
        transforms[key] = ScaleTransform.from_standard_scaler(scaler, pad=pad)
    graph_t = None
    if "V_f" in transforms or "E_f" in transforms:
        graph_t = GraphTransform(transforms.get("V_f"), transforms.get("E_f"))
    return transforms.get("X_d"), transforms.get("V_d"), transforms.get("E_d"), graph_t


def build_MAB_model(args, train_dset, output_transforms, input_transforms=(None,) * 4):
    mol_t, atom_t, bond_t = output_transforms
    X_d_t, V_d_t, E_d_t, graph_t = input_transforms
    mp_cls = MABAtomMessagePassing if args.atom_messages else MABBondMessagePassing
    d_h = args.message_hidden_dim
    n_mol = len(args.target_columns or [])
    n_atom = len(args.atom_target_columns or [])
    n_bond = len(args.bond_target_columns or [])
    data = train_dset.data
    d_vd = data[0].V_d.shape[1] if data and data[0].V_d is not None else None
    d_ed = data[0].E_d.shape[1] if data and data[0].E_d is not None else None
    message_passing = mp_cls(
        d_h=d_h,
        bias=args.message_bias,
        depth=args.depth,
        dropout=args.dropout,
        activation=args.activation,
        undirected=args.undirected,
        d_vd=d_vd,
        d_ed=d_ed,
        V_d_transform=V_d_t,
        E_d_transform=E_d_t,
        graph_transform=graph_t,
        return_vertex_embeddings=bool(n_mol or n_atom),
        return_edge_embeddings=bool(n_bond),
    )
    vertex_dim = d_h + (d_vd or 0)
    edge_dim = d_h + (d_ed or 0)
    d_xd = data[0].x_d.shape[0] if data and data[0].x_d is not None else 0
    agg = (
        Factory.build(
            AggregationRegistry[args.aggregation],
            norm=args.aggregation_norm,
            output_size=vertex_dim,
        )
        if n_mol
        else None
    )

    def head(kind, n_tasks, input_dim, transform):
        """Per-head FFN config: --atom-ffn-*/--bond-ffn-* override the shared
        --ffn-* values (reference cli/train.py:327-371)."""
        if not n_tasks:
            return None
        hidden = getattr(args, f"{kind}_ffn_hidden_dim", None)
        n_layers = getattr(args, f"{kind}_ffn_num_layers", None)
        weights = getattr(args, f"{kind}_task_weights", None)
        n_classes = getattr(args, f"{kind}_multiclass_num_classes", None)
        criterion = None
        if getattr(args, "loss_function", None) is not None:
            # --loss-function overrides each head's default criterion (e.g.
            # bounded-mse with the per-head lt/gt masks; reference MAB
            # bounded training, tests/cli/test_cli_MAB.py:576-607)
            from chemprop_tpu.nn.metrics import LossFunctionRegistry

            criterion = Factory.build(
                LossFunctionRegistry[args.loss_function],
                task_weights=(weights if weights is not None else args.task_weights) or 1.0,
                v_kl=args.v_kl,
                eps=getattr(args, "eps", 1e-8),
                alpha=getattr(args, "alpha", 0.1),
                threshold=args.threshold,
                n_classes=n_classes if n_classes is not None else args.multiclass_num_classes,
            )
        return Factory.build(
            PredictorRegistry[args.task_type],
            criterion=criterion,
            input_dim=input_dim,
            n_tasks=n_tasks,
            hidden_dim=hidden if hidden is not None else args.ffn_hidden_dim,
            n_layers=n_layers if n_layers is not None else args.ffn_num_layers,
            dropout=args.dropout,
            activation=args.activation,
            task_weights=weights if weights is not None else args.task_weights,
            threshold=args.threshold,
            n_classes=n_classes if n_classes is not None else args.multiclass_num_classes,
            output_transform=transform,
        )

    def constrainer(kind, n_constraints, fp_dim):
        hidden = getattr(args, f"{kind}_constrainer_ffn_hidden_dim", None)
        n_layers = getattr(args, f"{kind}_constrainer_ffn_num_layers", None)
        return ConstrainerFFN(
            n_constraints=n_constraints,
            fp_dim=fp_dim,
            hidden_dim=hidden if hidden is not None else args.ffn_hidden_dim,
            n_layers=n_layers if n_layers is not None else 1,
        )

    has_atom_c = any(d.atom_constraints is not None for d in data)
    has_bond_c = any(d.bond_constraints is not None for d in data)
    return MolAtomBondMPNN(
        message_passing=message_passing,
        agg=agg,
        mol_predictor=head("mol", n_mol, vertex_dim + d_xd, mol_t),
        atom_predictor=head("atom", n_atom, vertex_dim, atom_t),
        bond_predictor=head("bond", n_bond, 2 * edge_dim, bond_t),
        atom_constrainer=constrainer("atom", n_atom, vertex_dim) if has_atom_c else None,
        bond_constrainer=constrainer("bond", n_bond, 2 * edge_dim) if has_bond_c else None,
        batch_norm=args.batch_norm,
        X_d_transform=X_d_t,
    )


def main_MAB(args) -> int:
    from chemprop_tpu.cli.train import build_splits

    out_dir = args.output_dir or Path(f"chemprop_tpu_training/{args.data_path.stem}")
    out_dir.mkdir(parents=True, exist_ok=True)
    dps, mol_cols, atom_cols, bond_cols = build_MAB_datapoints(args)

    trains, vals, tests = build_splits(args, [dps])
    with open(out_dir / "splits.json", "w") as f:
        json.dump(
            [
                {"train": list(map(int, t)), "val": list(map(int, v)), "test": list(map(int, s))}
                for t, v, s in zip(trains, vals, tests)
            ],
            f,
        )

    all_scores = []
    for rep, (tr_i, va_i, te_i) in enumerate(zip(trains, vals, tests)):
        train_dset = MolAtomBondDataset([dps[i] for i in tr_i])
        val_dset = MolAtomBondDataset([dps[i] for i in va_i]) if len(va_i) else None
        test_dset = MolAtomBondDataset([dps[i] for i in te_i]) if len(te_i) else None

        input_transforms = normalize_MAB_inputs(train_dset, val_dset, args)

        transforms = [None, None, None]
        if args.task_type.startswith("regression"):
            for k, (kind, cols) in enumerate(
                zip(("mol", "atom", "bond"), (mol_cols, atom_cols, bond_cols))
            ):
                if not cols:
                    continue
                scaler = train_dset.normalize_targets(kind)
                if scaler is not None:
                    if val_dset is not None:
                        val_dset.normalize_targets(kind, scaler)
                    transforms[k] = UnscaleTransform.from_standard_scaler(scaler)
        if not args.no_cache:
            train_dset.cache = True
            if val_dset is not None:
                val_dset.cache = True

        train_loader = DataLoader(
            train_dset, batch_size=args.batch_size, shuffle=True, seed=args.data_seed
        )
        val_loader = (
            DataLoader(val_dset, batch_size=args.batch_size) if val_dset is not None else None
        )

        rep_dir = out_dir / (f"replicate_{rep}" if len(trains) > 1 else ".")
        for member in range(args.ensemble_size):
            model_dir = rep_dir / (f"model_{member}" if args.ensemble_size > 1 else ".")
            model_dir.mkdir(parents=True, exist_ok=True)
            model = build_MAB_model(args, train_dset, transforms, input_transforms)
            monitor, mode, val_metrics = "val_loss", "min", {}
            tracking = getattr(args, "tracking_metric", "val_loss") or "val_loss"
            if tracking != "val_loss":
                base, _, head = tracking.rpartition("-")
                if tracking.startswith("val_loss-") and head in ("mol", "atom", "bond"):
                    monitor = f"val_loss-{head}"
                elif base and head in ("mol", "atom", "bond"):
                    from chemprop_tpu.nn.metrics import MetricRegistry
                    from chemprop_tpu.utils.registry import Factory

                    tm = Factory.build(
                        MetricRegistry[base],
                        n_classes=args.multiclass_num_classes,
                        assume_logits=False,
                    )
                    val_metrics[tracking] = tm
                    monitor = f"val_{tracking}"
                    mode = "max" if tm.higher_is_better else "min"
                else:
                    raise ValueError(
                        f"MAB tracking metric {tracking!r} must be 'val_loss' or "
                        "suffixed with -mol/-atom/-bond (e.g. 'rmse-atom')"
                    )
            trainer = MABTrainer(
                model,
                monitor=monitor,
                mode=mode,
                val_metrics=val_metrics,
                min_delta=getattr(args, "min_delta", 0.0),
                max_epochs=args.epochs,
                warmup_epochs=args.warmup_epochs,
                init_lr=args.init_lr,
                max_lr=args.max_lr,
                final_lr=args.final_lr,
                grad_clip=args.grad_clip,
                patience=args.patience,
                checkpoint_dir=model_dir / "checkpoints",
                seed=args.seed + member,
                log_every=1,
            )
            trainer.fit(train_loader, val_loader)
            save_model(
                model_dir / "best.ckpt",
                model,
                trainer.best_variables,
                output_columns=mol_cols + atom_cols + bond_cols,
            )
            with open(model_dir / "history.json", "w") as f:
                json.dump(trainer.history, f, indent=2)

            if test_dset is not None and len(test_dset):
                test_loader = DataLoader(test_dset, batch_size=args.batch_size)
                preds = trainer.predict(test_loader)
                scores = _score_MAB(preds, test_dset, mol_cols, atom_cols, bond_cols)
                all_scores.append(scores)
                logger.info(f"replicate {rep} model {member} test scores: {scores}")
                write_MAB_preds(
                    model_dir / "test_predictions.csv",
                    test_dset,
                    preds,
                    mol_cols,
                    atom_cols,
                    bond_cols,
                )

    if all_scores:
        with open(out_dir / "test_scores.json", "w") as f:
            json.dump(all_scores, f, indent=2)
        print(json.dumps(all_scores[-1]))
    return 0


def _rmse(preds, targets):
    mask = np.isfinite(targets)
    if not mask.any():
        return float("nan")
    return float(np.sqrt(np.mean((preds[mask] - targets[mask]) ** 2)))


def _score_MAB(preds, dset, mol_cols, atom_cols, bond_cols) -> dict:
    mol_p, atom_p, bond_p = preds
    scores = {}
    if mol_p is not None and mol_cols:
        Y = np.array([d.y for d in dset.data], dtype=float)
        scores["mol_rmse"] = _rmse(_point(mol_p), Y)
    if atom_p is not None and atom_cols:
        Y = np.concatenate([d.atom_y for d in dset.data], axis=0)
        scores["atom_rmse"] = _rmse(_point(atom_p), Y)
    if bond_p is not None and bond_cols:
        Y = np.concatenate([d.bond_y for d in dset.data], axis=0)
        scores["bond_rmse"] = _rmse(_point(bond_p), Y)
    return scores


def _point(p):
    return p[..., 0] if p.ndim == 3 else p


def write_MAB_preds(path, dset, preds, mol_cols, atom_cols, bond_cols, uncs=None) -> None:
    """Predictions CSV: scalar mol columns + list-literal atom/bond columns
    (one list per molecule, in canonical atom/bond order). ``uncs`` is an
    optional (mol, atom, bond) uncertainty triple written as ``<col>_unc``."""
    mol_p, atom_p, bond_p = preds
    mol_u, atom_u, bond_u = uncs if uncs is not None else (None, None, None)
    rows: dict[str, list] = {"smiles": [d.name for d in dset.data]}
    n_atoms = [d.mol.num_atoms for d in dset.data]
    n_bonds = [d.mol.num_bonds for d in dset.data]

    def put_mol(P, cols, suffix=""):
        for j, c in enumerate(cols or [f"mol_{j}" for j in range(P.shape[1])]):
            rows[c + suffix] = P[:, j].tolist()

    def put_lists(P, cols, counts, prefix, suffix=""):
        offs = np.cumsum([0] + counts)
        for j, c in enumerate(cols or [f"{prefix}_{j}" for j in range(P.shape[1])]):
            rows[c + suffix] = [
                str([round(float(v), 6) for v in P[offs[i] : offs[i + 1], j]])
                for i in range(len(dset.data))
            ]

    if mol_p is not None:
        put_mol(_point(mol_p), mol_cols)
    if atom_p is not None:
        put_lists(_point(atom_p), atom_cols, n_atoms, "atom")
    if bond_p is not None:
        put_lists(_point(bond_p), bond_cols, n_bonds, "bond")
    if mol_u is not None:
        put_mol(np.asarray(mol_u), mol_cols, "_unc")
    if atom_u is not None:
        put_lists(np.asarray(atom_u), atom_cols, n_atoms, "atom", "_unc")
    if bond_u is not None:
        put_lists(np.asarray(bond_u), bond_cols, n_bonds, "bond", "_unc")
    pd.DataFrame(rows).to_csv(path, index=False)


def _mab_uncertainty(args, stacks):
    """Per-head uncertainties from per-model stacks ``[m, n, ...]`` (cf. the
    reference MAB estimator paths, ``uncertainty/estimator.py``: each
    estimator handles the (mol, atom, bond) triple head-by-head)."""
    method = getattr(args, "uncertainty_method", "none")
    if method in ("none", "dropout"):  # dropout uncs are computed inline
        return None
    from chemprop_tpu.uncertainty import UncertaintyEstimatorRegistry

    estimator = UncertaintyEstimatorRegistry[method]()
    return tuple(None if st is None else estimator(st) for st in stacks)


def _mab_output_columns(model, extra) -> tuple[list | None, list | None, list | None]:
    """Per-head output column names. Reference checkpoints store the triple
    ``(mol_cols, atom_cols, bond_cols)`` (``chemprop/models/utils.py:14-16``);
    in-repo training saves a flat list sliced by head task counts."""
    cols = extra.get("output_columns") or []
    if (
        isinstance(cols, (list, tuple))
        and len(cols) == 3
        and all(c is None or isinstance(c, (list, tuple)) for c in cols)
        and any(isinstance(c, (list, tuple)) for c in cols)
    ):
        return tuple(list(c) if c else None for c in cols)
    n_mol = model.mol_predictor.n_tasks if model.mol_predictor is not None else 0
    n_atom = model.atom_predictor.n_tasks if model.atom_predictor is not None else 0
    return (
        list(cols[:n_mol]) or None,
        list(cols[n_mol : n_mol + n_atom]) or None,
        list(cols[n_mol + n_atom :]) or None,
    )


def predict_MAB(args, model, variables, extra) -> int:
    """MAB predict path: smiles CSV (+ optional extra-feature .npz files and
    per-molecule constraints CSV) -> triple-head predictions CSV, optionally
    with ensemble / MC-dropout / head-based uncertainties
    (cf. reference ``chemprop/cli/predict.py:592+`` MAB branch)."""
    from chemprop_tpu.cli.parsing import load_input_feats
    from chemprop_tpu.models.serialize import load_model

    df = pd.read_csv(args.data_path)
    smiles_col = (args.smiles_columns or [df.columns[0]])[0]
    n = len(df)
    mol_cols, atom_cols, bond_cols = _mab_output_columns(model, extra)

    X_d = load_input_feats(getattr(args, "descriptors_path", None), n)
    V_fs = _comp0_feats(getattr(args, "atom_features_path", None), n)
    E_fs = _comp0_feats(getattr(args, "bond_features_path", None), n)
    V_ds = _comp0_feats(getattr(args, "atom_descriptors_path", None), n)
    E_ds = _comp0_feats(getattr(args, "bond_descriptors_path", None), n)

    # constraints: the k-th constraints-CSV column constrains the k-th named
    # target of --constraints-to-targets (reference common.py:173-177)
    atom_con = bond_con = None
    if getattr(args, "constraints_path", None) is not None:
        con_df = pd.read_csv(args.constraints_path)
        c2t = getattr(args, "constraints_to_targets", None)
        if c2t:
            # k-th constraints-CSV column constrains the k-th named target
            # (reference --constraints-to-targets, common.py:173-177)
            col_for = {t: con_df.iloc[:, k] for k, t in enumerate(c2t)}
        else:
            # inferred '<target>_constraint' columns map BY NAME (matches
            # the train path, cli/mab.py:93-98 — positional iloc over the
            # filtered list broke when non-constraint columns precede them)
            col_for = {
                c[: -len("_constraint")]: con_df[c]
                for c in con_df.columns
                if c.endswith("_constraint")
            }
        if atom_cols and any(c in col_for for c in atom_cols):
            atom_con = [col_for.get(c) for c in atom_cols]
        if bond_cols and any(c in col_for for c in bond_cols):
            bond_con = [col_for.get(c) for c in bond_cols]

    dps = []
    for i, smi in enumerate(df[smiles_col]):
        reorder = getattr(args, "reorder_atoms", False)
        atom_c = bond_c = None
        if atom_con is not None:
            atom_c = np.array([np.nan if c is None else float(c[i]) for c in atom_con])
        if bond_con is not None:
            bond_c = np.array([np.nan if c is None else float(c[i]) for c in bond_con])
        dps.append(
            MolAtomBondDatapoint.from_smi(
                smi,
                keep_h=args.keep_h,
                add_h=args.add_h,
                ignore_stereo=args.ignore_stereo,
                reorder_atoms=reorder,
                atom_constraints=atom_c,
                bond_constraints=bond_c,
                x_d=X_d[i] if X_d is not None else None,
                V_f=V_fs[i] if V_fs is not None else None,
                E_f=E_fs[i] if E_fs is not None else None,
                V_d=V_ds[i] if V_ds is not None else None,
                E_d=E_ds[i] if E_ds is not None else None,
            )
        )
    featurizer = None
    if V_fs is not None or E_fs is not None:
        from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer

        featurizer = SimpleMoleculeMolGraphFeaturizer(
            extra_atom_fdim=V_fs[0].shape[-1] if V_fs is not None else 0,
            extra_bond_fdim=E_fs[0].shape[-1] if E_fs is not None else 0,
        )
    dset = MolAtomBondDataset(dps, featurizer) if featurizer is not None else MolAtomBondDataset(dps)
    loader = DataLoader(dset, batch_size=args.batch_size)

    from chemprop_tpu.cli.common import find_models

    model_paths = find_models(args.model_paths)
    method = getattr(args, "uncertainty_method", "none")
    per_model = []  # list of per-head preds triples
    mc_uncs = []  # dropout: per-model per-head MC variances
    for i, path in enumerate(model_paths):
        m_i, v_i = (model, variables) if i == 0 else load_model(path)[:2]
        trainer = MABTrainer(m_i)
        if method == "dropout":
            from chemprop_tpu.cli.predict import _override_dropout

            mc = trainer.predict_mc_dropout(
                loader,
                variables=v_i,
                sampling_size=getattr(args, "dropout_sampling_size", 10),
            ) if getattr(args, "uncertainty_dropout_p", 0) == 0 else MABTrainer(
                _override_dropout(m_i, args.uncertainty_dropout_p)
            ).predict_mc_dropout(
                loader, variables=v_i, sampling_size=args.dropout_sampling_size
            )
            point = lambda a: a[..., 0] if a is not None and a.ndim == 4 else a
            per_model.append(tuple(None if s is None else s.mean(0) for s in mc))
            mc_uncs.append(tuple(None if s is None else point(s).var(0) for s in mc))
        else:
            per_model.append(trainer.predict(loader, variables=v_i))

    stacks = tuple(
        np.stack([pm[k] for pm in per_model]) if per_model[0][k] is not None else None
        for k in range(3)
    )
    preds = tuple(None if st is None else st.mean(0) for st in stacks)
    if method == "dropout":
        uncs = tuple(
            np.stack([u[k] for u in mc_uncs]).mean(0) if mc_uncs[0][k] is not None else None
            for k in range(3)
        )
    else:
        uncs = _mab_uncertainty(args, stacks)

    out = args.output or args.data_path.with_name(args.data_path.stem + "_preds.csv")
    out.parent.mkdir(parents=True, exist_ok=True)
    write_MAB_preds(out, dset, preds, mol_cols, atom_cols, bond_cols, uncs=uncs)
    print(f"wrote {out}")
    return 0
