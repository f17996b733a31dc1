"""``chemprop-tpu predict`` (cf. reference ``chemprop/cli/predict.py``):
load model(s), featurize the test CSV, run inference (ensemble-averaged),
optional uncertainty estimation/calibration, write predictions CSV."""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np
import pandas as pd

from chemprop_tpu.cli.common import add_common_args, find_models
from chemprop_tpu.cli.parsing import (
    build_datasets,
    load_component_feats,
    load_input_feats,
    make_datapoints,
    parse_csv,
)
from chemprop_tpu.data import DataLoader
from chemprop_tpu.featurizers.molecule import MoleculeFeaturizerRegistry
from chemprop_tpu.models.serialize import load_model
from chemprop_tpu.train import Trainer

logger = logging.getLogger(__name__)


def add_predict_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    add_common_args(parser)
    g = parser.add_argument_group("Predict args")
    g.add_argument("-o", "--output", "--preds-path", type=Path, default=None)
    g.add_argument("--model-paths", "--model-path", nargs="+", type=Path, required=True)
    g.add_argument("--drop-extra-columns", action="store_true")
    g.add_argument(
        "--edge-partition",
        type=int,
        nargs="?",
        const=0,
        default=None,
        metavar="N",
        help="edge-partitioned inference: each partitionable molecule's edge "
        "table is sharded across the device mesh with halo exchange (N "
        "devices; 0/omitted value = all); molecules too small to partition "
        "route through the dense single-device path "
        "(parallel/partitioned_mp.py:predict_partitioned)",
    )
    # MAB constrained prediction (reference predict supports constraints at
    # inference, ``chemprop/cli/common.py:165-177``)
    g.add_argument("--constraints-path", type=Path, default=None)
    g.add_argument("--constraints-to-targets", nargs="+", default=None)
    g.add_argument(
        "--uncertainty-method",
        choices=["none", "ensemble", "mve", "evidential-total", "evidential-epistemic",
                 "evidential-aleatoric", "classification", "classification-dirichlet",
                 "multiclass-dirichlet", "quantile-regression", "dropout"],
        default="none",
    )
    g.add_argument(
        "--uncertainty-dropout-p",
        type=float,
        default=0.1,
        help="dropout probability for Monte-Carlo dropout uncertainty estimation",
    )
    g.add_argument(
        "--dropout-sampling-size",
        type=int,
        default=10,
        help="number of stochastic forward passes for MC-dropout",
    )
    g.add_argument(
        "--calibration-interval-percentile",
        type=float,
        default=95,
        help="percentile used by interval calibration methods; in (1, 100)",
    )
    g.add_argument(
        "--conformal-alpha",
        type=float,
        default=0.1,
        help="target error rate for conformal prediction; in (0, 1)",
    )
    g.add_argument("--cal-path", type=Path, help="calibration set CSV")
    g.add_argument(
        "--cal-descriptors-path",
        type=Path,
        help="extra descriptors (.npz) for the calibration set",
    )
    g.add_argument(
        "--cal-atom-features-path",
        nargs="+",
        help="extra atom features (.npz) for the calibration set: PATH, or IDX PATH pairs",
    )
    g.add_argument(
        "--cal-atom-descriptors-path",
        nargs="+",
        help="post-MP atom descriptors (.npz) for the calibration set: PATH, or IDX PATH pairs",
    )
    g.add_argument(
        "--cal-bond-features-path",
        nargs="+",
        help="extra bond features (.npz) for the calibration set: PATH, or IDX PATH pairs",
    )
    g.add_argument(
        "--cal-bond-descriptors-path",
        nargs="+",
        help="post-MP bond descriptors (.npz) for the calibration set "
        "(cf. reference cli/predict.py:197): PATH, or IDX PATH pairs",
    )
    g.add_argument(
        "--cal-constraints-path",
        type=Path,
        help="per-molecule sum constraints CSV for the calibration set "
        "(cf. reference cli/predict.py:203)",
    )
    g.add_argument(
        "--test-path",
        dest="data_path",
        type=Path,
        help="alias for -i/--data-path (reference compatibility)",
    )
    g.add_argument(
        "--calibration-method",
        choices=["none", "zscaling", "zelikman-interval", "mve-weighting", "platt", "isotonic",
                 "conformal-regression", "conformal-multilabel", "conformal-multiclass",
                 "conformal-adaptive", "isotonic-multiclass"],
        default="none",
    )
    g.add_argument("--evaluation-methods", "--evaluation-method", nargs="+")
    g.add_argument(
        "--callback",
        choices=["myerson", "mcts"],
        help="interpretability callback run during predict: 'myerson' "
        "per-atom attributions (cf. reference --callback / "
        "MyersonExplainerCallback) or 'mcts' substructure rationales "
        "(the reference ships MCTS only as a notebook)",
    )
    g.add_argument(
        "--callback-params",
        type=json.loads,
        default={},
        help='JSON kwargs for the callback, e.g. \'{"sampling_threshold": 12, "save_as_json": true}\'',
    )
    return parser


def _reorder_components(components, variables, args):
    """Reference ``cli/predict.py:224-298`` component-order auto-fix: when a
    multicomponent checkpoint's per-block ``W_i`` input dims don't match the
    user's column order but a PERMUTATION of the components does (e.g. the
    rxn+mol example model was trained with (molecule, reaction) blocks),
    permute the data components to the checkpoint's order with a warning."""
    mp_params = variables.get("params", {}).get("message_passing") or {}
    block_keys = sorted(
        (k for k in mp_params if k.startswith("blocks_")), key=lambda k: int(k.split("_")[1])
    )
    if len(block_keys) < 2 or len(block_keys) != len(components):
        return components
    from chemprop_tpu.data import ReactionDatapoint
    from chemprop_tpu.featurizers.atom import get_multi_hot_atom_featurizer
    from chemprop_tpu.featurizers.bond import MultiHotBondFeaturizer, RIGRBondFeaturizer
    from chemprop_tpu.featurizers.molgraph.reaction import CondensedGraphOfReactionFeaturizer

    atom_f = get_multi_hot_atom_featurizer(args.multi_hot_atom_featurizer_mode)
    bond_f = (
        RIGRBondFeaturizer()
        if args.multi_hot_atom_featurizer_mode.lower() == "rigr"
        else MultiHotBondFeaturizer()
    )

    def comp_dim(comp) -> int:
        if comp and isinstance(comp[0], ReactionDatapoint):
            cgr = CondensedGraphOfReactionFeaturizer(
                atom_featurizer=atom_f, bond_featurizer=bond_f, mode_=args.rxn_mode
            )
            return cgr.atom_fdim + cgr.bond_fdim
        return len(atom_f) + len(bond_f)

    want = [int(np.asarray(mp_params[k]["W_i"]["kernel"]).shape[0]) for k in block_keys]
    have = [comp_dim(c) for c in components]
    if have == want:
        return components
    perm: list[int] = []
    used = set()
    for w in want:
        match = next((i for i, h in enumerate(have) if h == w and i not in used), None)
        if match is None:
            return components  # no permutation fixes it; let the error surface
        used.add(match)
        perm.append(match)
    logger.warning(
        f"input component order (dims {have}) does not match the checkpoint's "
        f"block order (dims {want}); reordering components {perm} "
        "(cf. reference predict component-order auto-fix)"
    )
    return [components[i] for i in perm]


def _build_loader(args, path, with_targets: bool = False, variables: dict | None = None):
    descriptors_cols = list(getattr(args, "descriptors_columns", None) or [])
    smis, rxns, Y, weights, lt, gt, _, input_cols, target_cols = parse_csv(
        path,
        args.smiles_columns,
        args.reaction_columns,
        target_cols=None if with_targets else [],
        ignore_cols=descriptors_cols if with_targets else None,
        no_header_row=args.no_header_row,
    )
    requested = set(args.molecule_featurizers or [])
    if {"rdkit_2d", "v1_rdkit_2d"} & requested:
        logger.info(
            "rdkit_2d descriptors: the 58 VSA surface-area values are a "
            "fixture-calibrated model of RDKit's (within 0.01 of the "
            "reference's own RDKit-generated golden; every other family is "
            "pinned exact — docs/chemistry_divergences.md); elements beyond "
            "C/N/O/F extrapolate the calibration"
        )
    if "v1_rdkit_2d_normalized" in requested:
        logger.warning(
            "v1_rdkit_2d_normalized: the reference applies per-descriptor "
            "descriptastorus CDFs fit on a proprietary corpus; this "
            "framework substitutes x/(1+|x|), so EVERY input dimension "
            "differs from the reference's. A reference checkpoint trained "
            "on normalized descriptors is NOT zero-shot transferable here — "
            "expect shifted predictions; re-train or fine-tune with this "
            "framework's normalization instead "
            "(docs/chemistry_divergences.md)"
        )
    mol_featurizers = [
        MoleculeFeaturizerRegistry[name]() for name in (args.molecule_featurizers or [])
    ]
    n = len(next(iter(smis.values()), next(iter(rxns.values()), [])))
    X_d = load_input_feats(args.descriptors_path, n)
    if descriptors_cols:
        import pandas as pd

        df = pd.read_csv(path, header=None if args.no_header_row else 0)
        col_X = df[descriptors_cols].to_numpy(dtype=np.float64)
        X_d = (
            list(col_X)
            if X_d is None
            else [np.concatenate([a, b]) for a, b in zip(X_d, col_X)]
        )
    V_fs = load_component_feats(getattr(args, "atom_features_path", None), n)
    E_fs = load_component_feats(getattr(args, "bond_features_path", None), n)
    V_ds = load_component_feats(args.atom_descriptors_path, n)
    components = make_datapoints(
        smis, rxns,
        Y if Y.size else np.full((n, 1), np.nan),
        weights, lt, gt,
        keep_h=args.keep_h, add_h=args.add_h, ignore_stereo=args.ignore_stereo,
        molecule_featurizers=mol_featurizers, X_d=X_d, V_fs=V_fs, E_fs=E_fs, V_ds=V_ds,
    )
    if variables is not None:
        components = _reorder_components(components, variables, args)
    dset = build_datasets(
        components,
        multi_hot_atom_featurizer_mode=args.multi_hot_atom_featurizer_mode,
        rxn_mode=args.rxn_mode,
    )
    return DataLoader(dset, batch_size=args.batch_size), dset, Y


def _check_featurizer_matches_model(args, variables) -> None:
    """Auto-fix a featurizer/model input-dim mismatch by scanning the atom
    featurizer modes for the one whose dims match the checkpoint's W_i
    (cf. reference ``cli/predict.py:224-298``, which falls back to the v1
    featurizer when predicting with converted v1 models)."""
    from chemprop_tpu.featurizers.atom import get_multi_hot_atom_featurizer
    from chemprop_tpu.featurizers.bond import MultiHotBondFeaturizer, RIGRBondFeaturizer

    mp_params = variables.get("params", {}).get("message_passing")
    if mp_params is None or "W_i" not in mp_params:
        return  # multicomponent blocks: skip the auto-check
    d_in = int(np.asarray(mp_params["W_i"]["kernel"]).shape[0])
    if args.reaction_columns:
        return  # CGR dims depend on rxn mode; no unambiguous fallback

    def dims_for(mode):
        atom = len(get_multi_hot_atom_featurizer(mode))
        bond = len(RIGRBondFeaturizer() if mode == "rigr" else MultiHotBondFeaturizer())
        return atom, bond

    atom_fdim, bond_fdim = dims_for(args.multi_hot_atom_featurizer_mode)
    for expected in (atom_fdim + bond_fdim, atom_fdim):  # bond vs atom messages
        if d_in == expected:
            return
    for mode in ("v2", "v1", "organic", "rigr"):
        a, b = dims_for(mode)
        if d_in in (a + b, a):
            logger.warning(
                f"model expects {d_in}-dim W_i input; switching atom featurizer "
                f"mode {args.multi_hot_atom_featurizer_mode!r} -> {mode!r}"
            )
            args.multi_hot_atom_featurizer_mode = mode
            return
    logger.warning(
        f"model W_i input dim {d_in} matches no known featurizer mode "
        "(extra atom/bond features?); proceeding unchanged"
    )


def main(args) -> int:
    model_paths = find_models(args.model_paths)

    from chemprop_tpu.models.mol_atom_bond import MolAtomBondMPNN

    first_model, first_vars, first_extra = load_model(model_paths[0])
    edge_partition = getattr(args, "edge_partition", None) is not None
    if edge_partition:
        if isinstance(first_model, MolAtomBondMPNN):
            raise ValueError("--edge-partition predict does not support MAB models")
        if args.uncertainty_method == "dropout":
            raise ValueError(
                "--edge-partition predict does not support --uncertainty-method dropout"
            )
    if isinstance(first_model, MolAtomBondMPNN):
        from chemprop_tpu.cli.mab import predict_MAB

        return predict_MAB(args, first_model, first_vars, first_extra)

    if not (args.atom_features_path or args.bond_features_path):
        _check_featurizer_matches_model(args, first_vars)
    loader, dset, _ = _build_loader(args, args.data_path, variables=first_vars)

    individual = []
    dropout_uncs = []
    output_columns = None
    part_session = None
    for path in model_paths:
        model, variables, extra = load_model(path)
        output_columns = extra.get("output_columns") or output_columns
        if args.uncertainty_method == "dropout":
            mc = Trainer(_override_dropout(model, args.uncertainty_dropout_p)).predict_mc_dropout(
                loader, variables=variables, sampling_size=args.dropout_sampling_size
            )
            individual.append(mc.mean(axis=0))
            point_mc = mc[..., 0] if mc.ndim == 4 else mc  # [S, n, t]
            dropout_uncs.append(point_mc.var(axis=0))
        elif edge_partition:
            if part_session is None:
                # one plan + one compile per bucket, shared by every
                # ensemble member (same model config, different params)
                from chemprop_tpu.parallel.partitioned_mp import PartitionedInference

                part_data = [dset[i] for i in range(len(dset))]
                part_session = PartitionedInference(
                    model, part_data, n_shards=args.edge_partition or None
                )
            individual.append(part_session.run(variables))
        else:
            trainer = Trainer(model)
            preds = trainer.predict(loader, variables=variables)
            individual.append(preds)
    stacked = np.stack(individual)  # [m, n, ...]
    mean_preds = stacked.mean(0)

    if args.uncertainty_method == "dropout":
        uncs = np.stack(dropout_uncs).mean(axis=0)
    else:
        uncs = _estimate_uncertainty(args, stacked, model)
    if uncs is not None and args.calibration_method != "none" and args.cal_path:
        from chemprop_tpu.uncertainty import CalibratorRegistry
        from chemprop_tpu.utils.registry import Factory

        cal_args = argparse.Namespace(**vars(args))
        # the calibration set carries its own extra-feature files
        # (cf. reference ``cli/predict.py:168-200`` --cal-*-path flags)
        cal_args.descriptors_path = args.cal_descriptors_path
        cal_args.atom_features_path = args.cal_atom_features_path
        cal_args.atom_descriptors_path = args.cal_atom_descriptors_path
        cal_args.bond_features_path = args.cal_bond_features_path
        cal_args.bond_descriptors_path = args.cal_bond_descriptors_path
        cal_args.constraints_path = args.cal_constraints_path
        cal_args.descriptors_columns = []
        cal_loader, cal_dset, cal_Y = _build_loader(
            cal_args, args.cal_path, with_targets=True, variables=first_vars
        )
        if args.uncertainty_method == "dropout":
            cal_stack, cal_unc_list = [], []
            for p in model_paths:
                m, v, _ = load_model(p)
                mc = Trainer(_override_dropout(m, args.uncertainty_dropout_p)).predict_mc_dropout(
                    cal_loader, variables=v, sampling_size=args.dropout_sampling_size
                )
                cal_stack.append(mc.mean(axis=0))
                point_mc = mc[..., 0] if mc.ndim == 4 else mc
                cal_unc_list.append(point_mc.var(axis=0))
            cal_preds = np.stack(cal_stack).mean(0)
            cal_uncs = np.stack(cal_unc_list).mean(axis=0)
        elif edge_partition:
            # the calibration set goes through the SAME partitioned path as
            # the main predictions — a giant calibration molecule must not
            # fall back to the one-device dense program the flag avoids
            from chemprop_tpu.parallel.partitioned_mp import PartitionedInference

            cal_data = [cal_dset[i] for i in range(len(cal_dset))]
            cal_session = PartitionedInference(
                first_model, cal_data, n_shards=args.edge_partition or None
            )
            cal_stack = np.stack(
                [cal_session.run(load_model(p)[1]) for p in model_paths]
            )
            cal_preds = cal_stack.mean(0)
            cal_uncs = _estimate_uncertainty(args, cal_stack, model)
        else:
            cal_stack = np.stack(
                [
                    Trainer(m := load_model(p)[0]).predict(cal_loader, variables=load_model(p)[1])
                    for p in model_paths
                ]
            )
            cal_preds = cal_stack.mean(0)
            cal_uncs = _estimate_uncertainty(args, cal_stack, model)
        mask = np.isfinite(cal_Y)
        calibrator = Factory.build(
            CalibratorRegistry[args.calibration_method],
            p=args.calibration_interval_percentile / 100,
            alpha=args.conformal_alpha,
        )
        calibrator.fit(
            _point(cal_preds), cal_uncs, np.nan_to_num(cal_Y).astype(np.float32), mask
        )
        uncs = calibrator.apply(uncs)

    if args.evaluation_methods and uncs is not None:
        # uncertainty evaluation against the input CSV's own targets
        # (cf. reference ``cli/predict.py:464-479``)
        from chemprop_tpu.uncertainty import UncertaintyEvaluatorRegistry

        _, _, eval_Y = _build_loader(args, args.data_path, with_targets=True)
        eval_mask = np.isfinite(eval_Y)
        evaluations = {}
        for name in args.evaluation_methods:
            evaluator = UncertaintyEvaluatorRegistry[name]()
            vals = evaluator.evaluate(
                _point(mean_preds), uncs, np.nan_to_num(eval_Y).astype(np.float32), eval_mask
            )
            evaluations[name] = np.asarray(vals).tolist()
            logger.info(f"uncertainty evaluation {name}: {evaluations[name]}")
        print(json.dumps({"uncertainty_evaluations": evaluations}))

    out = args.output or args.data_path.with_name(args.data_path.stem + "_preds.csv")
    out.parent.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame({"name": dset.names})

    from chemprop_tpu.nn.predictors import MulticlassClassificationFFN, MulticlassDirichletFFN

    if isinstance(model.predictor, MulticlassClassificationFFN):
        # class label + formatted per-class probability columns
        # (cf. reference ``cli/predict.py:509-515``)
        probs = mean_preds[..., :-1] if isinstance(model.predictor, MulticlassDirichletFFN) else mean_preds
        labels = probs.argmax(axis=-1)
        cols = output_columns or [f"pred_{j}" for j in range(labels.shape[1])]
        for j, c in enumerate(cols[: labels.shape[1]]):
            df[c] = labels[:, j]
            df[f"{c}_prob"] = [",".join(f"{p:.6f}" for p in row) for row in probs[:, j]]
    else:
        point = _point(mean_preds)
        cols = output_columns or [f"pred_{j}" for j in range(point.shape[1])]
        for j, c in enumerate(cols[: point.shape[1]]):
            df[c] = point[:, j]
    if uncs is not None:
        for j, c in enumerate(cols[: uncs.shape[1]]):
            if uncs.ndim == 3:  # conformal sets: one 0/1 (or in,out) entry per class
                df[f"{c}_unc"] = [",".join(f"{u:g}" for u in row) for row in uncs[:, j]]
            else:
                df[f"{c}_unc"] = uncs[:, j]
    if out.suffix == ".pkl":
        df.reset_index(drop=True).to_pickle(out)
    else:
        df.to_csv(out, index=False)
    logger.info(f"wrote predictions for {len(df)} rows to {out}")
    print(f"wrote {out}")

    if getattr(args, "callback", None) == "myerson":
        _run_myerson_callback(args, model_paths, dset, out)
    elif getattr(args, "callback", None) == "mcts":
        _run_mcts_callback(args, model_paths, dset, out)
    return 0


def _run_mcts_callback(args, model_paths, dset, out: Path) -> None:
    """MCTS substructure rationales for every input molecule, one JSON per
    model (``interpret.MCTSRationaleExplainer``; the reference ships this
    algorithm only as the ``interpreting_monte_carlo_tree_search``
    notebook). Writes ``<output stem>_mcts_rationales[_i].json``: a list
    (per molecule) of rationale dicts ``{atoms, smiles, score, n_atoms}``."""
    from chemprop_tpu.interpret import MCTSRationaleExplainer

    params = dict(args.callback_params)
    for m_i, path in enumerate(model_paths):
        model, variables, _ = load_model(path)
        explainer = MCTSRationaleExplainer(model, variables, **params)
        rationales = [
            explainer.explain_mol(dset.data[i].mol) for i in range(len(dset))
        ]
        suffix = "" if len(model_paths) == 1 else f"_{m_i}"
        dst = out.parent / f"{out.stem}_mcts_rationales{suffix}.json"
        with open(dst, "w") as f:
            json.dump(rationales, f, indent=2)
        logger.info(f"MCTS rationales saved to {dst}")


def _run_myerson_callback(args, model_paths, dset, out: Path) -> None:
    """Myerson atom attributions for every input molecule, one file per
    model (cf. reference ``callbacks/interpret.py:25-164``). Writes
    ``<output stem>_myerson_explanation[_i].npz`` (or ``.json``)."""
    from chemprop_tpu.interpret import MyersonExplainer
    from chemprop_tpu.nn.predictors import BinaryClassificationFFN, RegressionFFN

    params = dict(args.callback_params)
    save_as_json = params.pop("save_as_json", False)
    logger.warning("the 'myerson' callback is computationally expensive on large inputs")
    for m_i, path in enumerate(model_paths):
        model, variables, _ = load_model(path)
        if not isinstance(model.predictor, (RegressionFFN, BinaryClassificationFFN)):
            raise NotImplementedError(
                "Myerson explanations support regression and binary classification heads, "
                f"got {type(model.predictor).__name__}"
            )
        explainer = MyersonExplainer(model, variables, **params)
        explanations = []
        for i in range(len(dset)):
            phi = explainer.explain(dset[i].mg)
            explanations.append(phi[:, 0] if phi.shape[-1] == 1 else phi)
        suffix = "" if len(model_paths) == 1 else f"_{m_i}"
        base = out.parent / f"{out.stem}_myerson_explanation{suffix}"
        if save_as_json:
            with open(base.with_suffix(".json"), "w") as f:
                json.dump([e.tolist() for e in explanations], f, indent=4)
            logger.info(f"Myerson explanations saved to {base.with_suffix('.json')}")
        else:
            np.savez_compressed(base.with_suffix(".npz"), *explanations)
            logger.info(f"Myerson explanations saved to {base.with_suffix('.npz')}")


def _override_dropout(model, p: float):
    """Rebuild the model with every dropout rate replaced by ``p`` (the
    reference patches torch Dropout modules' ``p`` in-place,
    ``uncertainty/estimator.py:626-631``). Dropout layers hold no params, so
    the rebuilt module applies with the original checkpoint variables."""
    from chemprop_tpu.models.serialize import model_config, model_from_config

    if not p:
        return model
    cfg = model_config(model)

    def walk(d):
        if isinstance(d, dict):
            for k, v in d.items():
                if k == "dropout" and isinstance(v, (int, float)):
                    d[k] = p
                else:
                    walk(v)
        elif isinstance(d, list):
            for v in d:
                walk(v)

    walk(cfg)
    return model_from_config(cfg)


def _point(preds: np.ndarray) -> np.ndarray:
    """Collapse (mean, extra-head) outputs to point predictions."""
    if preds.ndim == 3:
        return preds[..., 0]
    return preds


def _estimate_uncertainty(args, stacked: np.ndarray, model=None) -> np.ndarray | None:
    """[m, n, t(, u)] model outputs -> [n, t] (or [n, t, c]) uncertainties."""
    m = args.uncertainty_method
    if m == "none":
        return None
    from chemprop_tpu.nn.predictors import MulticlassDirichletFFN
    from chemprop_tpu.uncertainty import UncertaintyEstimatorRegistry

    if m == "classification" and isinstance(getattr(model, "predictor", None), MulticlassDirichletFFN):
        stacked = stacked[..., :-1]  # drop the appended Dirichlet u channel
    estimator = UncertaintyEstimatorRegistry[m]()
    return estimator(stacked)


class PredictSubcommand:
    COMMAND = "predict"
    HELP = "use trained model(s) to predict on new data"

    @classmethod
    def add(cls, subparsers) -> argparse.ArgumentParser:
        parser = subparsers.add_parser(cls.COMMAND, help=cls.HELP)
        add_predict_args(parser)
        parser.set_defaults(func=main)
        return parser
