"""``chemprop-tpu train`` — the training orchestrator (cf. reference
``chemprop/cli/train.py``): CSV parsing, splits, input/target normalization,
model building from registries, per-replicate x ensemble training, test-set
scoring, and artifact output (config.toml, checkpoints, predictions CSV)."""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np

from chemprop_tpu.cli.common import add_common_args
from chemprop_tpu.cli.parsing import (
    build_datasets,
    load_input_feats,
    make_datapoints,
    parse_csv,
)
from chemprop_tpu.data import DataLoader, make_split_indices, split_data_by_indices
from chemprop_tpu.data.datasets import MulticomponentDataset, ReactionDataset
from chemprop_tpu.featurizers.molecule import MoleculeFeaturizerRegistry
from chemprop_tpu.models import MPNN, MulticomponentMPNN
from chemprop_tpu.models.serialize import save_model
from chemprop_tpu.nn import (
    AggregationRegistry,
    AtomMessagePassing,
    BondMessagePassing,
    MulticomponentMessagePassing,
    PredictorRegistry,
)
from chemprop_tpu.nn.metrics import LossFunctionRegistry, MetricRegistry
from chemprop_tpu.nn.transforms import GraphTransform, ScaleTransform, UnscaleTransform
from chemprop_tpu.train import Trainer
from chemprop_tpu.utils.registry import Factory

logger = logging.getLogger(__name__)


def add_train_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    add_common_args(parser)
    g = parser.add_argument_group("Train args")
    g.add_argument("-o", "--output-dir", "--save-dir", type=Path, default=None)
    g.add_argument("--target-columns", nargs="+")
    g.add_argument("--ignore-columns", nargs="+")
    g.add_argument("--weight-column")
    g.add_argument(
        "-t",
        "--task-type",
        default="regression",
        choices=sorted(PredictorRegistry.keys()),
    )
    g.add_argument("-l", "--loss-function", choices=sorted(LossFunctionRegistry.keys()))
    g.add_argument("--metrics", "--metric", nargs="+", choices=sorted(MetricRegistry.keys()))
    g.add_argument("--task-weights", nargs="+", type=float)
    g.add_argument("--v-kl", type=float, default=0.2)
    g.add_argument("--threshold", type=float)
    g.add_argument("--multiclass-num-classes", type=int, default=3)

    # message passing
    g.add_argument("--message-hidden-dim", type=int, default=300)
    g.add_argument("--message-bias", action="store_true")
    g.add_argument("--depth", type=int, default=3)
    g.add_argument("--undirected", action="store_true")
    g.add_argument("--dropout", type=float, default=0.0)
    g.add_argument("--activation", default="relu")
    g.add_argument("--atom-messages", action="store_true")
    g.add_argument("--aggregation", default="mean", choices=sorted(AggregationRegistry.keys()))
    g.add_argument("--aggregation-norm", type=float, default=100.0)
    g.add_argument("--batch-norm", action="store_true")
    g.add_argument("--mpn-shared", action="store_true")

    # FFN
    g.add_argument("--ffn-hidden-dim", type=int, default=300)
    g.add_argument("--ffn-num-layers", type=int, default=1)

    # training
    g.add_argument("--epochs", type=int, default=50)
    g.add_argument("--warmup-epochs", type=int, default=2)
    g.add_argument("--init-lr", type=float, default=1e-4)
    g.add_argument("--max-lr", type=float, default=1e-3)
    g.add_argument("--final-lr", type=float, default=1e-4)
    g.add_argument("--grad-clip", type=float)
    g.add_argument("--patience", type=int, default=None)
    g.add_argument("--class-balance", action="store_true")
    g.add_argument("--seed", "--pytorch-seed", type=int, default=0)
    g.add_argument("--data-seed", type=int, default=0)

    # splits
    g.add_argument(
        "--split",
        "--split-type",
        default="random",
        choices=["random", "scaffold_balanced", "random_with_repeated_smiles", "kennard_stone", "kmeans"],
    )
    g.add_argument("--split-sizes", nargs=3, type=float, default=[0.8, 0.1, 0.1])
    g.add_argument("--splits-column")
    g.add_argument("--splits-file", type=Path)
    g.add_argument("--num-replicates", type=int, default=1)
    g.add_argument("--ensemble-size", type=int, default=1)

    g.add_argument("--no-batch-norm", action="store_true", help=argparse.SUPPRESS)
    g.add_argument("--no-cache", action="store_true")

    # transfer learning / resume (reference --checkpoint/--freeze-encoder/
    # --frzn-ffn-layers, cli/train.py:1826-1833; resume is new here)
    g.add_argument("--checkpoint", type=Path, help="warm-start weights from a checkpoint")
    g.add_argument("--freeze-encoder", action="store_true")
    g.add_argument("--frzn-ffn-layers", type=int, default=0)
    g.add_argument("--resume", type=Path, help="resume a run from a last.ckpt")

    # mol+atom+bond multi-head targets (reference --atom/bond-target-columns,
    # cli/train.py:420-430 + cli/utils/MAB_parsing.py)
    g.add_argument("--atom-target-columns", nargs="+")
    g.add_argument("--bond-target-columns", nargs="+")
    g.add_argument(
        "--constraints-path",
        type=Path,
        help="CSV of per-molecule sum constraints; columns '<target>_constraint'",
    )
    return parser


def build_model(args, train_dset, output_transform=None, X_d_transform=None, V_d_transform=None, graph_transform=None):
    multicomponent = isinstance(train_dset, MulticomponentDataset)
    datasets = train_dset.datasets if multicomponent else [train_dset]

    mp_cls = AtomMessagePassing if args.atom_messages else BondMessagePassing
    blocks = []
    n_blocks = 1 if args.mpn_shared else len(datasets)
    for _ in range(n_blocks):
        blocks.append(
            mp_cls(
                d_h=args.message_hidden_dim,
                bias=args.message_bias,
                depth=args.depth,
                dropout=args.dropout,
                activation=args.activation,
                undirected=args.undirected,
                d_vd=datasets[0].d_vd or None,
                V_d_transform=V_d_transform,
                graph_transform=graph_transform,
            )
        )
    if multicomponent:
        message_passing = MulticomponentMessagePassing(
            blocks=blocks, n_components=len(datasets), shared=args.mpn_shared
        )
        mp_out_dim = message_passing.output_dim
    else:
        message_passing = blocks[0]
        mp_out_dim = blocks[0].output_dim

    agg = Factory.build(
        AggregationRegistry[args.aggregation],
        norm=args.aggregation_norm,
        output_size=mp_out_dim,
    )

    criterion = None
    if args.loss_function is not None:
        criterion = Factory.build(
            LossFunctionRegistry[args.loss_function],
            task_weights=args.task_weights or 1.0,
            v_kl=args.v_kl,
            threshold=args.threshold,
            n_classes=args.multiclass_num_classes,
        )
    predictor = Factory.build(
        PredictorRegistry[args.task_type],
        input_dim=mp_out_dim + train_dset.d_xd,
        n_tasks=train_dset.t,
        hidden_dim=args.ffn_hidden_dim,
        n_layers=args.ffn_num_layers,
        dropout=args.dropout,
        activation=args.activation,
        criterion=criterion,
        task_weights=args.task_weights,
        threshold=args.threshold,
        n_classes=args.multiclass_num_classes,
        output_transform=output_transform,
    )
    cls = MulticomponentMPNN if multicomponent else MPNN
    return cls(
        message_passing=message_passing,
        agg=agg,
        predictor=predictor,
        batch_norm=args.batch_norm,
        X_d_transform=X_d_transform,
    )


def build_splits(args, components):
    n = len(components[0])
    if args.splits_column is not None:
        return None  # handled by caller with the parsed splits list
    if args.splits_file is not None:
        with open(args.splits_file) as f:
            splits = json.load(f)
        trains = [s.get("train", []) for s in splits]
        vals = [s.get("val", []) for s in splits]
        tests = [s.get("test", []) for s in splits]
        return trains, vals, tests
    mols = [dp.mol if hasattr(dp, "mol") else dp.rct for dp in components[0]]
    return make_split_indices(
        mols, args.split, tuple(args.split_sizes), args.data_seed, args.num_replicates
    )


def normalize_inputs(train_dset, val_dset, args):
    """Fit input scalers on train, apply to train+val, return transforms for
    the model graph (used at eval; cf. reference ``cli/train.py:813-920``)."""
    X_d_transform = None
    V_d_transform = None
    graph_transform = None
    multicomponent = isinstance(train_dset, MulticomponentDataset)
    d0 = train_dset.datasets[0] if multicomponent else train_dset

    if d0.d_xd > 0:
        scaler = train_dset.normalize_inputs("X_d")
        scaler = scaler[0] if isinstance(scaler, list) else scaler
        if scaler is not None:
            val_dset and val_dset.normalize_inputs("X_d", scaler)
            X_d_transform = ScaleTransform.from_standard_scaler(scaler)
    if not isinstance(d0, ReactionDataset):
        if d0.d_vd > 0:
            scaler = train_dset.normalize_inputs("V_d")
            scaler = scaler[0] if isinstance(scaler, list) else scaler
            if scaler is not None:
                val_dset and val_dset.normalize_inputs("V_d", scaler)
                V_d_transform = ScaleTransform.from_standard_scaler(scaler)
        V_t = E_t = None
        if d0.d_vf > 0:
            scaler = train_dset.normalize_inputs("V_f")
            scaler = scaler[0] if isinstance(scaler, list) else scaler
            if scaler is not None:
                val_dset and val_dset.normalize_inputs("V_f", scaler)
                pad = d0.featurizer.atom_fdim - d0.d_vf
                V_t = ScaleTransform.from_standard_scaler(scaler, pad=pad)
        if d0.d_ef > 0:
            scaler = train_dset.normalize_inputs("E_f")
            scaler = scaler[0] if isinstance(scaler, list) else scaler
            if scaler is not None:
                val_dset and val_dset.normalize_inputs("E_f", scaler)
                pad = d0.featurizer.bond_fdim - d0.d_ef
                E_t = ScaleTransform.from_standard_scaler(scaler, pad=pad)
        if V_t is not None or E_t is not None:
            graph_transform = GraphTransform(V_t, E_t)
    return X_d_transform, V_d_transform, graph_transform


def main(args) -> int:
    if getattr(args, "atom_target_columns", None) or getattr(args, "bond_target_columns", None):
        from chemprop_tpu.cli.mab import main_MAB

        return main_MAB(args)

    out_dir = args.output_dir or Path(f"chemprop_tpu_training/{args.data_path.stem}")
    out_dir.mkdir(parents=True, exist_ok=True)

    smis, rxns, Y, weights, lt, gt, splits_col_values, input_cols, target_cols = parse_csv(
        args.data_path,
        args.smiles_columns,
        args.reaction_columns,
        args.target_columns,
        args.ignore_columns,
        args.weight_column,
        bounded=args.loss_function is not None and "bounded" in args.loss_function,
        splits_col=args.splits_column,
        no_header_row=args.no_header_row,
    )
    mol_featurizers = [
        MoleculeFeaturizerRegistry[name]() for name in (args.molecule_featurizers or [])
    ]
    n = len(Y)
    X_d = load_input_feats(args.descriptors_path, n)
    V_fs = load_input_feats(args.atom_features_path, n)
    E_fs = load_input_feats(args.bond_features_path, n)
    V_ds = load_input_feats(args.atom_descriptors_path, n)
    components = make_datapoints(
        smis, rxns, Y, weights, lt, gt,
        keep_h=args.keep_h, add_h=args.add_h, ignore_stereo=args.ignore_stereo,
        molecule_featurizers=mol_featurizers, X_d=X_d, V_fs=V_fs, E_fs=E_fs, V_ds=V_ds,
    )

    # save resolved config
    def _jsonable(v):
        try:
            json.dumps(v)
            return v
        except TypeError:
            return str(v)

    with open(out_dir / "config.json", "w") as f:
        json.dump({k: _jsonable(v) for k, v in vars(args).items() if k != "func"}, f, indent=2)

    if splits_col_values is not None:
        tr = [i for i, s in enumerate(splits_col_values) if s == "train"]
        va = [i for i, s in enumerate(splits_col_values) if s == "val"]
        te = [i for i, s in enumerate(splits_col_values) if s == "test"]
        split_idxs = ([tr], [va], [te])
    else:
        split_idxs = build_splits(args, components)
    trains, vals, tests = split_idxs

    with open(out_dir / "splits.json", "w") as f:
        json.dump(
            [
                {"train": list(map(int, t)), "val": list(map(int, v)), "test": list(map(int, s))}
                for t, v, s in zip(trains, vals, tests)
            ],
            f,
        )

    multicomponent = len(components) > 1
    all_scores = []
    for rep, (tr_i, va_i, te_i) in enumerate(zip(trains, vals, tests)):
        (train_data,), (val_data,), (test_data,) = split_data_by_indices(
            components if multicomponent else components[0], [tr_i], [va_i], [te_i]
        )
        mk = lambda d: build_datasets(
            d if multicomponent else [d],
            multi_hot_atom_featurizer_mode=args.multi_hot_atom_featurizer_mode,
            rxn_mode=args.rxn_mode,
        )
        train_dset = mk(train_data)
        val_dset = mk(val_data) if len(va_i) else None
        test_dset = mk(test_data) if len(te_i) else None

        X_d_t, V_d_t, graph_t = normalize_inputs(train_dset, val_dset, args)

        output_transform = None
        if args.task_type.startswith("regression"):
            scaler = train_dset.normalize_targets()
            if val_dset is not None:
                val_dset.normalize_targets(scaler)
            output_transform = UnscaleTransform.from_standard_scaler(scaler)
            logger.info(f"train target μ={scaler.mean_} σ={scaler.scale_}")

        if not args.no_cache:
            train_dset.cache = True
            if val_dset is not None:
                val_dset.cache = True

        train_loader = DataLoader(
            train_dset,
            batch_size=args.batch_size,
            shuffle=not args.class_balance,
            class_balance=args.class_balance,
            seed=args.data_seed,
        )
        val_loader = (
            DataLoader(val_dset, batch_size=args.batch_size) if val_dset is not None else None
        )

        rep_dir = out_dir / (f"replicate_{rep}" if len(trains) > 1 else ".")
        for member in range(args.ensemble_size):
            model_dir = rep_dir / (f"model_{member}" if args.ensemble_size > 1 else ".")
            model_dir.mkdir(parents=True, exist_ok=True)
            model = build_model(args, train_dset, output_transform, X_d_t, V_d_t, graph_t)
            freeze = None
            if args.freeze_encoder or args.frzn_ffn_layers:
                frzn_blocks = {f"block{i}" for i in range(args.frzn_ffn_layers)}

                def freeze(path: str) -> bool:
                    if args.freeze_encoder and path.startswith("message_passing"):
                        return True
                    parts = path.split("/")
                    return len(parts) > 2 and parts[-2] in frzn_blocks and "ffn" in parts

            trainer = Trainer(
                model,
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
                freeze=freeze,
            )
            if args.checkpoint is not None:
                from chemprop_tpu.models.serialize import load_checkpoint

                _, warm, _ = load_checkpoint(args.checkpoint)
                first = next(iter(train_loader))
                trainer.state = trainer.init_state(first, len(train_loader))
                from flax import serialization

                trainer.state = trainer.state.replace(
                    params=serialization.from_state_dict(trainer.state.params, warm["params"]),
                    batch_stats=serialization.from_state_dict(
                        trainer.state.batch_stats, warm.get("batch_stats", {})
                    ),
                )
            if args.resume is not None:
                first = next(iter(train_loader))
                trainer.start_epoch = trainer.resume_from(
                    args.resume, first, len(train_loader)
                )
            trainer.fit(train_loader, val_loader)
            save_model(
                model_dir / "best.ckpt", model, trainer.best_variables, output_columns=target_cols
            )
            with open(model_dir / "history.json", "w") as f:
                json.dump(trainer.history, f, indent=2)

            if test_dset is not None and len(test_dset):
                test_loader = DataLoader(test_dset, batch_size=args.batch_size)
                preds = trainer.predict(test_loader)
                scores = _score_test(preds, test_dset, args, target_cols)
                all_scores.append(scores)
                logger.info(f"replicate {rep} model {member} test scores: {scores}")
                _save_preds(model_dir / "test_predictions.csv", test_dset, preds, target_cols)

    if all_scores:
        with open(out_dir / "test_scores.json", "w") as f:
            json.dump(all_scores, f, indent=2)
        print(json.dumps(all_scores[-1]))
    return 0


def _score_test(preds, test_dset, args, target_cols) -> dict:
    import jax.numpy as jnp

    Y = test_dset._Y.astype(np.float32)
    mask = np.isfinite(Y)
    if preds.ndim == 3:
        if args.task_type.startswith("regression") or args.task_type == "classification-dirichlet":
            # (mean, ...) multi-head regression, or binary dirichlet (p, u):
            # the point prediction is channel 0
            preds_for_metric = preds[..., 0]
        elif args.task_type == "multiclass-dirichlet":
            # the dirichlet head appends the uncertainty channel u = c/S
            preds_for_metric = preds[..., :-1]
        else:
            preds_for_metric = preds
    else:
        preds_for_metric = preds
    metric_names = args.metrics or _default_metrics(args.task_type)
    scores = {}
    for name in metric_names:
        metric = Factory.build(
            MetricRegistry[name],
            n_classes=args.multiclass_num_classes,
            # predict-space preds are probabilities, not logits
            assume_logits=False,
        )
        try:
            if metric.needs_collection:
                scores[name] = float(
                    metric.compute_from_arrays(np.asarray(preds_for_metric), Y, mask)
                )
            else:
                p = preds_for_metric
                state = metric.update_state(
                    metric.init_state(),
                    jnp.asarray(p),
                    jnp.nan_to_num(jnp.asarray(Y)),
                    jnp.asarray(mask),
                    jnp.ones(len(Y)),
                    None,
                    None,
                )
                scores[name] = float(metric.compute(state))
        except Exception as e:  # scoring must never kill a finished run
            logger.warning(f"metric {name} failed: {e}")
            scores[name] = float("nan")
    return scores


def _default_metrics(task_type: str) -> list[str]:
    if task_type.startswith("regression"):
        return ["rmse", "mae"]
    if task_type.startswith("multiclass"):
        return ["multiclass-mcc"]
    if task_type == "spectral":
        return ["sid"]
    return ["roc"]


def _save_preds(path, test_dset, preds, target_cols) -> None:
    import pandas as pd

    if preds.ndim == 3:
        preds = preds[..., 0] if preds.shape[-1] in (2, 4) else preds.reshape(len(preds), -1)
    names = test_dset.names
    df = pd.DataFrame({"name": names})
    for j, col in enumerate(target_cols if preds.shape[1] == len(target_cols) else range(preds.shape[1])):
        df[f"pred_{col}"] = preds[:, j]
    df.to_csv(path, index=False)


class TrainSubcommand:
    COMMAND = "train"
    HELP = "train a chemprop-tpu model"

    @classmethod
    def add(cls, subparsers) -> argparse.ArgumentParser:
        parser = subparsers.add_parser(cls.COMMAND, help=cls.HELP)
        add_train_args(parser)
        parser.set_defaults(func=main)
        return parser
