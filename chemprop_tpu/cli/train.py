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
    load_component_feats,
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
    g.add_argument(
        "--v-kl",
        "--evidential-regularization",
        type=float,
        default=0.0,
        help="evidential-loss regularization weight (reference default 0.0)",
    )
    g.add_argument("--eps", type=float, default=1e-8, help="evidential regularization epsilon")
    g.add_argument(
        "--alpha", type=float, default=0.1, help="target error bounds for quantile interval loss"
    )
    g.add_argument("--threshold", type=float)
    g.add_argument("--multiclass-num-classes", type=int, default=3)
    g.add_argument(
        "--tracking-metric",
        default="val_loss",
        help="metric tracked for early stopping/checkpointing ('val_loss' or any "
        "metric name; MAB runs may suffix '-mol'/'-atom'/'-bond')",
    )
    g.add_argument("--show-individual-scores", action="store_true")

    # message passing
    g.add_argument("--message-hidden-dim", type=int, default=300)
    g.add_argument("--message-bias", action="store_true")
    g.add_argument("--depth", type=int, default=3)
    g.add_argument("--undirected", action="store_true")
    g.add_argument("--dropout", type=float, default=0.0)
    g.add_argument("--activation", default="relu")
    g.add_argument("--atom-messages", action="store_true")
    # reference default is "norm" (sum/100; cli/train.py:236-240)
    g.add_argument(
        "--aggregation", "--agg", default="norm", choices=sorted(AggregationRegistry.keys())
    )
    g.add_argument("--aggregation-norm", type=float, default=100.0)
    g.add_argument("--batch-norm", action="store_true")
    g.add_argument("--mpn-shared", action="store_true")

    # FFN (--ffn-hidden-dim accepts per-layer widths like the reference's
    # _process_ffn_hidden_dims, cli/train.py:599-607)
    g.add_argument("--ffn-hidden-dim", type=int, nargs="+", default=300)
    g.add_argument("--ffn-num-layers", type=int, default=1)

    # training
    g.add_argument("--epochs", type=int, default=50)
    g.add_argument("--warmup-epochs", type=int, default=2)
    g.add_argument("--init-lr", type=float, default=1e-4)
    g.add_argument("--max-lr", type=float, default=1e-3)
    g.add_argument("--final-lr", type=float, default=1e-4)
    g.add_argument("--grad-clip", type=float)
    g.add_argument("--patience", type=int, default=None)
    g.add_argument(
        "--min-delta",
        type=float,
        default=0.0,
        help="minimum tracked-metric change that counts as improvement",
    )
    g.add_argument("--class-balance", action="store_true")
    g.add_argument("--seed", "--pytorch-seed", type=int, default=0)
    g.add_argument("--data-seed", type=int, default=0)
    g.add_argument(
        "--remove-checkpoints",
        action="store_true",
        help="delete the per-epoch checkpoints/ dir after training",
    )
    g.add_argument(
        "--profile",
        action="store_true",
        help="capture a jax.profiler trace of the first few training steps "
        "into <output-dir>/profile (view with TensorBoard)",
    )
    g.add_argument(
        "--tensorboard",
        action="store_true",
        help="also log per-epoch scalars as tfevents into "
        "<model-dir>/tensorboard (reference: Lightning TensorBoardLogger; "
        "CSV/JSON history is always written regardless)",
    )

    # splits
    g.add_argument(
        "--split",
        "--split-type",
        default="random",
        choices=["random", "scaffold_balanced", "random_with_repeated_smiles", "kennard_stone", "kmeans"],
    )
    g.add_argument("--split-sizes", nargs=3, type=float, default=[0.8, 0.1, 0.1])
    g.add_argument(
        "--split-key-molecule",
        type=int,
        default=0,
        help="index of the component used for constrained splits (scaffold etc.)",
    )
    g.add_argument("--splits-column")
    g.add_argument("--splits-file", type=Path)
    g.add_argument("--num-replicates", type=int, default=1)
    g.add_argument(
        "-k",
        "--num-folds",
        help="[removed in v2.1.0 of the reference — use --num-replicates]",
    )
    g.add_argument("--save-smiles-splits", action="store_true")
    g.add_argument("--save-data-splits", action="store_true")
    g.add_argument("--ensemble-size", type=int, default=1)

    g.add_argument("--no-batch-norm", action="store_true", help=argparse.SUPPRESS)
    g.add_argument("--no-cache", action="store_true")
    g.add_argument(
        "--edge-partition",
        type=int,
        nargs="?",
        const=0,
        default=None,
        metavar="N",
        help="edge-partitioned training: each molecule's edge table is cut "
        "into contiguous per-chip slices with halo exchange over the device "
        "mesh (N devices; 0/omitted value = all) — for molecules too large "
        "for one chip's batch slice. One molecule per step; exact vs "
        "single-device (parallel/partitioned_mp.py)",
    )

    # transfer learning / resume (reference --checkpoint/--freeze-encoder/
    # --frzn-ffn-layers, cli/train.py:1826-1833; resume is new here)
    g.add_argument("--checkpoint", type=Path, help="warm-start weights from a checkpoint")
    g.add_argument(
        "--model-frzn",
        type=Path,
        help="[deprecated in the reference; = --checkpoint + --freeze-encoder]",
    )
    g.add_argument(
        "--from-foundation",
        help="warm-start the encoder from a foundation model: a local path to a "
        "CheMeleon-style .pt/.ckpt (downloading is unavailable in this build)",
    )
    g.add_argument("--freeze-encoder", action="store_true")
    g.add_argument("--frzn-ffn-layers", type=int, default=0)
    g.add_argument("--resume", type=Path, help="resume a run from a last.ckpt")

    # mol+atom+bond multi-head targets (reference --atom/bond-target-columns,
    # cli/train.py:420-430 + cli/utils/MAB_parsing.py)
    g.add_argument(
        "--mol-target-columns",
        nargs="+",
        help="molecule-level target columns when atom/bond targets are also given "
        "(alias of --target-columns in MAB runs)",
    )
    g.add_argument("--atom-target-columns", nargs="+")
    g.add_argument("--bond-target-columns", nargs="+")
    g.add_argument(
        "--constraints-path",
        type=Path,
        help="CSV of per-molecule sum constraints; either columns named "
        "'<target>_constraint' or raw columns mapped via --constraints-to-targets",
    )
    g.add_argument(
        "--constraints-to-targets",
        nargs="+",
        help="atom/bond target column names corresponding to each constraints-CSV column",
    )
    # per-head FFN config (reference cli/train.py:327-400)
    g.add_argument("--atom-task-weights", nargs="+", type=float)
    g.add_argument("--bond-task-weights", nargs="+", type=float)
    g.add_argument("--atom-ffn-hidden-dim", type=int, nargs="+", default=None)
    g.add_argument("--atom-ffn-num-layers", type=int, default=None)
    g.add_argument("--bond-ffn-hidden-dim", type=int, nargs="+", default=None)
    g.add_argument("--bond-ffn-num-layers", type=int, default=None)
    g.add_argument("--atom-multiclass-num-classes", type=int, default=3)
    g.add_argument("--bond-multiclass-num-classes", type=int, default=3)
    g.add_argument("--atom-constrainer-ffn-hidden-dim", type=int, nargs="+", default=None)
    g.add_argument("--atom-constrainer-ffn-num-layers", type=int, default=None)
    g.add_argument("--bond-constrainer-ffn-hidden-dim", type=int, nargs="+", default=None)
    g.add_argument("--bond-constrainer-ffn-num-layers", type=int, default=None)
    g.add_argument(
        "--activation-args",
        nargs="+",
        type=float,
        help="positional args for the activation (e.g. leakyrelu negative slope)",
    )
    return parser


def process_train_args(args) -> None:
    """Normalize parsed args in place (cf. reference process_train_args)."""
    # 1-3 input files (reference cli/train.py:126-133,1150-1215): two files =
    # train/val split of the first + the second as test; three = fixed splits
    paths = getattr(args, "data_paths", None) or (
        [args.data_path] if getattr(args, "data_path", None) else []
    )
    args.data_paths = [Path(p) for p in paths]
    if len(args.data_paths) > 1:
        if getattr(args, "atom_target_columns", None) or getattr(args, "bond_target_columns", None):
            raise ValueError(
                "multiple -i files are not supported for atom/bond-target (MAB) training"
            )
        for name in (
            "descriptors_path",
            "atom_features_path",
            "bond_features_path",
            "atom_descriptors_path",
        ):
            if getattr(args, name, None):
                raise ValueError(
                    f"--{name.replace('_', '-')} is not supported with multiple -i files "
                    "(per-file extra-feature tables would be required)"
                )
        if len(args.data_paths) == 3 and args.num_replicates > 1:
            logger.warning(
                "num_replicates is fixed to 1 when train, val, test data are "
                "supplied in 3 separate files"
            )
            args.num_replicates = 1
    if getattr(args, "num_folds", None) is not None:
        raise ValueError(
            "the -k/--num-folds argument was removed in reference v2.1.0 — "
            "use --num-replicates instead"
        )
    if getattr(args, "model_frzn", None) is not None:
        if args.checkpoint is not None:
            raise ValueError("--checkpoint and --model-frzn cannot be used together")
        args.checkpoint = args.model_frzn
        args.freeze_encoder = True
    if getattr(args, "from_foundation", None) is not None and args.checkpoint is not None:
        raise ValueError("--checkpoint and --from-foundation are mutually exclusive")
    if args.frzn_ffn_layers and args.checkpoint is None and args.from_foundation is None:
        raise ValueError(
            "--frzn-ffn-layers requires --checkpoint (or --model-frzn/--from-foundation)"
        )
    if getattr(args, "mol_target_columns", None):
        if args.target_columns:
            raise ValueError("--mol-target-columns and --target-columns are aliases; give one")
        args.target_columns = args.mol_target_columns
    # per-layer FFN widths: a single value stays scalar, a list implies n_layers
    for stem in ("ffn", "atom_ffn", "bond_ffn", "atom_constrainer_ffn", "bond_constrainer_ffn"):
        dims = getattr(args, f"{stem}_hidden_dim", None)
        if isinstance(dims, list):
            if len(dims) == 1:
                setattr(args, f"{stem}_hidden_dim", dims[0])
            else:
                setattr(args, f"{stem}_num_layers", len(dims))


def build_model(args, train_dset, output_transform=None, X_d_transform=None, V_d_transform=None, graph_transform=None):
    multicomponent = isinstance(train_dset, MulticomponentDataset)
    datasets = train_dset.datasets if multicomponent else [train_dset]

    mp_cls = AtomMessagePassing if args.atom_messages else BondMessagePassing
    blocks = []
    n_blocks = 1 if args.mpn_shared else len(datasets)
    # per-component transforms arrive as lists for multicomponent datasets
    V_d_ts = V_d_transform if isinstance(V_d_transform, list) else [V_d_transform] * n_blocks
    graph_ts = (
        graph_transform if isinstance(graph_transform, list) else [graph_transform] * n_blocks
    )
    for k in range(n_blocks):
        blocks.append(
            mp_cls(
                d_h=args.message_hidden_dim,
                bias=args.message_bias,
                depth=args.depth,
                dropout=args.dropout,
                activation=args.activation,
                undirected=args.undirected,
                d_vd=datasets[min(k, len(datasets) - 1)].d_vd or None,
                V_d_transform=V_d_ts[k],
                graph_transform=graph_ts[k],
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

    # always build the criterion here so the loss hyperparameters
    # (--v-kl/--eps/--alpha/...) reach the default loss too (reference
    # cli/train.py:1560-1580)
    loss_cls = (
        LossFunctionRegistry[args.loss_function]
        if args.loss_function is not None
        else PredictorRegistry[args.task_type]._T_default_criterion
    )
    criterion = Factory.build(
        loss_cls,
        task_weights=args.task_weights or 1.0,
        v_kl=args.v_kl,
        eps=getattr(args, "eps", 1e-8),
        alpha=getattr(args, "alpha", 0.1),
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
    key = min(getattr(args, "split_key_molecule", 0), len(components) - 1)
    mols = [dp.mol if hasattr(dp, "mol") else dp.rct for dp in components[key]]
    return make_split_indices(
        mols, args.split, tuple(args.split_sizes), args.data_seed, args.num_replicates
    )


def normalize_inputs(train_dset, val_dset, args):
    """Fit input scalers on train, apply to train+val, return transforms for
    the model graph (used at eval; cf. reference ``cli/train.py:813-920``).

    Multicomponent datasets get PER-COMPONENT ``V_d``/graph transforms
    (lists, one per component — components may carry different extra
    features via the indexed ``--atom-features-path 0 a.npz 1 b.npz``
    syntax); single-component datasets return bare transforms."""
    multicomponent = isinstance(train_dset, MulticomponentDataset)
    datasets = train_dset.datasets if multicomponent else [train_dset]
    if val_dset is None:
        val_datasets = [None] * len(datasets)
    else:
        val_datasets = val_dset.datasets if multicomponent else [val_dset]

    X_d_transform = None
    d0 = datasets[0]
    if d0.d_xd > 0 and not getattr(args, "no_descriptor_scaling", False):
        scaler = d0.normalize_inputs("X_d")
        if scaler is not None:
            val_datasets[0] is not None and val_datasets[0].normalize_inputs("X_d", scaler)
            X_d_transform = ScaleTransform.from_standard_scaler(scaler)

    V_d_transforms, graph_transforms = [], []
    for d, vd in zip(datasets, val_datasets):
        V_d_t = graph_t = None
        if not isinstance(d, ReactionDataset):
            if d.d_vd > 0 and not getattr(args, "no_atom_descriptor_scaling", False):
                scaler = d.normalize_inputs("V_d")
                if scaler is not None:
                    vd is not None and vd.normalize_inputs("V_d", scaler)
                    V_d_t = ScaleTransform.from_standard_scaler(scaler)
            V_t = E_t = None
            if d.d_vf > 0 and not getattr(args, "no_atom_feature_scaling", False):
                scaler = d.normalize_inputs("V_f")
                if scaler is not None:
                    vd is not None and vd.normalize_inputs("V_f", scaler)
                    pad = d.featurizer.atom_fdim - d.d_vf
                    V_t = ScaleTransform.from_standard_scaler(scaler, pad=pad)
            if d.d_ef > 0 and not getattr(args, "no_bond_feature_scaling", False):
                scaler = d.normalize_inputs("E_f")
                if scaler is not None:
                    vd is not None and vd.normalize_inputs("E_f", scaler)
                    pad = d.featurizer.bond_fdim - d.d_ef
                    E_t = ScaleTransform.from_standard_scaler(scaler, pad=pad)
            if V_t is not None or E_t is not None:
                graph_t = GraphTransform(V_t, E_t)
        V_d_transforms.append(V_d_t)
        graph_transforms.append(graph_t)
    if not multicomponent:
        return X_d_transform, V_d_transforms[0], graph_transforms[0]
    return X_d_transform, V_d_transforms, graph_transforms


def main(args) -> int:
    process_train_args(args)
    if getattr(args, "atom_target_columns", None) or getattr(args, "bond_target_columns", None):
        from chemprop_tpu.cli.mab import main_MAB

        return main_MAB(args)

    out_dir = args.output_dir or Path(f"chemprop_tpu_training/{args.data_path.stem}")
    out_dir.mkdir(parents=True, exist_ok=True)

    mesh = _select_devices(args)

    ignore_cols = list(args.ignore_columns or [])
    descriptors_cols = list(getattr(args, "descriptors_columns", None) or [])
    smis, rxns, Y, weights, lt, gt, splits_col_values, input_cols, target_cols = parse_csv(
        args.data_path,
        args.smiles_columns,
        args.reaction_columns,
        args.target_columns,
        ignore_cols + descriptors_cols,
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
    if descriptors_cols:
        import pandas as pd

        df = pd.read_csv(args.data_path, header=None if args.no_header_row else 0)
        col_X = df[descriptors_cols].to_numpy(dtype=np.float64)
        X_d = (
            list(col_X)
            if X_d is None
            else [np.concatenate([a, b]) for a, b in zip(X_d, col_X)]
        )
    V_fs = load_component_feats(args.atom_features_path, n)
    E_fs = load_component_feats(args.bond_features_path, n)
    V_ds = load_component_feats(args.atom_descriptors_path, n)
    components = make_datapoints(
        smis, rxns, Y, weights, lt, gt,
        keep_h=args.keep_h, add_h=args.add_h, ignore_stereo=args.ignore_stereo,
        molecule_featurizers=mol_featurizers, X_d=X_d, V_fs=V_fs, E_fs=E_fs, V_ds=V_ds,
    )

    # extra -i files (reference cli/train.py:1150-1215): appended to the
    # datapoint pool with known index ranges — 2 files: the second is the
    # test set; 3 files: fixed train/val/test
    extra_ns = []
    for p in args.data_paths[1:]:
        smis2, rxns2, Y2, w2, lt2, gt2, _, _, _ = parse_csv(
            p,
            args.smiles_columns,
            args.reaction_columns,
            args.target_columns,
            ignore_cols + descriptors_cols,
            args.weight_column,
            bounded=args.loss_function is not None and "bounded" in args.loss_function,
            no_header_row=args.no_header_row,
        )
        X_d2 = None
        if descriptors_cols:
            import pandas as pd

            df2 = pd.read_csv(p, header=None if args.no_header_row else 0)
            X_d2 = list(df2[descriptors_cols].to_numpy(dtype=np.float64))
        comps2 = make_datapoints(
            smis2, rxns2, Y2, w2, lt2, gt2,
            keep_h=args.keep_h, add_h=args.add_h, ignore_stereo=args.ignore_stereo,
            molecule_featurizers=mol_featurizers, X_d=X_d2,
        )
        for c, extra in zip(components, comps2):
            c.extend(extra)
        for col in smis:
            smis[col].extend(smis2[col])
        for col in rxns:
            rxns[col].extend(rxns2[col])
        Y = np.concatenate([Y, Y2], axis=0)
        extra_ns.append(len(Y2))

    # save resolved config
    def _jsonable(v):
        try:
            json.dumps(v)
            return v
        except TypeError:
            return str(v)

    with open(out_dir / "config.json", "w") as f:
        json.dump({k: _jsonable(v) for k, v in vars(args).items() if k != "func"}, f, indent=2)

    if len(args.data_paths) == 3:
        n1, n2 = extra_ns
        split_idxs = (
            [list(range(n))],
            [list(range(n, n + n1))],
            [list(range(n + n1, n + n1 + n2))],
        )
    elif splits_col_values is not None:
        tr = [i for i, s in enumerate(splits_col_values) if s == "train"]
        va = [i for i, s in enumerate(splits_col_values) if s == "val"]
        te = [i for i, s in enumerate(splits_col_values) if s == "test"]
        split_idxs = ([tr], [va], [te])
    else:
        # splits are computed over the FIRST file's rows only
        split_idxs = build_splits(args, [c[:n] for c in components])
    if len(args.data_paths) == 2:
        # the second file replaces the test split (its rows sit at [n, n+n1))
        trains_, vals_, _ = split_idxs
        split_idxs = (trains_, vals_, [list(range(n, n + extra_ns[0])) for _ in trains_])
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
        _log_data_summary(rep, train_dset, val_dset, test_dset, target_cols)

        if args.save_smiles_splits or args.save_data_splits:
            split_dir = out_dir / (f"replicate_{rep}" if len(trains) > 1 else ".")
            split_dir.mkdir(parents=True, exist_ok=True)
            _save_split_csvs(
                split_dir, args, (tr_i, va_i, te_i), smis, rxns, Y, target_cols
            )

        X_d_t, V_d_t, graph_t = normalize_inputs(train_dset, val_dset, args)

        output_transform = None
        if args.task_type.startswith("regression"):
            scaler = train_dset.normalize_targets()
            if val_dset is not None:
                val_dset.normalize_targets(scaler)
            output_transform = UnscaleTransform.from_standard_scaler(scaler)
            logger.info(f"train target μ={scaler.mean_} σ={scaler.scale_}")

        if getattr(args, "edge_partition", None) is not None:
            scores = _train_edge_partitioned(
                args, train_dset, val_dset, test_dset, output_transform,
                X_d_t, V_d_t, graph_t,
                out_dir / (f"replicate_{rep}" if len(trains) > 1 else "."),
                target_cols,
            )
            if scores is not None:
                all_scores.append(scores)
            continue

        if not args.no_cache:
            for d in (train_dset, val_dset):
                if d is None:
                    continue
                if getattr(args, "use_cuikmolmaker_featurization", False) and hasattr(
                    d, "populate_cache_native"
                ):
                    if not d.populate_cache_native(keep_h=args.keep_h):
                        logger.warning(
                            "native featurizer unavailable/incompatible; "
                            "falling back to Python featurization cache"
                        )
                        d.cache = True
                else:
                    d.cache = True

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

            monitor, mode, val_metrics = "val_loss", "min", {}
            tracking = getattr(args, "tracking_metric", "val_loss")
            if tracking and tracking != "val_loss":
                tm = Factory.build(
                    MetricRegistry[tracking],
                    n_classes=args.multiclass_num_classes,
                    assume_logits=False,
                )
                val_metrics[tracking] = tm
                monitor = f"val_{tracking}"
                mode = "max" if tm.higher_is_better else "min"
            trainer = Trainer(
                model,
                max_epochs=args.epochs,
                warmup_epochs=args.warmup_epochs,
                init_lr=args.init_lr,
                max_lr=args.max_lr,
                final_lr=args.final_lr,
                grad_clip=args.grad_clip,
                patience=args.patience,
                min_delta=getattr(args, "min_delta", 0.0),
                monitor=monitor,
                mode=mode,
                val_metrics=val_metrics,
                mesh=mesh,
                profile_dir=(model_dir / "profile") if getattr(args, "profile", False) else None,
                tensorboard_dir=(model_dir / "tensorboard")
                if getattr(args, "tensorboard", False)
                else None,
                checkpoint_dir=model_dir / "checkpoints",
                seed=args.seed + member,
                log_every=1,
                freeze=freeze,
            )
            if getattr(args, "from_foundation", None) is not None:
                _warm_start_encoder(trainer, args, train_loader)
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
            if getattr(args, "remove_checkpoints", False):
                import shutil

                shutil.rmtree(model_dir / "checkpoints", ignore_errors=True)

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


def _train_edge_partitioned(
    args, train_dset, val_dset, test_dset, output_transform, X_d_t, V_d_t, graph_t,
    out_dir, target_cols,
):
    """Edge-partitioned training loop: one molecule per step, its edge table
    sharded across the device mesh with halo exchange
    (``parallel/partitioned_mp.py``). Saves a STANDARD checkpoint — the
    trained model loads and predicts on the normal path too.

    Molecules are grouped into geometric DIM BUCKETS (edge pad quantized to
    powers of two) so one giant molecule no longer pads every small
    molecule's step to giant dims — each bucket compiles once. Molecules
    too small to partition across the mesh at all (node halo would exceed
    a shard's owned range) take a DENSE batched step sharing the same
    parameters and optimizer state — mixed giant+small datasets train in
    one run. When a validation split exists, per-epoch validation loss
    drives best-weight tracking and ``--patience`` early stopping
    (mirrors the dense path)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from chemprop_tpu.data.collate import collate_batch
    from chemprop_tpu.models.serialize import save_model
    from chemprop_tpu.parallel.partitioned_mp import (
        PartitionedInference,
        check_partitionable,
        make_partitioned_apply,
        make_partitioned_train_step,
        plan_buckets,
    )
    from chemprop_tpu.train.schedulers import build_noam_like_schedule
    from chemprop_tpu.train.trainer import TrainState

    n_dev = args.edge_partition if args.edge_partition and args.edge_partition > 0 else len(
        jax.devices()
    )
    n_dev = min(n_dev, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    model = build_model(args, train_dset, output_transform, X_d_t, V_d_t, graph_t)
    check_partitionable(model)
    out_dir.mkdir(parents=True, exist_ok=True)

    def data(dset):
        return [dset[i] for i in range(len(dset))] if dset is not None else []

    train = data(train_dset)
    vals = data(val_dset)
    tests = data(test_dset)
    if not train:
        raise ValueError("--edge-partition training needs a non-empty train split")

    # ---- route: molecules that cannot partition across this mesh (halo
    # wider than a shard's owned range) take the dense batched step;
    # partitionable molecules land in power-of-two dim buckets (one
    # compiled program per bucket, single-phase halo only when every
    # member satisfies the >= 2*HN ownership guard)
    all_data = train + vals + tests
    keys, graphs, bucket_dims = plan_buckets(all_data, n_dev)
    dense_sel = [k is None for k in keys]
    g_train, k_train = graphs[: len(train)], keys[: len(train)]
    g_val = graphs[len(train) : len(train) + len(vals)]
    k_val = keys[len(train) : len(train) + len(vals)]
    g_test = graphs[len(train) + len(vals) :]
    k_test = keys[len(train) + len(vals) :]
    n_dense = sum(dense_sel)
    logger.info(
        f"edge-partitioned training over {n_dev} devices: "
        f"{len(bucket_dims)} dim bucket(s) "
        + ", ".join(
            f"[P≤{k}: {sum(1 for x in keys if x == k)} mols"
            f"{' 1-phase halo' if bucket_dims[k].single_phase else ''}]"
            for k in sorted(bucket_dims)
        )
        + (f" + {n_dense} dense-path molecules" if n_dense else "")
        + f", {len(train)} molecules/epoch"
    )

    batch0 = collate_batch([train[0]])
    variables = model.init(
        jax.random.PRNGKey(args.seed), batch0.bmg, batch0.V_d, batch0.X_d,
        is_training=False,
    )
    # per-datum extra descriptors [1, d_xd] (replicated across shards)
    x_ds = [
        None if d.x_d is None else jnp.asarray(np.asarray(d.x_d, np.float32).reshape(1, -1))
        for d in all_data
    ]
    x_train = x_ds[: len(train)]
    x_val = x_ds[len(train) : len(train) + len(vals)]
    x_test = x_ds[len(train) + len(vals) :]
    # dense-path grouping (small molecules): fixed-shape batches of up to
    # --batch-size under one dataset-wide PadSpec
    from chemprop_tpu.data.collate import PadSpec

    dense_train = [i for i in range(len(train)) if dense_sel[i]]
    part_train = [i for i in range(len(train)) if not dense_sel[i]]
    dense_bs = max(1, min(args.batch_size, max(1, len(dense_train))))
    dense_pad = None
    if any(dense_sel):
        dense_pad = PadSpec.for_graphs(
            [d.mg for d, s in zip(all_data, dense_sel) if s], n_graphs=dense_bs
        )
    n_dense_batches = -(-len(dense_train) // dense_bs) if dense_train else 0
    steps = max(1, len(part_train) + n_dense_batches)
    sched = build_noam_like_schedule(
        args.warmup_epochs * steps,
        max(1, (args.epochs - args.warmup_epochs) * steps),
        args.init_lr, args.max_lr, args.final_lr,
    )
    tx = optax.adam(sched)
    state = TrainState(
        params=variables["params"],
        batch_stats={},
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(args.seed),
    )
    step_fns = {k: make_partitioned_train_step(model, tx, mesh, bucket_dims[k]) for k in bucket_dims}
    val_apply_fns = (
        {k: make_partitioned_apply(model, mesh, bucket_dims[k], train_space=True)
         for k in set(k for k in k_val if k is not None)}
        if vals
        else {}
    )
    criterion = model.criterion

    def _criterion_update(st, preds, y, w):
        mask = jnp.isfinite(y)
        return criterion.update_state(
            st, preds, jnp.nan_to_num(y), mask, w,
            jnp.zeros_like(mask), jnp.zeros_like(mask),
        )

    @jax.jit
    def dense_step(state, bmg, V_d, X_d, Y, w):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            preds = model.apply(
                {"params": params}, bmg, V_d, X_d, is_training=True,
                method="train_step_preds", rngs={"dropout": dropout_rng},
            )
            return criterion.compute(_criterion_update(criterion.init_state(), preds, Y, w))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=params, opt_state=opt_state, step=state.step + 1, rng=rng
        ), loss

    @jax.jit
    def dense_preds(params, bmg, V_d, X_d):
        return model.apply(
            {"params": params}, bmg, V_d, X_d, is_training=False,
            method="train_step_preds",
        )

    # epoch-invariant validation inputs: collation and target arrays are
    # built once; val_loss_of only re-runs the device programs each epoch
    val_part = [
        (
            k, g, xd,
            jnp.asarray(np.asarray(d.y, np.float32))[None],
            jnp.asarray([np.float32(d.weight)]),
        )
        for d, g, k, xd in zip(vals, g_val, k_val, x_val)
        if k is not None
    ]
    val_dense = []
    dense_val_data = [d for d, k in zip(vals, k_val) if k is None]
    for j in range(0, len(dense_val_data), dense_bs):
        chunk = dense_val_data[j : j + dense_bs]
        vb = collate_batch(chunk, dense_pad)
        y = jnp.asarray(np.asarray([np.asarray(d.y, np.float32) for d in chunk]))
        w = jnp.asarray(np.asarray([np.float32(d.weight) for d in chunk]))
        val_dense.append((vb, y, w, len(chunk)))

    def val_loss_of(params):
        st = criterion.init_state()
        for k, g, xd, y, w in val_part:
            preds = val_apply_fns[k]({"params": params}, g, xd)
            st = _criterion_update(st, preds, y, w)
        for vb, y, w, n in val_dense:
            preds = dense_preds(params, vb.bmg, vb.V_d, vb.X_d)[:n]
            st = _criterion_update(st, preds, y, w)
        return float(criterion.compute(st))

    rng = np.random.default_rng(args.data_seed)
    history = []
    best_val = float("inf")
    best_params = None
    patience = args.patience if (vals and args.patience) else None
    bad_epochs = 0
    for epoch in range(args.epochs):
        # interleave partitioned molecules and dense batches in one
        # shuffled work list per epoch
        d_order = rng.permutation(len(dense_train)) if dense_train else np.array([], int)
        work: list = [("p", i) for i in part_train]
        for j in range(0, len(d_order), dense_bs):
            work.append(("d", [dense_train[t] for t in d_order[j : j + dense_bs]]))
        work = [work[t] for t in rng.permutation(len(work))]
        losses = []
        for kind, payload in work:
            if kind == "p":
                i = int(payload)
                y = np.asarray(train[i].y, np.float32)[None]
                w = np.asarray([train[i].weight], np.float32)
                state, loss = step_fns[k_train[i]](
                    state, g_train[i], jnp.asarray(y), jnp.asarray(w), x_train[i]
                )
            else:
                chunk = [train[i] for i in payload]
                db = collate_batch(chunk, dense_pad)
                Y = np.full((dense_bs, np.asarray(chunk[0].y).size), np.nan, np.float32)
                W = np.zeros((dense_bs,), np.float32)
                for t, d in enumerate(chunk):
                    Y[t] = np.asarray(d.y, np.float32)
                    W[t] = np.float32(d.weight)
                state, loss = dense_step(
                    state, db.bmg, db.V_d, db.X_d, jnp.asarray(Y), jnp.asarray(W)
                )
            losses.append(loss)
        train_loss = float(np.mean(jax.device_get(losses)))
        rec = {"epoch": epoch, "train_loss": train_loss}
        if vals:
            vl = val_loss_of(state.params)
            rec["val_loss"] = vl
            if vl < best_val:
                best_val, bad_epochs = vl, 0
                best_params = jax.device_get(state.params)
            else:
                bad_epochs += 1
        history.append(rec)
        logger.info(
            f"epoch={epoch} train_loss={train_loss:.5g}"
            + (f" val_loss={rec['val_loss']:.5g}" if vals else "")
        )
        if patience is not None and bad_epochs >= patience:
            logger.info(f"early stopping at epoch {epoch} (patience={patience})")
            break

    final_params = best_params if best_params is not None else jax.device_get(state.params)
    final_vars = {"params": final_params, "batch_stats": {}}
    save_model(out_dir / "best.ckpt", model, final_vars, output_columns=target_cols)
    with open(out_dir / "history.json", "w") as f:
        json.dump(history, f, indent=2)

    scores = None
    if tests:
        # reuse the already-built test graphs/buckets; dense-routed test
        # molecules are batched per dispatch inside the session
        session = PartitionedInference(
            model, tests, plan=(k_test, g_test, bucket_dims), mesh=mesh,
            dense_batch_size=dense_bs,
        )
        preds = session.run(final_vars)
        scores = _score_test(preds, test_dset, args, target_cols)
        logger.info(f"edge-partitioned test scores: {scores}")
        _save_preds(out_dir / "test_predictions.csv", test_dset, preds, target_cols)
    return scores


def _log_data_summary(rep, train_dset, val_dset, test_dset, target_cols) -> None:
    """Per-split size and per-task target statistics (the reference renders
    these as rich tables, cli/train.py:1229-1311)."""
    sizes = {
        "train": len(train_dset),
        "val": len(val_dset) if val_dset is not None else 0,
        "test": len(test_dset) if test_dset is not None else 0,
    }
    logger.info(
        f"replicate {rep} split sizes: "
        + "  ".join(f"{k}={v}" for k, v in sizes.items())
    )
    try:
        Y = np.asarray(train_dset._Y, dtype=np.float64)
        lines = []
        for j, col in enumerate(target_cols[: Y.shape[1]]):
            y = Y[:, j]
            y = y[np.isfinite(y)]
            if y.size:
                lines.append(
                    f"  {col}: n={y.size} mean={y.mean():.4g} std={y.std():.4g} "
                    f"min={y.min():.4g} max={y.max():.4g}"
                )
        if lines:
            logger.info("train target summary:\n" + "\n".join(lines))
    except Exception:  # raw targets may be non-numeric views (MAB lists)
        pass


def _select_devices(args):
    """--accelerator/--devices: pick the JAX platform and build a
    data-parallel mesh when >1 device is requested (the reference forwards
    these to the Lightning Trainer; here they pick the jax.sharding.Mesh)."""
    accelerator = getattr(args, "accelerator", "auto")
    if accelerator not in (None, "auto"):
        import jax

        try:
            jax.config.update("jax_platforms", accelerator.lower())
        except Exception as e:
            logger.warning(f"could not select platform {accelerator}: {e}")
    devices = getattr(args, "devices", "auto")
    if devices in (None, "auto", 1, "1"):
        return None
    import jax

    from chemprop_tpu.parallel import make_mesh

    n = int(devices)
    avail = jax.devices()
    if n > len(avail):
        logger.warning(f"requested {n} devices, only {len(avail)} available")
        n = len(avail)
    return make_mesh(avail[:n]) if n > 1 else None


def _save_split_csvs(split_dir, args, split_idxs, smis, rxns, Y, target_cols) -> None:
    """Write {train,val,test}_smiles.csv (and *_full.csv with targets when
    --save-data-splits; cf. reference cli/train.py:1100-1226 split saving)."""
    import pandas as pd

    input_cols = list(smis.keys()) + list(rxns.keys())
    frame = {c: smis.get(c, rxns.get(c)) for c in input_cols}
    for name, idxs in zip(("train", "val", "test"), split_idxs):
        idxs = list(map(int, idxs))
        if not idxs:
            continue
        if args.save_smiles_splits:
            df = pd.DataFrame({c: [frame[c][i] for i in idxs] for c in input_cols})
            df.to_csv(split_dir / f"{name}_smiles.csv", index=False)
        if args.save_data_splits:
            data = {c: [frame[c][i] for i in idxs] for c in input_cols}
            for j, t in enumerate(target_cols):
                data[t] = [Y[i, j] for i in idxs]
            pd.DataFrame(data).to_csv(split_dir / f"{name}_full.csv", index=False)


def _warm_start_encoder(trainer, args, train_loader) -> None:
    """--from-foundation: graft a foundation model's message-passing weights
    into a fresh model (reference CheMeleon flow, cli/train.py:1466-1498;
    downloading is unavailable here, so the flag takes a local path)."""
    from flax import serialization

    path = Path(args.from_foundation)
    if not path.exists():
        raise FileNotFoundError(
            f"--from-foundation expects a local checkpoint path in this build "
            f"(no network access to fetch named foundation models); got {path}"
        )
    if path.suffix == ".pt":
        from chemprop_tpu.models.torch_convert import convert_model

        _, fvars, _ = convert_model(path)
    else:
        from chemprop_tpu.models.serialize import load_checkpoint

        _, fvars, _ = load_checkpoint(path)
    fparams = fvars["params"]
    if "message_passing" not in fparams:
        raise ValueError(f"{path} has no message_passing params to warm-start from")
    first = next(iter(train_loader))
    trainer.state = trainer.init_state(first, len(train_loader))
    mp = serialization.from_state_dict(
        trainer.state.params["message_passing"], fparams["message_passing"]
    )
    params = dict(trainer.state.params)
    params["message_passing"] = mp
    trainer.state = trainer.state.replace(params=type(trainer.state.params)(params))


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

    def _one(metric, p, y, m) -> float:
        if metric.needs_collection:
            return float(metric.compute_from_arrays(np.asarray(p), y, m))
        state = metric.update_state(
            metric.init_state(),
            jnp.asarray(p),
            jnp.nan_to_num(jnp.asarray(y)),
            jnp.asarray(m),
            jnp.ones(len(y)),
            None,
            None,
        )
        return float(metric.compute(state))

    for name in metric_names:
        metric = Factory.build(
            MetricRegistry[name],
            n_classes=args.multiclass_num_classes,
            # predict-space preds are probabilities, not logits
            assume_logits=False,
        )
        try:
            scores[name] = _one(metric, preds_for_metric, Y, mask)
        except Exception as e:  # scoring must never kill a finished run
            logger.warning(f"metric {name} failed: {e}")
            scores[name] = float("nan")
        if getattr(args, "show_individual_scores", False) and Y.shape[1] > 1:
            for j, col in enumerate(target_cols[: Y.shape[1]]):
                try:
                    p_j = np.asarray(preds_for_metric)[:, j : j + 1]
                    scores[f"{name}_{col}"] = _one(metric, p_j, Y[:, j : j + 1], mask[:, j : j + 1])
                except Exception:
                    scores[f"{name}_{col}"] = float("nan")
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
