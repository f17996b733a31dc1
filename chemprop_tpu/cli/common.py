"""Shared CLI argument groups (cf. reference ``chemprop/cli/common.py``)."""

from __future__ import annotations

import argparse
from pathlib import Path


def add_common_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    group = parser.add_argument_group("Shared input args")
    # also accepted after the subcommand (reference ConfigArgParse behavior:
    # `chemprop train --config-path cfg.toml`); the defaults themselves are
    # injected pre-parse by cli.main._apply_config_defaults
    group.add_argument("--config-path", type=Path, help="JSON/TOML file of argument defaults")
    group.add_argument(
        "-i",
        "--data-path",
        type=Path,
        nargs="+",
        help="input CSV path(s). train accepts one, two, or three files "
        "(reference cli/train.py:126-133): one = train/val/test split; two = "
        "the first is train/val-split and the second is the test set; three = "
        "fixed train, val, test. Other subcommands take exactly one.",
    )
    group.add_argument(
        "-s", "--smiles-columns", nargs="+", help="SMILES column name(s); >1 = multicomponent"
    )
    group.add_argument(
        "--reaction-columns", nargs="+", help="reaction SMILES column name(s)"
    )
    group.add_argument("--no-header-row", action="store_true")
    group.add_argument(
        "--multi-hot-atom-featurizer-mode",
        default="v2",
        choices=["v1", "v2", "organic", "rigr"],
    )
    group.add_argument(
        "--rxn-mode",
        "--reaction-mode",
        default="reac_diff",
        choices=[
            "reac_prod",
            "reac_prod_balance",
            "reac_diff",
            "reac_diff_balance",
            "prod_diff",
            "prod_diff_balance",
        ],
    )
    group.add_argument("--keep-h", action="store_true")
    group.add_argument("--add-h", action="store_true")
    group.add_argument("--ignore-stereo", action="store_true")
    group.add_argument(
        "--reorder-atoms",
        action="store_true",
        help="reorder atoms by atom map numbers (cf. reference common.py:95)",
    )
    group.add_argument(
        "--molecule-featurizers",
        "--features-generators",
        nargs="+",
        choices=sorted(_molecule_featurizer_keys()),
        help="extra global descriptor featurizers",
    )
    group.add_argument("--descriptors-path", type=Path, help=".npz of extra descriptors X_d")
    group.add_argument(
        "--descriptors-columns",
        nargs="+",
        help="input-CSV column names holding extra datapoint descriptors (e.g. temperature)",
    )
    # a single PATH (component 0) or (IDX PATH) pairs for multicomponent
    # inputs — reference per-component syntax (common.py:194-231)
    group.add_argument(
        "--atom-features-path", nargs="+",
        help=".npz extra atom features V_f: PATH, or IDX PATH pairs",
    )
    group.add_argument(
        "--bond-features-path", nargs="+",
        help=".npz extra bond features E_f: PATH, or IDX PATH pairs",
    )
    group.add_argument(
        "--atom-descriptors-path", nargs="+",
        help=".npz extra atom descriptors V_d: PATH, or IDX PATH pairs",
    )
    group.add_argument(
        "--bond-descriptors-path", nargs="+",
        help=".npz extra bond descriptors E_d (mol/atom/bond models only): "
        "PATH, or IDX PATH pairs",
    )
    group.add_argument("--no-descriptor-scaling", action="store_true")
    group.add_argument("--no-atom-feature-scaling", action="store_true")
    group.add_argument("--no-atom-descriptor-scaling", action="store_true")
    group.add_argument("--no-bond-feature-scaling", action="store_true")
    group.add_argument("--no-bond-descriptor-scaling", action="store_true")
    group.add_argument(
        "--use-cuikmolmaker-featurization",
        action="store_true",
        help="use the native C++ batch featurizer (csrc/featurizer.cpp) for "
        "accelerated atom/bond featurization (cuik-molmaker equivalent)",
    )
    group.add_argument("-n", "--num-workers", type=int, default=0)
    group.add_argument("-b", "--batch-size", type=int, default=64)
    group.add_argument(
        "--accelerator", default="auto", help="JAX platform to use: auto|tpu|cpu"
    )
    group.add_argument(
        "--devices",
        default="auto",
        help="number of devices for data-parallel training ('auto' = all local)",
    )
    return parser


def _molecule_featurizer_keys() -> list[str]:
    from chemprop_tpu.featurizers.molecule import MoleculeFeaturizerRegistry

    return list(MoleculeFeaturizerRegistry.keys())


def find_models(model_paths: list[Path]) -> list[Path]:
    """Expand directories to model checkpoints (cf. reference
    ``cli/common.py:274-288``). A training output dir yields its ``best.ckpt``
    once (not the ``checkpoints/`` duplicate, and never the full-state
    ``last.ckpt``, which carries optimizer state for resume, not inference);
    other dirs yield every ``*.ckpt``/``*.pt`` below them minus those."""
    found = []
    for p in model_paths:
        p = Path(p)
        if p.suffix in (".ckpt", ".pt"):
            found.append(p)
        elif p.is_dir():
            if (p / "best.ckpt").exists():
                found.append(p / "best.ckpt")
            else:
                found.extend(
                    f
                    for f in sorted(list(p.rglob("*.ckpt")) + list(p.rglob("*.pt")))
                    if f.name != "last.ckpt"
                )
        else:
            raise ValueError(f"cannot interpret model path {p}")
    return found
