"""``chemprop-tpu fingerprint`` — learned fingerprints / hidden encodings
(cf. reference ``chemprop/cli/fingerprint.py:25-258``)."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from chemprop_tpu.cli.common import add_common_args, find_models
from chemprop_tpu.cli.predict import _build_loader
from chemprop_tpu.models.serialize import load_model


def add_fingerprint_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    add_common_args(parser)
    g = parser.add_argument_group("Fingerprint args")
    g.add_argument("-o", "--output", type=Path, default=None)
    g.add_argument("--model-paths", "--model-path", nargs="+", type=Path, required=True)
    g.add_argument(
        "--ffn-block-index",
        type=int,
        default=-1,
        help="use predictor FFN blocks [:i] on top of the fingerprint",
    )
    return parser


def main(args) -> int:
    import jax

    model_paths = find_models(args.model_paths)
    loader, dset, _ = _build_loader(args, args.data_path)

    for k, path in enumerate(model_paths):
        model, variables, _ = load_model(path)
        apply = jax.jit(
            lambda v, bmg, V_d, X_d: model.apply(
                v, bmg, V_d, X_d, i=args.ffn_block_index, method="encoding"
            )
        )
        chunks = []
        for batch in loader:
            enc = apply(variables, batch.bmg, batch.V_d, batch.X_d)
            chunks.append(np.asarray(enc)[batch.pad_mask])
        fps = np.concatenate(chunks, 0)

        out = args.output or args.data_path.with_name(args.data_path.stem + "_fingerprint.csv")
        if len(model_paths) > 1:
            out = out.with_name(f"{out.stem}_model_{k}{out.suffix}")
        out.parent.mkdir(parents=True, exist_ok=True)
        if out.suffix == ".npz":
            np.savez(out, fps=fps)
        else:
            df = pd.DataFrame(fps, columns=[f"fp_{i}" for i in range(fps.shape[1])])
            df.insert(0, "name", dset.names)
            df.to_csv(out, index=False)
        print(f"wrote {out} {fps.shape}")
    return 0


class FingerprintSubcommand:
    COMMAND = "fingerprint"
    HELP = "use trained model(s) to compute learned representations"

    @classmethod
    def add(cls, subparsers) -> argparse.ArgumentParser:
        parser = subparsers.add_parser(cls.COMMAND, help=cls.HELP)
        add_fingerprint_args(parser)
        parser.set_defaults(func=main)
        return parser
