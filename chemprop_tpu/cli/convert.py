"""``chemprop-tpu convert`` — import reference PyTorch checkpoints
(cf. reference ``chemprop/cli/convert.py``; here the conversion target is the
chemprop-tpu checkpoint format, validated to forward-parity 1e-7)."""

from __future__ import annotations

import argparse
from pathlib import Path


def add_convert_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument(
        "-i", "--input-path", type=Path, required=True, help="reference .pt/.ckpt checkpoint"
    )
    parser.add_argument("-o", "--output-path", type=Path, default=None)
    parser.add_argument(
        "--conversion",
        default="torch_to_tpu",
        choices=["torch_to_tpu", "v1_to_v2", "v2_0_to_v2_1"],
        help="only torch_to_tpu is meaningful here; the others are accepted "
        "for reference-CLI compatibility and also produce a tpu checkpoint",
    )
    return parser


def main(args) -> int:
    from chemprop_tpu.models.serialize import save_model
    from chemprop_tpu.models.torch_convert import convert_model

    out = args.output_path or args.input_path.with_suffix(".tpu.ckpt")
    model, variables, output_columns = convert_model(args.input_path)
    save_model(out, model, variables, output_columns=output_columns)
    print(f"converted {args.input_path} -> {out}")
    return 0


class ConvertSubcommand:
    COMMAND = "convert"
    HELP = "convert a reference PyTorch checkpoint to a chemprop-tpu checkpoint"

    @classmethod
    def add(cls, subparsers) -> argparse.ArgumentParser:
        parser = subparsers.add_parser(cls.COMMAND, help=cls.HELP)
        add_convert_args(parser)
        parser.set_defaults(func=main)
        return parser
