"""CLI entry point (cf. reference ``chemprop/cli/main.py``): subcommands
train / predict / fingerprint / convert / hpopt, logging setup, and optional
JSON/TOML config files via ``--config-path`` (values become argument
defaults, mirroring ConfigArgParse semantics)."""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

from chemprop_tpu import __version__

logger = logging.getLogger(__name__)

LOG_LEVELS = {0: logging.INFO, 1: logging.DEBUG, -1: logging.WARNING, -2: logging.ERROR}


def construct_parser() -> argparse.ArgumentParser:
    from chemprop_tpu.cli.convert import ConvertSubcommand
    from chemprop_tpu.cli.fingerprint import FingerprintSubcommand
    from chemprop_tpu.cli.hpopt import HpoptSubcommand
    from chemprop_tpu.cli.serve import ServeSubcommand
    from chemprop_tpu.cli.predict import PredictSubcommand
    from chemprop_tpu.cli.train import TrainSubcommand

    parser = argparse.ArgumentParser(prog="chemprop-tpu")
    parser.add_argument("--version", action="version", version=__version__)
    parser.add_argument("--logfile", "--log", nargs="?", const="default")
    parser.add_argument("-v", action="count", default=0, dest="verbose")
    parser.add_argument("-q", action="count", default=0, dest="quiet")
    parser.add_argument("--config-path", type=Path, help="JSON/TOML file of argument defaults")

    subparsers = parser.add_subparsers(title="mode", dest="mode", required=True)
    for cmd in (
        TrainSubcommand,
        PredictSubcommand,
        FingerprintSubcommand,
        ConvertSubcommand,
        HpoptSubcommand,
        ServeSubcommand,
    ):
        cmd.add(subparsers)
    return parser


def _apply_config_defaults(argv: list[str], parser) -> list[str]:
    if "--config-path" not in argv:
        return argv
    i = argv.index("--config-path")
    path = Path(argv[i + 1])
    if path.suffix == ".toml":
        import tomllib

        cfg = tomllib.loads(path.read_text())
    else:
        cfg = json.loads(path.read_text())
    extra: list[str] = []
    for k, v in cfg.items():
        flag = f"--{k.replace('_', '-')}"
        if flag in argv or v is None:
            continue
        if isinstance(v, bool):
            if v:
                extra.append(flag)
        elif isinstance(v, (list, tuple)):
            extra.extend([flag, *map(str, v)])
        else:
            extra.extend([flag, str(v)])
    # insert after the subcommand
    return argv + extra


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = construct_parser()
    argv = _apply_config_defaults(argv, parser)
    args = parser.parse_args(argv)

    level = LOG_LEVELS.get(min(max(args.verbose - args.quiet, -2), 1), logging.INFO)
    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stderr)]
    if args.logfile:
        logpath = (
            Path("chemprop_tpu.log") if args.logfile == "default" else Path(args.logfile)
        )
        handlers.append(logging.FileHandler(logpath))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=handlers,
        force=True,
    )
    # -i accepts 1-3 files for train (reference cli/train.py:126-133) and
    # exactly one elsewhere; downstream code sees args.data_path (first file)
    # plus args.data_paths (the full list)
    dp = getattr(args, "data_path", None)
    if isinstance(dp, list):
        if args.mode == "train":
            if not 1 <= len(dp) <= 3:
                parser.error("train takes one, two, or three -i/--data-path files")
        elif len(dp) != 1:
            parser.error(f"{args.mode} takes exactly one -i/--data-path file")
        args.data_paths = dp
        args.data_path = dp[0]
    elif dp is not None:
        args.data_paths = [dp]

    logger.info(f"chemprop-tpu {__version__} :: {args.mode}")
    return args.func(args) or 0


if __name__ == "__main__":
    raise SystemExit(main())
