"""Shared plumbing for the runnable examples: repo-relative data paths and
an in-process CLI runner. Every example executes on CPU in seconds and
writes its artifacts under ``examples/out/<name>/``."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / "tests" / "data"

sys.path.insert(0, str(REPO))


def out_dir(name: str) -> Path:
    d = Path(__file__).resolve().parent / "out" / name
    d.mkdir(parents=True, exist_ok=True)
    return d


def run_cli(argv: list[str]) -> None:
    """Run a chemprop-tpu subcommand in-process (same as the console
    entry point ``chemprop-tpu <subcommand> ...``)."""
    from chemprop_tpu.cli.main import main

    old = sys.argv
    sys.argv = ["chemprop-tpu", *map(str, argv)]
    try:
        rc = main()
        if rc not in (0, None):
            raise SystemExit(rc)
    finally:
        sys.argv = old
