"""Reference-compatible CLI utility surface (cf. reference
``chemprop/cli/utils/__init__.py``): argparse helpers, the ``Subcommand``
ABC, CSV/datapoint factories, and small attribute utilities. The heavy
lifting lives in :mod:`chemprop_tpu.cli.parsing` / :mod:`chemprop_tpu.cli.mab`;
this package provides the same entry-point names the reference exports so
user scripts written against ``chemprop.cli.utils`` port directly.
"""

from __future__ import annotations

from chemprop_tpu.cli.utils import actions, args, command, parsing, utils
from chemprop_tpu.cli.utils.actions import LookupAction
from chemprop_tpu.cli.utils.args import activation_function_argument, bounded
from chemprop_tpu.cli.utils.command import Subcommand
from chemprop_tpu.cli.utils.parsing import (
    build_data_from_files,
    build_MAB_data_from_files,
    get_column_names,
    make_datapoints,
    make_dataset,
    parse_activation,
    parse_indices,
)
from chemprop_tpu.cli.utils.utils import (
    _pop_attr,
    _pop_attr_d,
    format_probability_string,
    pop_attr,
)

__all__ = [
    "activation_function_argument",
    "bounded",
    "LookupAction",
    "Subcommand",
    "build_data_from_files",
    "build_MAB_data_from_files",
    "make_datapoints",
    "make_dataset",
    "get_column_names",
    "parse_activation",
    "parse_indices",
    "actions",
    "args",
    "command",
    "format_probability_string",
    "parsing",
    "utils",
    "pop_attr",
    "_pop_attr",
    "_pop_attr_d",
]
