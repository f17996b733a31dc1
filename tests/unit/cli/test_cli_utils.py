"""The reference-compatible ``chemprop_tpu.cli.utils`` surface (cf. reference
``chemprop/cli/utils/__init__.py`` exports)."""

import argparse

import numpy as np
import pytest

from chemprop_tpu.cli.utils import (
    LookupAction,
    Subcommand,
    activation_function_argument,
    bounded,
    build_data_from_files,
    format_probability_string,
    get_column_names,
    parse_activation,
    parse_indices,
    pop_attr,
)

DATA = "tests/data/regression/mol/mol.csv"


def test_parse_indices():
    assert parse_indices("0,1,2-4") == [0, 1, 2, 3, 4]
    assert parse_indices("7") == [7]
    assert parse_indices([3, 4]) == [3, 4]


def test_bounded():
    f = bounded(lo=0.0, hi=1.0)(float)
    assert f("0.5") == 0.5
    with pytest.raises(ValueError):
        f("1.5")
    with pytest.raises(ValueError):
        f("-0.1")
    with pytest.raises(ValueError):
        bounded()


def test_activation_function_argument():
    assert activation_function_argument("0.1") == 0.1
    assert activation_function_argument("negative_slope=0.1") == {"negative_slope": 0.1}
    assert activation_function_argument("flag=true") == {"flag": True}
    assert activation_function_argument("n=3") == {"n": 3}


def test_parse_activation():
    class A:
        def __init__(self, x, y=0):
            self.x, self.y = x, y

    a = parse_activation(A, [1.5, {"y": 2}])
    assert a.x == 1.5 and a.y == 2


def test_pop_attr():
    ns = argparse.Namespace(a=1)
    assert pop_attr(ns, "a") == 1
    assert not hasattr(ns, "a")
    assert pop_attr(ns, "a", 42) == 42
    with pytest.raises(AttributeError):
        pop_attr(ns, "a")


def test_format_probability_string():
    out = format_probability_string(np.array([[0.25, 0.75]]))
    assert out.shape == (1,)
    a, b = out[0].split(",")
    assert float(a) == 0.25 and float(b) == 0.75


def test_lookup_action():
    parser = argparse.ArgumentParser()
    parser.add_argument("--agg", action=LookupAction({"mean": 1, "sum": 2}), default="mean")
    assert parser.parse_args([]).agg == "mean"
    assert parser.parse_args(["--agg", "sum"]).agg == "sum"
    with pytest.raises(SystemExit):
        parser.parse_args(["--agg", "bogus"])
    with pytest.raises(ValueError):
        parser.add_argument("--bad", action=LookupAction({"a": 1}), default="zzz")


def test_subcommand_abc():
    class Echo(Subcommand):
        COMMAND = "echo"

        @classmethod
        def add_args(cls, parser):
            parser.add_argument("--x", type=int, default=1)
            return parser

        @classmethod
        def func(cls, args):
            return args.x * 2

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers()
    Echo.add(sub)
    args = parser.parse_args(["echo", "--x", "21"])
    assert args.func(args) == 42


def test_get_column_names():
    inputs, targets = get_column_names(DATA, None, None, None, None, None, None)
    assert inputs == ["smiles"]
    assert targets == ["lipo"]


def test_build_data_from_files():
    components = build_data_from_files(DATA)
    assert len(components) == 1
    dps = components[0]
    assert len(dps) == 100
    assert dps[0].y.shape == (1,)
