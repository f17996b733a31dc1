"""MolAtomBond CLI breadth matrix (cf. reference ``tests/cli/test_cli_MAB.py``,
1,170 L): every head subset (mol/atom/bond present or absent), the
classification/multiclass/bounded/MVE task variants, and atom-mapped
prediction, each as a quick train(+predict) e2e run on the bundled MAB CSVs.
"""

import ast
import csv
import json
import sys

import pytest

from chemprop_tpu.cli.main import main as cli_main


def run_cli(monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["chemprop-tpu", *argv])
    assert cli_main() in (0, None)


def _train(monkeypatch, data_dir, out, *, csv_name="regression.csv", extra=()):
    run_cli(
        monkeypatch,
        [
            "train", "-i", str(data_dir / "mol_atom_bond" / csv_name),
            "--keep-h", "--epochs", "2", "--batch-size", "8", "-o", str(out),
            *extra,
        ],
    )


MOL = ("--target-columns", "mol_y1", "mol_y2")
ATOM = ("--atom-target-columns", "atom_y1", "atom_y2")
BOND = ("--bond-target-columns", "bond_y1", "bond_y2")


class TestHeadSubsets:
    """Reference: test_train_regression_no_mol/no_atom/no_bond/only_* —
    every subset of the three heads trains and predicts
    (``/root/reference/tests/cli/test_cli_MAB.py:290-573``)."""

    @pytest.mark.parametrize(
        "name, cols, present, absent",
        [
            ("no_mol", ATOM + BOND, ["atom_y1", "bond_y1"], ["mol_y1"]),
            ("no_atom", MOL + BOND, ["mol_y1", "bond_y1"], ["atom_y1"]),
            ("no_bond", MOL + ATOM, ["mol_y1", "atom_y1"], ["bond_y1"]),
            ("only_atom", ATOM, ["atom_y1"], ["mol_y1", "bond_y1"]),
            ("only_bond", BOND, ["bond_y1"], ["mol_y1", "atom_y1"]),
        ],
    )
    def test_train_predict_subset(self, monkeypatch, data_dir, tmp_path, name, cols, present, absent):
        out = tmp_path / name
        _train(monkeypatch, data_dir, out, extra=[*cols, "--weight-column", "weight"])
        assert any(out.rglob("best.ckpt"))

        preds = tmp_path / f"{name}_preds.csv"
        run_cli(
            monkeypatch,
            [
                "predict", "-i", str(data_dir / "mol_atom_bond" / "regression.csv"),
                "--model-paths", str(out), "--keep-h", "-o", str(preds),
            ],
        )
        rows = list(csv.DictReader(open(preds)))
        assert len(rows) == 11
        for col in present:
            assert col in rows[0], (name, col)
        for col in absent:
            assert col not in rows[0], (name, col)
        # per-atom/per-bond outputs are lists sized to the molecule (row 0 = H2)
        if "atom_y1" in present:
            assert len(ast.literal_eval(rows[0]["atom_y1"])) == 2
        if "bond_y1" in present:
            assert len(ast.literal_eval(rows[0]["bond_y1"])) == 1


class TestTaskVariants:
    def test_classification(self, monkeypatch, data_dir, tmp_path):
        """Reference test_train_classification_quick (``test_cli_MAB.py:609``)."""
        out = tmp_path / "clf"
        _train(
            monkeypatch, data_dir, out,
            csv_name="classification.csv",
            extra=[*MOL, *ATOM, *BOND, "--task-type", "classification"],
        )
        scores = json.load(open(next(out.rglob("test_scores.json"))))
        assert scores, "no scores written"

    def test_multiclass(self, monkeypatch, data_dir, tmp_path):
        """Reference test_train_multiclass_quick (``test_cli_MAB.py:660``)."""
        out = tmp_path / "mc"
        _train(
            monkeypatch, data_dir, out,
            csv_name="multiclass.csv",
            extra=[*MOL, *ATOM, *BOND, "--task-type", "multiclass",
                   "--multiclass-num-classes", "3"],
        )
        assert any(out.rglob("best.ckpt"))

    def test_bounded(self, monkeypatch, data_dir, tmp_path):
        """Reference test_train_bounded_quick (``test_cli_MAB.py:576``)."""
        out = tmp_path / "bounded"
        _train(
            monkeypatch, data_dir, out,
            csv_name="bounded.csv",
            extra=[*MOL, *ATOM, *BOND, "--loss-function", "bounded-mse"],
        )
        assert any(out.rglob("best.ckpt"))

    def test_mve(self, monkeypatch, data_dir, tmp_path):
        """Reference test_train_mve_quick (``test_cli_MAB.py:711``)."""
        out = tmp_path / "mve"
        _train(
            monkeypatch, data_dir, out,
            extra=[*MOL, *ATOM, *BOND, "--task-type", "regression-mve"],
        )
        assert any(out.rglob("best.ckpt"))


class TestAtomMappedPredict:
    def test_atom_mapped_targets_roundtrip(self, monkeypatch, data_dir, tmp_path):
        """Atom-mapped SMILES order their atom targets by map number; training
        + predicting must keep that order (reference
        test_make_predictions_with_atom_map, ``test_cli_MAB.py:1112``)."""
        csv_in = data_dir / "mol_atom_bond" / "atomic_regression_atom_mapped.csv"
        out = tmp_path / "mapped"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(csv_in),
                "--atom-target-columns", "charges",
                "--epochs", "2", "--batch-size", "8", "-o", str(out),
            ],
        )
        preds = tmp_path / "mapped_preds.csv"
        run_cli(
            monkeypatch,
            [
                "predict", "-i", str(csv_in),
                "--model-paths", str(out), "-o", str(preds),
            ],
        )
        in_rows = list(csv.DictReader(open(csv_in)))
        out_rows = list(csv.DictReader(open(preds)))
        assert len(out_rows) == len(in_rows)
        for rin, rout in zip(in_rows, out_rows):
            got = ast.literal_eval(rout["charges"])
            want = ast.literal_eval(rin["charges"])
            assert len(got) == len(want), rin["smiles"]
