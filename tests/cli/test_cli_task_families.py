"""CLI e2e across task families (cf. reference ``tests/cli/test_cli_regression_
mol_multitask.py``, ``test_cli_regression_mol+mol.py``, ``test_cli_regression_
rxn+mol.py``, ``test_cli_classification_mol_multiclass.py``): train a few
epochs on the bundled CSVs, then predict and check the output artifacts."""

import csv

import numpy as np
import pytest

from chemprop_tpu.cli.main import main as cli_main


def run_cli(monkeypatch, argv):
    monkeypatch.setattr("sys.argv", ["chemprop-tpu", *argv])
    assert cli_main() in (0, None)


@pytest.mark.cli
class TestMultitaskCLI:
    def test_train_predict_multitask(self, monkeypatch, data_dir, tmp_path):
        out = tmp_path / "mt"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(data_dir / "regression" / "mol_multitask.csv"),
                "--smiles-columns", "smiles",
                "--epochs", "2", "--batch-size", "32", "--output-dir", str(out),
                "--split-sizes", "0.8", "0.1", "0.1",
            ],
        )
        assert (out / "best.ckpt").exists()
        preds = tmp_path / "mt_preds.csv"
        run_cli(
            monkeypatch,
            [
                "predict", "-i", str(data_dir / "smis.csv"),
                "--model-paths", str(out), "-o", str(preds),
            ],
        )
        rows = list(csv.DictReader(open(preds)))
        assert len(rows) == 100
        # all 12 QM9 target columns present with finite predictions
        for col in ("mu", "alpha", "homo", "lumo", "gap", "g298"):
            assert np.isfinite([float(r[col]) for r in rows]).all()


@pytest.mark.cli
class TestMulticomponentCLI:
    def test_train_predict_mol_plus_mol(self, monkeypatch, data_dir, tmp_path):
        out = tmp_path / "mm"
        csv_in = data_dir / "regression" / "mol+mol" / "mol+mol.csv"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(csv_in),
                "--smiles-columns", "smiles", "solvent",
                "--target-columns", "peakwavs_max",
                "--epochs", "2", "--batch-size", "16", "--output-dir", str(out),
            ],
        )
        assert (out / "best.ckpt").exists()
        preds = tmp_path / "mm_preds.csv"
        run_cli(
            monkeypatch,
            [
                "predict", "-i", str(csv_in),
                "--smiles-columns", "smiles", "solvent",
                "--model-paths", str(out), "-o", str(preds),
            ],
        )
        rows = list(csv.DictReader(open(preds)))
        assert len(rows) > 0
        assert np.isfinite([float(r["peakwavs_max"]) for r in rows]).all()

    def test_train_rxn_plus_mol(self, monkeypatch, data_dir, tmp_path):
        out = tmp_path / "rm"
        csv_in = data_dir / "regression" / "rxn+mol" / "rxn+mol.csv"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(csv_in),
                "--reaction-columns", "rxn_smiles",
                "--smiles-columns", "solvent_smiles",
                "--target-columns", "target",
                "--keep-h",
                "--epochs", "2", "--batch-size", "16", "--output-dir", str(out),
            ],
        )
        assert (out / "best.ckpt").exists()


@pytest.mark.cli
class TestReactionCLI:
    """cf. reference ``tests/cli/test_cli_regression_rxn.py``: rxn-only CGR
    training + prediction on the bundled atom-mapped ea dataset."""

    def test_train_predict_rxn(self, monkeypatch, data_dir, tmp_path):
        out = tmp_path / "rxn"
        csv_in = data_dir / "regression" / "rxn" / "rxn.csv"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(csv_in),
                "--reaction-columns", "smiles",
                "--target-columns", "ea",
                "--keep-h",
                "--epochs", "2", "--batch-size", "16", "--output-dir", str(out),
            ],
        )
        assert (out / "best.ckpt").exists()
        preds = tmp_path / "rxn_preds.csv"
        run_cli(
            monkeypatch,
            [
                "predict", "-i", str(csv_in),
                "--reaction-columns", "smiles",
                "--keep-h",
                "--model-paths", str(out), "-o", str(preds),
            ],
        )
        rows = list(csv.DictReader(open(preds)))
        assert len(rows) > 0
        assert np.isfinite([float(r["ea"]) for r in rows]).all()


@pytest.mark.cli
class TestBoundedCLI:
    """Bounded ("<x"/">x") regression targets end-to-end (reference parses
    them at ``cli/utils/parsing.py:85-93`` and trains with bounded-mse)."""

    def test_train_bounded_mse(self, monkeypatch, data_dir, tmp_path):
        out = tmp_path / "bounded"
        csv_in = data_dir / "regression" / "bounded.csv"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(csv_in),
                "--loss-function", "bounded-mse",
                "--epochs", "2", "--batch-size", "32", "--output-dir", str(out),
            ],
        )
        assert (out / "best.ckpt").exists()
        import json

        scores = json.load(open(out / "test_scores.json"))
        flat = []
        for entry in scores if isinstance(scores, list) else [scores]:
            flat.extend(entry.values() if isinstance(entry, dict) else [entry])
        assert flat and all(np.isfinite(v) for v in flat)


@pytest.mark.cli
class TestMulticlassCLI:
    def test_train_predict_multiclass(self, monkeypatch, data_dir, tmp_path):
        out = tmp_path / "mc"
        csv_in = data_dir / "classification" / "mol_multiclass.csv"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(csv_in),
                "--task-type", "multiclass",
                "--epochs", "2", "--batch-size", "32", "--output-dir", str(out),
            ],
        )
        assert (out / "best.ckpt").exists()
        preds = tmp_path / "mc_preds.csv"
        run_cli(
            monkeypatch,
            [
                "predict", "-i", str(csv_in),
                "--model-paths", str(out), "-o", str(preds),
            ],
        )
        rows = list(csv.DictReader(open(preds)))
        assert len(rows) > 0
        # class-label column + per-class probability column
        label_col = [c for c in rows[0] if not c.endswith("_prob") and c != "name"][0]
        labels = {int(float(r[label_col])) for r in rows}
        assert labels <= {0, 1, 2}
        probs = [float(p) for p in rows[0][f"{label_col}_prob"].split(",")]
        assert abs(sum(probs) - 1.0) < 1e-3
