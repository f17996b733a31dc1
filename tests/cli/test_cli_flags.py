"""Coverage for the reference-parity CLI flags added on top of the core
subcommands: tracking metric, split saving, descriptor columns, scaling
toggles, per-head MAB config, deprecations, and arg normalization
(cf. reference ``chemprop/cli/train.py`` / ``common.py`` flag groups)."""

import csv
import json
import sys
from argparse import Namespace
from pathlib import Path

import numpy as np
import pytest

from chemprop_tpu.cli.main import main as cli_main
from chemprop_tpu.cli.train import process_train_args


def run_cli(monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["chemprop-tpu", *argv])
    assert cli_main() in (0, None)


@pytest.fixture(scope="module")
def mol_csv(data_dir, tmp_path_factory):
    rows = list(csv.reader(open(data_dir / "regression" / "mol" / "mol.csv")))
    p = tmp_path_factory.mktemp("data") / "mol24.csv"
    with open(p, "w", newline="") as f:
        csv.writer(f).writerows(rows[:25])
    return p


@pytest.fixture(scope="module")
def mol_csv_with_descriptor(data_dir, tmp_path_factory):
    """mol.csv plus a synthetic 'temperature' descriptor column."""
    rows = list(csv.reader(open(data_dir / "regression" / "mol" / "mol.csv")))[:25]
    rows[0].append("temperature")
    for i, r in enumerate(rows[1:]):
        r.append(str(280.0 + i))
    p = tmp_path_factory.mktemp("data") / "mol_temp.csv"
    with open(p, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return p


def _ns(**kw):
    base = dict(
        num_folds=None,
        model_frzn=None,
        checkpoint=None,
        from_foundation=None,
        frzn_ffn_layers=0,
        freeze_encoder=False,
        mol_target_columns=None,
        target_columns=None,
        ffn_hidden_dim=300,
        atom_ffn_hidden_dim=None,
        bond_ffn_hidden_dim=None,
        atom_constrainer_ffn_hidden_dim=None,
        bond_constrainer_ffn_hidden_dim=None,
    )
    base.update(kw)
    return Namespace(**base)


class TestProcessTrainArgs:
    def test_num_folds_removed(self):
        with pytest.raises(ValueError, match="num-folds"):
            process_train_args(_ns(num_folds="5"))

    def test_model_frzn_maps_to_checkpoint_freeze(self, tmp_path):
        args = _ns(model_frzn=tmp_path / "m.ckpt")
        process_train_args(args)
        assert args.checkpoint == tmp_path / "m.ckpt"
        assert args.freeze_encoder

    def test_model_frzn_conflicts_with_checkpoint(self, tmp_path):
        with pytest.raises(ValueError, match="together"):
            process_train_args(
                _ns(model_frzn=tmp_path / "a.ckpt", checkpoint=tmp_path / "b.ckpt")
            )

    def test_frzn_ffn_layers_requires_checkpoint(self):
        with pytest.raises(ValueError, match="frzn-ffn-layers"):
            process_train_args(_ns(frzn_ffn_layers=2))

    def test_mol_target_columns_alias(self):
        args = _ns(mol_target_columns=["a", "b"])
        process_train_args(args)
        assert args.target_columns == ["a", "b"]

    def test_ffn_hidden_dim_list_sets_layers(self):
        args = _ns(ffn_hidden_dim=[256, 128, 64], ffn_num_layers=1)
        process_train_args(args)
        assert args.ffn_hidden_dim == [256, 128, 64]
        assert args.ffn_num_layers == 3

    def test_ffn_hidden_dim_singleton_collapses(self):
        args = _ns(ffn_hidden_dim=[256], ffn_num_layers=1)
        process_train_args(args)
        assert args.ffn_hidden_dim == 256
        assert args.ffn_num_layers == 1


class TestActivationArgs:
    def test_leakyrelu_slope_from_string(self):
        import jax.numpy as jnp

        from chemprop_tpu.nn.utils import get_activation_function

        f = get_activation_function("leakyrelu:0.5")
        x = jnp.array([-2.0, 4.0])
        assert np.allclose(np.asarray(f(x)), [-1.0, 4.0])

    def test_plain_name_still_works(self):
        import jax.numpy as jnp

        from chemprop_tpu.nn.utils import get_activation_function

        f = get_activation_function("relu")
        assert np.allclose(np.asarray(f(jnp.array([-1.0, 2.0]))), [0.0, 2.0])


class TestTrainFlagsE2E:
    def test_tracking_metric_and_split_saving(self, monkeypatch, mol_csv, tmp_path):
        out = tmp_path / "out"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(mol_csv), "--epochs", "2", "--batch-size", "16",
                "-o", str(out), "--tracking-metric", "rmse", "--min-delta", "0.001",
                "--save-smiles-splits", "--save-data-splits",
                "--remove-checkpoints", "--show-individual-scores",
            ],
        )
        history = json.load(open(next(out.rglob("history.json"))))
        assert all("val_rmse" in rec for rec in history)
        assert (out / "train_smiles.csv").exists()
        assert (out / "test_full.csv").exists()
        assert not list(out.rglob("checkpoints/*.ckpt"))
        # smiles splits cover every row exactly once
        n = sum(
            len(list(csv.DictReader(open(out / f"{s}_smiles.csv"))))
            for s in ("train", "val", "test")
            if (out / f"{s}_smiles.csv").exists()
        )
        assert n == 24

    def test_descriptors_columns(self, monkeypatch, mol_csv_with_descriptor, tmp_path):
        out = tmp_path / "out"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(mol_csv_with_descriptor), "--epochs", "1",
                "--batch-size", "16", "-o", str(out),
                "--target-columns", "lipo",
                "--descriptors-columns", "temperature",
            ],
        )
        scores = json.load(open(next(out.rglob("test_scores.json"))))
        assert np.isfinite(scores[-1]["rmse"])

    def test_reaction_mode_alias(self, monkeypatch, data_dir, tmp_path):
        rows = list(csv.reader(open(data_dir / "regression" / "rxn" / "rxn.csv")))[:17]
        p = tmp_path / "rxn16.csv"
        with open(p, "w", newline="") as f:
            csv.writer(f).writerows(rows)
        out = tmp_path / "out"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(p), "--reaction-columns", "smiles",
                "--epochs", "1", "--batch-size", "16", "-o", str(out),
                "--reaction-mode", "reac_prod",
            ],
        )
        assert (next(out.rglob("best.ckpt"))).exists()

    def test_evidential_loss_flags(self, monkeypatch, mol_csv, tmp_path):
        out = tmp_path / "out"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(mol_csv), "--epochs", "1", "--batch-size", "16",
                "-o", str(out), "--task-type", "regression-evidential",
                "--evidential-regularization", "0.2", "--eps", "1e-7",
            ],
        )
        cfg = json.load(open(next(out.rglob("config.json"))))
        assert cfg["v_kl"] == 0.2 and cfg["eps"] == 1e-7


class TestMABTrackingAndDescriptors:
    def test_mab_tracking_metric_suffix(self, monkeypatch, data_dir, tmp_path):
        out = tmp_path / "mab_track"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(data_dir / "mol_atom_bond" / "regression.csv"),
                "--mol-target-columns", "mol_y1",
                "--atom-target-columns", "atom_y1",
                "--bond-target-columns", "bond_y1",
                "--keep-h", "--epochs", "2", "--batch-size", "8", "-o", str(out),
                "--tracking-metric", "rmse-atom",
                "--atom-ffn-hidden-dim", "128", "--bond-ffn-num-layers", "2",
            ],
        )
        history = json.load(open(next(out.rglob("history.json"))))
        assert all("val_rmse-atom" in h and "val_loss-bond" in h for h in history)

    def test_mab_bond_descriptors(self, monkeypatch, data_dir, tmp_path):
        out = tmp_path / "mab_ed"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(data_dir / "mol_atom_bond" / "regression.csv"),
                "--atom-target-columns", "atom_y1",
                "--bond-target-columns", "bond_y1",
                "--atom-descriptors-path",
                str(data_dir / "mol_atom_bond" / "atom_features_descriptors.npz"),
                "--bond-descriptors-path",
                str(data_dir / "mol_atom_bond" / "bond_features_descriptors.npz"),
                "--keep-h", "--epochs", "1", "--batch-size", "8", "-o", str(out),
            ],
        )
        scores = json.load(open(next(out.rglob("test_scores.json"))))
        # bond_rmse may be NaN if the tiny test split drew a bond-less
        # molecule (methane); atom scores must be finite
        assert np.isfinite(scores[-1]["atom_rmse"])
        assert "bond_rmse" in scores[-1]


class TestSpectralTask:
    def test_train_spectral(self, monkeypatch, data_dir, tmp_path):
        out = tmp_path / "spectra"
        run_cli(
            monkeypatch,
            [
                "train", "-i", str(data_dir / "spectra.csv"),
                "--task-type", "spectral", "--metrics", "sid", "wasserstein",
                "--epochs", "2", "--batch-size", "8", "-o", str(out),
                "--split-sizes", "0.7", "0.0", "0.3",
            ],
        )
        scores = json.load(open(next(out.rglob("test_scores.json"))))
        assert np.isfinite(scores[-1]["sid"])
        # spectral preds are positive and normalized per row
        rows = list(csv.DictReader(open(next(out.rglob("test_predictions.csv")))))
        vals = np.array([[float(v) for k, v in r.items() if k != "name"] for r in rows])
        assert (vals > 0).all()
        np.testing.assert_allclose(vals.sum(1), 1.0, atol=1e-4)


class TestIndexedFeaturePaths:
    def test_multicomponent_indexed_extras_train(self, monkeypatch, data_dir, tmp_path):
        """Reference per-component extra-feature syntax
        (``--atom-features-path 0 a.npz 1 b.npz``, common.py:194-231) using
        the reference's own mol+mol fixtures."""
        import json
        import sys

        from chemprop_tpu.cli.main import main as cli_main

        mm = data_dir / "regression" / "mol+mol"
        out = tmp_path / "out"
        monkeypatch.setattr(sys, "argv", [
            "chemprop-tpu", "train", "-i", str(mm / "mol+mol.csv"),
            "-s", "smiles", "solvent", "--target-columns", "peakwavs_max",
            "--atom-features-path", "0", str(mm / "atom_features_0.npz"),
            "1", str(mm / "atom_features_1.npz"),
            "--bond-features-path", "0", str(mm / "bond_features_0.npz"),
            "--atom-descriptors-path", "1", str(mm / "atom_descriptors_1.npz"),
            "--epochs", "1", "--batch-size", "16", "-o", str(out),
        ])
        assert cli_main() in (0, None)
        scores = json.load(open(next(out.rglob("test_scores.json"))))
        vals = [v for s in (scores if isinstance(scores, list) else [scores])
                for v in s.values() if isinstance(v, (int, float))]
        assert vals and all(abs(v) < 1e6 for v in vals)

    def test_bad_pairs_raise(self):
        import pytest as _pytest

        from chemprop_tpu.cli.parsing import parse_indexed_paths

        assert parse_indexed_paths(None) is None
        assert parse_indexed_paths("a.npz") == {0: __import__("pathlib").Path("a.npz")}
        assert 1 in parse_indexed_paths(["0", "a.npz", "1", "b.npz"])
        with _pytest.raises(ValueError):
            parse_indexed_paths(["0", "a.npz", "b.npz"])
        with _pytest.raises(ValueError):
            parse_indexed_paths(["x", "a.npz"])
        with _pytest.raises(ValueError):
            parse_indexed_paths(["0", "a.npz", "0", "b.npz"])
