"""Prediction uncertainty: an MVE head (mean + learned variance) trained
end-to-end, plus Monte-Carlo dropout on a plain regression model. Mirrors
``examples/uncertainty.ipynb`` (reference
``chemprop/uncertainty/estimator.py``).

Run: python examples/uncertainty.py
"""

import csv

import numpy as np

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("uncertainty")
    mol_csv = DATA / "regression" / "mol" / "mol.csv"

    # 1) mean-variance estimation: the head predicts (mean, var) per task
    run_cli([
        "train", "-i", mol_csv, "--task-type", "regression-mve",
        "--epochs", "2", "--batch-size", "64", "-o", out / "mve",
    ])
    preds = out / "mve_preds.csv"
    run_cli([
        "predict", "-i", mol_csv, "--model-paths", out / "mve",
        "--uncertainty-method", "mve", "-o", preds,
    ])
    rows = list(csv.DictReader(open(preds)))
    unc_col = next(c for c in rows[0] if c.endswith("_unc"))
    uncs = np.asarray([float(r[unc_col]) for r in rows])
    print(f"MVE: {len(rows)} predictions, mean predicted variance {uncs.mean():.3f}")
    assert (uncs >= 0).all()

    # 2) MC-dropout on a plain regression model: stochastic forward passes
    run_cli([
        "train", "-i", mol_csv, "--epochs", "2", "--batch-size", "64",
        "-o", out / "plain",
    ])
    preds2 = out / "dropout_preds.csv"
    run_cli([
        "predict", "-i", mol_csv, "--model-paths", out / "plain",
        "--uncertainty-method", "dropout",
        "--uncertainty-dropout-p", "0.2", "--dropout-sampling-size", "5",
        "-o", preds2,
    ])
    rows2 = list(csv.DictReader(open(preds2)))
    unc2 = np.asarray([float(r[unc_col]) for r in rows2])
    print(f"MC-dropout: mean sample variance {unc2.mean():.4f}")
    assert (unc2 > 0).all()


if __name__ == "__main__":
    main()
