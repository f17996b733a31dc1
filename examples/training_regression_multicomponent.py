"""Multicomponent regression: solute + solvent SMILES columns, one MP
block per component, concatenated embeddings into one head. Mirrors
``examples/training_regression_multicomponent.ipynb`` (reference
``chemprop/models/multi.py:16``).

Run: python examples/training_regression_multicomponent.py
"""

import csv

import numpy as np

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("multicomponent")
    csv_in = DATA / "regression" / "mol+mol" / "mol+mol.csv"
    run_cli([
        "train", "-i", csv_in,
        "--smiles-columns", "smiles", "solvent",
        "--target-columns", "peakwavs_max",
        "--epochs", "2", "--batch-size", "16", "-o", out,
    ])
    preds = out / "preds.csv"
    run_cli([
        "predict", "-i", csv_in,
        "--smiles-columns", "smiles", "solvent",
        "--model-paths", out, "-o", preds,
    ])
    rows = list(csv.DictReader(open(preds)))
    print(f"predicted peak wavelengths for {len(rows)} solute/solvent pairs")
    assert np.isfinite([float(r["peakwavs_max"]) for r in rows]).all()


if __name__ == "__main__":
    main()
