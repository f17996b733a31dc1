"""Train on reaction SMILES with the Condensed Graph of Reaction (CGR)
featurizer and predict activation energies. Mirrors
``examples/training_regression_reaction.ipynb`` (reference
``chemprop/featurizers/molgraph/reaction.py:45``).

Run: python examples/training_regression_reaction.py
"""

import csv

import numpy as np

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("reaction")
    csv_in = DATA / "regression" / "rxn" / "rxn.csv"
    run_cli([
        "train", "-i", csv_in, "--reaction-columns", "smiles",
        "--target-columns", "ea",
        "--epochs", "2", "--batch-size", "16", "-o", out,
    ])
    preds = out / "preds.csv"
    run_cli([
        "predict", "-i", csv_in, "--reaction-columns", "smiles",
        "--model-paths", out, "-o", preds,
    ])
    rows = list(csv.DictReader(open(preds)))
    vals = [float(r["ea"]) for r in rows]
    print(f"predicted ea for {len(rows)} reactions, mean {np.mean(vals):.2f}")
    assert np.isfinite(vals).all()


if __name__ == "__main__":
    main()
