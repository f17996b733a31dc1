"""Extract learned fingerprints (hidden encodings) from a trained model —
both from Python (``model.encoding``) and through the ``fingerprint``
subcommand. Mirrors ``examples/mpnn_fingerprints.ipynb`` (reference
``chemprop/models/model.py:136-140``).

Run: python examples/mpnn_fingerprints.py
"""

import csv

import numpy as np

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("fingerprints")
    mol_csv = DATA / "regression" / "mol" / "mol.csv"
    run_cli([
        "train", "-i", mol_csv, "--epochs", "2", "--batch-size", "64", "-o", out,
    ])
    fps_csv = out / "fps.csv"
    run_cli([
        "fingerprint", "-i", mol_csv, "--model-paths", out, "-o", fps_csv,
    ])
    rows = list(csv.reader(open(fps_csv)))
    n_fp = len(rows[1]) - 1  # minus the name column
    print(f"{len(rows) - 1} molecules x {n_fp}-dim learned fingerprints")
    assert n_fp >= 300
    assert np.isfinite(np.asarray(rows[1][1:], float)).all()


if __name__ == "__main__":
    main()
