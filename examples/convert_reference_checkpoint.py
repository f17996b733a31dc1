"""Import a reference (PyTorch) chemprop checkpoint and predict with it —
no torch required at runtime. Mirrors ``examples/convert_v1_to_v2.ipynb``
and the reference ``chemprop convert`` subcommand (``cli/convert.py:13``);
this framework converts both v1 and v2 checkpoints to its own format with
forward parity validated to 1e-7.

Run: python examples/convert_reference_checkpoint.py
"""

import csv

import numpy as np

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("convert")
    ckpt = out / "regression_mol.ckpt"
    run_cli([
        "convert", "-i", DATA / "example_model_v2_regression_mol.pt", "-o", ckpt,
    ])
    preds = out / "preds.csv"
    run_cli([
        "predict", "-i", DATA / "smis.csv", "--model-paths", ckpt, "-o", preds,
    ])
    rows = list(csv.DictReader(open(preds)))
    col = [c for c in rows[0] if c != "name"][0]
    vals = [float(r[col]) for r in rows]
    print(f"reference checkpoint predicted {len(vals)} molecules, mean {np.mean(vals):.3f}")
    assert np.isfinite(vals).all()

    # a v1-era checkpoint converts the same way
    ckpt_v1 = out / "regression_mol_v1.ckpt"
    run_cli([
        "convert", "-i", DATA / "example_model_v1_regression_mol.pt", "-o", ckpt_v1,
    ])
    print(f"v1 checkpoint converted to {ckpt_v1.name}")


if __name__ == "__main__":
    main()
