"""Interpret a trained model with Myerson values: exact per-atom
attributions of the prediction (game-theoretic contribution of each atom
over connected subgraphs). Mirrors
``examples/interpreting_with_myerson_values.ipynb`` (reference
``chemprop/callbacks/interpret.py:25``).

Run: python examples/interpreting_with_myerson_values.py
"""

import csv

import numpy as np

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("interpret")
    mol_csv = DATA / "regression" / "mol" / "mol.csv"
    run_cli([
        "train", "-i", mol_csv, "--epochs", "2", "--batch-size", "64", "-o", out,
    ])

    from chemprop_tpu.interpret import MyersonExplainer
    from chemprop_tpu.models.serialize import load_model
    from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset

    model, variables, _ = load_model(next(out.rglob("best.ckpt")))
    ds = MoleculeDataset([MoleculeDatapoint.from_smi("CC(=O)Oc1ccccc1C(=O)O", y=np.zeros(1))])
    mg = ds[0].mg
    phi = MyersonExplainer(model, variables).explain(mg)
    print("aspirin per-atom Myerson values:", np.round(phi.reshape(-1), 3))
    assert phi.shape[0] == mg.V.shape[0]


if __name__ == "__main__":
    main()
