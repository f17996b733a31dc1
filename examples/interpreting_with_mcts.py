"""Extract property rationales with Monte Carlo Tree Search: small
substructures whose predicted property stays high when the rest of the
molecule is deleted (Jin et al., arXiv:2002.03244). Mirrors the reference's
``examples/interpreting_monte_carlo_tree_search.ipynb`` notebook — here a
first-class API (``chemprop_tpu.interpret.MCTSRationaleExplainer``) whose
subgraph scoring runs in padded static-shape device batches.

Run: python examples/interpreting_with_mcts.py
"""

import csv

import numpy as np

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("interpret_mcts")
    mol_csv = DATA / "regression" / "mol" / "mol.csv"
    run_cli([
        "train", "-i", mol_csv, "--epochs", "2", "--batch-size", "64", "-o", out,
    ])

    from chemprop_tpu.interpret import MCTSRationaleExplainer
    from chemprop_tpu.models.serialize import load_model

    model, variables, _ = load_model(next(out.rglob("best.ckpt")))
    explainer = MCTSRationaleExplainer(
        model, variables,
        n_rollout=10,      # MCTS rollouts per molecule
        max_atoms=20,      # rationale must have at most this many atoms
        min_atoms=8,       # stop deleting below this size
        prop_delta=-1e9,   # keep all found substructures (demo model);
                           # set a real threshold for a trained property
        c_puct=10.0,       # exploration constant
    )

    smiles = [row["smiles"] for row in csv.DictReader(open(mol_csv))][:3]
    rows = []
    for smi in smiles:
        rationales = explainer.explain(smi)[:3]
        print(f"{smi}:")
        for r in rationales:
            print(f"  score={r['score']:+.3f} n_atoms={r['n_atoms']:2d} {r['smiles']}")
            assert np.isfinite(r["score"])
        rows.append((smi, rationales))
    assert any(r for _, r in rows), "expected rationales for the demo molecules"


if __name__ == "__main__":
    main()
