"""Train with the RIGR resonance-invariant featurizer: atoms/bonds that
differ only by resonance structure featurize identically. Mirrors
``examples/rigr_featurizer.ipynb`` (reference
``chemprop/featurizers/atom.py:204`` RIGRAtomFeaturizer).

Run: python examples/rigr_featurizer.py
"""

import json

import numpy as np

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("rigr")
    run_cli([
        "train", "-i", DATA / "regression" / "mol" / "mol.csv",
        "--multi-hot-atom-featurizer-mode", "rigr",
        "--epochs", "2", "--batch-size", "64", "-o", out,
    ])
    scores = json.load(open(next(out.rglob("test_scores.json"))))
    print(f"RIGR-featurized test scores: {scores[-1]}")

    # the two kekule forms of an amidinium featurize identically under RIGR
    from chemprop_tpu.featurizers.atom import get_multi_hot_atom_featurizer
    from chemprop_tpu.chem import make_mol

    f = get_multi_hot_atom_featurizer("rigr")
    ma, mb = make_mol("C(N)=[NH2+]"), make_mol("C(=N)[NH3+]")
    same = np.array_equal(f.featurize(ma, ma.atoms[0]), f.featurize(mb, mb.atoms[0]))
    print("resonance-invariant central carbon:", same)


if __name__ == "__main__":
    main()
