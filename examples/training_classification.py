"""Train a binary classifier (Tox21-style NR-AhR) through the CLI and
check the held-out AUC. Mirrors ``examples/training_classification.ipynb``
(reference classification defaults: BCE loss, ROC-AUC metric).

Run: python examples/training_classification.py
"""

import json

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("classification")
    run_cli([
        "train", "-i", DATA / "classification" / "mol.csv",
        "--task-type", "classification", "--metrics", "roc",
        "--epochs", "3", "--batch-size", "64", "-o", out,
    ])
    scores = json.load(open(next(out.rglob("test_scores.json"))))
    auc = list(scores[-1].values())[0]
    print(f"test AUC after 3 epochs: {auc:.3f}")
    assert 0.0 <= auc <= 1.0


if __name__ == "__main__":
    main()
