"""Multitask regression: 12 QM targets predicted jointly, with NaN-masked
loss so partially-labeled rows still train. Mirrors
``examples/multi_task.ipynb`` (reference NaN-mask semantics,
``chemprop/models/model.py:152-153``).

Run: python examples/multi_task.py
"""

import json

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("multitask")
    run_cli([
        "train", "-i", DATA / "regression" / "mol_multitask.csv",
        "--epochs", "2", "--batch-size", "64", "-o", out,
    ])
    scores = json.load(open(next(out.rglob("test_scores.json"))))
    print(f"12-task model test scores: {scores[-1]}")


if __name__ == "__main__":
    main()
