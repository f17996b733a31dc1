"""Hyperparameter optimization: random/TPE search over model
hyperparameters, best config re-trainable via ``--config-path``. Mirrors
``examples/hpopting.ipynb`` (reference ``chemprop hpopt``,
``cli/hpopt.py:440-533``).

Run: python examples/hpopting.py
"""

import json

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("hpopt")
    mol_csv = DATA / "regression" / "mol" / "mol.csv"
    run_cli([
        "hpopt", "-i", mol_csv, "--epochs", "2", "--num-trials", "3",
        "--batch-size", "16",
        "--search-parameter-keywords", "depth", "ffn_num_layers",
        "--hpopt-save-dir", out,
    ])
    best_path = next(out.rglob("best_config.json"))
    best = json.load(open(best_path))
    print(f"best config: {best}")

    # retrain with the winning hyperparameters
    run_cli([
        "train", "-i", mol_csv, "--config-path", best_path,
        "--epochs", "2", "--batch-size", "16", "-o", out / "retrain",
    ])
    scores = json.load(open(next((out / "retrain").rglob("test_scores.json"))))
    print(f"retrained test scores: {scores[-1]}")


if __name__ == "__main__":
    main()
