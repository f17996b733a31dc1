"""Transfer learning: warm-start from a trained checkpoint and fine-tune
only the head with the encoder frozen. Mirrors
``examples/transfer_learning.ipynb`` (reference ``--checkpoint`` +
``--freeze-encoder``, ``cli/train.py:1826-1833``).

Run: python examples/transfer_learning.py
"""

import json

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("transfer")
    mol_csv = DATA / "regression" / "mol" / "mol.csv"
    # pretrain
    run_cli([
        "train", "-i", mol_csv, "--epochs", "3", "--batch-size", "64",
        "-o", out / "pretrain",
    ])
    # fine-tune the head only, encoder frozen
    run_cli([
        "train", "-i", mol_csv,
        "--checkpoint", next((out / "pretrain").rglob("best.ckpt")),
        "--freeze-encoder",
        "--epochs", "2", "--batch-size", "64", "-o", out / "finetune",
    ])
    scores = json.load(open(next((out / "finetune").rglob("test_scores.json"))))
    print(f"fine-tuned (frozen encoder) test scores: {scores[-1]}")


if __name__ == "__main__":
    main()
