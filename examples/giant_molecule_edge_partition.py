"""Train and predict on GIANT molecules with edge-partitioned sharding.

Molecules too large for one chip's batch slice (polymers, peptides) can be
cut into contiguous per-chip edge slices: every message-passing iteration
exchanges only boundary halo state between neighboring devices
(`jax.lax.ppermute`) while the bulk segment-sum/GEMM math stays local, and
gradients are exact vs the single-device model. The reference has no
analog (each rank holds whole graphs, `chemprop/nn/message_passing/
base.py:196-212` on one device) — this is the framework's graph version
of sequence parallelism (SURVEY.md §5.7).

The saved checkpoint is a standard MPNN checkpoint: normal `predict`
loads it, and `predict`/`fingerprint` accept `--edge-partition` too.

Run: python examples/giant_molecule_edge_partition.py
(uses an 8-device virtual CPU mesh; on a TPU pod slice the same flags
shard over real chips and the halo exchange rides ICI)
"""

import csv
import os

# an 8-device virtual mesh on CPU — must be set before jax is imported
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from _common import out_dir, run_cli


def main():
    out = out_dir("edge_partition")

    # a tiny dataset of linked-cyclohexane polymers (~240-290 heavy atoms
    # each, >1600 directed edges — larger than the fused kernels' widest
    # single-molecule window) plus small molecules to show mixed routing
    data_csv = out / "giant.csv"
    rows = [["smiles", "logS"]]
    for k in range(6):
        rows.append(["C1(CCCCC1)" * (40 + 4 * k), f"{0.1 * k:.2f}"])
    for k in range(6):
        rows.append(["C1(CCCCC1)" * 3, f"{0.3 + 0.1 * k:.2f}"])
    with open(data_csv, "w", newline="") as f:
        csv.writer(f).writerows(rows)

    # --edge-partition [N]: giant molecules shard across the mesh, the
    # small ones route through the dense batched step in the same run
    run_cli([
        "train", "-i", data_csv, "--edge-partition",
        "--epochs", "4", "--patience", "3",
        "--message-hidden-dim", "64", "--ffn-hidden-dim", "64",
        "--split-sizes", "0.5", "0.25", "0.25",
        "-o", out / "model",
    ])

    # partitioned inference with the trained checkpoint (dense predict
    # on the same checkpoint gives matching numbers)
    run_cli([
        "predict", "-i", data_csv,
        "--model-paths", out / "model" / "best.ckpt",
        "--edge-partition", "-o", out / "preds.csv",
    ])
    preds = list(csv.DictReader(open(out / "preds.csv")))
    print(f"predicted {len(preds)} molecules; first: {preds[0]['logS']}")


if __name__ == "__main__":
    main()
