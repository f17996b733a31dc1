"""``chemprop-tpu fingerprint`` — learned fingerprints / hidden encodings
(cf. reference ``chemprop/cli/fingerprint.py:25-258``)."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from chemprop_tpu.cli.common import add_common_args, find_models
from chemprop_tpu.cli.predict import _build_loader
from chemprop_tpu.models.serialize import load_model


def add_fingerprint_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    add_common_args(parser)
    g = parser.add_argument_group("Fingerprint args")
    g.add_argument("-o", "--output", type=Path, default=None)
    g.add_argument("--model-paths", "--model-path", nargs="+", type=Path, required=True)
    g.add_argument(
        "--ffn-block-index",
        type=int,
        default=-1,
        help="use predictor FFN blocks [:i] on top of the fingerprint",
    )
    g.add_argument(
        "--edge-partition",
        type=int,
        nargs="?",
        const=0,
        default=None,
        metavar="N",
        help="edge-partitioned fingerprinting: shard each partitionable "
        "molecule across the device mesh (N devices; 0/omitted value = "
        "all), dense fallback for the rest "
        "(parallel/partitioned_mp.py:predict_partitioned)",
    )
    return parser


def main(args) -> int:
    import jax

    model_paths = find_models(args.model_paths)

    from chemprop_tpu.models.mol_atom_bond import MolAtomBondMPNN

    first_model, first_vars, _ = load_model(model_paths[0])
    edge_partition = getattr(args, "edge_partition", None) is not None
    if isinstance(first_model, MolAtomBondMPNN):
        if edge_partition:
            raise ValueError("--edge-partition fingerprint does not support MAB models")
        return _main_MAB(args, model_paths)

    loader, dset, _ = _build_loader(args, args.data_path)

    part_session = None
    for k, path in enumerate(model_paths):
        model, variables, _ = load_model(path)
        if edge_partition:
            if part_session is None:
                # one plan + one compile per bucket shared across the
                # ensemble (same model config, different params)
                from chemprop_tpu.parallel.partitioned_mp import PartitionedInference

                part_data = [dset[i] for i in range(len(dset))]
                part_session = PartitionedInference(
                    model, part_data,
                    n_shards=args.edge_partition or None,
                    encode_index=args.ffn_block_index,
                )
            fps = part_session.run(variables)
        else:
            apply = jax.jit(
                lambda v, bmg, V_d, X_d: model.apply(
                    v, bmg, V_d, X_d, i=args.ffn_block_index, method="encoding"
                )
            )
            chunks = []
            for batch in loader:
                enc = apply(variables, batch.bmg, batch.V_d, batch.X_d)
                chunks.append(np.asarray(enc)[batch.pad_mask])
            from chemprop_tpu.train.trainer import _restore_order

            # oversized-molecule isolation may reorder batch emission
            fps = _restore_order(np.concatenate(chunks, 0), loader)

        out = args.output or args.data_path.with_name(args.data_path.stem + "_fingerprint.csv")
        if len(model_paths) > 1:
            out = out.with_name(f"{out.stem}_model_{k}{out.suffix}")
        out.parent.mkdir(parents=True, exist_ok=True)
        if out.suffix == ".npz":
            np.savez(out, fps=fps)
        else:
            df = pd.DataFrame(fps, columns=[f"fp_{i}" for i in range(fps.shape[1])])
            df.insert(0, "name", dset.names)
            df.to_csv(out, index=False)
        print(f"wrote {out} {fps.shape}")
    return 0


def _main_MAB(args, model_paths) -> int:
    """MAB fingerprints: one file per kind (mol/atom/bond), matching the
    reference's MAB fingerprint output (``cli/fingerprint.py:185-223``)."""
    import jax
    import pandas as pd

    from chemprop_tpu.cli.mab import _point  # noqa: F401 (naming parity)
    from chemprop_tpu.data import DataLoader, MolAtomBondDatapoint
    from chemprop_tpu.data.datasets import MolAtomBondDataset

    df = pd.read_csv(args.data_path)
    smiles_col = (args.smiles_columns or [df.columns[0]])[0]
    dps = [
        MolAtomBondDatapoint.from_smi(
            s, keep_h=args.keep_h, add_h=args.add_h, ignore_stereo=args.ignore_stereo
        )
        for s in df[smiles_col]
    ]
    dset = MolAtomBondDataset(dps)
    loader = DataLoader(dset, batch_size=args.batch_size)

    for k, path in enumerate(model_paths):
        model, variables, _ = load_model(path)
        apply = jax.jit(
            lambda v, b: model.apply(
                v, b.bmg, b.V_d, b.E_d, b.X_d, is_training=False, method="fingerprint"
            )
        )
        from chemprop_tpu.train.mab_trainer import collect_mab_rows, restore_mab_order

        mol_chunks, atom_chunks, bond_chunks = [], [], []
        for batch in loader:
            H_g, H_v, H_e = apply(variables, batch)
            collect_mab_rows(batch, H_g, H_v, H_e, mol_chunks, atom_chunks, bond_chunks)

        base = args.output or args.data_path.with_name(args.data_path.stem + "_fingerprint.npz")
        if len(model_paths) > 1:
            base = base.with_name(f"{base.stem}_model_{k}{base.suffix}")
        base.parent.mkdir(parents=True, exist_ok=True)
        cat = lambda cs: np.concatenate(cs, 0) if cs else None
        # oversized isolation may reorder batch emission; restore input
        # row order (grouped for the atom/bond tables)
        mol_cat, atom_cat, bond_cat = restore_mab_order(
            loader, cat(mol_chunks), cat(atom_chunks), cat(bond_chunks)
        )
        arrays = {
            kind: arr
            for kind, arr in (("mol", mol_cat), ("atom", atom_cat), ("bond", bond_cat))
            if arr is not None
        }
        np.savez(base.with_suffix(".npz"), **arrays)
        print(f"wrote {base.with_suffix('.npz')} " + str({k: v.shape for k, v in arrays.items()}))
    return 0


class FingerprintSubcommand:
    COMMAND = "fingerprint"
    HELP = "use trained model(s) to compute learned representations"

    @classmethod
    def add(cls, subparsers) -> argparse.ArgumentParser:
        parser = subparsers.add_parser(cls.COMMAND, help=cls.HELP)
        add_fingerprint_args(parser)
        parser.set_defaults(func=main)
        return parser
