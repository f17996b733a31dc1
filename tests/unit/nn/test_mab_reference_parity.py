"""Per-layer activation parity gate for the MolAtomBond family against the
PyTorch reference math, evaluated here in eager float32 torch — exactly the
operations of ``/root/reference/chemprop/nn/message_passing/mol_atom_bond.py:
284-305`` (initialize / message / update / vertex+edge finalize) and
``/root/reference/chemprop/models/mol_atom_bond.py:140-151, 237`` (bond head
input ``[H_e ; H_e[rev]]``, direction-pair prediction averaging) — run on
committed reference MAB checkpoints over a real-molecule corpus.

Compared tables: H_0, H after each depth iteration, M_v, H_v, H_e, the mol
head (agg -> FFN -> unscale), the atom head, and the bond head (per-bond
predictions). The JAX modules run padded, dst-sorted, lane-aligned; rows map
back through the collate permutation — so the gate proves the padded MAB
machinery is activation-exact vs the reference, not merely e2e-plausible.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from chemprop_tpu.data import MoleculeDatapoint
from chemprop_tpu.data.collate import PadSpec, batch_mol_graphs
from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer
from chemprop_tpu.models.torch_convert import convert_model, load_torch_checkpoint

CHECKPOINTS = [
    "regression.pt",  # all three heads + per-head output transforms
    "multiclass.pt",  # 3-class heads on all three levels
    "regression_no_mol.pt",  # suppressed mol head
    "regression_only_bond.pt",  # edge embeddings only
]

D_H = 300
DEPTH = 3


@pytest.fixture(scope="module")
def mgs(smis):
    feat = SimpleMoleculeMolGraphFeaturizer()
    return [feat(MoleculeDatapoint.from_smi(s, y=np.zeros(1)).mol) for s in smis[:50]]


def _torch_batch(mgs):
    Vs, Es, srcs, dsts, revs, batch = [], [], [], [], [], []
    v_off = e_off = 0
    for gi, mg in enumerate(mgs):
        Vs.append(torch.tensor(np.asarray(mg.V, np.float32)))
        Es.append(torch.tensor(np.asarray(mg.E, np.float32)))
        srcs.append(torch.tensor(mg.edge_index[0].astype(np.int64)) + v_off)
        dsts.append(torch.tensor(mg.edge_index[1].astype(np.int64)) + v_off)
        revs.append(torch.tensor(mg.rev_edge_index.astype(np.int64)) + e_off)
        batch.extend([gi] * mg.V.shape[0])
        v_off += mg.V.shape[0]
        e_off += mg.E.shape[0]
    return (
        torch.cat(Vs),
        torch.cat(Es),
        torch.cat(srcs),
        torch.cat(dsts),
        torch.cat(revs),
        torch.tensor(batch, dtype=torch.int64),
        len(mgs),
    )


def _scatter_add(H, index, n_rows):
    return torch.zeros(n_rows, H.shape[1], dtype=H.dtype).index_add_(0, index, H)


def _ffn(sd, prefix, z):
    """Reference MLP blocks (``chemprop/nn/ffn.py:38-61``)."""
    outs = [z @ sd[f"{prefix}.ffn.0.0.weight"].T + sd[f"{prefix}.ffn.0.0.bias"]]
    i = 1
    while f"{prefix}.ffn.{i}.2.weight" in sd:
        outs.append(
            torch.relu(outs[-1]) @ sd[f"{prefix}.ffn.{i}.2.weight"].T
            + sd[f"{prefix}.ffn.{i}.2.bias"]
        )
        i += 1
    return outs[-1]


def _head(sd, hp, prefix, z, kind):
    """Inference-space head output (reference ``nn/predictors.py``)."""
    z = _ffn(sd, prefix, z)
    if kind == "multiclass":
        n_classes = int(hp[prefix]["n_classes"])
        z = z.reshape(len(z), -1, n_classes)
        return torch.softmax(z, dim=-1)
    if kind == "classification":
        return torch.sigmoid(z)
    if f"{prefix}.output_transform.mean" in sd:
        return z * sd[f"{prefix}.output_transform.scale"].reshape(-1) + sd[
            f"{prefix}.output_transform.mean"
        ].reshape(-1)
    return z


def _torch_layers(ckpt_path, mgs, kind):
    d = load_torch_checkpoint(ckpt_path)
    sd = {
        k: torch.tensor(np.array(v, np.float32))
        for k, v in d["state_dict"].items()
        if "num_batches_tracked" not in k and "metricss" not in k and "criterion" not in k
    }
    hp = d["hyper_parameters"]
    V, E, src, dst, rev, batch, n_graphs = _torch_batch(mgs)
    nv = V.shape[0]
    out = {}

    # ---- MAB message passing (reference mol_atom_bond.py:284-305)
    H0 = torch.cat([V[src], E], 1) @ sd["message_passing.W_i.weight"].T
    out["H_0"] = H0
    H = torch.relu(H0)
    out["H"] = []
    for _ in range(1, DEPTH):
        M = _scatter_add(H, dst, nv)[src] - H[rev]
        H = torch.relu(H0 + M @ sd["message_passing.W_h.weight"].T)
        out["H"].append(H)

    if "message_passing.W_vo.weight" in sd:
        M_v = _scatter_add(H, dst, nv)
        out["M_v"] = M_v
        H_v = torch.relu(
            torch.cat([V, M_v], 1) @ sd["message_passing.W_vo.weight"].T
            + sd["message_passing.W_vo.bias"]
        )
        out["H_v"] = H_v
    if "message_passing.W_eo.weight" in sd:
        # edge finalize: cat(E, H) (reference mol_atom_bond.py edge_finalize)
        H_e = torch.relu(
            torch.cat([E, H], 1) @ sd["message_passing.W_eo.weight"].T
            + sd["message_passing.W_eo.bias"]
        )
        out["H_e"] = H_e

    # ---- heads (reference models/mol_atom_bond.py:140-151, 237)
    if "mol_predictor.ffn.0.0.weight" in sd and "H_v" in out:
        sums = _scatter_add(out["H_v"], batch, n_graphs)
        if type(hp["agg"]["cls"]).__name__ == "NormAggregation" or (
            isinstance(hp["agg"]["cls"], type) and "Norm" in hp["agg"]["cls"].__name__
        ):
            agg = sums / float(hp["agg"].get("norm", 100.0))
        else:
            counts = _scatter_add(torch.ones(nv, 1), batch, n_graphs)
            agg = sums / counts
        out["mol_preds"] = _head(sd, hp, "mol_predictor", agg, kind)
    if "atom_predictor.ffn.0.0.weight" in sd and "H_v" in out:
        out["atom_preds"] = _head(sd, hp, "atom_predictor", out["H_v"], kind)
    if "bond_predictor.ffn.0.0.weight" in sd and "H_e" in out:
        fp = torch.cat([out["H_e"], out["H_e"][rev]], dim=1)
        preds = _head(sd, hp, "bond_predictor", fp, kind)
        out["bond_preds"] = (preds[::2] + preds[1::2]) / 2  # per-bond
    return {k: (v.numpy() if torch.is_tensor(v) else [t.numpy() for t in v]) for k, v in out.items()}


def _jax_layers(ckpt_path, mgs):
    model, variables, _ = convert_model(ckpt_path)
    bmg, perm = batch_mol_graphs(
        mgs, PadSpec.for_graphs(mgs), sort_edges=True, return_perm=True
    )
    (mol_p, atom_p, bond_p), state = model.apply(
        variables,
        bmg,
        is_training=False,
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    inter = state["intermediates"]

    edge_mask = np.asarray(bmg.edge_mask)
    node_mask = np.asarray(bmg.node_mask)
    perm = np.asarray(perm)
    n_real_edges = int(edge_mask.sum())

    def edge_table(x, d=D_H):
        x = np.asarray(x, np.float32)
        x = x[:, :d] if x.ndim == 2 else x
        out = np.zeros((n_real_edges,) + x.shape[1:], np.float32)
        out[perm[edge_mask]] = x[edge_mask]
        return out

    def node_table(x):
        x = np.asarray(x, np.float32)
        return x[node_mask][:, :D_H] if x.ndim == 2 else x[node_mask]

    mp_i = inter["message_passing"]
    out = {"H_0": edge_table(mp_i["H_0"][0]), "H": [edge_table(h) for h in mp_i["H"]]}
    if "M_v" in mp_i:
        out["M_v"] = node_table(mp_i["M_v"][0])
    H_v, H_e = mp_i["__call__"][0]
    if H_v is not None:
        out["H_v"] = node_table(H_v)
    if H_e is not None:
        out["H_e"] = edge_table(H_e, d=None)
    if mol_p is not None:
        out["mol_preds"] = np.asarray(mol_p, np.float32)[: len(mgs)]
    if atom_p is not None:
        out["atom_preds"] = node_table(atom_p)
    if bond_p is not None:
        # both directions carry the pair average; reference order pairs are
        # adjacent (2b, 2b+1), so rows [::2] are the per-bond predictions
        out["bond_preds"] = edge_table(bond_p, d=None)[::2]
    return out


@pytest.mark.parametrize("ckpt", CHECKPOINTS)
def test_mab_per_layer_parity_f32(data_dir, mgs, ckpt):
    path = data_dir / "mol_atom_bond" / "example_models" / ckpt
    kind = "multiclass" if "multiclass" in ckpt else (
        "classification" if "classification" in ckpt else "regression"
    )
    want = _torch_layers(path, mgs, kind)
    got = _jax_layers(path, mgs)

    def check(name, rtol=1e-4, atol=5e-4):
        assert (name in got) == (name in want), f"{ckpt}: {name} presence mismatch"
        if name in want:
            np.testing.assert_allclose(
                got[name], want[name], rtol=rtol, atol=atol, err_msg=f"{ckpt}: {name}"
            )

    check("H_0", atol=2e-4)
    assert len(got["H"]) == DEPTH - 1
    for d, (jh, th) in enumerate(zip(got["H"], want["H"]), start=1):
        np.testing.assert_allclose(jh, th, rtol=1e-4, atol=2e-4, err_msg=f"{ckpt}: H depth {d}")
    for name in ("M_v", "H_v", "H_e", "mol_preds", "atom_preds", "bond_preds"):
        check(name, rtol=1e-3, atol=1e-3)
