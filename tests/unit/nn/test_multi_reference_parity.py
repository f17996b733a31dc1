"""Per-layer activation parity for the multicomponent and reaction (CGR)
families against the PyTorch reference math in eager float32 torch —
the operations of ``/root/reference/chemprop/nn/message_passing/multi.py:
13-84`` (per-component blocks) + ``/root/reference/chemprop/models/multi.py:
44-55`` (per-component agg concat) and the CGR featurization consumed by a
plain BondMessagePassing (``/root/reference/chemprop/featurizers/molgraph/
reaction.py``) — on the committed ``mol+mol`` / ``rxn`` / ``rxn+mol``
reference checkpoints over the bundled datasets.
"""

from __future__ import annotations

import csv

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from chemprop_tpu.data import MoleculeDatapoint, ReactionDatapoint
from chemprop_tpu.data.collate import PadSpec, batch_mol_graphs
from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer
from chemprop_tpu.featurizers.molgraph.reaction import CondensedGraphOfReactionFeaturizer
from chemprop_tpu.models.torch_convert import convert_model, load_torch_checkpoint

N_ROWS = 40
DEPTH = 3
D_H = 300


def _mol_graphs(smis):
    feat = SimpleMoleculeMolGraphFeaturizer()
    return [feat(MoleculeDatapoint.from_smi(s, y=np.zeros(1)).mol) for s in smis]


def _rxn_graphs(rxn_smis):
    feat = CondensedGraphOfReactionFeaturizer()
    out = []
    for s in rxn_smis:
        dp = ReactionDatapoint.from_smi(s, y=np.zeros(1))
        out.append(feat((dp.rct, dp.pdt)))
    return out


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


def _torch_component(sd, prefix, mgs):
    """One BondMessagePassing block + mean agg, eager torch f32
    (reference ``base.py:196-212`` + ``agg.py:66-80``)."""
    V, E, src, dst, rev, batch, n_graphs = _torch_batch(mgs)
    nv = V.shape[0]
    H0 = torch.cat([V[src], E], 1) @ sd[f"{prefix}.W_i.weight"].T
    H = torch.relu(H0)
    Hs = [H0]
    for _ in range(1, DEPTH):
        M = _scatter_add(H, dst, nv)[src] - H[rev]
        H = torch.relu(H0 + M @ sd[f"{prefix}.W_h.weight"].T)
        Hs.append(H)
    M_v = _scatter_add(H, dst, nv)
    H_v = torch.relu(
        torch.cat([V, M_v], 1) @ sd[f"{prefix}.W_o.weight"].T + sd[f"{prefix}.W_o.bias"]
    )
    sums = _scatter_add(H_v, batch, n_graphs)
    counts = _scatter_add(torch.ones(nv, 1), batch, n_graphs)
    return Hs, H_v, sums / counts


def _bn(sd, Z):
    """Eval-mode batchnorm when the checkpoint carries bn buffers
    (reference ``models/model.py:94,133``)."""
    if "bn.running_mean" not in sd:
        return Z
    Z = (Z - sd["bn.running_mean"]) / torch.sqrt(sd["bn.running_var"] + 1e-5)
    return Z * sd["bn.weight"] + sd["bn.bias"]


def _torch_predict(sd, Z):
    Z = _bn(sd, Z)
    z = Z @ sd["predictor.ffn.0.0.weight"].T + sd["predictor.ffn.0.0.bias"]
    i = 1
    while f"predictor.ffn.{i}.2.weight" in sd:
        z = torch.relu(z) @ sd[f"predictor.ffn.{i}.2.weight"].T + sd[f"predictor.ffn.{i}.2.bias"]
        i += 1
    if "predictor.output_transform.mean" in sd:
        z = z * sd["predictor.output_transform.scale"].reshape(-1) + sd[
            "predictor.output_transform.mean"
        ].reshape(-1)
    return z


def _load_sd(path):
    return {
        k: torch.tensor(np.array(v, np.float32))
        for k, v in load_torch_checkpoint(path)["state_dict"].items()
        if "num_batches_tracked" not in k and "criterion" not in k
    }


def _jax_apply(model, variables, component_mgs):
    bmgs = []
    for mgs in component_mgs:
        bmg, _ = batch_mol_graphs(mgs, PadSpec.for_graphs(mgs), sort_edges=True, return_perm=True)
        bmgs.append(bmg)
    arg = bmgs if len(bmgs) > 1 else bmgs[0]
    return model.apply(variables, arg, None, None, is_training=False)


def test_multicomponent_mol_mol_parity(data_dir):
    """mol+mol: two BondMessagePassing blocks, concatenated agg outputs
    (reference ``models/multi.py:44-55``)."""
    path = data_dir / "example_model_v2_regression_mol+mol.pt"
    rows = list(csv.DictReader(open(data_dir / "regression" / "mol+mol" / "mol+mol.csv")))[:N_ROWS]
    comp0 = _mol_graphs([r["smiles"] for r in rows])
    comp1 = _mol_graphs([r["solvent"] for r in rows])

    sd = _load_sd(path)
    _, _, agg0 = _torch_component(sd, "message_passing.blocks.0", comp0)
    _, _, agg1 = _torch_component(sd, "message_passing.blocks.1", comp1)
    want = _torch_predict(sd, torch.cat([agg0, agg1], dim=1)).numpy()

    model, variables, _ = convert_model(path)
    got = np.asarray(_jax_apply(model, variables, [comp0, comp1]), np.float32)[: len(rows)]
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=2e-3)


def test_rxn_cgr_parity(data_dir):
    """rxn: CGR featurization feeding a single BondMessagePassing — the
    parity here additionally pins the CGR feature construction
    (reference ``featurizers/molgraph/reaction.py:45-332``)."""
    path = data_dir / "example_model_v2_regression_rxn.pt"
    rows = list(csv.DictReader(open(data_dir / "regression" / "rxn" / "rxn.csv")))[:N_ROWS]
    graphs = _rxn_graphs([r["smiles"] for r in rows])

    sd = _load_sd(path)
    _, _, agg = _torch_component(sd, "message_passing", graphs)
    want = _torch_predict(sd, agg).numpy()

    model, variables, _ = convert_model(path)
    got = np.asarray(_jax_apply(model, variables, [graphs]), np.float32)[: len(rows)]
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=2e-3)


def test_rxn_mol_multicomponent_parity(data_dir):
    """rxn+mol: mixed CGR + molecule components through one multicomponent
    model (reference ``models/multi.py`` with a CGR block)."""
    path = data_dir / "example_model_v2_regression_rxn+mol.pt"
    rows = list(csv.DictReader(open(data_dir / "regression" / "rxn+mol" / "rxn+mol.csv")))[:N_ROWS]
    # this reference checkpoint was trained with component order
    # (molecule, reaction): blocks.0.W_i is 86-wide, blocks.1.W_i 134-wide
    # (the reference predict CLI has order-swap detection for exactly this,
    # ``chemprop/cli/predict.py:224-298``)
    comp0 = _mol_graphs([r["solvent_smiles"] for r in rows])
    comp1 = _rxn_graphs([r["rxn_smiles"] for r in rows])

    sd = _load_sd(path)
    _, _, agg0 = _torch_component(sd, "message_passing.blocks.0", comp0)
    _, _, agg1 = _torch_component(sd, "message_passing.blocks.1", comp1)
    want = _torch_predict(sd, torch.cat([agg0, agg1], dim=1)).numpy()

    model, variables, _ = convert_model(path)
    got = np.asarray(_jax_apply(model, variables, [comp0, comp1]), np.float32)[: len(rows)]
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=2e-3)
