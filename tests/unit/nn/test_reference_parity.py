"""Per-layer activation parity gate against the PyTorch reference math.

North star (BASELINE.md): per-layer message-passing activations must match
the reference (allclose). For each committed reference checkpoint, the
reference model's math is evaluated here in eager float32 torch — exactly the
operations of ``/root/reference/chemprop/nn/message_passing/base.py:196-212``
(initialize / message / update / finalize) and
``/root/reference/chemprop/models/model.py:126-146`` (agg -> batchnorm ->
FFN) — on the full 100-molecule ``smis.csv`` corpus, and every intermediate
table of the JAX modules is asserted allclose against it:

    H0, H after each depth iteration, M_v, H_v (message-passing output),
    aggregation output, batchnorm output, every FFN block output, and the
    final train-space and inference-space predictions.

The JAX modules run on padded dst-sorted batches with lane-aligned (384-wide,
zero-tail) hidden tables; rows are mapped back through the collate sort
permutation and columns sliced to ``d_h`` before comparison, so the gate also
proves the padding/sorting machinery is activation-exact, not merely
end-to-end-exact. A bfloat16 compute-dtype variant pins the low-precision
drift envelope.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from chemprop_tpu.data import MoleculeDatapoint
from chemprop_tpu.data.collate import PadSpec, batch_mol_graphs
from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer
from chemprop_tpu.models.torch_convert import convert_model, load_torch_checkpoint

CHECKPOINTS = [
    "example_model_v2_regression_mol.pt",
    "example_model_v2_regression_mve_mol.pt",
    "example_model_v2_classification_mol.pt",
]

D_H = 300
DEPTH = 3


@pytest.fixture(scope="module")
def mgs(smis):
    feat = SimpleMoleculeMolGraphFeaturizer()
    return [feat(MoleculeDatapoint.from_smi(s, y=np.zeros(1)).mol) for s in smis]


def _torch_batch(mgs):
    """Reference collate semantics (``chemprop/data/collate.py:37-62``):
    concatenated tables, edge/node indices offset by running counts."""
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


def _torch_layers(ckpt_path, mgs):
    """All per-layer tables of the reference model, eager torch f32."""
    sd = {
        k: torch.tensor(np.array(v, np.float32))
        for k, v in load_torch_checkpoint(ckpt_path)["state_dict"].items()
        if "num_batches_tracked" not in k
    }
    hp = load_torch_checkpoint(ckpt_path)["hyper_parameters"]
    agg_cls = type(hp["agg"]["cls"]).__name__ if not isinstance(hp["agg"]["cls"], type) else hp[
        "agg"
    ]["cls"].__name__
    V, E, src, dst, rev, batch, n_graphs = _torch_batch(mgs)
    nv = V.shape[0]
    out = {}

    # ---- message passing (reference base.py:196-212, mixins.py:8-18)
    H0 = torch.cat([V[src], E], 1) @ sd["message_passing.W_i.weight"].T
    out["H_0"] = H0
    H = torch.relu(H0)
    out["H"] = []
    for _ in range(1, DEPTH):
        M = _scatter_add(H, dst, nv)[src] - H[rev]
        H = torch.relu(H0 + M @ sd["message_passing.W_h.weight"].T)
        out["H"].append(H)
    M_v = _scatter_add(H, dst, nv)
    out["M_v"] = M_v
    H_v = torch.relu(
        torch.cat([V, M_v], 1) @ sd["message_passing.W_o.weight"].T
        + sd["message_passing.W_o.bias"]
    )
    out["H_v"] = H_v

    # ---- aggregation (reference agg.py:66-115)
    sums = _scatter_add(H_v, batch, n_graphs)
    counts = _scatter_add(torch.ones(nv, 1), batch, n_graphs)
    if "Norm" in str(agg_cls):
        agg = sums / 100.0
    else:
        agg = sums / counts
    out["agg"] = agg

    # ---- batchnorm, eval mode (reference models/model.py:94,133)
    bn = (agg - sd["bn.running_mean"]) / torch.sqrt(sd["bn.running_var"] + 1e-5)
    bn = bn * sd["bn.weight"] + sd["bn.bias"]
    out["bn"] = bn

    # ---- FFN blocks (reference nn/ffn.py:38-61: block0 = Linear,
    # block i>0 = act -> dropout -> Linear)
    z = bn @ sd["predictor.ffn.0.0.weight"].T + sd["predictor.ffn.0.0.bias"]
    out["ffn_blocks"] = [z]
    i = 1
    while f"predictor.ffn.{i}.2.weight" in sd:
        z = torch.relu(z) @ sd[f"predictor.ffn.{i}.2.weight"].T + sd[f"predictor.ffn.{i}.2.bias"]
        out["ffn_blocks"].append(z)
        i += 1

    # ---- heads (reference nn/predictors.py:160-250)
    if "mve" in str(ckpt_path):
        mean, var = z.chunk(2, 1)
        var = torch.nn.functional.softplus(var)
        out["train_preds"] = torch.cat([mean[..., None], var[..., None]], -1)
        u_mean = mean * sd["predictor.output_transform.scale"] + sd[
            "predictor.output_transform.mean"
        ]
        u_var = var * sd["predictor.output_transform.scale"] ** 2
        out["preds"] = torch.cat([u_mean[..., None], u_var[..., None]], -1)
    elif "classification" in str(ckpt_path):
        out["train_preds"] = z  # logits
        out["preds"] = torch.sigmoid(z)
    else:
        out["train_preds"] = z
        out["preds"] = z * sd["predictor.output_transform.scale"] + sd[
            "predictor.output_transform.mean"
        ]
    return {
        k: [t.numpy() for t in v] if isinstance(v, list) else v.numpy() for k, v in out.items()
    }


def _jax_layers(ckpt_path, mgs, compute_dtype=None):
    """The JAX modules' per-layer tables on the padded dst-sorted batch,
    mapped back to reference row order."""
    model, variables, _ = convert_model(ckpt_path)
    if compute_dtype is not None:
        mp = model.message_passing.clone(compute_dtype=compute_dtype)
        model = model.clone(message_passing=mp)
    bmg, perm = batch_mol_graphs(
        mgs, PadSpec.for_graphs(mgs), sort_edges=True, return_perm=True
    )
    train_preds, state = model.apply(
        variables,
        bmg,
        None,
        None,
        is_training=False,
        method="train_step_preds",
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    preds = model.apply(variables, bmg, None, None, is_training=False)
    inter = state["intermediates"]

    edge_mask = np.asarray(bmg.edge_mask)
    node_mask = np.asarray(bmg.node_mask)
    perm = np.asarray(perm)
    n_real_edges = int(edge_mask.sum())

    def edge_table(x):
        """Sorted padded edge table -> reference (concat) edge order."""
        x = np.asarray(x, np.float32)[:, :D_H]
        out = np.zeros((n_real_edges, D_H), np.float32)
        out[perm[edge_mask]] = x[edge_mask]
        return out

    def node_table(x):
        return np.asarray(x, np.float32)[node_mask][:, :D_H]

    def graph_table(x, d=None):
        x = np.asarray(x, np.float32)[: len(mgs)]
        return x[:, :D_H] if d is None else x

    mp_i = inter["message_passing"]
    out = {
        "H_0": edge_table(mp_i["H_0"][0]),
        "H": [edge_table(h) for h in mp_i["H"]],
        "M_v": node_table(mp_i["M_v"][0]),
        "H_v": node_table(mp_i["__call__"][0]),
        "agg": graph_table(inter["agg"]["__call__"][0]),
        "bn": graph_table(inter["bn"]["__call__"][0]),
        "ffn_blocks": [
            np.asarray(inter["predictor"]["ffn"][k]["__call__"][0], np.float32)[: len(mgs)]
            for k in sorted(k for k in inter["predictor"]["ffn"] if k.startswith("block"))
        ],
        "train_preds": np.asarray(train_preds, np.float32)[: len(mgs)],
        "preds": np.asarray(preds, np.float32)[: len(mgs)],
    }
    return out


@pytest.mark.parametrize("ckpt", CHECKPOINTS)
def test_per_layer_parity_f32(data_dir, mgs, ckpt):
    path = data_dir / ckpt
    want = _torch_layers(path, mgs)
    got = _jax_layers(path, mgs)

    def check(name, j, t, rtol=1e-4, atol=2e-4):
        np.testing.assert_allclose(j, t, rtol=rtol, atol=atol, err_msg=f"{ckpt}: {name}")

    check("H_0", got["H_0"], want["H_0"])
    assert len(got["H"]) == DEPTH - 1
    for d, (jh, th) in enumerate(zip(got["H"], want["H"]), start=1):
        check(f"H depth {d}", jh, th)
    check("M_v", got["M_v"], want["M_v"], atol=5e-4)  # segment sums over ~2E/V rows
    check("H_v", got["H_v"], want["H_v"], atol=5e-4)
    check("agg", got["agg"], want["agg"], atol=5e-4)
    check("bn", got["bn"], want["bn"], atol=5e-4)
    assert len(got["ffn_blocks"]) == len(want["ffn_blocks"])
    for b, (jz, tz) in enumerate(zip(got["ffn_blocks"], want["ffn_blocks"])):
        check(f"ffn block {b}", jz, tz, atol=5e-4)
    check("train preds", got["train_preds"], want["train_preds"], atol=5e-4)
    check("inference preds", got["preds"], want["preds"], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("ckpt", CHECKPOINTS[:1])
def test_parity_bf16_envelope(data_dir, mgs, ckpt):
    """bfloat16 compute-dtype drift envelope on the flagship checkpoint: the
    per-layer tables stay within bf16 tolerance of the f32 reference."""
    path = data_dir / ckpt
    want = _torch_layers(path, mgs)
    got = _jax_layers(path, mgs, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(got["H_0"], want["H_0"], rtol=0.05, atol=0.05)
    np.testing.assert_allclose(got["H_v"], want["H_v"], rtol=0.1, atol=0.15)
    np.testing.assert_allclose(got["preds"], want["preds"], rtol=0.05, atol=0.1)


def test_empty_edge_graph_parity(data_dir):
    """Single-atom molecules (zero edges) follow the reference's zero-message
    path (``/root/reference/chemprop/featurizers/molgraph/molecule.py:65-66``,
    ``tests/integration/test_export.py:19``)."""
    feat = SimpleMoleculeMolGraphFeaturizer()
    mgs = [feat(MoleculeDatapoint.from_smi(s, y=np.zeros(1)).mol) for s in ["C", "CCO", "[Na+]"]]
    path = data_dir / CHECKPOINTS[0]
    want = _torch_layers(path, mgs)
    got = _jax_layers(path, mgs)
    np.testing.assert_allclose(got["H_v"], want["H_v"], rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(got["preds"], want["preds"], rtol=1e-3, atol=1e-3)
