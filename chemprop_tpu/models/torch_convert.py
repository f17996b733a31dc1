"""Reference (PyTorch) checkpoint interop.

Reads chemprop v2 ``.pt``/``.ckpt`` files (``{hyper_parameters, state_dict,
output_columns}``, reference ``chemprop/models/utils.py:17-24``) *without*
the chemprop/torch-lightning packages: unknown classes in the pickle stream
are materialized as dict-backed stubs that record their qualified name, which
is all the hparams-reconstruction protocol needs (``hparams['cls']``).

State-dict tensors are transposed into flax layout (torch ``Linear.weight``
is ``[out, in]``; flax ``Dense.kernel`` is ``[in, out]``) and batch-norm
running stats move to the ``batch_stats`` collection. This is the
``chemprop-tpu convert`` backbone and the per-layer allclose parity gate.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import numpy as np


class _Stub(dict):
    """Dict-backed stand-in for any unpicklable class (supports item and
    attribute protocols plus __setstate__)."""

    _qualname = "?"

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k) from None

    def __setattr__(self, k, v):
        self[k] = v

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.update(state)
        elif isinstance(state, tuple):
            for part in state:
                if isinstance(part, dict):
                    self.update(part)

    def __reduce__(self):
        return (dict, (dict(self),))


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError, ModuleNotFoundError):
            return type(name, (_Stub,), {"_qualname": f"{module}.{name}"})


class _StubPickleModule:
    Unpickler = _StubUnpickler

    @staticmethod
    def load(f, **kwargs):
        return _StubUnpickler(f).load()


def load_torch_checkpoint(path: str | Path) -> dict:
    import torch

    return torch.load(path, map_location="cpu", pickle_module=_StubPickleModule, weights_only=False)


def _cls_name(obj: Any) -> str:
    if isinstance(obj, type):
        return getattr(obj, "_qualname", obj.__module__ + "." + obj.__name__).rsplit(".", 1)[-1]
    return type(obj).__name__


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def convert_state_dict(sd: dict, prefix_map: dict[str, str] | None = None) -> tuple[dict, dict]:
    """torch state dict -> (flax params, batch_stats)."""
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    for key, tensor in sd.items():
        parts = key.split(".")
        if parts[0] in ("metrics",) or "criterion" in parts:
            continue
        if parts[0] == "predictor" and parts[1] == "output_transform":
            continue  # baked into the manifest, not the params
        if parts[0] in ("X_d_transform",) or "V_d_transform" in parts or "graph_transform" in parts:
            continue
        v = _np(tensor)
        if parts[0] == "message_passing" and parts[1] in ("W_i", "W_h", "W_o", "W_d"):
            name = "kernel" if parts[-1] == "weight" else "bias"
            put(params, ("message_passing", parts[1], name), v.T if name == "kernel" else v)
        elif parts[0] == "message_passing" and parts[1] == "blocks":
            # multicomponent: message_passing.blocks.<i>.W_x.*
            name = "kernel" if parts[-1] == "weight" else "bias"
            put(
                params,
                ("message_passing", f"blocks_{parts[2]}", parts[3], name),
                v.T if name == "kernel" else v,
            )
        elif parts[0] == "bn":
            if parts[1] == "weight":
                put(params, ("bn", "scale"), v)
            elif parts[1] == "bias":
                put(params, ("bn", "bias"), v)
            elif parts[1] == "running_mean":
                put(batch_stats, ("bn", "mean"), v)
            elif parts[1] == "running_var":
                put(batch_stats, ("bn", "var"), v)
        elif parts[0] == "agg" and parts[1] == "W":
            name = "kernel" if parts[-1] == "weight" else "bias"
            put(params, ("agg", "W", name), v.T if name == "kernel" else v)
        elif parts[0] == "predictor" and parts[1] == "ffn":
            # reference MLP: block 0 = Sequential(Linear) => ffn.0.0.*
            # block i>0 = Sequential(act, dropout, Linear) => ffn.i.2.*
            block = int(parts[2])
            name = "kernel" if parts[-1] == "weight" else "bias"
            put(
                params,
                ("predictor", "ffn", f"block{block}", name),
                v.T if name == "kernel" else v,
            )
        else:
            raise KeyError(f"unmapped torch state-dict key: {key}")
    return params, batch_stats


_PREDICTOR_NAMES = {
    "RegressionFFN": "RegressionFFN",
    "MveFFN": "MveFFN",
    "EvidentialFFN": "EvidentialFFN",
    "QuantileFFN": "QuantileFFN",
    "BinaryClassificationFFN": "BinaryClassificationFFN",
    "BinaryDirichletFFN": "BinaryDirichletFFN",
    "MulticlassClassificationFFN": "MulticlassClassificationFFN",
    "MulticlassDirichletFFN": "MulticlassDirichletFFN",
    "SpectralFFN": "SpectralFFN",
}


def convert_model(path: str | Path):
    """Reference .pt/.ckpt -> (chemprop_tpu MPNN, variables, output_columns).
    v1-era checkpoints ({args, state_dict, data_scaler, ...}) are detected and
    routed to :func:`convert_v1_model`."""
    from chemprop_tpu.models.model import MPNN
    from chemprop_tpu.nn import agg as agg_mod
    from chemprop_tpu.nn import predictors as pred_mod
    from chemprop_tpu.nn.message_passing import base as mp_mod
    from chemprop_tpu.nn.transforms import ScaleTransform, UnscaleTransform

    d = load_torch_checkpoint(path)
    if "hyper_parameters" not in d and "args" in d:
        return convert_v1_model(path, _loaded=d)
    hp = d["hyper_parameters"]
    sd = d["state_dict"]
    output_columns = d.get("output_columns")

    mp_hp = hp["message_passing"]
    mp_cls_name = _cls_name(mp_hp["cls"])
    mp_cls = (
        mp_mod.AtomMessagePassing if "Atom" in mp_cls_name else mp_mod.BondMessagePassing
    )
    mp = mp_cls(
        d_h=int(mp_hp.get("d_h", 300)),
        bias=bool(mp_hp.get("bias", False)),
        depth=int(mp_hp.get("depth", 3)),
        dropout=float(_scalar(mp_hp.get("dropout", 0.0))),
        activation=_activation_name(mp_hp.get("activation", "relu")),
        undirected=bool(mp_hp.get("undirected", False)),
        d_vd=mp_hp.get("d_vd"),
    )

    agg_hp = hp["agg"]
    agg_name = _cls_name(agg_hp["cls"])
    agg_cls = getattr(agg_mod, agg_name)
    agg_kwargs = {}
    if agg_name == "NormAggregation":
        agg_kwargs["norm"] = float(agg_hp.get("norm", 100.0))
    if agg_name == "AttentiveAggregation":
        agg_kwargs["output_size"] = int(agg_hp.get("output_size", 300))
    agg = agg_cls(**agg_kwargs)

    p_hp = hp["predictor"]
    p_name = _PREDICTOR_NAMES[_cls_name(p_hp["cls"])]
    p_cls = getattr(pred_mod, p_name)
    out_tf = None
    ot = p_hp.get("output_transform")
    if ot is not None and "mean" in _stub_state(ot):
        st = _stub_state(ot)
        out_tf = UnscaleTransform(_np(st["mean"]).reshape(-1), _np(st["scale"]).reshape(-1))
    kwargs = dict(
        n_tasks=int(p_hp.get("n_tasks", 1)),
        input_dim=int(p_hp.get("input_dim", 300)),
        hidden_dim=_hidden(p_hp.get("hidden_dim", 300)),
        n_layers=int(p_hp.get("n_layers", 1)),
        dropout=float(_scalar(p_hp.get("dropout", 0.0))),
        activation=_activation_name(p_hp.get("activation", "relu")),
        output_transform=out_tf,
    )
    if "Multiclass" in p_name:
        kwargs["n_classes"] = int(p_hp.get("n_classes", 3))
    predictor = p_cls(**kwargs)

    model = MPNN(
        message_passing=mp,
        agg=agg,
        predictor=predictor,
        batch_norm="bn.running_mean" in sd,
    )
    params, batch_stats = convert_state_dict(sd)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return model, variables, output_columns


def convert_v1_model(path: str | Path, _loaded: dict | None = None):
    """Chemprop v1 ``.pt`` ({args, state_dict, data_scaler, ...}) ->
    (chemprop_tpu model, variables, output_columns).

    v1 state-dict layout (cf. reference ``chemprop/utils/v1_to_v2.py:30-120``,
    re-derived here from the checkpoint itself):

    * ``encoder.encoder.<i>.W_{i,h,o}`` — the D-MPNN weights of component i
      (math identical to v2's BondMessagePassing/AtomMessagePassing)
    * ``readout.<j>`` — Sequential(dropout, Linear, act, dropout, Linear, ...);
      the sorted Linear indices become MLP blocks, so v1 ``ffn_num_layers``
      (Linear count) = our ``n_layers + 1``
    * ``data_scaler`` means/stds -> UnscaleTransform

    v1 models use the 133-dim v1 atom featurizer — predict with
    ``--multi-hot-atom-featurizer-mode v1``.
    """
    from chemprop_tpu.models.model import MPNN
    from chemprop_tpu.models.multi import MulticomponentMPNN
    from chemprop_tpu.nn import agg as agg_mod
    from chemprop_tpu.nn import predictors as pred_mod
    from chemprop_tpu.nn.message_passing import base as mp_mod
    from chemprop_tpu.nn.message_passing.multi import MulticomponentMessagePassing
    from chemprop_tpu.nn.transforms import UnscaleTransform

    d = _loaded if _loaded is not None else load_torch_checkpoint(path)
    args = d["args"]
    sd = d["state_dict"]

    def arg(name, default=None):
        return getattr(args, name, default)

    atom_messages = bool(arg("atom_messages", False))
    mp_cls = mp_mod.AtomMessagePassing if atom_messages else mp_mod.BondMessagePassing
    n_components = int(arg("number_of_molecules", 1))
    shared = bool(arg("mpn_shared", False))

    def tnp(t):
        a = t if isinstance(t, np.ndarray) else _np(t)
        return np.asarray(a, dtype=np.float32)

    params: dict = {"message_passing": {}, "predictor": {"ffn": {}}}
    n_encoders = len(
        {k.split(".")[2] for k in sd if k.startswith("encoder.encoder.")}
    )
    blocks = []
    for i in range(n_encoders):
        pre = f"encoder.encoder.{i}."
        block_params = {}
        for w in ("W_i", "W_h", "W_o"):
            block_params[w] = {"kernel": tnp(sd[pre + w + ".weight"]).T}
            if pre + w + ".bias" in sd:
                block_params[w]["bias"] = tnp(sd[pre + w + ".bias"])
        if pre + "atom_descriptors_layer.weight" in sd:
            block_params["W_d"] = {
                "kernel": tnp(sd[pre + "atom_descriptors_layer.weight"]).T,
                "bias": tnp(sd[pre + "atom_descriptors_layer.bias"]),
            }
        blocks.append(block_params)
        mp_kwargs = dict(
            d_h=int(arg("hidden_size", 300)),
            bias=bool(arg("bias", False)),
            depth=int(arg("depth", 3)),
            dropout=float(arg("dropout", 0.0)),
            activation=_activation_name(arg("activation", "ReLU")),
            undirected=bool(arg("undirected", False)),
        )

    if n_components > 1 or n_encoders > 1:
        mps = [mp_cls(**mp_kwargs) for _ in range(n_encoders)]
        message_passing = MulticomponentMessagePassing(
            blocks=mps, n_components=n_components, shared=shared
        )
        params["message_passing"] = {
            f"blocks_{i}": blk for i, blk in enumerate(blocks)
        }
        mp_out_dim = message_passing.output_dim
    else:
        message_passing = mp_cls(**mp_kwargs)
        params["message_passing"] = blocks[0]
        mp_out_dim = message_passing.output_dim

    # readout Sequential: sorted Linear layer indices -> MLP blocks
    readout_idx = sorted(
        {int(k.split(".")[1]) for k in sd if k.startswith("readout.") and k.endswith(".weight")}
    )
    widths = []
    for b, j in enumerate(readout_idx):
        W = tnp(sd[f"readout.{j}.weight"])
        params["predictor"]["ffn"][f"block{b}"] = {
            "kernel": W.T,
            "bias": tnp(sd[f"readout.{j}.bias"]),
        }
        widths.append(W.shape[0])

    dataset_type = str(arg("dataset_type", "regression"))
    out_tf = None
    scaler = d.get("data_scaler")
    if scaler is not None and scaler.get("means") is not None:
        out_tf = UnscaleTransform(
            np.asarray(scaler["means"], dtype=np.float32).reshape(-1),
            np.asarray(scaler["stds"], dtype=np.float32).reshape(-1),
        )
    task_names = list(arg("task_names", None) or [])
    n_tasks = int(arg("num_tasks", 0) or len(task_names) or 1)
    p_map = {
        "regression": pred_mod.RegressionFFN,
        "classification": pred_mod.BinaryClassificationFFN,
        "multiclass": pred_mod.MulticlassClassificationFFN,
    }
    p_cls = p_map.get(dataset_type, pred_mod.RegressionFFN)
    p_kwargs = dict(
        n_tasks=n_tasks,
        input_dim=mp_out_dim,
        hidden_dim=int(arg("ffn_hidden_size", 300)),
        n_layers=len(readout_idx) - 1,
        dropout=float(arg("dropout", 0.0)),
        activation=_activation_name(arg("activation", "ReLU")),
        output_transform=out_tf,
    )
    if dataset_type == "multiclass":
        p_kwargs["n_classes"] = int(arg("multiclass_num_classes", 3))
    predictor = p_cls(**p_kwargs)

    agg_name = str(arg("aggregation", "mean")).lower()
    agg = {
        "mean": agg_mod.MeanAggregation(),
        "sum": agg_mod.SumAggregation(),
        "norm": agg_mod.NormAggregation(norm=float(arg("aggregation_norm", 100))),
    }[agg_name]

    cls = MulticomponentMPNN if (n_components > 1 or n_encoders > 1) else MPNN
    model = cls(message_passing=message_passing, agg=agg, predictor=predictor, batch_norm=False)
    return model, {"params": params}, (task_names or None)


def _stub_state(obj) -> dict:
    if isinstance(obj, dict):
        # torch buffers may live under _buffers
        state = dict(obj)
        bufs = state.get("_buffers")
        if isinstance(bufs, dict):
            state.update(bufs)
        return state
    return {}


def _scalar(v):
    if isinstance(v, dict):  # nn.Dropout stub: {'p': rate, ...}
        return v.get("p", 0.0)
    return v


def _activation_name(v) -> str:
    if isinstance(v, str):
        return v.lower()
    name = _cls_name(v).lower()
    for known in ("relu", "leakyrelu", "prelu", "tanh", "elu", "gelu", "silu", "softplus"):
        if known in name:
            return known
    return "relu"


def _hidden(v):
    if isinstance(v, (list, tuple)):
        return tuple(int(x) for x in v)
    return int(v)
