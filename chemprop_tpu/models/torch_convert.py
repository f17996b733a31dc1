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

    head_prefixes = (
        "predictor",
        "mol_predictor",
        "atom_predictor",
        "bond_predictor",
        "atom_constrainer",
        "bond_constrainer",
    )
    for key, tensor in sd.items():
        parts = key.split(".")
        if parts[0] in ("metrics", "metricss") or "criterion" in parts:
            continue
        if parts[0] in head_prefixes and parts[1] == "output_transform":
            continue  # baked into the manifest, not the params
        if (
            parts[0] in ("X_d_transform",)
            or "V_d_transform" in parts
            or "E_d_transform" in parts
            or "graph_transform" in parts
        ):
            continue  # transforms are module config, not params
        v = _np(tensor)
        if parts[0] == "message_passing" and parts[1] in (
            "W_i",
            "W_h",
            "W_o",
            "W_d",
            "W_vo",
            "W_vd",
            "W_eo",
            "W_ed",
        ):
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
        elif parts[0] in head_prefixes and parts[1] == "ffn":
            # reference MLP: block 0 = Sequential(Linear) => ffn.0.0.*
            # block i>0 = Sequential(act, dropout, Linear) => ffn.i.2.*
            block = int(parts[2])
            name = "kernel" if parts[-1] == "weight" else "bias"
            put(
                params,
                (parts[0], "ffn", f"block{block}", name),
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


_SINGLE_MP_CLASSES = ("BondMessagePassing", "AtomMessagePassing")
_MAB_MP_CLASSES = ("MABBondMessagePassing", "MABAtomMessagePassing")


def _sd_scale_transform(sd: dict, prefix: str):
    """ScaleTransform from buffer keys ``{prefix}.mean/.scale`` (if present).
    Reference transforms store full-width buffers (pad block already baked,
    cf. ``chemprop/nn/transforms.py:12-16``), so ``pad=0`` here is exact."""
    from chemprop_tpu.nn.transforms import ScaleTransform

    if f"{prefix}.mean" not in sd:
        return None
    return ScaleTransform(
        _np(sd[f"{prefix}.mean"]).reshape(-1), _np(sd[f"{prefix}.scale"]).reshape(-1)
    )


def _sd_graph_transform(sd: dict, prefix: str = "message_passing.graph_transform"):
    from chemprop_tpu.nn.transforms import GraphTransform

    V = _sd_scale_transform(sd, prefix + ".V_transform")
    E = _sd_scale_transform(sd, prefix + ".E_transform")
    return GraphTransform(V, E) if (V is not None or E is not None) else None


def _convert_single_mp(mp_hp: dict, sd: dict, sd_prefix: str = "message_passing"):
    """One Bond/AtomMessagePassing module from its hparams blob. Unknown MP
    classes raise (reference routes by exact class,
    ``chemprop/models/utils.py:30-35`` + hparams ``cls`` reconstruction)."""
    from chemprop_tpu.nn.message_passing import base as mp_mod

    name = _cls_name(mp_hp["cls"])
    if name not in _SINGLE_MP_CLASSES:
        raise ValueError(
            f"unsupported message-passing class in checkpoint: {name!r} "
            f"(expected one of {_SINGLE_MP_CLASSES})"
        )
    mp_cls = getattr(mp_mod, name)
    return mp_cls(
        d_h=int(mp_hp.get("d_h", 300)),
        bias=bool(mp_hp.get("bias", False)),
        depth=int(mp_hp.get("depth", 3)),
        dropout=float(_scalar(mp_hp.get("dropout", 0.0))),
        activation=_activation_name(mp_hp.get("activation", "relu")),
        undirected=bool(mp_hp.get("undirected", False)),
        d_vd=(int(mp_hp.get("d_vd") or 0) or None),
        V_d_transform=_sd_scale_transform(sd, sd_prefix + ".V_d_transform"),
        graph_transform=_sd_graph_transform(sd, sd_prefix + ".graph_transform"),
    )


def _convert_agg(agg_hp: dict):
    from chemprop_tpu.nn import agg as agg_mod

    agg_name = _cls_name(agg_hp["cls"])
    if not hasattr(agg_mod, agg_name):
        raise ValueError(f"unsupported aggregation class in checkpoint: {agg_name!r}")
    agg_kwargs = {}
    if agg_name == "NormAggregation":
        agg_kwargs["norm"] = float(agg_hp.get("norm", 100.0))
    if agg_name == "AttentiveAggregation":
        agg_kwargs["output_size"] = int(agg_hp.get("output_size", 300))
    return getattr(agg_mod, agg_name)(**agg_kwargs)


def _convert_predictor(p_hp: dict):
    from chemprop_tpu.nn import predictors as pred_mod
    from chemprop_tpu.nn.transforms import UnscaleTransform

    cls_name = _cls_name(p_hp["cls"])
    if cls_name not in _PREDICTOR_NAMES:
        raise ValueError(
            f"unsupported predictor class in checkpoint: {cls_name!r} "
            f"(expected one of {sorted(_PREDICTOR_NAMES)})"
        )
    p_cls = getattr(pred_mod, _PREDICTOR_NAMES[cls_name])
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
    if "Multiclass" in _PREDICTOR_NAMES[cls_name]:
        kwargs["n_classes"] = int(p_hp.get("n_classes", 3))
    return p_cls(**kwargs)


def _convert_constrainer(c_hp: dict | None):
    from chemprop_tpu.nn.ffn import ConstrainerFFN

    if c_hp is None:
        return None
    return ConstrainerFFN(
        n_constraints=int(c_hp.get("n_constraints", 1)),
        fp_dim=int(c_hp.get("fp_dim", 300)),
        hidden_dim=_hidden(c_hp.get("hidden_dim", 300)),
        n_layers=int(c_hp.get("n_layers", 1)),
        dropout=float(_scalar(c_hp.get("dropout", 0.0))),
        activation=_activation_name(c_hp.get("activation", "relu")),
    )


def _convert_x_d_transform(hp: dict, sd: dict):
    x_hp = hp.get("X_d_transform")
    if x_hp is None:
        return None
    return _sd_scale_transform(sd, "X_d_transform")


def convert_model(path: str | Path):
    """Reference .pt/.ckpt -> (chemprop_tpu model, variables, output_columns).

    Routing matches the reference's (multicomponent, mol_atom_bond) class
    choice (``chemprop/models/utils.py:30-35``): MAB checkpoints carry
    ``mol/atom/bond_predictor`` hparams, multicomponent ones carry a
    ``MulticomponentMessagePassing`` blob with ``blocks``; anything with an
    unrecognized class raises instead of silently mis-converting. v1-era
    checkpoints ({args, state_dict, data_scaler, ...}) are detected and
    routed to :func:`convert_v1_model`."""
    d = load_torch_checkpoint(path)
    if "hyper_parameters" not in d and "args" in d:
        return convert_v1_model(path, _loaded=d)
    hp = d["hyper_parameters"]
    if any(k in hp for k in ("mol_predictor", "atom_predictor", "bond_predictor")):
        return _convert_mab_model(d)
    if _cls_name(hp["message_passing"]["cls"]) == "MulticomponentMessagePassing":
        return _convert_multicomponent_model(d)
    return _convert_single_model(d)


def _convert_single_model(d: dict):
    from chemprop_tpu.models.model import MPNN

    hp = d["hyper_parameters"]
    sd = d["state_dict"]
    model = MPNN(
        message_passing=_convert_single_mp(hp["message_passing"], sd),
        agg=_convert_agg(hp["agg"]),
        predictor=_convert_predictor(hp["predictor"]),
        batch_norm="bn.running_mean" in sd,
        X_d_transform=_convert_x_d_transform(hp, sd),
    )
    params, batch_stats = convert_state_dict(sd)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return model, variables, d.get("output_columns")


def _convert_multicomponent_model(d: dict):
    """v2 multicomponent checkpoint (``example_model_v2_regression_mol+mol.pt``
    and friends): one MP block per component (or one shared), per-component
    state under ``message_passing.blocks.<i>``."""
    from chemprop_tpu.models.multi import MulticomponentMPNN
    from chemprop_tpu.nn.message_passing.multi import MulticomponentMessagePassing

    hp = d["hyper_parameters"]
    sd = d["state_dict"]
    mp_hp = hp["message_passing"]
    blocks = [
        _convert_single_mp(bhp, sd, sd_prefix=f"message_passing.blocks.{i}")
        for i, bhp in enumerate(mp_hp["blocks"])
    ]
    message_passing = MulticomponentMessagePassing(
        blocks=blocks,
        n_components=int(mp_hp.get("n_components", len(blocks))),
        shared=bool(mp_hp.get("shared", False)),
    )
    model = MulticomponentMPNN(
        message_passing=message_passing,
        agg=_convert_agg(hp["agg"]),
        predictor=_convert_predictor(hp["predictor"]),
        batch_norm="bn.running_mean" in sd,
        X_d_transform=_convert_x_d_transform(hp, sd),
    )
    params, batch_stats = convert_state_dict(sd)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return model, variables, d.get("output_columns")


def _convert_mab_model(d: dict):
    """MolAtomBond checkpoint (reference ``tests/data/mol_atom_bond/
    example_models/*.pt``): MAB message passing + up to three heads +
    optional constrainers (reference ``chemprop/models/mol_atom_bond.py``)."""
    from chemprop_tpu.models.mol_atom_bond import MolAtomBondMPNN
    from chemprop_tpu.nn.message_passing import mol_atom_bond as mab_mod

    hp = d["hyper_parameters"]
    sd = d["state_dict"]
    mp_hp = hp["message_passing"]
    name = _cls_name(mp_hp["cls"])
    if name not in _MAB_MP_CLASSES:
        raise ValueError(
            f"unsupported MAB message-passing class in checkpoint: {name!r} "
            f"(expected one of {_MAB_MP_CLASSES})"
        )
    mp_cls = getattr(mab_mod, name)
    mp = mp_cls(
        d_h=int(mp_hp.get("d_h", 300)),
        bias=bool(mp_hp.get("bias", False)),
        depth=int(mp_hp.get("depth", 3)),
        dropout=float(_scalar(mp_hp.get("dropout", 0.0))),
        activation=_activation_name(mp_hp.get("activation", "relu")),
        undirected=bool(mp_hp.get("undirected", False)),
        d_vd=(int(mp_hp.get("d_vd") or 0) or None),
        d_ed=(int(mp_hp.get("d_ed") or 0) or None),
        return_vertex_embeddings=bool(mp_hp.get("return_vertex_embeddings", True)),
        return_edge_embeddings=bool(mp_hp.get("return_edge_embeddings", True)),
        V_d_transform=_sd_scale_transform(sd, "message_passing.V_d_transform"),
        E_d_transform=_sd_scale_transform(sd, "message_passing.E_d_transform"),
        graph_transform=_sd_graph_transform(sd),
    )
    if bool(hp.get("batch_norm")) or any(k.startswith("bns.") for k in sd):
        raise ValueError(
            "MAB checkpoints with batch_norm=True are not supported by the "
            "converter yet (no reference example ships one); file an issue "
            "with the checkpoint"
        )
    heads = {
        k: (None if hp.get(k) is None else _convert_predictor(hp[k]))
        for k in ("mol_predictor", "atom_predictor", "bond_predictor")
    }
    model = MolAtomBondMPNN(
        message_passing=mp,
        agg=_convert_agg(hp["agg"]) if heads["mol_predictor"] is not None else None,
        mol_predictor=heads["mol_predictor"],
        atom_predictor=heads["atom_predictor"],
        bond_predictor=heads["bond_predictor"],
        atom_constrainer=_convert_constrainer(hp.get("atom_constrainer")),
        bond_constrainer=_convert_constrainer(hp.get("bond_constrainer")),
        batch_norm=False,
        X_d_transform=_convert_x_d_transform(hp, sd),
    )
    params, batch_stats = convert_state_dict(sd)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return model, variables, d.get("output_columns")


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
