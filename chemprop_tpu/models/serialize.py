"""Checkpoint save/load with hparams-manifest reconstruction.

Same role as the reference's ``.pt`` format (``chemprop/models/utils.py:10-43``
+ the ``hparams['cls']`` reconstruction protocol, ``chemprop/nn/hparams.py``):
a checkpoint is a single file containing

* a JSON manifest describing every submodule (class name + constructor args,
  transforms, criterion), and
* the flax variables (params + batch_stats) in msgpack.

``load_model(path)`` rebuilds the exact model and its weights with no
external state.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import numpy as np
from flax import serialization

from chemprop_tpu.models.model import MPNN
from chemprop_tpu.nn import agg as agg_mod
from chemprop_tpu.nn import metrics as metrics_mod
from chemprop_tpu.nn import predictors as predictors_mod
from chemprop_tpu.nn.ffn import ConstrainerFFN
from chemprop_tpu.nn.message_passing import base as mp_mod
from chemprop_tpu.nn.message_passing import mol_atom_bond as mab_mod
from chemprop_tpu.nn.message_passing.multi import MulticomponentMessagePassing
from chemprop_tpu.nn.transforms import GraphTransform, ScaleTransform, UnscaleTransform

MAGIC = b"CPTPU001"

_MODULE_CLASSES = {
    cls.__name__: cls
    for cls in [
        mp_mod.BondMessagePassing,
        mp_mod.AtomMessagePassing,
        agg_mod.MeanAggregation,
        agg_mod.SumAggregation,
        agg_mod.NormAggregation,
        agg_mod.AttentiveAggregation,
        predictors_mod.RegressionFFN,
        predictors_mod.MveFFN,
        predictors_mod.EvidentialFFN,
        predictors_mod.QuantileFFN,
        predictors_mod.BinaryClassificationFFN,
        predictors_mod.BinaryDirichletFFN,
        predictors_mod.MulticlassClassificationFFN,
        predictors_mod.MulticlassDirichletFFN,
        predictors_mod.SpectralFFN,
        MulticomponentMessagePassing,
        mab_mod.MABBondMessagePassing,
        mab_mod.MABAtomMessagePassing,
        ConstrainerFFN,
    ]
}

_METRIC_CLASSES = {
    cls.__name__: cls
    for cls in set(metrics_mod.LossFunctionRegistry.values())
    | set(metrics_mod.MetricRegistry.values())
}


def _encode_value(v: Any) -> Any:
    if type(v).__name__ in _MODULE_CLASSES:
        return {"__submodule__": module_config(v)}
    if isinstance(v, (list, tuple)) and v and type(v[0]).__name__ in _MODULE_CLASSES:
        return [{"__submodule__": module_config(m)} for m in v]
    if isinstance(v, ScaleTransform):
        kind = "unscale" if isinstance(v, UnscaleTransform) else "scale"
        return {"__transform__": kind, **v.to_dict()}
    if isinstance(v, GraphTransform):
        return {
            "__transform__": "graph",
            "V": _encode_value(v.V_transform),
            "E": _encode_value(v.E_transform),
        }
    if isinstance(v, metrics_mod.ChempropMetric):
        kwargs = {}
        for f in dataclasses.fields(v):
            if not f.init:
                continue
            val = getattr(v, f.name)
            if isinstance(val, (np.ndarray, list, tuple)):
                val = np.asarray(val).tolist()
            kwargs[f.name] = val
        return {"__metric__": type(v).__name__, "kwargs": kwargs}
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (np.integer, np.floating)):
        return v.item()
    if isinstance(v, tuple):
        return list(v)
    if hasattr(v, "dtype") and hasattr(v, "name"):  # jnp dtype objects
        return str(np.dtype(v).name)
    return v


def _decode_value(v: Any) -> Any:
    if isinstance(v, dict) and "__submodule__" in v:
        return module_from_config(v["__submodule__"])
    if isinstance(v, list) and v and isinstance(v[0], dict) and "__submodule__" in v[0]:
        return [module_from_config(m["__submodule__"]) for m in v]
    if isinstance(v, dict) and "__transform__" in v:
        match v["__transform__"]:
            case "scale":
                return ScaleTransform(np.array(v["mean"]), np.array(v["scale"]))
            case "unscale":
                return UnscaleTransform(np.array(v["mean"]), np.array(v["scale"]))
            case "graph":
                return GraphTransform(_decode_value(v["V"]), _decode_value(v["E"]))
    if isinstance(v, dict) and "__metric__" in v:
        return _METRIC_CLASSES[v["__metric__"]](**v["kwargs"])
    return v


def module_config(module) -> dict:
    """Constructor-args manifest for a flax module (dataclass introspection)."""
    cfg: dict[str, Any] = {"cls": type(module).__name__}
    for f in dataclasses.fields(module):
        if f.name in ("name", "parent"):
            continue
        v = getattr(module, f.name)
        if f.name == "compute_dtype":
            cfg[f.name] = str(np.dtype(v).name)
        else:
            cfg[f.name] = _encode_value(v)
    return cfg


def module_from_config(cfg: dict):
    cfg = dict(cfg)
    cls = _MODULE_CLASSES[cfg.pop("cls")]
    kwargs = {k: _decode_value(v) for k, v in cfg.items()}
    if "compute_dtype" in kwargs:
        kwargs["compute_dtype"] = np.dtype(kwargs["compute_dtype"])
    if "hidden_dim" in kwargs and isinstance(kwargs["hidden_dim"], list):
        kwargs["hidden_dim"] = tuple(kwargs["hidden_dim"])
    if "task_weights" in kwargs and isinstance(kwargs["task_weights"], list):
        kwargs["task_weights"] = tuple(kwargs["task_weights"])
    return cls(**kwargs)


def model_config(model) -> dict:
    from chemprop_tpu.models.mol_atom_bond import MolAtomBondMPNN

    if isinstance(model, MolAtomBondMPNN):
        return {
            "format": "chemprop_tpu.mpnn.v1",
            "model_cls": "MolAtomBondMPNN",
            "message_passing": module_config(model.message_passing),
            "agg": None if model.agg is None else module_config(model.agg),
            "mol_predictor": _maybe_config(model.mol_predictor),
            "atom_predictor": _maybe_config(model.atom_predictor),
            "bond_predictor": _maybe_config(model.bond_predictor),
            "atom_constrainer": _maybe_config(model.atom_constrainer),
            "bond_constrainer": _maybe_config(model.bond_constrainer),
            "batch_norm": model.batch_norm,
            "X_d_transform": _encode_value(model.X_d_transform),
        }
    return {
        "format": "chemprop_tpu.mpnn.v1",
        "model_cls": type(model).__name__,
        "message_passing": module_config(model.message_passing),
        "agg": module_config(model.agg),
        "predictor": module_config(model.predictor),
        "batch_norm": model.batch_norm,
        "X_d_transform": _encode_value(model.X_d_transform),
    }


def _maybe_config(m):
    return None if m is None else module_config(m)


def _maybe_from_config(cfg):
    return None if cfg is None else module_from_config(cfg)


def model_from_config(cfg: dict):
    from chemprop_tpu.models.mol_atom_bond import MolAtomBondMPNN
    from chemprop_tpu.models.multi import MulticomponentMPNN

    model_cls = cfg.get("model_cls", "MPNN")
    if model_cls == "MolAtomBondMPNN":
        return MolAtomBondMPNN(
            message_passing=module_from_config(cfg["message_passing"]),
            agg=_maybe_from_config(cfg.get("agg")),
            mol_predictor=_maybe_from_config(cfg.get("mol_predictor")),
            atom_predictor=_maybe_from_config(cfg.get("atom_predictor")),
            bond_predictor=_maybe_from_config(cfg.get("bond_predictor")),
            atom_constrainer=_maybe_from_config(cfg.get("atom_constrainer")),
            bond_constrainer=_maybe_from_config(cfg.get("bond_constrainer")),
            batch_norm=cfg.get("batch_norm", False),
            X_d_transform=_decode_value(cfg.get("X_d_transform")),
        )
    cls = MulticomponentMPNN if model_cls == "MulticomponentMPNN" else MPNN
    return cls(
        message_passing=module_from_config(cfg["message_passing"]),
        agg=module_from_config(cfg["agg"]),
        predictor=module_from_config(cfg["predictor"]),
        batch_norm=cfg.get("batch_norm", False),
        X_d_transform=_decode_value(cfg.get("X_d_transform")),
    )


def save_checkpoint(
    path: str | Path, model: MPNN, variables: dict, extra: dict | None = None
) -> None:
    """Single-file checkpoint: MAGIC | manifest_len | manifest_json | msgpack."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    manifest = {"model": model_config(model), "extra": extra or {}}
    mjson = json.dumps(manifest).encode()
    blob = serialization.to_bytes(variables)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(len(mjson).to_bytes(8, "little"))
        f.write(mjson)
        f.write(blob)


def load_checkpoint(path: str | Path) -> tuple[MPNN, dict, dict]:
    """Returns (model, variables, extra)."""
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not a chemprop_tpu checkpoint")
        mlen = int.from_bytes(f.read(8), "little")
        manifest = json.loads(f.read(mlen).decode())
        blob = f.read()
    model = model_from_config(manifest["model"])
    # build a variables template by shape-free deserialization
    variables = serialization.msgpack_restore(blob)
    return model, variables, manifest.get("extra", {})


def save_model(path: str | Path, model: MPNN, variables: dict, output_columns=None) -> None:
    save_checkpoint(path, model, variables, {"output_columns": output_columns})


def load_model(path: str | Path) -> tuple[MPNN, dict, dict]:
    """Like :func:`load_checkpoint` but keeps only the flax variable
    collections — a full-state resume checkpoint (``last.ckpt``) also carries
    ``opt_state``/``step``/``rng``/``epoch``, which ``model.apply`` rejects."""
    model, variables, extra = load_checkpoint(path)
    variables = {k: v for k, v in variables.items() if k in ("params", "batch_stats")}
    return model, variables, extra
