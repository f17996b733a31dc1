"""Deployment export: serialize a trained model's forward pass to StableHLO
via ``jax.export`` with symbolic node/edge dims.

The reference ships deployment serialization through ``torch.export`` with
dynamic shapes (``tests/integration/test_export.py:14-49``,
``tests/unit/nn/test_message_passing.py:44``). The TPU-native equivalent is a
shape-polymorphic StableHLO artifact: node count ``n`` and edge count ``e``
are symbolic, so one exported program serves every padded batch shape, and it
runs under any JAX runtime (TPU/CPU) without the Python model code.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from chemprop_tpu.data.collate import BatchMolGraph

# jax.export serialization needs to encode the pytree structure, including
# BatchMolGraph's static auxdata (n_graphs, edges_sorted)
try:
    import json

    jax.export.register_pytree_node_serialization(
        BatchMolGraph,
        serialized_name="chemprop_tpu.BatchMolGraph",
        serialize_auxdata=lambda aux: json.dumps(list(aux)).encode(),
        deserialize_auxdata=lambda data: tuple(json.loads(data.decode())),
    )
except ValueError:  # already registered (repeated import paths)
    pass


@contextmanager
def _no_pallas():
    """Pallas kernels require concrete tile-aligned shapes; the exported
    program must stay shape-polymorphic, so force the XLA scatter path."""
    prev = os.environ.get("CHEMPROP_TPU_PALLAS")
    os.environ["CHEMPROP_TPU_PALLAS"] = "0"
    try:
        yield
    finally:
        if prev is None:
            del os.environ["CHEMPROP_TPU_PALLAS"]
        else:
            os.environ["CHEMPROP_TPU_PALLAS"] = prev


def _symbolic_bmg(bmg: BatchMolGraph, scope) -> BatchMolGraph:
    """ShapeDtypeStructs for a BatchMolGraph with symbolic node/edge counts."""
    (n,) = jax.export.symbolic_shape("n", scope=scope)
    (e,) = jax.export.symbolic_shape("e", scope=scope)

    def sds(shape, like):
        return jax.ShapeDtypeStruct(shape, jnp.asarray(like).dtype)

    return BatchMolGraph(
        V=sds((n, bmg.V.shape[1]), bmg.V),
        E=sds((e, bmg.E.shape[1]), bmg.E),
        src=sds((e,), bmg.src),
        dst=sds((e,), bmg.dst),
        rev=sds((e,), bmg.rev),
        batch=sds((n,), bmg.batch),
        node_mask=sds((n,), bmg.node_mask),
        edge_mask=sds((e,), bmg.edge_mask),
        n_graphs=bmg.n_graphs,
        edges_sorted=bmg.edges_sorted,
        # the exported program is shape-polymorphic: the Pallas fast paths
        # (which need concrete tile-aligned shapes) are disabled, so the
        # fused-kernel eligibility metadata is pinned in the signature
        fused_ok=False,
        fused_window=2,
        readout_ok=False,
        edge_band=128,
        agg_expand_ok=False,
    )


class _NormalizingExported:
    """Wraps :class:`jax.export.Exported` so callers can pass any
    :class:`BatchMolGraph`: static metadata that does not affect the
    exported (Pallas-free) program — ``fused_ok`` — is normalized to the
    traced value before the structure check."""

    def __init__(self, exported):
        self.exported = exported

    def call(self, variables, bmg, V_d=None, X_d=None):
        bmg = bmg.replace(fused_ok=False, fused_window=2, readout_ok=False, edge_band=128, agg_expand_ok=False)
        return self.exported.call(variables, bmg, V_d, X_d)

    __call__ = call

    def serialize(self) -> bytes:
        return self.exported.serialize()

    def __getattr__(self, name):
        return getattr(self.exported, name)


def export_forward(
    model,
    variables: dict,
    example_batch,
    dynamic: bool = True,
    platforms: tuple[str, ...] | None = None,
):
    """Export ``model``'s inference forward to a :class:`jax.export.Exported`.

    ``dynamic=True`` makes node/edge counts symbolic (any padded batch with
    the same graph count and feature dims can be fed); the graph count stays
    static because segment reductions size their output with it.
    """
    bmg = example_batch.bmg.replace(fused_ok=False, fused_window=2, readout_ok=False, edge_band=128, agg_expand_ok=False)
    V_d, X_d = example_batch.V_d, example_batch.X_d

    def forward(variables, bmg, V_d, X_d):
        return model.apply(variables, bmg, V_d, X_d, is_training=False)

    with _no_pallas():
        if dynamic:
            scope = jax.export.SymbolicScope()
            abs_bmg = _symbolic_bmg(bmg, scope)
            (n,) = jax.export.symbolic_shape("n", scope=scope)
            abs_Vd = (
                None
                if V_d is None
                else jax.ShapeDtypeStruct((n, V_d.shape[1]), jnp.asarray(V_d).dtype)
            )
        else:
            abs_bmg = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype), bmg
            )
            abs_Vd = (
                None
                if V_d is None
                else jax.ShapeDtypeStruct(np.shape(V_d), jnp.asarray(V_d).dtype)
            )
        abs_Xd = (
            None
            if X_d is None
            else jax.ShapeDtypeStruct(np.shape(X_d), jnp.asarray(X_d).dtype)
        )
        abs_vars = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype), variables
        )
        kwargs = {} if platforms is None else {"platforms": list(platforms)}
        return _NormalizingExported(
            jax.export.export(jax.jit(forward), **kwargs)(abs_vars, abs_bmg, abs_Vd, abs_Xd)
        )


def save_exported(path: str | Path, exported) -> None:
    Path(path).write_bytes(exported.serialize())


def load_exported(path: str | Path):
    """Deserialize a StableHLO artifact; returns a callable
    ``(variables, bmg, V_d, X_d) -> preds`` backed by the compiled program —
    no model class or featurizer config needed at serving time."""
    exported = jax.export.deserialize(Path(path).read_bytes())
    return _NormalizingExported(exported).call
