"""The MPNN model: message passing -> aggregation -> [batchnorm] -> predictor.

Composition matches the reference invariant exactly
(``chemprop/models/model.py:24-146``):
``MPNN(G) = predictor(agg(message_passing(G)))``, with optional extra
descriptors ``X_d`` concatenated to the aggregated fingerprint.

Unlike the reference (a LightningModule holding optimizer/scheduler state),
this is a pure flax module; training state lives in
:mod:`chemprop_tpu.train.trainer`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from chemprop_tpu.data.collate import BatchMolGraph
from chemprop_tpu.nn.agg import Aggregation
from chemprop_tpu.nn.batchnorm import MaskedBatchNorm
from chemprop_tpu.nn.metrics import ChempropMetric
from chemprop_tpu.nn.predictors import _FFNPredictorBase
from chemprop_tpu.nn.transforms import ScaleTransform


class MPNN(nn.Module):
    message_passing: nn.Module
    agg: Aggregation
    predictor: _FFNPredictorBase
    batch_norm: bool = False
    X_d_transform: ScaleTransform | None = None
    # mesh axis for cross-chip batch-statistic sync under shard_map training
    # (set by the Trainer in sharded mode; no effect on params or inference)
    bn_axis: str | None = None

    def setup(self):
        if self.batch_norm:
            self.bn = MaskedBatchNorm(axis_name=self.bn_axis)

    @property
    def criterion(self) -> ChempropMetric:
        return self.predictor.get_criterion()

    @property
    def n_tasks(self) -> int:
        return self.predictor.n_tasks

    @property
    def n_targets(self) -> int:
        return self.predictor.n_targets

    def fingerprint(
        self,
        bmg: BatchMolGraph,
        V_d: jax.Array | None = None,
        X_d: jax.Array | None = None,
        is_training: bool = True,
        mc_dropout: bool = False,
    ) -> jax.Array:
        # columnwise readouts are width-agnostic per column, so the MP block
        # may keep its lane-aligned (zero-tail) node width through the
        # readout — the graph-level slice below is ~30x cheaper than slicing
        # or re-padding the node table (see docs/performance.md)
        keep_padded = getattr(self.agg, "columnwise", False)
        # out_dtype=None: the node table stays in the MP compute dtype (one
        # bf16 write instead of bf16+f32); the f32 cast happens on the much
        # smaller graph table below, bitwise-identical because every readout
        # accumulates in f32
        H_v = self.message_passing(
            bmg, V_d, is_training, mc_dropout, keep_padded=keep_padded, out_dtype=None
        )
        H = self.agg(H_v, bmg).astype(jnp.float32)
        if H.shape[1] != self.message_passing.output_dim:
            H = H[:, : self.message_passing.output_dim]
        if self.batch_norm:
            # graph_mask: real graphs have at least one node
            graph_counts = jnp.zeros(bmg.n_graphs + 1).at[bmg.batch].add(1.0)[: bmg.n_graphs]
            H = self.bn(H, mask=graph_counts > 0, is_training=is_training)
        if X_d is None:
            return H
        if self.X_d_transform is not None:
            X_d = self.X_d_transform(X_d, is_training)
        return jnp.concatenate([H, X_d], axis=1)

    def encoding(
        self,
        bmg: BatchMolGraph,
        V_d: jax.Array | None = None,
        X_d: jax.Array | None = None,
        i: int = -1,
        is_training: bool = False,
    ) -> jax.Array:
        return self.predictor.encode(self.fingerprint(bmg, V_d, X_d, is_training), i, is_training)

    def __call__(
        self,
        bmg: BatchMolGraph,
        V_d: jax.Array | None = None,
        X_d: jax.Array | None = None,
        is_training: bool = False,
    ) -> jax.Array:
        """Inference-space predictions."""
        return self.predictor(self.fingerprint(bmg, V_d, X_d, is_training), is_training)

    def mc_dropout_preds(
        self,
        bmg: BatchMolGraph,
        V_d: jax.Array | None = None,
        X_d: jax.Array | None = None,
    ) -> jax.Array:
        """Inference-space predictions with dropout layers active (one
        Monte-Carlo sample; cf. reference MC-dropout estimator,
        ``uncertainty/estimator.py:491-636``). Batchnorm and all eval-only
        scalers behave exactly as in :meth:`__call__`."""
        Z = self.fingerprint(bmg, V_d, X_d, is_training=False, mc_dropout=True)
        return self.predictor.mc_step(Z)

    def train_step_preds(
        self,
        bmg: BatchMolGraph,
        V_d: jax.Array | None = None,
        X_d: jax.Array | None = None,
        is_training: bool = True,
    ) -> jax.Array:
        """Criterion-space predictions (e.g. logits)."""
        Z = self.fingerprint(bmg, V_d, X_d, is_training)
        return self.predictor.train_step(Z, is_training)

    def val_step_preds(
        self,
        bmg: BatchMolGraph,
        V_d: jax.Array | None = None,
        X_d: jax.Array | None = None,
        is_training: bool = False,
    ) -> jax.Array:
        """Validation-metric predictions: inference activations without output
        unscaling (reference ``_evaluate_batch``, ``models/model.py:185-200``)."""
        return self.predictor.val_step(self.fingerprint(bmg, V_d, X_d, is_training=False))
