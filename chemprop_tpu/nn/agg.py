"""Node->graph aggregation (readout) over padded batches (cf. reference
``chemprop/nn/agg.py:19-133``).

Padding nodes carry graph id ``n_graphs`` (one extra sacrificial segment), so
every reduction runs over ``n_graphs + 1`` segments and drops the last row —
no masking inside the reduction. Mean counts therefore exclude padding
automatically.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from chemprop_tpu.data.collate import BatchMolGraph
from chemprop_tpu.ops.segment import segment_softmax_weights, segment_sum
from chemprop_tpu.utils.registry import ClassRegistry

AggregationRegistry = ClassRegistry()


class Aggregation(nn.Module):
    # True when each output column depends only on the same input column —
    # such readouts may consume lane-aligned (zero-tail) node tables and be
    # sliced at graph level (see MPNN.fingerprint). Attention-style readouts
    # that mix columns must leave this False. Deliberately NOT a dataclass
    # field (no annotation): it is a capability of the class, not a config.
    columnwise = False

    def __call__(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        raise NotImplementedError


@AggregationRegistry.register("sum")
class SumAggregation(Aggregation):
    columnwise = True

    @nn.compact
    def __call__(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        return segment_sum(H, bmg.batch, bmg.n_graphs + 1, sorted=True)[: bmg.n_graphs]


@AggregationRegistry.register("mean")
class MeanAggregation(Aggregation):
    columnwise = True

    @nn.compact
    def __call__(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        from chemprop_tpu.ops.sorted_segments import sorted_segment_sum_counts

        # counts ride the same kernel pass as the totals (one-hot row sums,
        # no extra HBM traffic) instead of a separate segment-sum of ones;
        # the bwd cotangent expansion takes the Pallas window gather when
        # collate stamped containment
        expand_w = 2 if getattr(bmg, "agg_expand_ok", False) else 0
        totals, counts = sorted_segment_sum_counts(
            H, bmg.batch, bmg.n_graphs + 1, jnp.float32, expand_w
        )
        totals = totals[: bmg.n_graphs]
        counts = counts[: bmg.n_graphs]
        return totals / jnp.maximum(counts[:, None].astype(totals.dtype), 1.0)


@AggregationRegistry.register("norm")
class NormAggregation(Aggregation):
    columnwise = True
    norm: float = 100.0

    @nn.compact
    def __call__(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        return segment_sum(H, bmg.batch, bmg.n_graphs + 1, sorted=True)[: bmg.n_graphs] / self.norm


@AggregationRegistry.register("attentive")
class AttentiveAggregation(Aggregation):
    output_size: int = 300

    @nn.compact
    def __call__(self, H: jax.Array, bmg: BatchMolGraph) -> jax.Array:
        logits = nn.Dense(1, name="W")(H)
        alphas = segment_softmax_weights(logits, bmg.batch, bmg.n_graphs + 1)
        return segment_sum(alphas * H, bmg.batch, bmg.n_graphs + 1, sorted=True)[: bmg.n_graphs]
