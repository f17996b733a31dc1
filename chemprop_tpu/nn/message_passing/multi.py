"""Multicomponent message passing: one MP block per input component, or one
shared block (cf. reference ``chemprop/nn/message_passing/multi.py:13-84``)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax

from chemprop_tpu.data.collate import BatchMolGraph


class MulticomponentMessagePassing(nn.Module):
    blocks: Sequence[nn.Module]
    n_components: int
    shared: bool = False

    def __post_init__(self):
        super().__post_init__()
        if len(self.blocks) == 0:
            raise ValueError("arg 'blocks' was empty!")
        if self.shared and len(self.blocks) > 1:
            raise ValueError("only one block may be given when 'shared' is True")
        if not self.shared and len(self.blocks) != self.n_components:
            raise ValueError(
                f"expected {self.n_components} blocks, got {len(self.blocks)}"
            )

    @property
    def output_dim(self) -> int:
        if self.shared:
            return self.blocks[0].output_dim * self.n_components
        return sum(b.output_dim for b in self.blocks)

    def __call__(
        self,
        bmgs: Sequence[BatchMolGraph],
        V_ds: Sequence[jax.Array | None] | None = None,
        is_training: bool = True,
        mc_dropout: bool = False,
    ) -> list[jax.Array]:
        if len(bmgs) != self.n_components:
            raise ValueError(
                f"expected {self.n_components} component graphs, got {len(bmgs)}"
            )
        if V_ds is None:
            V_ds = [None] * len(bmgs)
        if self.shared:
            return [
                self.blocks[0](bmg, V_d, is_training, mc_dropout)
                for bmg, V_d in zip(bmgs, V_ds)
            ]
        return [
            block(bmg, V_d, is_training, mc_dropout)
            for block, bmg, V_d in zip(self.blocks, bmgs, V_ds)
        ]
