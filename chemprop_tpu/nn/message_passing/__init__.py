from chemprop_tpu.nn.message_passing.base import (
    AtomMessagePassing,
    BondMessagePassing,
    _MessagePassingBase,
)

__all__ = ["AtomMessagePassing", "BondMessagePassing", "_MessagePassingBase"]
