from chemprop_tpu.utils.registry import ClassRegistry, Factory
from chemprop_tpu.utils.utils import (
    EnumMapping,
    batched,
    create_and_call_object,
    parallel_execute,
    pretty_shape,
)
from chemprop_tpu.chem import make_mol

__all__ = ["ClassRegistry", "EnumMapping", "Factory", "batched", "create_and_call_object", "make_mol", "parallel_execute", "pretty_shape"]
