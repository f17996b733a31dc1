from chemprop_tpu.utils.registry import ClassRegistry, Factory
from chemprop_tpu.utils.utils import EnumMapping, batched, parallel_execute

__all__ = ["ClassRegistry", "EnumMapping", "Factory", "batched", "parallel_execute"]
