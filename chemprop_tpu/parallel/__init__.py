from chemprop_tpu.parallel import distributed
from chemprop_tpu.parallel.sharding import (
    DATA_AXIS,
    batch_shardings,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_shardings",
    "distributed",
    "make_mesh",
    "replicate",
    "shard_batch",
]
