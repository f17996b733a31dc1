from chemprop_tpu.parallel import distributed
from chemprop_tpu.parallel.shard_train import (
    is_sharded_batch,
    local_shard,
    make_sharded_apply,
    make_sharded_eval_step,
    make_sharded_train_step,
    unstack_preds,
)
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
    "is_sharded_batch",
    "local_shard",
    "make_mesh",
    "make_sharded_apply",
    "make_sharded_eval_step",
    "make_sharded_train_step",
    "replicate",
    "shard_batch",
    "unstack_preds",
]
