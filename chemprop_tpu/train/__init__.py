from chemprop_tpu.train.schedulers import build_noam_like_schedule
from chemprop_tpu.train.trainer import Trainer, TrainState

__all__ = ["Trainer", "TrainState", "build_noam_like_schedule"]
