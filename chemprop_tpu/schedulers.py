"""LR schedulers (cf. reference ``chemprop/schedulers.py:5-65``): top-level
re-export of the Noam-like warmup/decay schedule built on optax."""

from chemprop_tpu.train.schedulers import build_noam_like_schedule

# reference-compatible name
build_NoamLike_LRSched = build_noam_like_schedule

__all__ = ["build_NoamLike_LRSched", "build_noam_like_schedule"]
