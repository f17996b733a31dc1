"""Noam-like LR schedule (cf. reference ``chemprop/schedulers.py:5-65``):
linear warmup ``init_lr -> max_lr`` over ``warmup_steps``, exponential decay
``max_lr -> final_lr`` over ``cooldown_steps``, then constant ``final_lr``.
Implemented as an optax-compatible ``step -> lr`` schedule."""

from __future__ import annotations

import jax.numpy as jnp


def build_noam_like_schedule(
    warmup_steps: int,
    cooldown_steps: int,
    init_lr: float,
    max_lr: float,
    final_lr: float,
):
    warmup_steps = max(1, int(warmup_steps))
    cooldown_steps = max(1, int(cooldown_steps))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + step * (max_lr - init_lr) / warmup_steps
        gamma = (step - warmup_steps) / cooldown_steps
        cool = max_lr * jnp.power(final_lr / max_lr, gamma)
        lr = jnp.where(
            step < warmup_steps,
            warm,
            jnp.where(step < warmup_steps + cooldown_steps, cool, final_lr),
        )
        return lr

    return schedule


def noam_lr_host(
    step: int,
    warmup_steps: int,
    cooldown_steps: int,
    init_lr: float,
    max_lr: float,
    final_lr: float,
) -> float:
    """Pure-host twin of :func:`build_noam_like_schedule` — same numbers, no
    device work (the trainer logs LR every epoch; an eager jnp evaluation
    would cost a device round trip per epoch on remote-TPU links)."""
    warmup_steps = max(1, int(warmup_steps))
    cooldown_steps = max(1, int(cooldown_steps))
    if step < warmup_steps:
        return init_lr + step * (max_lr - init_lr) / warmup_steps
    if step < warmup_steps + cooldown_steps:
        gamma = (step - warmup_steps) / cooldown_steps
        return max_lr * (final_lr / max_lr) ** gamma
    return final_lr
