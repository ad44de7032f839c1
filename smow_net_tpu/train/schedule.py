"""Per-iteration LR schedules matching the reference
(utils/lr_scheduler.py:64-88; stepped per-iteration at train.py:179).

All schedules are pure functions step -> lr (optax-compatible).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

__all__ = ["cosine_schedule", "multistep_schedule", "warmup_wrap", "get_schedule"]


def cosine_schedule(base_lr: float, total_steps: int, eta_min: float = 1e-6) -> Callable:
    """torch CosineAnnealingLR: eta_min + (base-eta_min)(1+cos(pi t/T))/2."""

    def fn(step):
        t = jnp.minimum(step, total_steps).astype(jnp.float32)
        return eta_min + 0.5 * (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t / total_steps))

    return fn


def multistep_schedule(base_lr: float, milestones: Sequence[int], gamma: float) -> Callable:
    ms = jnp.asarray(sorted(milestones), dtype=jnp.int32)

    def fn(step):
        n = jnp.sum(step >= ms)
        return base_lr * gamma ** n.astype(jnp.float32)

    return fn


def warmup_wrap(after: Callable, base_lr: float, multiplier: float, warmup_steps: int) -> Callable:
    """Reference GradualWarmupScheduler semantics (utils/lr_scheduler.py:5-61,
    fixed — the reference class crashes if enabled): linear from
    base/multiplier to base over warmup_steps, then `after(step - warmup)`."""

    def fn(step):
        t = step.astype(jnp.float32) if hasattr(step, "astype") else jnp.float32(step)
        warm = base_lr / multiplier * ((multiplier - 1.0) * t / warmup_steps + 1.0)
        return jnp.where(step <= warmup_steps, warm, after(jnp.maximum(step - warmup_steps, 0)))

    return fn


def get_schedule(
    name: str,
    base_lr: float,
    epochs: int,
    iters_per_epoch: int,
    warmup_epochs: int = -1,
    warmup_multiplier: float = 100.0,
    eta_min: float = 1e-6,
    lr_decay_epochs: Optional[Sequence[int]] = None,
    lr_decay_steps: int = 20,
    lr_decay_rate: float = 0.1,
) -> Callable:
    """Mirror of reference get_scheduler (utils/lr_scheduler.py:64-88)."""
    warmup = max(warmup_epochs, 0)
    if "cosine" in name:
        sched = cosine_schedule(base_lr, (epochs - warmup) * iters_per_epoch, eta_min)
    elif "step" in name:
        if lr_decay_epochs:
            decay = list(lr_decay_epochs)
        else:
            decay = [lr_decay_steps * i for i in range(1, epochs // lr_decay_steps)]
        sched = multistep_schedule(
            base_lr, [(m - warmup) * iters_per_epoch for m in decay], lr_decay_rate
        )
    else:
        raise NotImplementedError(f"scheduler {name} not supported")
    if warmup_epochs > 0:
        sched = warmup_wrap(sched, base_lr, warmup_multiplier, warmup_epochs * iters_per_epoch)
    return sched
