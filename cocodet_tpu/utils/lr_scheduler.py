"""LR schedules as pure functions of the global iteration.

Parity target: ref yolox/utils/lr_scheduler.py:9-168 — cos, warmcos,
yoloxwarmcos (quadratic warmup lr*(t/T)^2, cosine decay to min_lr_ratio*lr,
flat floor during the no-aug tail, :113-131), yoloxsemiwarmcos, multistep.

These return plain python callables iter -> lr, usable both as optax
schedules (traced: all ops are jnp-safe) and host-side for logging.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Sequence

import jax.numpy as jnp


def cos_lr(lr: float, total_iters: int, iters: jnp.ndarray):
    return lr * 0.5 * (1.0 + jnp.cos(math.pi * iters / total_iters))


def warm_cos_lr(lr: float, total_iters: int, warmup_iters: int,
                warmup_lr_start: float, iters: jnp.ndarray):
    warm = warmup_lr_start + (lr - warmup_lr_start) * iters / max(warmup_iters, 1)
    cos = lr * 0.5 * (
        1.0 + jnp.cos(math.pi * (iters - warmup_iters)
                      / max(total_iters - warmup_iters, 1)))
    return jnp.where(iters < warmup_iters, warm, cos)


def yolox_warm_cos_lr(lr: float, min_lr_ratio: float, total_iters: int,
                      warmup_iters: int, warmup_lr_start: float,
                      no_aug_iters: int, iters: jnp.ndarray,
                      semi_ratio: float = 1.0):
    """Quadratic warmup -> cosine -> flat min during no-aug tail
    (ref lr_scheduler.py:113-131)."""
    min_lr = lr * min_lr_ratio
    warm = (lr - warmup_lr_start) * jnp.square(
        iters / max(warmup_iters, 1)) + warmup_lr_start
    span = max(total_iters - warmup_iters - no_aug_iters, 1)
    cos = min_lr + 0.5 * (lr - min_lr) * (
        1.0 + jnp.cos(math.pi * (iters - warmup_iters) / span))
    out = jnp.where(iters < warmup_iters, warm,
                    jnp.where(iters >= total_iters - no_aug_iters, min_lr, cos))
    return out


def multistep_lr(lr: float, milestones: Sequence[int], gamma: float,
                 iters: jnp.ndarray):
    k = sum((jnp.asarray(iters) >= m).astype(jnp.float32) for m in milestones)
    return lr * jnp.power(gamma, k)


def build_lr_schedule(
    name: str,
    lr: float,
    iters_per_epoch: int,
    total_epochs: int,
    warmup_epochs: int = 5,
    warmup_lr_start: float = 0.0,
    no_aug_epochs: int = 15,
    min_lr_ratio: float = 0.05,
    milestones: Sequence[int] = (),
    gamma: float = 0.1,
    semi_epoch: int = 0,
) -> Callable:
    """Schedule factory keyed like ref LRScheduler.__init__ (:9-60)."""
    total_iters = iters_per_epoch * total_epochs
    warmup_iters = iters_per_epoch * warmup_epochs
    no_aug_iters = iters_per_epoch * no_aug_epochs

    if name == "cos":
        return partial(cos_lr, lr, total_iters)
    if name == "warmcos":
        return partial(warm_cos_lr, lr, total_iters, warmup_iters,
                       warmup_lr_start)
    if name in ("yoloxwarmcos", "yoloxsemiwarmcos"):
        return partial(yolox_warm_cos_lr, lr, min_lr_ratio, total_iters,
                       warmup_iters, warmup_lr_start, no_aug_iters)
    if name == "multistep":
        ms = [int(m * iters_per_epoch) for m in milestones]
        return partial(multistep_lr, lr, ms, gamma)
    raise ValueError(f"unknown scheduler {name!r}")
