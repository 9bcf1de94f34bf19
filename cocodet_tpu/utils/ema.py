"""Exponential moving average of model variables — pure pytree transform.

Parity target: ref yolox/utils/ema.py:22-58 (ModelEMA): fp32 shadow copy,
decay ramp d(t) = decay * (1 - exp(-t/2000)), updates both params AND
buffers (BN running stats).

Here the EMA state is just a pytree inside the jitted train step — no module
copies, no host sync.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    shadow: Any            # fp32 pytree: {"params": ..., "batch_stats": ...}
    updates: jnp.ndarray   # int32 step counter


def ema_init(variables: Any) -> EMAState:
    # explicit copy: astype(f32) on an f32 array is a no-op that would alias
    # the shadow with the live params and break buffer donation in the
    # jitted train step
    shadow = jax.tree_util.tree_map(
        lambda x: jnp.array(x, dtype=jnp.float32, copy=True), variables)
    return EMAState(shadow=shadow, updates=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, variables: Any,
               decay: float = 0.9998) -> EMAState:
    """One EMA step with the reference's warmup ramp (ema.py:48-58)."""
    updates = state.updates + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))
    shadow = jax.tree_util.tree_map(
        lambda s, v: s * d + v.astype(jnp.float32) * (1.0 - d),
        state.shadow, variables)
    return EMAState(shadow=shadow, updates=updates)
