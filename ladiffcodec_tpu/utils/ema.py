"""EMA parameter shadowing with inverse-decay warmup.

Functional counterpart of reference srcs/utils.py:182-347 (lucidrains-style
EMA; constructed there but never wired in — train.py:361 sets ema=None; here
it is a first-class trainer option).  Pure pytree state: jit/shard_map safe.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EMAState:
    params: tp.Any
    step: jnp.ndarray  # int32
    initted: jnp.ndarray  # bool

    @classmethod
    def create(cls, params) -> "EMAState":
        return cls(
            params=jax.tree_util.tree_map(jnp.asarray, params),
            step=jnp.asarray(0, jnp.int32),
            initted=jnp.asarray(False),
        )


def ema_decay_schedule(
    step: jnp.ndarray,
    beta: float = 0.9999,
    update_after_step: int = 100,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> jnp.ndarray:
    """current decay = clamp(1 - (1 + epoch/inv_gamma)^-power, min_value, beta)
    with epoch = step - update_after_step - 1 (reference utils.py:276-292)."""
    epoch = jnp.clip(step - update_after_step - 1, 0, None).astype(jnp.float32)
    value = 1.0 - (1.0 + epoch / inv_gamma) ** -power
    value = jnp.clip(value, min_value, beta)
    return jnp.where(epoch <= 0, 0.0, value)


def ema_update(
    state: EMAState,
    params,
    beta: float = 0.9999,
    update_after_step: int = 100,
    update_every: int = 10,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> EMAState:
    """One EMA tick (call once per optimizer step; the `update_every`
    subsampling and the pre-warmup hard copy are folded in branch-free)."""
    step = state.step + 1
    do_update = (step % update_every) == 0
    past_warmup = step > update_after_step
    decay = ema_decay_schedule(step, beta, update_after_step, inv_gamma, power, min_value)
    # before warmup: hard copy (decay 0); after: ema. Skipped ticks keep old.
    eff = jnp.where(past_warmup, decay, 0.0)
    eff = jnp.where(do_update, eff, 1.0)

    new_params = jax.tree_util.tree_map(
        lambda e, p: e * eff + p.astype(e.dtype) * (1.0 - eff), state.params, params
    )
    return EMAState(params=new_params, step=step, initted=jnp.asarray(True))
