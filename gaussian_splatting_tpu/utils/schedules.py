"""Learning-rate schedules (reference ``get_expon_lr_func``,
utils/general_utils.py:29-62 — the Plenoxels/JaxNeRF log-lerp decay with an
optional delayed cosine ramp)."""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(
    step,
    *,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    return delay_rate * log_lerp
