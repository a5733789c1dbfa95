"""Learning-rate schedules.

The exponential log-lerp schedule with optional delayed warm start, matching
get_expon_lr_func (utils/general_utils.py:29-62, from Plenoxels).
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    max_steps: int,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
):
    """Log-linear interpolation from lr_init to lr_final over max_steps."""
    step = jnp.asarray(step, jnp.float32)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    # lr 0 when the schedule is disabled or the step is out of range, as in
    # the reference (returns 0.0 for step < 0 or lr_init == 0).
    out = delay_rate * log_lerp
    return jnp.where((step >= 0) & (lr_init != 0.0), out, 0.0)
