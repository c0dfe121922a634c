"""Learning-rate schedules.

`expon_lr_schedule` reproduces the Plenoxels log-linear decay used for the
Gaussian position parameter in the reference (`gaussian_utils.py:223-256`),
as a jittable optax-style schedule.
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linearly interpolated (exponential) decay with optional sine delay.

    Returns lr_init at step 0 and lr_final at max_steps; 0.0 if both are 0
    (parameter disabled), matching the reference helper semantics.
    """

    disabled = lr_init == 0.0 and lr_final == 0.0

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if disabled:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        lr = delay_rate * log_lerp
        # Negative steps disable the parameter (reference behavior).
        return jnp.where(step < 0, 0.0, lr)

    return schedule
