"""Learning-rate schedule (layer L3d) as a pure function of the step.

The reference mutates optimizer param groups per batch through a
``CyclicLR`` object (scheduler.py:16-161, train.py:203,251). On TPU the
schedule must live *inside* the jitted train step, so it is a pure
``step -> lr`` function handed to optax. All three published policies
(triangular, triangular2, exp_range) are supported.
"""
from __future__ import annotations

import jax.numpy as jnp


def cyclic_lr(step, base_lr: float, max_lr: float, step_size: int,
              mode: str = "triangular", gamma: float = 1.0):
    """Triangular cyclic learning rate.

    lr(step) follows a triangle wave between base_lr and max_lr with half-
    cycle ``step_size``. Matches ``CyclicLR.get_lr`` (reference
    scheduler.py:147-161) exactly for a scalar param group:

        cycle = floor(1 + step / (2 * step_size))
        x     = |step/step_size - 2*cycle + 1|
        lr    = base_lr + (max_lr - base_lr) * max(0, 1 - x) * scale
    """
    step = jnp.asarray(step, dtype=jnp.float32)
    step_size_f = float(step_size)
    cycle = jnp.floor(1.0 + step / (2.0 * step_size_f))
    x = jnp.abs(step / step_size_f - 2.0 * cycle + 1.0)
    base_height = (max_lr - base_lr) * jnp.maximum(0.0, 1.0 - x)
    if mode == "triangular":
        scale = 1.0
    elif mode == "triangular2":
        scale = 1.0 / (2.0 ** (cycle - 1.0))
    elif mode == "exp_range":
        scale = gamma ** step
    else:
        raise ValueError(f"unknown cyclic mode {mode!r}")
    return base_lr + base_height * scale


def make_cyclic_schedule(base_lr: float, max_lr: float, step_size: int,
                         mode: str = "triangular", gamma: float = 1.0):
    """optax-compatible ``schedule_fn(count) -> lr``."""
    def schedule(count):
        return cyclic_lr(count, base_lr, max_lr, step_size, mode, gamma)
    return schedule
