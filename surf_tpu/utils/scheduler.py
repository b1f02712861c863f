"""LR schedules (functional re-design of utils/scheduler.py): linear warmup
0.1 -> 1 over ``warmup`` epochs, then cosine to ``alpha``.  Returned callables
map a (possibly fractional) epoch to an LR *multiplier*, exactly like the
reference's LambdaLR lambda."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def warmup_cosine(total_steps, warmup=0.2, alpha=0.1):
    def scale(step):
        step = jnp.asarray(step, jnp.float32)
        warm = 0.1 + 0.9 * step / warmup
        cos = (jnp.cos(np.pi * (step - warmup) / (total_steps - warmup)) + 1.0) \
            * 0.5 * (1 - alpha) + alpha
        return jnp.where(step < warmup, warm, cos)
    return scale
