"""LR schedule: linear warmup then polynomial decay.

Reference behavior (misc/utils.py:35-43): during warmup, lr ramps linearly
from warmup_lr to lr; afterwards lr * (1 - frac)^lr_pow where frac is the
progress through the post-warmup iterations.
"""

import jax.numpy as jnp


def warmup_poly_schedule(lr, max_iters, warmup_lr=1e-6, warmup_iters=0,
                         lr_pow=0.9):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr + (lr - warmup_lr) * step / jnp.maximum(warmup_iters, 1)
        frac = (step - warmup_iters) / jnp.maximum(max_iters - warmup_iters, 1)
        poly = lr * jnp.maximum(1.0 - frac, 0.0) ** lr_pow
        return jnp.where(step < warmup_iters, warm, poly)
    return schedule
