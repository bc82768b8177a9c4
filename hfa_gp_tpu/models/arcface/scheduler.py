"""PolyScheduler — poly(2) decay with linear warmup.

Rebuilds arcface_torch/lr_scheduler.py:4-30 as an optax schedule:
  warmup:  lr * step / warmup_steps        (linear)
  decay:   lr * (1 - (step-warmup)/(total-warmup)) ** 2
"""

from __future__ import annotations

import optax


def poly_scheduler(base_lr: float, total_steps: int, warmup_steps: int,
                   power: float = 2.0) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(warmup_steps, 1)
        frac = 1.0 - (step - warmup_steps) / max(
            total_steps - warmup_steps, 1)
        decay = base_lr * jnp.clip(frac, 0.0, 1.0) ** power
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule
