"""Functional training state + the generator freeze/unfreeze schedule.

Replaces the reference's imperative `requires_grad` surgery
(trainer_rgb.py:58-71: generator frozen at construction, `tune_generator`
unfreezes after `tune_iter` — PTI-style fine-tuning): here the generator's
gradients are multiplied by [step >= tune_iter] inside the jitted step, so
the schedule is part of the compiled program, not python-side state.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

Params = dict[str, Any]


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array           # int32 scalar


def make_optimizer(lr: float = 3e-4) -> optax.GradientTransformation:
    """Adam(lr, betas=(0.9, 0.999)) — reference trainer_rgb.py:58."""
    return optax.adam(lr, b1=0.9, b2=0.999)


def init_state(params: Params, tx: optax.GradientTransformation
               ) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def apply_generator_freeze(grads: Params, step: jax.Array,
                           tune_iter: int) -> Params:
    """Zero the EG3D generator grads while step < tune_iter.

    Note: unlike torch Adam (which skips grad-None params entirely), the
    zeroed grads still decay Adam's moments; when unfrozen the moments
    start near zero — the same effective warm start."""
    gate = (step >= tune_iter).astype(jnp.float32)
    gen = jax.tree_util.tree_map(lambda g: g * gate, grads["generator"])
    return {**grads, "generator": gen}
