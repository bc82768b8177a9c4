"""3DMM-coefficient-driven training (reference code/trainer_3dmm.py).

Identical loss shape to the RGB trainer (the reference keeps a zero-valued
`l2_loss_3dmm` slot, trainer_3dmm.py:53 — reproduced in the metrics for
log parity)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..core import ops
from ..models import lpips as lpips_mod
from ..models.avatar import heads
from .state import TrainState, apply_generator_freeze

Params = dict[str, Any]


def loss_fn(params: Params, lpips_params: Params, cfg: heads.AvatarConfig,
            real_image: jax.Array, label: jax.Array, coeffs: jax.Array, *,
            label_convention: str = "opencv"):
    generated = heads.t3dmm_forward(params, cfg, coeffs, label,
                                    label_convention=label_convention)
    generated = ops.avg_pool_to(generated, cfg.size)
    l2 = jnp.mean(jnp.square(real_image - generated))
    lp = jnp.mean(lpips_mod.lpips_distance(lpips_params, real_image,
                                           generated))
    return l2 + lp, {"l2_loss": l2, "lpips_loss": lp,
                     "generated": generated}


def make_train_step(cfg: heads.AvatarConfig,
                    tx: optax.GradientTransformation, tune_iter: int, *,
                    label_convention: str = "opencv", donate: bool = True):

    def step_fn(state: TrainState, lpips_params: Params,
                real_image: jax.Array, label: jax.Array,
                coeffs: jax.Array):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, lpips_params, cfg, real_image, label, coeffs,
            label_convention=label_convention)
        grads = apply_generator_freeze(grads, state.step, tune_iter)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        metrics = {"loss": loss,
                   "l2_loss_3dmm": jnp.zeros(()),   # parity slot
                   "l2_loss": aux["l2_loss"],
                   "lpips_loss": aux["lpips_loss"]}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
