"""RGB-driven training (reference code/trainer_rgb.py + train_rgb.py).

Loss = L2 + LPIPS on the 512→size avg-pooled render (trainer_rgb.py:84-91).
Data parallelism: the jitted step runs over a (data, model) mesh with the
batch sharded on 'data' — XLA inserts the gradient psum that the
reference's RGB path silently lacks (SURVEY.md §2.1: the `.module` bypass
skips DDP's allreduce).
"""

from __future__ import annotations

from functools import partial
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
            real_image: jax.Array, label: jax.Array, *,
            label_convention: str = "opencv"):
    """real_image: (B, size, size, 3) in [-1,1]; label: (B, 25)."""
    weights = heads.rgb_get_weights(params, cfg, real_image)
    if cfg.out_pose:
        weights, _pose = weights
    latent = heads.get_latent(params, weights, cfg)
    generated = heads.get_image(params, cfg, latent, label,
                                label_convention=label_convention)
    generated = ops.avg_pool_to(generated, cfg.size)
    l2 = jnp.mean(jnp.square(real_image - generated))
    lp = jnp.mean(lpips_mod.lpips_distance(lpips_params, real_image,
                                           generated))
    return l2 + lp, {"l2_loss": l2, "lpips_loss": lp,
                     "generated": generated}


def make_train_step(cfg: heads.AvatarConfig, tx: optax.GradientTransformation,
                    tune_iter: int, *, label_convention: str = "opencv",
                    donate: bool = True):
    """Returns jitted (state, lpips_params, real_image, label) → (state,
    metrics)."""

    def step_fn(state: TrainState, lpips_params: Params,
                real_image: jax.Array, label: jax.Array):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, lpips_params, cfg, real_image, label,
            label_convention=label_convention)
        grads = apply_generator_freeze(grads, state.step, tune_iter)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        metrics = {"loss": loss, "l2_loss": aux["l2_loss"],
                   "lpips_loss": aux["lpips_loss"]}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: heads.AvatarConfig, *,
                   label_convention: str = "opencv"):
    """trainer.sample equivalent (trainer_rgb.py:100-106)."""
    cfg = heads.without_data_sharding(cfg)  # single replicated frame

    @jax.jit
    def sample(params: Params, real_image: jax.Array, label: jax.Array):
        return heads.rgb_forward(params, cfg, real_image, label,
                                 label_convention=label_convention)

    return sample


def sample_bases(params: Params, cfg: heads.AvatarConfig,
                 weight_value: float = 10.0):
    """Render every basis direction with a weight spike (trainer_rgb.py:
    108-127) — returns (dim_shape, H, W, 3). Batched over the basis axis
    in ONE synthesis call instead of the reference's python loop."""
    from ..core import camera as cam
    cfg = heads.without_data_sharding(cfg)  # replicated basis sweep
    label = cam.sample_camera_label(None, n=1, mode=None)
    n = cfg.dim_shape
    weights = jnp.eye(n) * weight_value
    latents = heads.get_latent(params, weights, cfg)
    labels = jnp.tile(label, (n, 1))
    return heads.get_image(params, cfg, latents, labels,
                           label_convention="opengl")
