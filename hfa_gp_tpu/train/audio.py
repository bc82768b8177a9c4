"""Audio-driven training (reference code/trainer_audio.py).

Two phases (trainer_audio.py:57-113):
  * step <  nosmo_iters: AudioNet on the single 16×29 DeepSpeech window.
  * step >= nosmo_iters: AudioNet over the smo_size(=8)-frame window +
    AudioAttNet attention smoothing (attention optimizer only steps in
    this phase — reproduced here by gating its grads).

The reference's three Adam optimizers (w_optim / optimizer_Aud /
optimizer_AudAtt, same lr) become an optax.multi_transform of three Adams
keyed by top-level subtree — elementwise-identical, AND each keeps its own
bias-correction count, so resetting the AudAtt leg at the phase switch
(reset_audattnet_opt) reproduces the reference's fresh optimizer exactly
(its optimizer_AudAtt never steps before trainer_audio.py:110-111).

Window extraction (the data-dependent auds[i-4:i+4] zero-padded slice) is
host-side in data/dataset.py — static shapes in the jitted step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..core import ops
from ..models import lpips as lpips_mod
from ..models.avatar import audio as aud
from ..models.avatar import heads
from .state import TrainState, apply_generator_freeze

Params = dict[str, Any]


def make_audio_optimizer(lr: float = 3e-4) -> optax.GradientTransformation:
    """Three Adams (model / audnet / audattnet) with independent
    bias-correction counts — the reference's w_optim / optimizer_Aud /
    optimizer_AudAtt (trainer_audio.py:50-55)."""
    from .state import make_optimizer
    transforms = {k: make_optimizer(lr)
                  for k in ("model", "audnet", "audattnet")}
    return optax.multi_transform(
        transforms,
        lambda tree: {k: jax.tree_util.tree_map(lambda _: k, v)
                      for k, v in tree.items()})


def reset_audattnet_opt(opt_state, tx: optax.GradientTransformation,
                        params: Params):
    """Fresh AudAtt optimizer state at the nosmo→smooth phase switch:
    the reference's optimizer_AudAtt takes its first-ever step there,
    so its Adam count/moments start at zero (trainer_audio.py:108-111)."""
    fresh = tx.init(params)
    inner = dict(opt_state.inner_states)
    inner["audattnet"] = fresh.inner_states["audattnet"]
    return opt_state._replace(inner_states=inner)


def init_audio_params(key: jax.Array, cfg: heads.AvatarConfig,
                      generator_params: Params | None = None) -> Params:
    k_m, k_a, k_att = jax.random.split(key, 3)
    return {
        "model": heads.init_avatar_audio(k_m, cfg, generator_params),
        "audnet": aud.init_audio_net(k_a, cfg.dim_aud, cfg.win_size),
        "audattnet": aud.init_audio_att_net(k_att, seq_len=cfg.smo_size),
    }


def _encode_audio(params: Params, cfg: heads.AvatarConfig,
                  aud_window: jax.Array, smooth: bool) -> jax.Array:
    """aud_window: (B, smo_size, 16, 29) when smooth else (B, 16, 29)."""
    if not smooth:
        return aud.audio_net_apply(params["audnet"], aud_window,
                                   cfg.win_size)
    b, smo, w, c = aud_window.shape
    codes = aud.audio_net_apply(params["audnet"],
                                aud_window.reshape(b * smo, w, c),
                                cfg.win_size)
    codes = codes.reshape(b, smo, -1)
    smoothed = jax.vmap(
        lambda x: aud.audio_att_net_apply(params["audattnet"], x,
                                          seq_len=cfg.smo_size))(codes)
    return smoothed


def loss_fn(params: Params, lpips_params: Params, cfg: heads.AvatarConfig,
            real_image: jax.Array, label: jax.Array,
            aud_window: jax.Array, smooth: bool, *,
            label_convention: str = "opencv"):
    code = _encode_audio(params, cfg, aud_window, smooth)
    generated = heads.audio_forward(params["model"], cfg, code, label,
                                    label_convention=label_convention)
    generated = ops.avg_pool_to(generated, cfg.size)
    l2 = jnp.mean(jnp.square(real_image - generated))
    lp = jnp.mean(lpips_mod.lpips_distance(lpips_params, real_image,
                                           generated))
    return l2 + lp, {"l2_loss": l2, "lpips_loss": lp,
                     "generated": generated}


def make_train_step(cfg: heads.AvatarConfig,
                    tx: optax.GradientTransformation, tune_iter: int,
                    smooth: bool, *, label_convention: str = "opencv",
                    donate: bool = True):
    """One jitted step per phase (smooth False/True), mirroring the
    reference's branch at trainer_audio.py:67-95."""

    def step_fn(state: TrainState, lpips_params: Params,
                real_image: jax.Array, label: jax.Array,
                aud_window: jax.Array):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, lpips_params, cfg, real_image, label, aud_window,
            smooth, label_convention=label_convention)
        grads["model"] = apply_generator_freeze(grads["model"], state.step,
                                                tune_iter)
        # pre-smoothing, optimizer_AudAtt must not step
        # (trainer_audio.py:110-111) — automatic here: the non-smooth
        # loss never reads params['audattnet'], so its grads are
        # already exactly zero and its Adam moments only decay
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        metrics = {"loss": loss, "l2_loss_3dmm": jnp.zeros(()),
                   "l2_loss": aux["l2_loss"],
                   "lpips_loss": aux["lpips_loss"]}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
