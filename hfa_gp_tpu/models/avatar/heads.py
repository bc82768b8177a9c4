"""Avatar model heads — the HFA-GP models proper.

Rebuilds reference code/networks/headnerf.py:44-279:
  * RGB-driven   (HeadNeRF_final):  image → Encoder → α → subspace → EG3D
  * 3DMM-driven  (HeadNeRF_3DMM):   coeffs → MLP → α → subspace → EG3D
  * audio-driven (HeadNeRF_Audio):  audio code → MLP → α → subspace → EG3D

Convention hygiene: the reference flips label columns twice (dataset +
in-model, SURVEY.md §2.1) so EG3D sees the raw cameras.json convention.
Here, datasets DO NOT flip; `get_image` applies `flip_yz_label` exactly
once when the label comes from a sampled (OpenGL-convention) camera, and
`label_convention='opencv'` (dataset labels) passes through untouched.
Net behavior matches the reference.

Params layout (one tree per model, checkpoint-parity with the reference's
single "gen" state dict):
    {"encoder"|"weights_mlp": ..., "subspace": {bases, delta},
     "generator": <EG3D params>}
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from ...core import camera as cam
from ..eg3d import generator as eg3d_gen
from ..eg3d.generator import EG3DConfig
from . import audio as audio_mod
from . import encoder as enc
from . import subspace as sub
from .encoder import init_linear_stack, linear_stack_apply

Params = dict[str, Any]


@dataclass(frozen=True)
class AvatarConfig:
    size: int = 256                 # encoder input resolution (train_rgb.py)
    dim: int = 512                  # latent_dim_style
    dim_shape: int = 50             # latent_dim_shape
    use_softmax: bool = False
    out_pose: bool = False
    params_len: int = 76            # 3DMM expression-vector length
    dim_aud: int = 64
    win_size: int = 16
    smo_size: int = 8
    person_2: bool = False          # second-person subspace (headnerf:60-69)
    same_bases: bool = False        # person 2 shares bases, own delta
    eg3d: EG3DConfig = field(default_factory=EG3DConfig)


def without_data_sharding(cfg: AvatarConfig) -> AvatarConfig:
    """Copy of cfg with the renderer's DP shard_map wrapper disabled —
    for eval/sample paths that run replicated small batches (a single
    test frame, the dim_shape basis sweep) which need not divide the
    mesh's data axis."""
    from dataclasses import replace
    if cfg.eg3d.render.data_shard_axis is None:
        return cfg
    render = replace(cfg.eg3d.render, data_shard_axis=None)
    return replace(cfg, eg3d=replace(cfg.eg3d, render=render))


# -- init -------------------------------------------------------------------


def init_avatar_rgb(key: jax.Array, cfg: AvatarConfig,
                    generator_params: Params | None = None,
                    init_bases: jax.Array | None = None,
                    init_bases_2: jax.Array | None = None) -> Params:
    """`person_2`/`same_bases` in cfg add a second subspace
    (headnerf.py:60-69): its bases come from `init_bases_2` (PTI pivots
    via subspace.load_pti_bases when args.init) or random."""
    k_enc, k_sub, k_sub2, k_gen = jax.random.split(key, 4)
    p = {
        "encoder": enc.init_encoder(k_enc, cfg.size, cfg.dim, cfg.dim_shape,
                                    cfg.out_pose),
        "subspace": sub.init_subspace(k_sub, cfg.dim_shape,
                                      cfg.eg3d.num_ws, cfg.dim,
                                      init_bases),
        "generator": generator_params if generator_params is not None
        else eg3d_gen.init_generator(k_gen, cfg.eg3d),
    }
    if cfg.person_2:
        sub2 = sub.init_subspace(k_sub2, cfg.dim_shape, cfg.eg3d.num_ws,
                                 cfg.dim, init_bases_2)
        if cfg.same_bases:
            del sub2["bases"]       # person 2 shares person 1's bases
        p["subspace_2"] = sub2
    return p


def _init_weights_mlp(key, in_dim: int, cfg: AvatarConfig) -> Params:
    """Weights_3DMM (headnerf.py:138-158): 7 EqualLinear layers."""
    return init_linear_stack(key, [in_dim] + [cfg.dim] * 6
                             + [cfg.dim_shape])


def init_avatar_3dmm(key: jax.Array, cfg: AvatarConfig,
                     generator_params: Params | None = None) -> Params:
    k_mlp, k_sub, k_gen = jax.random.split(key, 3)
    return {
        "weights_mlp": _init_weights_mlp(k_mlp, cfg.params_len, cfg),
        "subspace": sub.init_subspace(k_sub, cfg.dim_shape,
                                      cfg.eg3d.num_ws, cfg.dim),
        "generator": generator_params if generator_params is not None
        else eg3d_gen.init_generator(k_gen, cfg.eg3d),
    }


def init_avatar_audio(key: jax.Array, cfg: AvatarConfig,
                      generator_params: Params | None = None) -> Params:
    """The audio model: Weights_3DMM MLP on dim_aud codes
    (headnerf.py:222-238) — AudioNet/AudioAttNet live in the trainer, as in
    the reference (trainer_audio.py:31-34)."""
    k_mlp, k_sub, k_gen = jax.random.split(key, 3)
    return {
        "weights_mlp": _init_weights_mlp(k_mlp, cfg.dim_aud, cfg),
        "subspace": sub.init_subspace(k_sub, cfg.dim_shape,
                                      cfg.eg3d.num_ws, cfg.dim),
        "generator": generator_params if generator_params is not None
        else eg3d_gen.init_generator(k_gen, cfg.eg3d),
    }


# -- shared pieces ------------------------------------------------------------


def get_latent(params: Params, weights: jax.Array,
               cfg: AvatarConfig, person_2: bool = False) -> jax.Array:
    """person_2 selects the second subspace (bases_2 unless same_bases,
    always delta_2) — headnerf.py:81-102."""
    if person_2:
        sp2 = dict(params["subspace_2"])
        if "bases" not in sp2:      # same_bases: share person 1's bases
            sp2["bases"] = params["subspace"]["bases"]
        return sub.get_latent(sp2, weights, cfg.dim)
    return sub.get_latent(params["subspace"], weights, cfg.dim)


def _normalize_label(label: jax.Array, label_convention: str) -> jax.Array:
    """'opencv' (dataset/cameras.json labels): pass through — the
    reference's two flips cancel. 'opengl' (sampled cameras from
    cam_utils): flip once, like the model-side flip at headnerf.py:108."""
    if label_convention == "opencv":
        return label
    if label_convention == "opengl":
        return cam.flip_yz_label(label)
    raise ValueError(label_convention)


def get_image(params: Params, cfg: AvatarConfig, latent: jax.Array,
              label: jax.Array, *, label_convention: str = "opencv",
              noise_mode: str = "const") -> jax.Array:
    """(B, num_ws, 512) W+ → (B, 512, 512, 3) image in [-1, 1].
    Parity: headnerf.py:131-134 (get_image)."""
    c = _normalize_label(label, label_convention)
    out = eg3d_gen.synthesis(params["generator"], cfg.eg3d, latent, c,
                             noise_mode=noise_mode)
    return out["image"]


# -- forwards -----------------------------------------------------------------


def rgb_forward(params: Params, cfg: AvatarConfig, image: jax.Array,
                label: jax.Array, *, person_2: bool = False,
                label_convention: str = "opencv"):
    """HeadNeRF_final.forward (headnerf.py:106-120). image: NHWC [-1,1]."""
    if cfg.out_pose:
        weights, pose = enc.encoder_apply(params["encoder"], image,
                                          use_softmax=cfg.use_softmax)
        latent = get_latent(params, weights, cfg, person_2)
        img = get_image(params, cfg, latent, label,
                        label_convention=label_convention)
        return img, pose
    weights = enc.encoder_apply(params["encoder"], image,
                                use_softmax=cfg.use_softmax)
    latent = get_latent(params, weights, cfg, person_2)
    return get_image(params, cfg, latent, label,
                     label_convention=label_convention)


def rgb_get_weights(params: Params, cfg: AvatarConfig, image: jax.Array):
    return enc.encoder_apply(params["encoder"], image,
                             use_softmax=cfg.use_softmax)


def mlp_get_weights(params: Params, cfg: AvatarConfig,
                    driving: jax.Array) -> jax.Array:
    w = linear_stack_apply(params["weights_mlp"], driving)
    if cfg.use_softmax:
        w = jax.nn.softmax(w, axis=1)
    return w


def t3dmm_forward(params: Params, cfg: AvatarConfig, coeffs: jax.Array,
                  label: jax.Array, *, label_convention: str = "opencv"):
    """HeadNeRF_3DMM.forward (headnerf.py:200-209)."""
    weights = mlp_get_weights(params, cfg, coeffs)
    latent = get_latent(params, weights, cfg)
    return get_image(params, cfg, latent, label,
                     label_convention=label_convention)


def audio_forward(params: Params, cfg: AvatarConfig, aud_code: jax.Array,
                  label: jax.Array, *, label_convention: str = "opencv"):
    """HeadNeRF_Audio.forward (headnerf.py:260-270); aud_code is the
    AudioNet/AudioAttNet output (B, dim_aud)."""
    weights = mlp_get_weights(params, cfg, aud_code)
    latent = get_latent(params, weights, cfg)
    return get_image(params, cfg, latent, label,
                     label_convention=label_convention)
