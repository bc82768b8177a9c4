"""TriPlaneGenerator — the TPU-native equivalent of the EG3D pickle.

Public surface mirrors what the reference uses (headnerf.py:112):

    out = synthesis(params, cfg, ws, c)      # ws (B,14,512), c (B,25)
    out["image"]       (B, 512, 512, 3)  in [-1, 1]   (NHWC!)
    out["image_raw"]   (B, 128, 128, 3)
    out["image_depth"] (B, 128, 128, 1)

plus the mapping network (z, c → ws) for completeness. `c` is a 25-dim
label in the raw cameras.json (OpenCV) convention — i.e. the label AFTER
the reference's in-model flip; see core/camera.flip_yz_label.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from ...core import camera as cam
from . import networks as nets
from . import renderer as rnd

Params = dict[str, Any]


@dataclass(frozen=True)
class EG3DConfig:
    mapping: nets.MappingConfig = field(default_factory=nets.MappingConfig)
    backbone: nets.BackboneConfig = field(
        default_factory=nets.BackboneConfig)
    sr: nets.SRConfig = field(default_factory=nets.SRConfig)
    render: rnd.RenderConfig = field(default_factory=rnd.RenderConfig)
    compute_dtype: Any = jnp.float32

    @property
    def num_ws(self) -> int:
        return self.backbone.num_ws

    @property
    def plane_channels(self) -> int:
        return self.backbone.img_channels // 3


def init_generator(key: jax.Array, cfg: EG3DConfig) -> Params:
    k_map, k_bb, k_dec, k_sr = jax.random.split(key, 4)
    return {
        "mapping": nets.init_mapping(k_map, cfg.mapping, cfg.num_ws),
        "backbone": nets.init_backbone(k_bb, cfg.backbone),
        "decoder": rnd.init_decoder(k_dec, cfg.render, cfg.plane_channels),
        "superresolution": nets.init_superresolution(k_sr, cfg.sr),
    }


def mapping(params: Params, cfg: EG3DConfig, z: jax.Array,
            c: jax.Array | None, truncation_psi: float = 1.0) -> jax.Array:
    return nets.mapping_apply(params["mapping"], cfg.mapping, cfg.num_ws,
                              z, c, truncation_psi)


def synthesis(params: Params, cfg: EG3DConfig, ws: jax.Array, c: jax.Array,
              *, noise_mode: str = "const",
              rng: jax.Array | None = None,
              render_rng: jax.Array | None = None,
              neural_rendering_resolution: int | None = None
              ) -> dict[str, jax.Array]:
    """ws (B, 14, 512) W+ latents; c (B, 25) OpenCV-convention label.

    `rng` feeds 'random' noise_mode; `render_rng` feeds the stratified /
    importance depth perturbation (None → deterministic — the TPU analog
    of the reference's noise_mode='const' inference path).
    """
    b = ws.shape[0]
    res = neural_rendering_resolution or \
        cfg.render.neural_rendering_resolution

    cam2world, intrinsics = cam.unpack_label(c)
    ray_origins, ray_directions = cam.generate_rays(cam2world, intrinsics,
                                                    res)

    planes = nets.backbone_apply(params["backbone"], cfg.backbone, ws,
                                 noise_mode=noise_mode, rng=rng,
                                 compute_dtype=cfg.compute_dtype)
    h = w = cfg.backbone.img_resolution
    planes = planes.reshape(b, h, w, 3, cfg.plane_channels)
    planes = jnp.transpose(planes, (0, 3, 1, 2, 4))    # (B, 3, H, W, C)

    feature_samples, depth_samples, _ = rnd.render_rays(
        params["decoder"], cfg.render, planes, ray_origins, ray_directions,
        rng=render_rng)

    feature_image = feature_samples.reshape(b, res, res, -1)
    depth_image = depth_samples.reshape(b, res, res, 1)
    rgb_image = feature_image[..., :3]

    sr_image = nets.superresolution_apply(
        params["superresolution"], cfg.sr, rgb_image, feature_image, ws,
        noise_mode="none" if noise_mode == "const" else noise_mode,
        rng=rng, compute_dtype=cfg.compute_dtype)

    return {"image": sr_image, "image_raw": rgb_image,
            "image_depth": depth_image}


def generate(params: Params, cfg: EG3DConfig, z: jax.Array, c: jax.Array,
             truncation_psi: float = 1.0, **kw) -> dict[str, jax.Array]:
    """Full z→image path (TriPlaneGenerator.forward equivalent)."""
    ws = mapping(params, cfg, z, c, truncation_psi)
    return synthesis(params, cfg, ws, c, **kw)
