"""Backbone registry — the reference's `get_model` dispatcher
(arcface_torch/backbones/__init__.py:5-85) as a uniform functional
interface.

Every backbone follows one contract:
  init_backbone(key, name, embedding_dim) -> (params, batch_stats)
  backbone_apply(name, params, batch_stats, x, train=..., rng=..., dtype=...)
      -> embeddings                      (train=False)
      -> (embeddings, new_batch_stats)   (train=True)

Reference short names (r18/r50/.../r2060, mbf, mbf_large, vit_*) and the
repo's long names (iresnet50, mobilefacenet) both resolve.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from . import iresnet, mobilefacenet, vit

Params = dict[str, Any]

_ALIASES = {
    "r18": "iresnet18", "r34": "iresnet34", "r50": "iresnet50",
    "r100": "iresnet100", "r200": "iresnet200", "r2060": "iresnet2060",
    "mobilefacenet": "mbf",
}


def canonical_name(name: str) -> str:
    return _ALIASES.get(name, name)


def backbone_names() -> list[str]:
    return (sorted(iresnet.IRESNET_LAYERS) + sorted(mobilefacenet.MBF_CONFIGS)
            + sorted(vit.VIT_CONFIGS))


def init_backbone(key: jax.Array, name: str, embedding_dim: int = 512
                  ) -> tuple[Params, Params]:
    name = canonical_name(name)
    if name in iresnet.IRESNET_LAYERS:
        return iresnet.init_iresnet(key, name, embedding_dim)
    if name in mobilefacenet.MBF_CONFIGS:
        return mobilefacenet.init_mobilefacenet(key, embedding_dim, name)
    if name in vit.VIT_CONFIGS:
        return vit.init_vit(key, name, embedding_dim)
    raise ValueError(
        f"unknown backbone {name!r}; available: {backbone_names()}")


def backbone_apply(name: str, params: Params, batch_stats: Params,
                   x: jax.Array, *, train: bool = False,
                   rng: jax.Array | None = None, dtype=jnp.float32):
    name = canonical_name(name)
    if name in iresnet.IRESNET_LAYERS:
        return iresnet.iresnet_apply(params, batch_stats, x, name,
                                     train=train, dtype=dtype)
    if name in mobilefacenet.MBF_CONFIGS:
        return mobilefacenet.mobilefacenet_apply(params, batch_stats, x,
                                                 name=name, train=train,
                                                 dtype=dtype)
    if name in vit.VIT_CONFIGS:
        if train and rng is None:
            rng = jax.random.PRNGKey(0)
        return vit.vit_apply(params, x, name, dtype=dtype,
                             batch_stats=batch_stats, train=train, rng=rng)
    raise ValueError(
        f"unknown backbone {name!r}; available: {backbone_names()}")
