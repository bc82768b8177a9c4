"""LPIPS perceptual loss (AlexNet backbone + linear heads), TPU-native.

The reference uses the `lpips` pip package with net='alex'
(code/trainer_rgb.py:10,62). This is the same architecture in JAX:
AlexNet feature taps (relu1..relu5), per-channel unit normalization,
squared differences, non-negative 1x1 linear heads, spatial + layer sum.

Pretrained weights: `tools/convert_lpips.py` converts the torch `lpips`
checkpoint when available; randomly initialized weights keep the training
loop functional (a fixed random deep feature metric is still a valid
perceptual surrogate) and the unit tests meaningful.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

# torchvision AlexNet.features layout: (out_ch, kernel, stride, pad)
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# max-pool (k=3, s=2) after taps 1 and 2 (and 5, irrelevant for LPIPS)
_POOL_AFTER = {0, 1}

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def init_lpips(key: jax.Array) -> Params:
    p: Params = {}
    in_ch = 3
    keys = jax.random.split(key, 2 * len(_ALEX_CONVS))
    for i, (out_ch, k, s, pad) in enumerate(_ALEX_CONVS):
        bound = 1.0 / math.sqrt(in_ch * k * k)
        p[f"conv{i}"] = {
            "weight": jax.random.uniform(keys[2 * i], (k, k, in_ch, out_ch),
                                         jnp.float32, -bound, bound),
            "bias": jnp.zeros((out_ch,), jnp.float32),
        }
        # linear head: non-negative 1x1 weights (lpips convention)
        p[f"lin{i}"] = {"weight": jax.random.uniform(
            keys[2 * i + 1], (out_ch,), jnp.float32, 0.0, 2.0 / out_ch)}
        in_ch = out_ch
    return p


def _max_pool_3_2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _alex_features(p: Params, x: jax.Array) -> list[jax.Array]:
    feats = []
    for i, (out_ch, k, s, pad) in enumerate(_ALEX_CONVS):
        x = jax.lax.conv_general_dilated(
            x, p[f"conv{i}"]["weight"], window_strides=(s, s),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + p[f"conv{i}"]["bias"])
        feats.append(x)
        if i in _POOL_AFTER:
            x = _max_pool_3_2(x)
    return feats


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params: Params, img0: jax.Array,
                   img1: jax.Array) -> jax.Array:
    """img0/img1: (B, H, W, 3) in [-1, 1] NHWC → (B,) perceptual distance.

    Parity with the lpips package's forward: scaling layer → AlexNet taps
    → channel-unit-normalize → squared diff → 1x1 lin head → spatial mean
    → sum over layers."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    x0 = (img0 - shift) / scale
    x1 = (img1 - shift) / scale
    f0 = _alex_features(params, x0)
    f1 = _alex_features(params, x1)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
        w = jax.nn.relu(params[f"lin{i}"]["weight"])    # non-negative
        val = jnp.sum(d * w, axis=-1)                   # (B, H, W)
        total = total + jnp.mean(val, axis=(1, 2))
    return total
