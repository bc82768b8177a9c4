"""Deep3DFaceRecon inference net: ResNet-50 → 257 BFM coefficients.

Rebuilds reference eg3d-pose-detection/models/networks.py:69-104
(ReconNetWrapper): torchvision-style ResNet-50 trunk (bottleneck blocks,
final avg-pool kept as 1x1 feature map) + seven zero-initialized conv1x1
heads emitting [id 80 | exp 64 | tex 80 | angle 3 | gamma 27 | tx,ty 2 |
tz 1] = 257 coefficients. Weights convert from the epoch-20 checkpoint
via tools/convert_facerecon.py.

Input: (B, 224, 224, 3) float in [0, 1] (the Deep3DFaceRecon convention —
images are fed un-normalized beyond /255).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

_BN_EPS = 1e-5
_LAYERS = (3, 4, 6, 3)             # resnet50
_WIDTHS = (64, 128, 256, 512)
HEAD_DIMS = (80, 64, 80, 3, 27, 2, 1)


def _conv_init(key, k, cin, cout):
    std = math.sqrt(2.0 / (k * k * cout))
    return jax.random.normal(key, (k, k, cin, cout), jnp.float32) * std


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _bn(p, x):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + _BN_EPS) \
        * p["scale"] + p["bias"]


def _conv(x, w, stride=1, pad=None):
    k = w.shape[0]
    pad = k // 2 if pad is None else pad
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _init_bottleneck(key, cin, width, stride, downsample):
    ks = jax.random.split(key, 4)
    cout = width * 4
    p = {"conv1": _conv_init(ks[0], 1, cin, width), "bn1": _bn_init(width),
         "conv2": _conv_init(ks[1], 3, width, width),
         "bn2": _bn_init(width),
         "conv3": _conv_init(ks[2], 1, width, cout),
         "bn3": _bn_init(cout)}
    if downsample:
        p["down_conv"] = _conv_init(ks[3], 1, cin, cout)
        p["down_bn"] = _bn_init(cout)
    return p


def _bottleneck(p, x, stride):
    out = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"])))
    out = jax.nn.relu(_bn(p["bn2"], _conv(out, p["conv2"], stride)))
    out = _bn(p["bn3"], _conv(out, p["conv3"]))
    if "down_conv" in p:
        idn = _bn(p["down_bn"], _conv(x, p["down_conv"], stride))
    else:
        idn = x
    return jax.nn.relu(out + idn)


def init_facerecon(key: jax.Array) -> Params:
    n = 2 + sum(_LAYERS) + len(HEAD_DIMS)
    ks = iter(jax.random.split(key, n))
    p: Params = {"stem_conv": _conv_init(next(ks), 7, 3, 64),
                 "stem_bn": _bn_init(64)}
    cin = 64
    for stage, (blocks, width) in enumerate(zip(_LAYERS, _WIDTHS)):
        for i in range(blocks):
            stride = 1 if (stage == 0 or i > 0) else 2
            down = i == 0
            p[f"s{stage}_b{i}"] = _init_bottleneck(next(ks), cin, width,
                                                   stride, down)
            cin = width * 4
    # zero-initialized coefficient heads (networks.py:92-95)
    for i, d in enumerate(HEAD_DIMS):
        next(ks)
        p[f"head{i}"] = {"weight": jnp.zeros((1, 1, 2048, d)),
                         "bias": jnp.zeros((d,))}
    return p


def facerecon_apply(params: Params, x: jax.Array) -> jax.Array:
    """(B, 224, 224, 3) in [0,1] → (B, 257) coefficients."""
    h = _conv(x, params["stem_conv"], stride=2, pad=3)
    h = jax.nn.relu(_bn(params["stem_bn"], h))
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1),
                                             (0, 0)))
    for stage, blocks in enumerate(_LAYERS):
        for i in range(blocks):
            stride = 1 if (stage == 0 or i > 0) else 2
            h = _bottleneck(params[f"s{stage}_b{i}"], h, stride)
    h = jnp.mean(h, axis=(1, 2), keepdims=True)        # (B,1,1,2048)
    outs = []
    for i in range(len(HEAD_DIMS)):
        q = params[f"head{i}"]
        outs.append(_conv(h, q["weight"], pad=0) + q["bias"])
    return jnp.concatenate(outs, axis=-1)[:, 0, 0, :]
