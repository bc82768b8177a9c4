"""MobileFaceNet face-embedding backbone, TPU-native.

Rebuilds the reference's mobilefacenet
(arcface_torch/backbones/mobilefacenet.py, 147 LoC): depthwise-separable
conv blocks with PReLU, inverted residuals, and a global depthwise conv
head → 512-d embedding (scale=2 config is the registry default "mbf").
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]
_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


def _conv_init(key, k, cin, cout, groups=1):
    std = math.sqrt(2.0 / (k * k * cout))
    return jax.random.normal(key, (k, k, cin // groups, cout),
                             jnp.float32) * std


def _init_bn(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def _bn(p, st, x, train):
    if train:
        axes = tuple(range(x.ndim - 1))
        mean, var = jnp.mean(x, axis=axes), jnp.var(x, axis=axes)
        new = {"mean": (1 - _BN_MOMENTUM) * st["mean"] + _BN_MOMENTUM * mean,
               "var": (1 - _BN_MOMENTUM) * st["var"] + _BN_MOMENTUM * var}
    else:
        mean, var = st["mean"], st["var"]
        new = st
    return (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * p["scale"] \
        + p["bias"], new


def _conv(x, w, stride=1, groups=1, pad=None):
    k = w.shape[0]
    pad = k // 2 if pad is None else pad
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def _init_cb(key, k, cin, cout, groups=1, prelu=True):
    p = {"w": _conv_init(key, k, cin, cout, groups)}
    p["bn"], st = _init_bn(cout)
    if prelu:
        p["prelu"] = {"alpha": jnp.full((cout,), 0.25, jnp.float32)}
    return p, {"bn": st}


def _cb(p, st, x, stride=1, groups=1, train=False, pad=None):
    y = _conv(x, p["w"], stride, groups, pad)
    y, new = _bn(p["bn"], st["bn"], y, train)
    if "prelu" in p:
        y = jnp.where(y >= 0, y, p["prelu"]["alpha"] * y)
    return y, {"bn": new}


# (expansion_channels, out_channels, stride) per depthwise block; the
# "mbf" scale-2 config
_BLOCKS = [
    # dw_conv(64,64,g64) stem follower then residual stages
    (128, 64, 2), (128, 64, 1), (128, 64, 1), (128, 64, 1), (128, 64, 1),
    (256, 128, 2), (256, 128, 1), (256, 128, 1), (256, 128, 1),
    (256, 128, 1), (256, 128, 1), (256, 128, 1),
    (512, 128, 2), (256, 128, 1), (256, 128, 1),
]


def init_mobilefacenet(key: jax.Array, embedding_dim: int = 512
                       ) -> tuple[Params, Params]:
    ks = iter(jax.random.split(key, 4 * len(_BLOCKS) + 8))
    p: Params = {}
    st: Params = {}
    p["stem"], st["stem"] = _init_cb(next(ks), 3, 3, 64)
    p["stem_dw"], st["stem_dw"] = _init_cb(next(ks), 3, 64, 64, groups=64)
    cin = 64
    for i, (exp, cout, stride) in enumerate(_BLOCKS):
        bp: Params = {}
        bs: Params = {}
        bp["pw1"], bs["pw1"] = _init_cb(next(ks), 1, cin, exp)
        bp["dw"], bs["dw"] = _init_cb(next(ks), 3, exp, exp, groups=exp)
        bp["pw2"], bs["pw2"] = _init_cb(next(ks), 1, exp, cout,
                                        prelu=False)
        p[f"b{i}"] = bp
        st[f"b{i}"] = bs
        cin = cout
    p["head_pw"], st["head_pw"] = _init_cb(next(ks), 1, cin, 512)
    p["head_gdw"], st["head_gdw"] = _init_cb(next(ks), 7, 512, 512,
                                             groups=512, prelu=False)
    p["fc"] = {"weight": jax.random.normal(
        next(ks), (embedding_dim, 512)) * 0.01,
        "bias": jnp.zeros((embedding_dim,))}
    p["feat_bn"], st["feat_bn"] = _init_bn(embedding_dim)
    return p, st


def mobilefacenet_apply(params: Params, batch_stats: Params, x: jax.Array,
                        *, train: bool = False):
    """x (B, 112, 112, 3) → (B, 512) [, new_batch_stats]."""
    new: Params = {}
    h, new["stem"] = _cb(params["stem"], batch_stats["stem"], x, stride=2,
                         train=train)
    h, new["stem_dw"] = _cb(params["stem_dw"], batch_stats["stem_dw"], h,
                            groups=64, train=train)
    cin = 64
    for i, (exp, cout, stride) in enumerate(_BLOCKS):
        bp, bs = params[f"b{i}"], batch_stats[f"b{i}"]
        nb: Params = {}
        y, nb["pw1"] = _cb(bp["pw1"], bs["pw1"], h, train=train)
        y, nb["dw"] = _cb(bp["dw"], bs["dw"], y, stride=stride,
                          groups=exp, train=train)
        y, nb["pw2"] = _cb(bp["pw2"], bs["pw2"], y, train=train)
        h = h + y if (stride == 1 and cin == cout) else y
        new[f"b{i}"] = nb
        cin = cout
    h, new["head_pw"] = _cb(params["head_pw"], batch_stats["head_pw"], h,
                            train=train)
    h, new["head_gdw"] = _cb(params["head_gdw"], batch_stats["head_gdw"],
                             h, groups=512, train=train, pad=0)
    h = h.reshape(h.shape[0], -1)
    h = h @ params["fc"]["weight"].T + params["fc"]["bias"]
    h, new["feat_bn"] = _bn(params["feat_bn"], batch_stats["feat_bn"], h,
                            train)
    if train:
        return h, new
    return h
