"""MobileFaceNet face-embedding backbones ("mbf", "mbf_large"), TPU-native.

Rebuilds the reference's mobilefacenet
(arcface_torch/backbones/mobilefacenet.py, 147 LoC): ConvBlock stem at
64·scale channels, DepthWise inverted-residual stages (pw-expand → dw 3×3
→ pw-linear, expansion channels are the reference's literal `groups`
arguments 128/256/512), a 1×1 conv_sep to 512, and the GDC head (global
7×7 depthwise LinearBlock → flatten → bias-free Linear → BN1d).

Registry parity (backbones/__init__.py:23-31): "mbf" = blocks (1,4,6,2)
scale 2, "mbf_large" = blocks (2,8,12,4) scale 4.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]
_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1

MBF_CONFIGS = {
    # name: (blocks, scale) — mobilefacenet.py:143-147
    "mbf": ((1, 4, 6, 2), 2),
    "mbf_large": ((2, 8, 12, 4), 4),
}


def _conv_init(key, k, cin, cout, groups=1):
    std = math.sqrt(2.0 / (k * k * cout))
    return jax.random.normal(key, (k, k, cin // groups, cout),
                             jnp.float32) * std


def _init_bn(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def _bn(p, st, x, train):
    # fp32 stats/affine island, output back in the activation dtype so
    # the convs stay on the bf16 MXU path (torch-AMP semantics)
    xf = x.astype(jnp.float32)
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        # one-pass E[x²]−E[x]² (independent sibling reductions fuse;
        # jnp.var's centered pass re-reads the activation) — iresnet._bn
        var = jnp.maximum(jnp.mean(xf * xf, axis=axes) - mean * mean,
                          0.0)
        new = {"mean": (1 - _BN_MOMENTUM) * st["mean"] + _BN_MOMENTUM * mean,
               "var": (1 - _BN_MOMENTUM) * st["var"] + _BN_MOMENTUM * var}
    else:
        mean, var = st["mean"], st["var"]
        new = st
    y = (xf - mean) * jax.lax.rsqrt(var + _BN_EPS) * p["scale"] + p["bias"]
    return y.astype(x.dtype), new


def _conv(x, w, stride=1, groups=1, pad=None):
    k = w.shape[0]
    pad = k // 2 if pad is None else pad
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def _init_cb(key, k, cin, cout, groups=1, prelu=True):
    """ConvBlock (prelu=True) / LinearBlock (prelu=False)."""
    p = {"w": _conv_init(key, k, cin, cout, groups)}
    p["bn"], st = _init_bn(cout)
    if prelu:
        p["prelu"] = {"alpha": jnp.full((cout,), 0.25, jnp.float32)}
    return p, {"bn": st}


def _cb(p, st, x, stride=1, groups=1, train=False, pad=None):
    y = _conv(x, p["w"].astype(x.dtype), stride, groups, pad)
    y, new = _bn(p["bn"], st["bn"], y, train)
    if "prelu" in p:
        y = jnp.where(y >= 0, y, p["prelu"]["alpha"].astype(y.dtype) * y)
    return y, {"bn": new}


def _arch(blocks, scale):
    """DepthWise descriptors (cin, cout, expansion, stride, residual)
    mirroring MobileFaceNet.__init__ (mobilefacenet.py:89-115). The
    blocks[0]==1 stem follower is a plain grouped ConvBlock handled
    separately in init/apply."""
    c1, c2 = 64 * scale, 128 * scale
    arch = []
    if blocks[0] > 1:
        arch += [(c1, c1, 128, 1, True)] * blocks[0]
    arch += [(c1, c1, 128, 2, False)]
    arch += [(c1, c1, 128, 1, True)] * blocks[1]
    arch += [(c1, c2, 256, 2, False)]
    arch += [(c2, c2, 256, 1, True)] * blocks[2]
    arch += [(c2, c2, 512, 2, False)]
    arch += [(c2, c2, 256, 1, True)] * blocks[3]
    return arch


def init_mobilefacenet(key: jax.Array, embedding_dim: int = 512,
                       name: str = "mbf") -> tuple[Params, Params]:
    blocks, scale = MBF_CONFIGS[name]
    arch = _arch(blocks, scale)
    c1 = 64 * scale
    ks = iter(jax.random.split(key, 3 * len(arch) + 8))
    p: Params = {}
    st: Params = {}
    p["stem"], st["stem"] = _init_cb(next(ks), 3, 3, c1)
    if blocks[0] == 1:
        # ConvBlock(64s, 64s, 3x3, groups=64) — groups literal 64
        p["stem_dw"], st["stem_dw"] = _init_cb(next(ks), 3, c1, c1,
                                               groups=64)
    for i, (cin, cout, exp, _, _) in enumerate(arch):
        bp: Params = {}
        bs: Params = {}
        bp["pw1"], bs["pw1"] = _init_cb(next(ks), 1, cin, exp)
        bp["dw"], bs["dw"] = _init_cb(next(ks), 3, exp, exp, groups=exp)
        bp["pw2"], bs["pw2"] = _init_cb(next(ks), 1, exp, cout, prelu=False)
        p[f"b{i}"] = bp
        st[f"b{i}"] = bs
    c_last = arch[-1][1]
    p["head_pw"], st["head_pw"] = _init_cb(next(ks), 1, c_last, 512)
    p["head_gdw"], st["head_gdw"] = _init_cb(next(ks), 7, 512, 512,
                                             groups=512, prelu=False)
    # GDC Linear is bias-free in the reference (mobilefacenet.py:81)
    p["fc"] = {"weight": jax.random.normal(
        next(ks), (embedding_dim, 512)) * 0.01}
    p["feat_bn"], st["feat_bn"] = _init_bn(embedding_dim)
    return p, st


def mobilefacenet_apply(params: Params, batch_stats: Params, x: jax.Array,
                        *, name: str = "mbf", train: bool = False,
                        dtype=jnp.float32):
    """x (B, 112, 112, 3) → (B, embedding_dim) [, new_batch_stats]."""
    blocks, scale = MBF_CONFIGS[name]
    arch = _arch(blocks, scale)
    x = x.astype(dtype)
    new: Params = {}
    h, new["stem"] = _cb(params["stem"], batch_stats["stem"], x, stride=2,
                         train=train)
    if blocks[0] == 1:
        h, new["stem_dw"] = _cb(params["stem_dw"], batch_stats["stem_dw"],
                                h, groups=64, train=train)
    for i, (cin, cout, exp, stride, residual) in enumerate(arch):
        bp, bs = params[f"b{i}"], batch_stats[f"b{i}"]
        nb: Params = {}
        y, nb["pw1"] = _cb(bp["pw1"], bs["pw1"], h, train=train)
        y, nb["dw"] = _cb(bp["dw"], bs["dw"], y, stride=stride,
                          groups=exp, train=train)
        y, nb["pw2"] = _cb(bp["pw2"], bs["pw2"], y, train=train)
        h = h + y if residual else y
        new[f"b{i}"] = nb
    h, new["head_pw"] = _cb(params["head_pw"], batch_stats["head_pw"], h,
                            train=train)
    h, new["head_gdw"] = _cb(params["head_gdw"], batch_stats["head_gdw"],
                             h, groups=512, train=train, pad=0)
    h = h.reshape(h.shape[0], -1)
    h = h @ params["fc"]["weight"].astype(h.dtype).T
    h, new["feat_bn"] = _bn(params["feat_bn"], batch_stats["feat_bn"], h,
                            train)
    h = h.astype(jnp.float32)
    if train:
        return h, new
    return h
