"""iresnet{18,34,50,100,200} face-embedding backbones, TPU-native.

Rebuilds the reference's arcface backbones
(eg3d-pose-detection/models/arcface_torch/backbones/iresnet.py, registry
at backbones/__init__.py:5-85): BN-first basic blocks with PReLU, a
stride-1 3x3 stem on 112² inputs, and a BN→dropout→FC→BN1d embedding
head (512-d).

Functional form: params pytree + `batch_stats` pytree (BN running
moments). `iresnet_apply(..., train=True)` returns (embeddings,
new_batch_stats); inference uses the stored moments. NHWC / HWIO.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

IRESNET_LAYERS = {
    "iresnet18": (2, 2, 2, 2),
    "iresnet34": (3, 4, 6, 3),
    "iresnet50": (3, 4, 14, 3),
    "iresnet100": (3, 13, 30, 5),
    "iresnet200": (6, 26, 60, 6),
    # backbones/iresnet2060.py:176 — [3, 128, 1024-128, 3]; the reference
    # wraps it in checkpoint_sequential, here deep stages run under a
    # remat'd lax.scan (see _SCAN_THRESHOLD).
    "iresnet2060": (3, 128, 896, 3),
}

# Stages with more than this many identical blocks are executed as a
# remat'd lax.scan over stacked per-block params — one compiled block
# body instead of an unrolled chain (XLA trace/compile time stays O(1)
# in depth, and remat gives the checkpoint_sequential memory profile).
_SCAN_THRESHOLD = 16
_CHANNELS = (64, 128, 256, 512)
_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1   # torch convention: new = (1-m)*old + m*batch


def _conv_init(key, k, cin, cout):
    # kaiming normal (fan_out) like torch resnet init
    std = math.sqrt(2.0 / (k * k * cout))
    return jax.random.normal(key, (k, k, cin, cout), jnp.float32) * std


def _init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _init_bn_stats(c):
    return {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _bn(p, stats, x, train: bool):
    # stats/affine math in fp32 (torch-AMP semantics: BN is an fp32
    # island), output back in the activation dtype so the surrounding
    # convs stay on the bf16 MXU path — the fp32 affine used to promote
    # every block to fp32 convs (≈4× MXU cost on a v5e)
    xf = x.astype(jnp.float32)
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        # E[x²]−E[x]² instead of jnp.var: the centered form's second
        # reduction DEPENDS on the first's result, forcing a second
        # read pass over the activation; these two are independent →
        # XLA multi-output-fuses them into one pass. fp32 accumulation
        # keeps the cancellation benign at BN-activation scales.
        var = jnp.maximum(jnp.mean(xf * xf, axis=axes) - mean * mean,
                          0.0)
        new_stats = {
            "mean": (1 - _BN_MOMENTUM) * stats["mean"] + _BN_MOMENTUM * mean,
            "var": (1 - _BN_MOMENTUM) * stats["var"] + _BN_MOMENTUM * var,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    y = (xf - mean) * jax.lax.rsqrt(var + _BN_EPS)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_stats


def _prelu(p, x):
    return jnp.where(x >= 0, x, p["alpha"].astype(x.dtype) * x)


def _conv(x, w, stride=1):
    pad = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _init_block(key, cin, cout, stride):
    ks = jax.random.split(key, 3)
    p = {
        "bn1": _init_bn(cin),
        "conv1": _conv_init(ks[0], 3, cin, cout),
        "bn2": _init_bn(cout),
        "prelu": {"alpha": jnp.full((cout,), 0.25, jnp.float32)},
        "conv2": _conv_init(ks[1], 3, cout, cout),
        "bn3": _init_bn(cout),
    }
    st = {"bn1": _init_bn_stats(cin), "bn2": _init_bn_stats(cout),
          "bn3": _init_bn_stats(cout)}
    if stride != 1 or cin != cout:
        p["down_conv"] = _conv_init(ks[2], 1, cin, cout)
        p["down_bn"] = _init_bn(cout)
        st["down_bn"] = _init_bn_stats(cout)
    return p, st


def _block(p, st, x, stride, train):
    dt = x.dtype
    out, s1 = _bn(p["bn1"], st["bn1"], x, train)
    out = _conv(out, p["conv1"].astype(dt))
    out, s2 = _bn(p["bn2"], st["bn2"], out, train)
    out = _prelu(p["prelu"], out)
    out = _conv(out, p["conv2"].astype(dt), stride)
    out, s3 = _bn(p["bn3"], st["bn3"], out, train)
    new_st = {"bn1": s1, "bn2": s2, "bn3": s3}
    if "down_conv" in p:
        idn = _conv(x, p["down_conv"].astype(dt), stride)
        idn, sd = _bn(p["down_bn"], st["down_bn"], idn, train)
        new_st["down_bn"] = sd
    else:
        idn = x
    return out + idn, new_st


def init_iresnet(key: jax.Array, name: str = "iresnet50",
                 embedding_dim: int = 512, input_size: int = 112
                 ) -> tuple[Params, Params]:
    layers = IRESNET_LAYERS[name]
    n_keys = 3 + sum(layers)
    ks = iter(jax.random.split(key, n_keys + 2))
    p: Params = {"stem_conv": _conv_init(next(ks), 3, 3, 64),
                 "stem_bn": _init_bn(64),
                 "stem_prelu": {"alpha": jnp.full((64,), 0.25, jnp.float32)}}
    st: Params = {"stem_bn": _init_bn_stats(64)}
    cin = 64
    for stage, (n, cout) in enumerate(zip(layers, _CHANNELS)):
        for i in range(n):
            stride = 2 if i == 0 else 1
            bp, bs = _init_block(next(ks), cin, cout, stride)
            p[f"s{stage}_b{i}"] = bp
            st[f"s{stage}_b{i}"] = bs
            cin = cout
    feat = input_size // 16
    p["bn2"] = _init_bn(512)
    st["bn2"] = _init_bn_stats(512)
    fc_in = 512 * feat * feat
    p["fc"] = {"weight": jax.random.normal(next(ks),
                                           (embedding_dim, fc_in)) * 0.01,
               "bias": jnp.zeros((embedding_dim,))}
    # 'features' BN1d (affine weight frozen to const 1.0 in the reference)
    p["features_bn"] = _init_bn(embedding_dim)
    st["features_bn"] = _init_bn_stats(embedding_dim)
    return p, st


def iresnet_apply(params: Params, batch_stats: Params, x: jax.Array,
                  name: str = "iresnet50", *, train: bool = False,
                  dtype=jnp.float32):
    """x: (B, 112, 112, 3) in [-1, 1] → (B, 512) embeddings
    [, new_batch_stats when train]."""
    layers = IRESNET_LAYERS[name]
    x = x.astype(dtype)
    new_st: Params = {}
    h = _conv(x, params["stem_conv"].astype(dtype))
    h, new_st["stem_bn"] = _bn(params["stem_bn"], batch_stats["stem_bn"],
                               h, train)
    h = _prelu(params["stem_prelu"], h)
    for stage, n in enumerate(layers):
        keys = [f"s{stage}_b{i}" for i in range(n)]
        h, new_st[keys[0]] = _block(params[keys[0]], batch_stats[keys[0]],
                                    h, 2, train)
        rest = keys[1:]
        if len(rest) >= _SCAN_THRESHOLD:
            sp = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[params[k] for k in rest])
            ss = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[batch_stats[k] for k in rest])

            def body(carry, ps):
                p, s = ps
                out, ns = _block(p, s, carry, 1, train)
                return out, ns

            h, ns_stacked = jax.lax.scan(jax.checkpoint(body), h, (sp, ss))
            for j, k in enumerate(rest):
                new_st[k] = jax.tree.map(lambda a, j=j: a[j], ns_stacked)
        else:
            for k in rest:
                h, new_st[k] = _block(params[k], batch_stats[k], h, 1,
                                      train)
    h, new_st["bn2"] = _bn(params["bn2"], batch_stats["bn2"], h, train)
    b = h.shape[0]
    h = h.reshape(b, -1)
    h = h @ params["fc"]["weight"].astype(dtype).T + params["fc"]["bias"]
    h, new_st["features_bn"] = _bn(params["features_bn"],
                                   batch_stats["features_bn"], h, train)
    h = h.astype(jnp.float32)
    if train:
        return h, new_st
    return h
