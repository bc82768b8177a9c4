"""ViT face-embedding backbones (vit_t/s/b/l).

Rebuilds the reference's arcface ViT family
(arcface_torch/backbones/vit.py, 280 LoC; registry vit_t..vit_l at
backbones/__init__.py:35-85): patch embedding over 112² crops,
pre-norm transformer blocks, mean-pooled tokens → BN'd 512-d embedding.

TPU-first: attention is one batched einsum chain (no flash needed at 144
tokens); bf16-friendly.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

VIT_CONFIGS = {
    # name: (patch, dim, depth, heads, mlp_ratio)
    "vit_t": (9, 256, 12, 8, 3.0),
    "vit_s": (9, 512, 12, 8, 3.0),
    "vit_b": (9, 512, 24, 8, 3.0),
    "vit_l": (9, 768, 24, 8, 3.0),
}


def _init_linear(key, cin, cout):
    k1, k2 = jax.random.split(key)
    lim = math.sqrt(6.0 / (cin + cout))
    return {"weight": jax.random.uniform(k1, (cout, cin), jnp.float32,
                                         -lim, lim),
            "bias": jnp.zeros((cout,))}


def _linear(p, x):
    return x @ p["weight"].T + p["bias"]


def _init_ln(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _ln(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def init_vit(key: jax.Array, name: str = "vit_s",
             embedding_dim: int = 512, input_size: int = 108) -> Params:
    """input_size 108 = 12x12 patches of 9 (the reference pads/crops 112²
    to a patch-divisible size)."""
    patch, dim, depth, heads, mlp_ratio = VIT_CONFIGS[name]
    n_tokens = (input_size // patch) ** 2
    ks = iter(jax.random.split(key, depth * 4 + 4))
    p: Params = {
        "patch_embed": _init_linear(next(ks), patch * patch * 3, dim),
        "pos_embed": jax.random.normal(next(ks), (n_tokens, dim)) * 0.02,
    }
    for i in range(depth):
        p[f"blk{i}"] = {
            "ln1": _init_ln(dim),
            "qkv": _init_linear(next(ks), dim, dim * 3),
            "proj": _init_linear(next(ks), dim, dim),
            "ln2": _init_ln(dim),
            "fc1": _init_linear(next(ks), dim, int(dim * mlp_ratio)),
            "fc2": _init_linear(next(ks), int(dim * mlp_ratio), dim),
        }
    p["norm"] = _init_ln(dim)
    p["head"] = _init_linear(next(ks), dim, embedding_dim)
    p["feat_bn"] = {"scale": jnp.ones((embedding_dim,)),
                    "bias": jnp.zeros((embedding_dim,)),
                    "mean": jnp.zeros((embedding_dim,)),
                    "var": jnp.ones((embedding_dim,))}
    return p


def vit_apply(params: Params, x: jax.Array, name: str = "vit_s",
              input_size: int = 108, dtype=jnp.float32) -> jax.Array:
    """x (B, H, W, 3) → (B, embedding_dim). H/W center-cropped to
    input_size."""
    patch, dim, depth, heads, _ = VIT_CONFIGS[name]
    b, h, w, _ = x.shape
    if h != input_size:
        off = (h - input_size) // 2
        x = x[:, off:off + input_size, off:off + input_size]
    g = input_size // patch
    x = x.astype(dtype).reshape(b, g, patch, g, patch, 3)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, g * g, -1)
    tok = _linear(params["patch_embed"], x) \
        + params["pos_embed"].astype(dtype)

    scale = 1.0 / math.sqrt(dim // heads)
    for i in range(depth):
        blk = params[f"blk{i}"]
        y = _ln(blk["ln1"], tok)
        qkv = _linear(blk["qkv"], y).reshape(b, -1, 3, heads,
                                             dim // heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, -1, dim)
        tok = tok + _linear(blk["proj"], y)
        y = _ln(blk["ln2"], tok)
        y = jax.nn.gelu(_linear(blk["fc1"], y))
        tok = tok + _linear(blk["fc2"], y)

    tok = _ln(params["norm"], tok).mean(axis=1)        # mean pool
    emb = _linear(params["head"], tok.astype(jnp.float32))
    bn = params["feat_bn"]
    return (emb - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5) \
        * bn["scale"] + bn["bias"]
