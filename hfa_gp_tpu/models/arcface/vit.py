"""ViT face-embedding backbones (vit_t/s/b/l + WebFace42M dp/mask variants).

Rebuilds the reference's arcface ViT family
(arcface_torch/backbones/vit.py, 280 LoC; registry at
backbones/__init__.py:33-85): stride-9 patch embedding over 112² crops
(the conv reads the top-left 108², 12×12 = 144 tokens), pre-norm
transformer blocks with ReLU6 MLPs and bias-free qkv, per-block
stochastic depth (linear 0→drop_path_rate schedule, vit.py:176), optional
MAE-style random token masking during training (vit.py:224-251,
mask_token restore at vit.py:270-274), and a flatten-all-tokens head:
Linear(dim·144→dim, no bias) → BN1d(eps 2e-5) → Linear(dim→emb, no bias)
→ BN1d (vit.py:195-200).

TPU-first: attention is one batched einsum chain (no flash needed at 144
tokens); masking/unmasking are static-shape vmap'd row gathers; bf16
trunk with fp32 attention softmax like the reference's autocast split
(vit.py:56-66).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

VIT_CONFIGS = {
    # name: (patch, dim, depth, heads, mlp_ratio, drop_path, mask_ratio)
    # registry parity: backbones/__init__.py:33-85
    "vit_t": (9, 256, 12, 8, 4.0, 0.1, 0.1),
    "vit_t_dp005_mask0": (9, 256, 12, 8, 4.0, 0.05, 0.0),
    "vit_s": (9, 512, 12, 8, 4.0, 0.1, 0.1),
    "vit_s_dp005_mask_0": (9, 512, 12, 8, 4.0, 0.05, 0.0),
    "vit_b": (9, 512, 24, 8, 4.0, 0.1, 0.1),
    "vit_b_dp005_mask_005": (9, 512, 24, 8, 4.0, 0.05, 0.05),
    # the reference ships vit_l only as the dp005_mask_005 variant
    "vit_l": (9, 768, 24, 8, 4.0, 0.05, 0.05),
    "vit_l_dp005_mask_005": (9, 768, 24, 8, 4.0, 0.05, 0.05),
}

_BN_EPS = 2e-5          # reference head BN eps (vit.py:197-199)
_BN_MOMENTUM = 0.1


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape,
                                             jnp.float32)


def _init_linear(key, cin, cout, bias=True):
    p = {"weight": _trunc_normal(key, (cout, cin))}
    if bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def _linear(p, x):
    y = x @ p["weight"].astype(x.dtype).T
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _init_ln(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _ln(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"].astype(x.dtype) \
        + p["bias"].astype(x.dtype)


def _init_bn1d(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def _bn1d(p, st, x, train):
    if train:
        # fp32 batch stats regardless of compute dtype (matches
        # iresnet._bn / mobilefacenet._bn): the one-pass E[x²]−E[x]²
        # cancellation is catastrophic in an 8-bit-mantissa bf16 head
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=0)
        var = jnp.maximum(jnp.mean(xf * xf, axis=0) - mean * mean, 0.0)
        new = {"mean": (1 - _BN_MOMENTUM) * st["mean"] + _BN_MOMENTUM * mean,
               "var": (1 - _BN_MOMENTUM) * st["var"] + _BN_MOMENTUM * var}
    else:
        mean, var = st["mean"], st["var"]
        new = st
    return (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * p["scale"] \
        + p["bias"], new


def init_vit(key: jax.Array, name: str = "vit_s",
             embedding_dim: int = 512, input_size: int = 108
             ) -> tuple[Params, Params]:
    """input_size 108 = 12×12 patches of 9 — identical coverage to the
    reference's stride-9 Conv2d on 112² (it reads rows/cols 0..107,
    vit.py:124-125). Returns (params, batch_stats)."""
    patch, dim, depth, heads, mlp_ratio, _, _ = VIT_CONFIGS[name]
    n_tokens = (input_size // patch) ** 2
    ks = iter(jax.random.split(key, depth * 4 + 8))
    p: Params = {
        "patch_embed": _init_linear(next(ks), patch * patch * 3, dim),
        "pos_embed": _trunc_normal(next(ks), (n_tokens, dim)),
        "mask_token": _trunc_normal(next(ks), (dim,)),
    }
    for i in range(depth):
        p[f"blk{i}"] = {
            "ln1": _init_ln(dim),
            "qkv": _init_linear(next(ks), dim, dim * 3, bias=False),
            "proj": _init_linear(next(ks), dim, dim),
            "ln2": _init_ln(dim),
            "fc1": _init_linear(next(ks), dim, int(dim * mlp_ratio)),
            "fc2": _init_linear(next(ks), int(dim * mlp_ratio), dim),
        }
    p["norm"] = _init_ln(dim)
    # flatten-all-tokens feature head (vit.py:195-200)
    p["head0"] = _init_linear(next(ks), dim * n_tokens, dim, bias=False)
    p["head0_bn"], bn0_st = _init_bn1d(dim)
    p["head1"] = _init_linear(next(ks), dim, embedding_dim, bias=False)
    p["head1_bn"], bn1_st = _init_bn1d(embedding_dim)
    st: Params = {"head0_bn": bn0_st, "head1_bn": bn1_st}
    return p, st


def _random_masking(key, tok, len_keep):
    """MAE-style per-sample masking (vit.py:224-251): argsort random
    noise, keep the first len_keep tokens. Static shapes; returns
    (kept tokens, ids_restore)."""
    b, n, _ = tok.shape
    noise = jax.random.uniform(key, (b, n))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    kept = jax.vmap(lambda t, i: t[i])(tok, ids_keep)
    return kept, ids_restore


def _drop_path(key, x, rate):
    """Stochastic depth (timm DropPath): per-sample Bernoulli keep,
    rescaled by 1/keep_prob."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


def vit_apply(params: Params, x: jax.Array, name: str = "vit_s",
              input_size: int = 108, dtype=jnp.float32, *,
              batch_stats: Params | None = None, train: bool = False,
              rng: jax.Array | None = None):
    """x (B, H, W, 3) → (B, embedding_dim).

    H/W cropped top-left to input_size (the reference's stride-9 conv on
    112² reads exactly pixels 0..107). train=True enables drop-path and
    random token masking (needs rng) and returns (emb, new_batch_stats).
    """
    patch, dim, depth, heads, _, drop_path_rate, mask_ratio = \
        VIT_CONFIGS[name]
    b, h, w, _ = x.shape
    if h != input_size:
        x = x[:, :input_size, :input_size]
    g = input_size // patch
    n_tokens = g * g
    x = x.astype(dtype).reshape(b, g, patch, g, patch, 3)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, n_tokens, -1)
    tok = _linear(params["patch_embed"], x) \
        + params["pos_embed"].astype(dtype)

    masking = train and mask_ratio > 0
    if masking:
        kmask, rng = jax.random.split(rng)
        len_keep = int(n_tokens * (1 - mask_ratio))
        tok, ids_restore = _random_masking(kmask, tok, len_keep)

    # linear stochastic-depth schedule 0 → drop_path_rate (vit.py:176)
    dpr = [drop_path_rate * i / max(depth - 1, 1) for i in range(depth)]
    scale = 1.0 / math.sqrt(dim // heads)
    for i in range(depth):
        blk = params[f"blk{i}"]
        y = _ln(blk["ln1"], tok)
        qkv = _linear(blk["qkv"], y).reshape(b, -1, 3, heads, dim // heads)
        # attention in fp32 like the reference's autocast(False) block
        q = qkv[:, :, 0].astype(jnp.float32)
        k = qkv[:, :, 1].astype(jnp.float32)
        v = qkv[:, :, 2].astype(jnp.float32)
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, -1, dim)
        y = _linear(blk["proj"], y.astype(dtype))
        if train and dpr[i] > 0:
            kdp, rng = jax.random.split(rng)
            y = _drop_path(kdp, y, dpr[i])
        tok = tok + y
        y = _ln(blk["ln2"], tok)
        y = _linear(blk["fc2"], jnp.clip(_linear(blk["fc1"], y), 0.0, 6.0))
        if train and dpr[i] > 0:
            kdp, rng = jax.random.split(rng)
            y = _drop_path(kdp, y, dpr[i])
        tok = tok + y

    tok = _ln(params["norm"], tok.astype(jnp.float32))

    if masking:
        # restore masked positions with mask_token, unshuffle (vit.py:270)
        n_masked = n_tokens - tok.shape[1]
        fill = jnp.broadcast_to(params["mask_token"], (b, n_masked, dim))
        full = jnp.concatenate([tok, fill.astype(tok.dtype)], axis=1)
        tok = jax.vmap(lambda t, i: t[i])(full, ids_restore)

    flat = tok.reshape(b, n_tokens * dim)
    if batch_stats is not None:
        st = batch_stats
    else:  # inference on fresh stats (zero-mean/unit-var identity-ish BN)
        st = {"head0_bn": _init_bn1d(dim)[1],
              "head1_bn": _init_bn1d(params["head1"]["weight"].shape[0])[1]}
    new_st: Params = {}
    emb = _linear(params["head0"], flat)
    emb, new_st["head0_bn"] = _bn1d(params["head0_bn"], st["head0_bn"],
                                    emb, train)
    emb = _linear(params["head1"], emb)
    emb, new_st["head1_bn"] = _bn1d(params["head1_bn"], st["head1_bn"],
                                    emb, train)
    if train:
        return emb, new_st
    return emb
