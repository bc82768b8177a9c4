"""RGB driving-signal encoder — StyleGAN2-style equal-lr conv pyramid.

Rebuilds reference code/networks/encoder3d.py:201-321 (EncoderApp +
Encoder): a 1x1 stem, ResBlocks halving resolution down to 4², a 4x4
valid conv to a 512-d appearance code, then a 5-layer EqualLinear stack to
`dim_shape` driving weights (plus an optional 25-d pose head).

All tensors NHWC; conv weights HWIO.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ...core import ops

Params = dict[str, Any]

# channel schedule (encoder3d.py:205-215)
CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
            256: 64, 512: 32, 1024: 16}

BLUR_KERNEL = (1, 3, 3, 1)


def _init_conv(key, in_ch, out_ch, k) -> jax.Array:
    return jax.random.normal(key, (k, k, in_ch, out_ch), jnp.float32)


def init_conv_layer(key, in_ch, out_ch, k, *, downsample=False,
                    bias=True, activate=True) -> Params:
    """ConvLayer (encoder3d.py:142-179): optional blur+stride-2, equal-lr
    conv, fused bias+lrelu."""
    p: Params = {"weight": _init_conv(key, in_ch, out_ch, k)}
    if activate and bias:
        p["act_bias"] = jnp.zeros((out_ch,), jnp.float32)   # FusedLeakyReLU
    elif bias and not activate:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv_layer_apply(p: Params, x: jax.Array, *, downsample=False,
                     activate=True) -> jax.Array:
    k = p["weight"].shape[0]
    if downsample:
        factor = 2
        ptot = (len(BLUR_KERNEL) - factor) + (k - 1)
        pad0, pad1 = (ptot + 1) // 2, ptot // 2
        x = ops.blur(x, ops.make_fir_kernel(BLUR_KERNEL), pad=(pad0, pad1))
        stride, padding = 2, 0
    else:
        stride, padding = 1, k // 2
    y = ops.equal_conv2d(x, p["weight"], p.get("bias"), stride=stride,
                         padding=padding)
    if activate:
        if "act_bias" in p:
            y = ops.fused_leaky_relu(y, p["act_bias"])
        else:
            y = jax.nn.leaky_relu(y, 0.2)                   # ScaledLeakyReLU
    return y


def init_res_block(key, in_ch, out_ch) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": init_conv_layer(k1, in_ch, in_ch, 3),
        "conv2": init_conv_layer(k2, in_ch, out_ch, 3, downsample=True),
        "skip": init_conv_layer(k3, in_ch, out_ch, 1, downsample=True,
                                bias=False, activate=False),
    }


def res_block_apply(p: Params, x: jax.Array) -> jax.Array:
    out = conv_layer_apply(p["conv1"], x)
    out = conv_layer_apply(p["conv2"], out, downsample=True)
    skip = conv_layer_apply(p["skip"], x, downsample=True, activate=False)
    return (out + skip) / math.sqrt(2.0)


def init_encoder_app(key, size: int, w_dim: int = 512) -> Params:
    log_size = int(math.log2(size))
    n_res = log_size - 2
    keys = jax.random.split(key, n_res + 2)
    p: Params = {"stem": init_conv_layer(keys[0], 3, CHANNELS[size], 1)}
    in_ch = CHANNELS[size]
    for i, res_exp in enumerate(range(log_size, 2, -1)):
        out_ch = CHANNELS[2 ** (res_exp - 1)]
        p[f"res{i}"] = init_res_block(keys[i + 1], in_ch, out_ch)
        in_ch = out_ch
    p["final"] = {"weight": _init_conv(keys[-1], in_ch, w_dim, 4)}
    return p


def encoder_app_apply(p: Params, x: jax.Array) -> jax.Array:
    """(B, size, size, 3) → (B, w_dim) appearance code."""
    h = conv_layer_apply(p["stem"], x)
    i = 0
    while f"res{i}" in p:
        h = res_block_apply(p[f"res{i}"], h)
        i += 1
    h = ops.equal_conv2d(h, p["final"]["weight"], None, padding=0)
    return h[:, 0, 0, :]


def init_linear_stack(key, dims: list[int]) -> Params:
    keys = jax.random.split(key, len(dims) - 1)
    return {f"fc{i}": {
        "weight": jax.random.normal(keys[i], (dims[i + 1], dims[i]),
                                    jnp.float32),
        "bias": jnp.zeros((dims[i + 1],), jnp.float32)}
        for i in range(len(dims) - 1)}


def linear_stack_apply(p: Params, x: jax.Array) -> jax.Array:
    """Composed EqualLinear layers with NO inter-layer activation — the
    reference builds its weight heads exactly this way (encoder3d.py:250-255
    passes no `activation` to EqualLinear)."""
    i = 0
    while f"fc{i}" in p:
        x = ops.equal_linear(x, **p[f"fc{i}"])
        i += 1
    return x


def init_encoder(key, size: int, dim: int = 512, dim_shape: int = 50,
                 out_pose: bool = False) -> Params:
    k_app, k_fc, k_pose = jax.random.split(key, 3)
    p: Params = {
        "net_app": init_encoder_app(k_app, size, dim),
        "fc": init_linear_stack(k_fc, [dim] * 5 + [dim_shape]),
    }
    if out_pose:
        p["pose"] = init_linear_stack(k_pose, [dim] * 5 + [25])
    return p


def encoder_apply(p: Params, x: jax.Array, *, use_softmax: bool = False):
    """(B, size, size, 3) → driving weights (B, dim_shape)
    [, pose (B, 25)]. Parity: encoder3d.py:280-298."""
    h = encoder_app_apply(p["net_app"], x)
    w = linear_stack_apply(p["fc"], h)
    if use_softmax:
        w = jax.nn.softmax(w, axis=1)
    if "pose" in p:
        return w, linear_stack_apply(p["pose"], h)
    return w


# -- Encoder_whole / pose2latent (encoder3d.py:325-442) ----------------------


def init_encoder_whole(key, size: int, dim: int = 512,
                       dim_shape: int = 50,
                       out_pose: bool = False) -> Params:
    """Encoder variant that also returns the 512-d appearance code
    (encoder3d.py:325-408)."""
    return init_encoder(key, size, dim, dim_shape, out_pose)


def encoder_whole_apply(p: Params, x: jax.Array, *,
                        use_softmax: bool = False):
    """→ (weights, appearance_code[, pose])."""
    h = encoder_app_apply(p["net_app"], x)
    w = linear_stack_apply(p["fc"], h)
    if use_softmax:
        w = jax.nn.softmax(w, axis=1)
    if "pose" in p:
        return w, h, linear_stack_apply(p["pose"], h)
    return w, h


def init_pose2latent(key, latent_warp: int = 32, len_pose: int = 25,
                     dim: int = 512) -> Params:
    """pose → warp-latent MLP (encoder3d.py:412-426): 5 EqualLinear
    layers 25→512→512→512→512→latent_warp."""
    return init_linear_stack(key, [len_pose] + [dim] * 4 + [latent_warp])


def pose2latent_apply(p: Params, pose: jax.Array) -> jax.Array:
    return linear_stack_apply(p, pose)
