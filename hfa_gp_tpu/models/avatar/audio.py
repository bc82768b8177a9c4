"""Audio driving-signal encoders (AD-NeRF style).

Rebuilds reference code/networks/headnerf.py:284-349: `AudioNet` (1-D conv
stack over a 16-frame DeepSpeech window, 29×16 → dim_aud) and
`AudioAttNet` (1-D conv attention over an 8-frame smoothing window).

Conventions: sequences are NWC ((batch, frames, channels)); conv1d weights
are (k, cin, cout) WIO. Plain torch-style Conv1d/Linear init (kaiming
uniform bounds) since these are NOT equal-lr layers in the reference.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ...core import ops

Params = dict[str, Any]


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _init_conv1d(key, cin, cout, k) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin * k)
    return {"weight": _uniform(kw, (k, cin, cout), bound),
            "bias": _uniform(kb, (cout,), bound)}


def _init_linear(key, cin, cout) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    return {"weight": _uniform(kw, (cout, cin), bound),
            "bias": _uniform(kb, (cout,), bound)}


def _linear(p: Params, x: jax.Array) -> jax.Array:
    return x @ p["weight"].T + p["bias"]


def init_audio_net(key, dim_aud: int = 64, win_size: int = 16) -> Params:
    ks = jax.random.split(key, 6)
    return {
        "conv0": _init_conv1d(ks[0], 29, 32, 3),
        "conv1": _init_conv1d(ks[1], 32, 32, 3),
        "conv2": _init_conv1d(ks[2], 32, 64, 3),
        "conv3": _init_conv1d(ks[3], 64, 64, 3),
        "fc0": _init_linear(ks[4], 64, 64),
        "fc1": _init_linear(ks[5], 64, dim_aud),
    }


def audio_net_apply(p: Params, x: jax.Array, win_size: int = 16
                    ) -> jax.Array:
    """x: (B, 16, 29) DeepSpeech window → (B, dim_aud).

    Parity: headnerf.py:319-349 — window crop around center frame 8, four
    stride-2 convs with lrelu(0.02), two-layer MLP head."""
    half = win_size // 2
    x = x[:, 8 - half:8 + half, :]
    for name in ("conv0", "conv1", "conv2", "conv3"):
        x = ops.leaky_relu_conv1d(x, p[name]["weight"], p[name]["bias"],
                                  stride=2, padding=1)
    x = x[:, 0, :]                                      # (B, 64)
    x = jax.nn.leaky_relu(_linear(p["fc0"], x), 0.02)
    return _linear(p["fc1"], x)


def init_audio_att_net(key, dim_aud: int = 32, seq_len: int = 8) -> Params:
    ks = jax.random.split(key, 6)
    chans = [dim_aud, 16, 8, 4, 2, 1]
    p: Params = {f"conv{i}": _init_conv1d(ks[i], chans[i], chans[i + 1], 3)
                 for i in range(5)}
    p["att_fc"] = _init_linear(ks[5], seq_len, seq_len)
    return p


def audio_att_net_apply(p: Params, x: jax.Array, dim_aud: int = 32,
                        seq_len: int = 8) -> jax.Array:
    """x: (seq_len, D) per-frame audio codes → (D,) attention-smoothed code.

    Parity: headnerf.py:284-314 — scores computed from the FIRST dim_aud
    channels only (the reference instantiates AudioAttNet() with default
    dim_aud=32 against 64-d codes, trainer_audio.py:32), weighted sum taken
    over the full code."""
    y = x[None, :, :dim_aud]                            # (1, seq, dim_aud)
    for i in range(5):
        y = ops.leaky_relu_conv1d(y, p[f"conv{i}"]["weight"],
                                  p[f"conv{i}"]["bias"], stride=1,
                                  padding=1, slope=0.02)
    scores = _linear(p["att_fc"], y[0, :, 0][None])     # (1, seq)
    att = jax.nn.softmax(scores, axis=1)[0, :, None]    # (seq, 1)
    return jnp.sum(att * x, axis=0)
