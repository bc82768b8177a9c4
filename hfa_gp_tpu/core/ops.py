"""Fused XLA formulations of the reference's native/CUDA ops.

The reference reaches these ops through EG3D's `torch_utils.ops` CUDA
extensions (bias_act.cu, upfirdn2d.cu, JIT-compiled when the pickle loads;
see reference code/networks/headnerf.py:31-38) and through pure-python
StyleGAN2 primitives (reference code/networks/encoder3d.py:7-198).

TPU-first design notes:
  * Every image tensor is NHWC (channels last) — the native TPU conv layout.
    The reference is NCHW; tools/convert_pickle.py transposes weights.
  * `upfirdn2d` is ONE `lax.conv_general_dilated` call: `lhs_dilation`
    performs the zero-stuffed upsample, `window_strides` the downsample and
    the FIR filter is a depthwise kernel — XLA fuses pad/up/filter/down into
    a single HBM-friendly kernel instead of the reference's 5-step
    pad/view/pad/conv/stride chain (encoder3d.py:23-41).
  * Modulated conv uses the input-scale/output-scale identity
    (y = demod ⊙ conv(x ⊙ style, w)) so the conv keeps ONE shared weight —
    batched cleanly onto the MXU with no per-sample weight materialisation.
  * Equal-lr scaling (StyleGAN's runtime `weight * 1/sqrt(fan_in)`) is kept
    at runtime exactly like the reference so converted checkpoints match.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# bias_act — fused bias + leaky-relu + gain + optional clamp
# (replaces EG3D's bias_act.cu; reference python fallback encoder3d.py:7-8)
# ---------------------------------------------------------------------------


def fused_leaky_relu(x: jax.Array, bias: jax.Array | None = None,
                     negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)) -> jax.Array:
    """leaky_relu(x + b) * scale with channel-last bias broadcast.

    Parity: reference encoder3d.py:7-8 (`fused_leaky_relu`), where bias is
    shaped (1, C, 1, 1) for NCHW; here x is (..., C) and bias is (C,).
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jax.nn.leaky_relu(x, negative_slope) * jnp.asarray(scale, x.dtype)


def bias_act(x: jax.Array, bias: jax.Array | None = None, *,
             act: str = "linear", gain: float | None = None,
             clamp: float | None = None) -> jax.Array:
    """EG3D-style fused bias/activation/gain/clamp (bias_act.cu equivalent).

    act ∈ {linear, relu, lrelu, sigmoid, tanh, softplus}. Default gains match
    the CUDA op's spec table (lrelu → sqrt(2), everything else 1).
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    if act == "linear":
        pass
    elif act == "relu":
        x = jax.nn.relu(x)
    elif act == "lrelu":
        x = jax.nn.leaky_relu(x, 0.2)
        if gain is None:
            gain = math.sqrt(2.0)
    elif act == "sigmoid":
        x = jax.nn.sigmoid(x)
    elif act == "tanh":
        x = jnp.tanh(x)
    elif act == "softplus":
        x = jax.nn.softplus(x)
    else:
        raise ValueError(f"unknown act {act!r}")
    if gain is not None and gain != 1.0:
        x = x * jnp.asarray(gain, x.dtype)
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x


# ---------------------------------------------------------------------------
# FIR filtering — upfirdn2d (replaces upfirdn2d.cu / encoder3d.py:23-45)
# ---------------------------------------------------------------------------


def make_fir_kernel(k: Sequence[float] | np.ndarray) -> np.ndarray:
    """Build a normalized separable 2-D FIR kernel from a 1-D tap list.

    Parity: reference encoder3d.py:48-56 (`make_kernel`).
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()


def upfirdn2d(x: jax.Array, kernel: jax.Array | np.ndarray, *,
              up: int = 1, down: int = 1,
              pad: tuple[int, int] = (0, 0),
              gain: float = 1.0) -> jax.Array:
    """Upsample (zero-stuff) → pad → FIR filter → downsample, in one conv.

    x: (B, H, W, C);  kernel: (kh, kw) shared across channels.
    Semantics match reference encoder3d.py:23-45 (upfirdn2d_native): the
    output length is  (H*up + pad0 + pad1 - kh)//down + 1.

    `lhs_dilation` produces H*up-(up-1) samples (zeros between elements,
    none trailing); the reference zero-stuffs to H*up (trailing zeros), so
    we add (up-1) to the trailing pad — identical values, identical size.
    """
    if not hasattr(kernel, "ndim") or kernel.ndim == 1:
        kernel = make_fir_kernel(kernel)
    kh, kw = kernel.shape
    c = x.shape[-1]
    k = jnp.asarray(kernel, x.dtype) * jnp.asarray(gain, x.dtype)
    # The reference convolves with the flipped kernel (true convolution);
    # XLA's conv is also true convolution only after we flip — XLA conv is
    # cross-correlation, torch's F.conv2d too, and the reference flips the
    # kernel before F.conv2d (encoder3d.py:36). Net effect: correlate with
    # the *flipped* kernel == convolve with the original.
    k = jnp.flip(k, (0, 1))
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    pad0, pad1 = pad
    pads = ((pad0, pad1 + (up - 1)), (pad0, pad1 + (up - 1)))
    return jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(down, down),
        padding=pads,
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def blur(x: jax.Array, kernel: jax.Array | np.ndarray,
         pad: tuple[int, int], upsample_factor: int = 1) -> jax.Array:
    """FIR blur (reference Blur module, encoder3d.py:59-73)."""
    gain = float(upsample_factor) ** 2
    return upfirdn2d(x, kernel, pad=pad, gain=gain)


def upsample2d(x: jax.Array, kernel: jax.Array | np.ndarray,
               factor: int = 2) -> jax.Array:
    """2x FIR upsample (EG3D upfirdn2d.upsample2d equivalent)."""
    kh = np.asarray(kernel).shape[0]
    p0 = (kh + factor - 1) // 2
    p1 = (kh - factor) // 2
    return upfirdn2d(x, kernel, up=factor, pad=(p0, p1),
                     gain=float(factor) ** 2)


def _upfirdn1d_matrix(h: int, taps: np.ndarray, up: int,
                      pad: tuple[int, int]) -> np.ndarray:
    """Dense (out_len, h) matrix of the 1-D upfirdn axis op.

    Mirrors upfirdn2d's conv exactly: dilate the input to (h-1)*up+1
    samples, pad (pad0, pad1 + up - 1), correlate with the FLIPPED taps.
    """
    kf = np.asarray(taps, np.float64)[::-1]
    kh = len(kf)
    n_dil = (h - 1) * up + 1
    pad_l = pad[0]
    out_len = n_dil + pad[0] + pad[1] + (up - 1) - kh + 1
    u = np.zeros((out_len, h), np.float64)
    for o in range(out_len):
        for t in range(kh):
            i = o + t - pad_l
            if 0 <= i < n_dil and i % up == 0:
                u[o, i // up] += kf[t]
    return u.astype(np.float32)


_UPSAMPLE_MAT_CACHE: dict[tuple, np.ndarray] = {}


def upsample2d_cm(x: jax.Array, taps: Sequence[float],
                  factor: int = 2) -> jax.Array:
    """upsample2d for CHANNEL-MAJOR (B, C, H, W) tensors, as two separable
    dense matmuls instead of a depthwise conv.

    Bit-path rationale (measured r5, tools/probe_sr_bwd*.py): the SR head's
    img skip chain carries 3-channel tensors; in NHWC every materialization
    has minor dim 3 and XLA pads it ~42× in T(8,128) layouts — ~14 ms of
    hidden padded copies per fwd+bwd at batch 2. Channel-major keeps W
    (≥128) minor everywhere, and the separable FIR as dense (2H, H)
    matmuls is layout-clean with a transposed-matmul backward. FLOPs are
    trivial (banded matrix, ~GFLOP at 512²).

    Matches ops.upsample2d exactly: same pads, same flipped kernel, same
    gain = factor² (split as `factor` per axis on the normalized taps).
    """
    k = np.asarray(taps, np.float64)
    assert k.ndim == 1, "upsample2d_cm needs the 1-D taps (separable FIR)"
    kh = len(k)
    p0 = (kh + factor - 1) // 2
    p1 = (kh - factor) // 2
    axis_taps = k / k.sum() * factor
    b, c, h, w = x.shape
    key_h = (h, factor, tuple(k.tolist()))
    key_w = (w, factor, tuple(k.tolist()))
    for key, n in ((key_h, h), (key_w, w)):
        if key not in _UPSAMPLE_MAT_CACHE:
            _UPSAMPLE_MAT_CACHE[key] = _upfirdn1d_matrix(
                n, axis_taps, factor, (p0, p1))
    uh = jnp.asarray(_UPSAMPLE_MAT_CACHE[key_h], x.dtype)
    uw = jnp.asarray(_UPSAMPLE_MAT_CACHE[key_w], x.dtype)
    y = jax.lax.dot_general(uh, x, (((1,), (2,)), ((), ())))  # (2H,B,C,W)
    y = jnp.transpose(y, (1, 2, 0, 3))                        # major-only
    return jax.lax.dot_general(y, uw, (((3,), (1,)), ((), ())))


def downsample2d(x: jax.Array, kernel: jax.Array | np.ndarray,
                 factor: int = 2) -> jax.Array:
    kh = np.asarray(kernel).shape[0]
    p0 = (kh - factor + 1) // 2
    p1 = (kh - factor) // 2
    return upfirdn2d(x, kernel, down=factor, pad=(p0, p1))


# ---------------------------------------------------------------------------
# Equal-learning-rate primitives (reference encoder3d.py:86-139)
# ---------------------------------------------------------------------------


def equal_linear(x: jax.Array, weight: jax.Array,
                 bias: jax.Array | None = None, *,
                 lr_mul: float = 1.0, activation: str | None = None
                 ) -> jax.Array:
    """y = x @ (w * scale).T (+ b*lr_mul), scale = lr_mul/sqrt(in_dim).

    weight is stored (out, in) — torch Linear layout — so converted
    checkpoints drop in directly. Parity: encoder3d.py:112-136.
    """
    out_dim, in_dim = weight.shape
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    w = weight.astype(x.dtype) * jnp.asarray(scale, x.dtype)
    y = x @ w.T
    b = None if bias is None else bias * lr_mul
    if activation:  # 'fused_lrelu'
        return fused_leaky_relu(y, b)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def equal_conv2d(x: jax.Array, weight: jax.Array,
                 bias: jax.Array | None = None, *,
                 stride: int = 1, padding: int = 0) -> jax.Array:
    """Equal-lr conv2d. x: NHWC; weight: (kh, kw, cin, cout) HWIO.

    scale = 1/sqrt(cin*kh*kw). Parity: encoder3d.py:86-103 (EqualConv2d).
    """
    kh, kw, cin, _ = weight.shape
    scale = 1.0 / math.sqrt(cin * kh * kw)
    w = weight.astype(x.dtype) * jnp.asarray(scale, x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# EG3D FullyConnectedLayer (runtime weight gain, used all over the generator)
# ---------------------------------------------------------------------------


def fully_connected(x: jax.Array, weight: jax.Array,
                    bias: jax.Array | None = None, *,
                    activation: str = "linear",
                    lr_multiplier: float = 1.0) -> jax.Array:
    """EG3D FullyConnectedLayer: y = act(x @ (w*g).T + b*lr_mul), with
    g = lr_multiplier / sqrt(in_features). weight stored (out, in)."""
    out_dim, in_dim = weight.shape
    gain = lr_multiplier / math.sqrt(in_dim)
    w = weight.astype(x.dtype) * jnp.asarray(gain, x.dtype)
    y = x @ w.T
    b = None if bias is None else (bias * lr_multiplier).astype(y.dtype)
    return bias_act(y, b, act=activation)


def normalize_2nd_moment(x: jax.Array, axis: int = -1,
                         eps: float = 1e-8) -> jax.Array:
    """x * rsqrt(mean(x^2)) — StyleGAN2 mapping-net input normalization."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis,
                                      keepdims=True) + eps)


# ---------------------------------------------------------------------------
# Modulated conv2d — the StyleGAN2 synthesis workhorse
# ---------------------------------------------------------------------------


def modulated_conv2d(
    x: jax.Array,            # (B, H, W, Cin)
    weight: jax.Array,       # (kh, kw, Cin, Cout) HWIO
    styles: jax.Array,       # (B, Cin)
    *,
    demodulate: bool = True,
    up: int = 1,
    padding: int = 0,
    resample_filter: jax.Array | np.ndarray | None = None,
    eps: float = 1e-8,
    fused: bool = False,
) -> jax.Array:
    """Style-modulated conv with optional 2x upsample, MXU-friendly.

    Implements the StyleGAN2 op (the `modulated_conv2d` reached through the
    EG3D pickle at reference headnerf.py:112). Two formulations, same math:

    unfused (default):  y = d ⊙ conv(x ⊙ s, w),
                        d_o = rsqrt(Σ_{i,k} (w_oik s_i)^2 + eps)
    — one shared conv weight, but the x·s prescale and y·d postscale are
    full passes over the big activation (and AD residuals of both).

    fused:  per-sample weights w_b = w · s_b · d_b (tiny: B·k²·Cin·Cout)
    run as ONE conv with `batch_group_count=B` — no big elementwise pre/
    post passes at all. This is the reference op's own small-batch path
    (StyleGAN2 `fused_modconv`); on TPU it trades those HBM passes for a
    grouped conv.

    With up=2 the zero-stuffed upsample rides the same conv via
    `lhs_dilation`, followed by the FIR smoothing filter (gain=4).
    """
    kh, kw, cin, cout = weight.shape

    if resample_filter is None:
        resample_filter = make_fir_kernel([1, 3, 3, 1])
    elif not hasattr(resample_filter, "ndim") \
            or np.asarray(resample_filter).ndim == 1:
        resample_filter = make_fir_kernel(resample_filter)
    fh = np.asarray(resample_filter).shape[0]
    # up=2: pad so the pre-FIR size is 2H+kh-2 (matches
    # conv_transpose(stride=2)); after FIR: (2H+kh-2)+p0+p1-fh+1 == 2H.
    ptot = fh + 1 - kh
    fp0, fp1 = (ptot + 1) // 2, ptot // 2

    if fused:
        b = x.shape[0]
        w32 = weight.astype(jnp.float32)[None] \
            * styles.astype(jnp.float32)[:, None, None, :, None]
        if demodulate:
            d = jax.lax.rsqrt(jnp.sum(jnp.square(w32), axis=(1, 2, 3),
                                      keepdims=True) + eps)
            w32 = w32 * d
        # (kh, kw, Cin, B*Cout); batch group g consumes lhs batch g and
        # produces the g-th Cout block (verified vs unfused, test_ops)
        wb = jnp.transpose(w32, (1, 2, 3, 0, 4)).reshape(
            kh, kw, cin, b * cout).astype(x.dtype)
        if up == 1:
            y = jax.lax.conv_general_dilated(
                x, wb, window_strides=(1, 1),
                padding=((padding, padding), (padding, padding)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                batch_group_count=b)
        elif up == 2:
            y = jax.lax.conv_general_dilated(
                x, wb, window_strides=(1, 1),
                padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                batch_group_count=b)
            # FIR is per-channel — apply on the (1, H, W, B*Cout) grouped
            # output, then unblock
            y = upfirdn2d(y, resample_filter, pad=(fp0, fp1), gain=4.0)
        else:
            raise NotImplementedError(f"up={up}")
        y = jnp.transpose(y.reshape(y.shape[1], y.shape[2], b, cout),
                          (2, 0, 1, 3))
        return y

    w = weight.astype(x.dtype)
    s = styles.astype(x.dtype)

    x = x * s[:, None, None, :]

    if up == 1:
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1),
            padding=((padding, padding), (padding, padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    elif up == 2:
        # zero-stuff (lhs_dilation=2) + conv in one call, then FIR-smooth
        # down to exactly 2H.
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1),
            padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = upfirdn2d(y, resample_filter, pad=(fp0, fp1), gain=4.0)
    else:
        raise NotImplementedError(f"up={up}")

    if demodulate:
        # d: (B, Cout) from w^2 (contract in,kh,kw) x s^2 — accumulated in
        # fp32 so bf16 compute keeps the normalization exact
        w32 = weight.astype(jnp.float32)
        s32 = styles.astype(jnp.float32)
        w2 = jnp.sum(jnp.square(w32), axis=(0, 1))        # (Cin, Cout)
        d = jax.lax.rsqrt(jnp.square(s32) @ w2 + eps)     # (B, Cout)
        y = y * d[:, None, None, :].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Misc small ops used across the framework
# ---------------------------------------------------------------------------


def avg_pool_to(x: jax.Array, size: int) -> jax.Array:
    """AdaptiveAvgPool2d((size, size)) for NHWC inputs whose H=W is an
    integer multiple of `size` (the only case the reference hits:
    512→256 face_pool, trainer_rgb.py:63,84)."""
    b, h, w, c = x.shape
    if h == size and w == size:
        return x
    assert h % size == 0 and w % size == 0, (h, w, size)
    fh, fw = h // size, w // size
    x = x.reshape(b, size, fh, size, fw, c)
    return x.mean(axis=(2, 4))


def leaky_relu_conv1d(x: jax.Array, weight: jax.Array, bias: jax.Array, *,
                      stride: int = 1, padding: int = 1,
                      slope: float = 0.02) -> jax.Array:
    """Conv1d + LeakyReLU used by AudioNet/AudioAttNet
    (reference headnerf.py:284-349). x: (B, L, C); weight: (k, cin, cout)."""
    y = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype),
        window_strides=(stride,),
        padding=((padding, padding),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    y = y + bias.astype(y.dtype)
    return jax.nn.leaky_relu(y, slope)


def minibatch_gaussian_filter1d(x: jax.Array, sigma: float,
                                truncate: float = 4.0) -> jax.Array:
    """gaussian_filter1d along axis 0 with 'reflect' boundary — parity with
    scipy.ndimage.gaussian_filter1d as used for temporal label/landmark
    smoothing (reference smooth.py:40, dataset.py:253)."""
    radius = int(truncate * sigma + 0.5)
    t = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    n = x.shape[0]
    flat = x.reshape(n, -1).T[:, :, None]              # (F, N, 1)
    # scipy 'reflect' == jnp.pad mode='symmetric'
    padded = jnp.pad(flat, ((0, 0), (radius, radius), (0, 0)),
                     mode="symmetric")
    y = jax.lax.conv_general_dilated(
        padded, jnp.asarray(k)[::-1][:, None, None],
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y[:, :, 0].T.reshape(x.shape)
