"""Parity tests for core ops against clean-room torch implementations of the
reference formulas (reference code/networks/encoder3d.py:7-139 and the
StyleGAN2 modulated-conv math reached through the EG3D pickle)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from hfa_gp_tpu.core import ops


def torch_upfirdn2d(x, k, up=1, down=1, pad=(0, 0)):
    """Reference semantics (encoder3d.py:23-45), NCHW torch."""
    b, c, in_h, in_w = x.shape
    kh, kw = k.shape
    out = x.view(-1, c, in_h, 1, in_w, 1)
    out = TF.pad(out, [0, up - 1, 0, 0, 0, up - 1, 0, 0])
    out = out.view(-1, c, in_h * up, in_w * up)
    out = TF.pad(out, [max(pad[0], 0), max(pad[1], 0),
                       max(pad[0], 0), max(pad[1], 0)])
    out = out[:, :,
              max(-pad[0], 0): out.shape[2] - max(-pad[1], 0),
              max(-pad[0], 0): out.shape[3] - max(-pad[1], 0)]
    out = out.reshape([-1, 1, out.shape[2], out.shape[3]])
    w = torch.flip(k, [0, 1]).view(1, 1, kh, kw)
    out = TF.conv2d(out, w)
    out = out.reshape(b, c, out.shape[2], out.shape[3])
    return out[:, :, ::down, ::down]


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def to_nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (2, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (3, 2)),
])
def test_upfirdn2d_matches_reference(up, down, pad):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    k = ops.make_fir_kernel([1, 3, 3, 1])
    got = ops.upfirdn2d(jnp.asarray(x), k, up=up, down=down, pad=pad)
    want = torch_upfirdn2d(nchw(x), torch.from_numpy(k),
                           up=up, down=down, pad=pad)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_leaky_relu_matches_reference():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    got = ops.fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
    want = TF.leaky_relu(nchw(x) + torch.from_numpy(b).view(1, 8, 1, 1),
                         0.2) * math.sqrt(2)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-6,
                               atol=1e-6)


def test_equal_linear_matches_reference():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 16)).astype(np.float32)
    w = rng.standard_normal((8, 16)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    lr_mul = 0.5
    got = ops.equal_linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                           lr_mul=lr_mul)
    scale = (1 / math.sqrt(16)) * lr_mul
    want = TF.linear(torch.from_numpy(x), torch.from_numpy(w) * scale,
                     torch.from_numpy(b) * lr_mul)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-5)

    got_act = ops.equal_linear(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(b), lr_mul=lr_mul,
                               activation="fused_lrelu")
    lin = TF.linear(torch.from_numpy(x), torch.from_numpy(w) * scale)
    want_act = TF.leaky_relu(lin + torch.from_numpy(b) * lr_mul, 0.2) \
        * math.sqrt(2)
    np.testing.assert_allclose(np.asarray(got_act), want_act.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_equal_conv2d_matches_reference():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    got = ops.equal_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                           stride=2, padding=1)
    scale = 1 / math.sqrt(4 * 9)
    w_t = torch.from_numpy(w.transpose(3, 2, 0, 1)) * scale  # OIHW
    want = TF.conv2d(nchw(x), w_t, torch.from_numpy(b), stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-4,
                               atol=1e-5)


def torch_modulated_conv2d(x, w_oihw, styles, demodulate=True):
    """StyleGAN2 fused weight-modulation formulation (per-sample weights),
    the ground truth the input/output-scale formulation must match."""
    b = x.shape[0]
    o, i, kh, kw = w_oihw.shape
    w = w_oihw[None] * styles.reshape(b, 1, i, 1, 1)
    if demodulate:
        d = (w.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
        w = w * d.reshape(b, o, 1, 1, 1)
    x = x.reshape(1, -1, *x.shape[2:])
    w = w.reshape(-1, i, kh, kw)
    y = TF.conv2d(x, w, padding=kh // 2, groups=b)
    return y.reshape(b, o, *y.shape[2:])


def test_modulated_conv2d_matches_fused_formulation():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    s = rng.standard_normal((2, 4)).astype(np.float32) + 1.5
    got = ops.modulated_conv2d(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(s), padding=1)
    want = torch_modulated_conv2d(nchw(x),
                                  torch.from_numpy(w.transpose(3, 2, 0, 1)),
                                  torch.from_numpy(s))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-3,
                               atol=1e-4)


def test_modulated_conv2d_fused_matches_unfused():
    """fused=True (per-sample weights, batch_group_count) == the default
    prescale/postscale formulation — outputs AND gradients, up=1 and
    up=2, with and without demodulation."""
    rng = np.random.default_rng(9)
    b, h, cin, cout = 2, 8, 4, 6
    x = jnp.asarray(rng.standard_normal((b, h, h, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(
        np.float32))
    s = jnp.asarray(rng.standard_normal((b, cin)).astype(np.float32) + 1.5)
    for up in (1, 2):
        for demod in (True, False):
            kw = dict(demodulate=demod, up=up, padding=1)
            ref = ops.modulated_conv2d(x, w, s, **kw)
            got = ops.modulated_conv2d(x, w, s, fused=True, **kw)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-5)

            def loss(x_, w_, s_, fused):
                y = ops.modulated_conv2d(x_, w_, s_, fused=fused, **kw)
                return jnp.sum(jnp.sin(y))

            g_ref = jax.grad(loss, argnums=(0, 1, 2))(x, w, s, False)
            g_fus = jax.grad(loss, argnums=(0, 1, 2))(x, w, s, True)
            for a, c in zip(g_ref, g_fus):
                np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                           rtol=1e-3, atol=1e-4)


def test_modulated_conv2d_up2_matches_transpose_then_fir():
    """up=2 path: zero-stuff+conv then FIR == conv_transpose(stride 2) then
    FIR with the stylegan pad rule, and the output is exactly 2x."""
    rng = np.random.default_rng(5)
    b, h, cin, cout = 2, 8, 4, 6
    x = rng.standard_normal((b, h, h, cin)).astype(np.float32)
    w = rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
    s = rng.standard_normal((b, cin)).astype(np.float32) + 1.5
    got = ops.modulated_conv2d(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(s), up=2)
    assert got.shape == (b, 2 * h, 2 * h, cout)

    # torch ground truth: per-sample modulated weights, conv_transpose2d
    # (weights IOHW, spatially flipped relative to correlation), FIR.
    xt = nchw(x)
    w_oihw = torch.from_numpy(w.transpose(3, 2, 0, 1))
    wmod = w_oihw[None] * torch.from_numpy(s).reshape(b, 1, cin, 1, 1)
    d = (wmod.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
    ys = []
    for bi in range(b):
        # jax lhs_dilation zero-stuff + correlation == conv_transpose with
        # spatially flipped kernel
        wt = torch.flip(wmod[bi], [2, 3]).permute(1, 0, 2, 3)  # IOHW
        y = TF.conv_transpose2d(xt[bi:bi + 1], wt, stride=2)
        ys.append(y)
    y = torch.cat(ys, 0)
    k = ops.make_fir_kernel([1, 3, 3, 1])
    y = torch_upfirdn2d(y, torch.from_numpy(k * 4.0), pad=(1, 1))
    y = y * d.reshape(b, cout, 1, 1)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(y), rtol=1e-3,
                               atol=1e-4)


def test_avg_pool_to():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    got = ops.avg_pool_to(jnp.asarray(x), 4)
    want = TF.adaptive_avg_pool2d(nchw(x), (4, 4))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-5,
                               atol=1e-6)


def test_gaussian_filter1d_matches_scipy():
    from scipy.ndimage import gaussian_filter1d
    rng = np.random.default_rng(7)
    x = rng.standard_normal((20, 25)).astype(np.float32)
    got = ops.minibatch_gaussian_filter1d(jnp.asarray(x), 2.0)
    want = gaussian_filter1d(x, 2.0, axis=0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_bias_act_clamp():
    x = jnp.array([[-1000.0, 0.5, 1000.0]])
    y = ops.bias_act(x, act="lrelu", clamp=256.0)
    assert float(y[0, 0]) == -256.0 and float(y[0, 2]) == 256.0
