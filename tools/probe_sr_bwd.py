"""Locate the SR backward blow-up (r5): sr fwd+bwd is 45.6 ms at batch 2
(tools/probe_syn_gap.py) against a ~0.64 TFLOP forward — the backward
runs ~10x the forward. Time each SR synth layer fwd+bwd separately at
the production shapes (bf16, batch 2), and A/B the up=2 modconv against
a pixel-shuffle (4-phase sub-kernel + depth_to_space) formulation whose
forward AND transpose are plain stride-1 convs.

Pipelined timing: ITERS dispatches, one scalar drain (CLAUDE.md rules).

Usage: python tools/probe_sr_bwd.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hfa_gp_tpu.core import ops

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 10
DT = jnp.bfloat16
FIR = (1, 3, 3, 1)


def timed(name, fn, *a):
    t0 = time.perf_counter()
    v = float(fn(*a))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.2f} ms  (compile {c:.0f}s, last={v:.3f})",
          flush=True)


def layer_case(name, res, cin, cout, up):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, res, res, cin), DT)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(2), (B, cin), jnp.float32)

    def loss(x_, w_, s_):
        y = ops.modulated_conv2d(x_, w_, s_, up=up, padding=0 if up == 2
                                 else 1, resample_filter=FIR)
        return jnp.mean(jnp.abs(y))

    g = jax.jit(lambda x_, w_, s_: sum(
        jnp.sum(jnp.abs(t)) for t in jax.grad(loss, argnums=(0, 1, 2))(
            x_, w_, s_)))
    timed(f"{name} ({res}^2 {cin}->{cout} up={up}) fwd+bwd", g, x, w, s)


# the four SR conv layers (SuperresolutionHybrid8XDC, networks.py SRConfig)
layer_case("sr b0.conv0", 128, 32, 256, 2)
layer_case("sr b0.conv1", 256, 256, 256, 1)
layer_case("sr b1.conv0", 256, 256, 128, 2)
layer_case("sr b1.conv1", 512, 128, 128, 1)


# --- pixel-shuffle up=2 modconv variant ----------------------------------
def up_modconv_ps(x, weight, styles, resample_filter=FIR, eps=1e-8):
    """modulated_conv2d(up=2) via 4-phase sub-kernels + depth_to_space.

    The zero-stuffed transposed conv only ever multiplies nonzero taps:
    output phase (di,dj) sees sub-kernel w[ki,kj] with ki≡(1-di),
    kj≡(1-dj) (mod 2). Emitting all 4 phases as one stride-1 conv to
    4*Cout channels keeps fwd AND its AD transpose on plain dense convs.
    """
    kh, kw, cin, cout = weight.shape
    assert kh == 3 and kw == 3
    w = weight.astype(x.dtype)
    s = styles.astype(x.dtype)
    x = x * s[:, None, None, :]
    # pad sub-kernels to 2x2: phase p=(di,dj) taps ki in {1-di, 3-di}∩[0,3)
    # build (2,2,cin, 2,2,cout) then reshape to (2,2,cin,4*cout)
    wp = jnp.zeros((2, 2, cin, 2, 2, cout), x.dtype)
    for di in range(2):
        for dj in range(2):
            for a in range(2):
                ki = 2 * a + 1 - di
                if not 0 <= ki < 3:
                    continue
                for b_ in range(2):
                    kj = 2 * b_ + 1 - dj
                    if not 0 <= kj < 3:
                        continue
                    wp = wp.at[a, b_, :, di, dj, :].set(w[ki, kj])
    wp = wp.reshape(2, 2, cin, 4 * cout)
    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, h, w_, _ = y.shape
    y = y.reshape(b, h, w_, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w_, cout)
    # phases: y2[2n+di] == y_ref[2n+di-1] of the lhs_dilation pre-FIR grid
    # (size 2H+1); y2 covers y_ref[-1..2H] (size 2H+2) — shift the FIR
    # pads one left to realign, same 2H output
    fh = np.asarray(ops.make_fir_kernel(resample_filter)).shape[0]
    ptot = fh + 1 - kh
    p0, p1 = (ptot + 1) // 2, ptot // 2
    y = ops.upfirdn2d(y, resample_filter, pad=(p0 - 1, p1), gain=4.0)
    # demodulate
    w32 = weight.astype(jnp.float32)
    s32 = styles.astype(jnp.float32)
    w2 = jnp.sum(jnp.square(w32), axis=(0, 1))
    d = jax.lax.rsqrt(jnp.square(s32) @ w2 + eps)
    return y * d[:, None, None, :].astype(y.dtype)


def parity_check():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 8),
                          jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 4), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(2), (1, 8), jnp.float32)
    a = ops.modulated_conv2d(x, w, s, up=2, resample_filter=FIR)
    b_ = up_modconv_ps(x, w, s)
    print("parity shapes", a.shape, b_.shape, flush=True)
    err = float(jnp.max(jnp.abs(a - b_)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"pixel-shuffle vs lhs_dilation rel err: {err:.2e}", flush=True)


parity_check()


def ps_case(name, res, cin, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, res, res, cin), DT)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(2), (B, cin), jnp.float32)

    def loss(x_, w_, s_):
        return jnp.mean(jnp.abs(up_modconv_ps(x_, w_, s_)))

    g = jax.jit(lambda x_, w_, s_: sum(
        jnp.sum(jnp.abs(t)) for t in jax.grad(loss, argnums=(0, 1, 2))(
            x_, w_, s_)))
    timed(f"{name} PS ({res}^2 {cin}->{cout} up=2) fwd+bwd", g, x, w, s)


ps_case("sr b0.conv0", 128, 32, 256)
ps_case("sr b1.conv0", 256, 256, 128)
print("DONE", flush=True)
