"""Fused-weight modulated conv probe (r5): per-sample weights
w[b] = W · s[b,i] · d[b,o] as ONE conv via batch_group_count, vs the
unfused prescale/postscale formulation (x·s → conv → y·d).

probe_sr_hlo.py showed the unfused form's xs/yd elementwise passes (and
their AD saves/recomputes) dominate SR fwd+bwd HBM traffic. The
reference's StyleGAN2 op picks fused weights for small batch
(`fused_modconv`); on TPU the question is whether XLA's
batch_group_count conv matches the plain conv's MXU efficiency.

Usage: python tools/probe_modconv_fused.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hfa_gp_tpu.core import ops

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 20
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
    dt = (time.perf_counter() - t0) / ITERS * 1000 - 33.0 / ITERS
    print(f"{name}: {dt:.2f} ms  (compile {c:.0f}s, last={v:.3f})",
          flush=True)


# First: check batch_group semantics/shape on a tiny case vs the unfused op
x = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, 16), jnp.float32)
w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 24), jnp.float32)
s = jax.random.normal(jax.random.PRNGKey(2), (B, 16), jnp.float32)
ref = ops.modulated_conv2d(x, w, s, padding=1)
kh, kw, cin, cout = w.shape
wb = w[None] * s[:, None, None, :, None]
d = jax.lax.rsqrt(jnp.sum(jnp.square(wb), axis=(1, 2, 3),
                          keepdims=True) + 1e-8)
wb = wb * d
wbt = jnp.transpose(wb, (1, 2, 3, 0, 4)).reshape(kh, kw, cin, B * cout)
y = jax.lax.conv_general_dilated(
    x, wbt, (1, 1), ((1, 1), (1, 1)),
    dimension_numbers=("NHWC", "HWIO", "NHWC"), batch_group_count=B)
print("bgc output shape:", y.shape, "ref:", ref.shape, flush=True)
# try mapping: output should be (1, H, W, B*Cout) with per-sample blocks
y2 = y.reshape(y.shape[1], y.shape[2], B, cout)
y2 = jnp.transpose(y2, (2, 0, 1, 3))
err = float(jnp.max(jnp.abs(y2 - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
print(f"bgc parity rel err: {err:.2e}", flush=True)


def unfused_case(name, res, c, up=1):
    xx = jax.random.normal(jax.random.PRNGKey(0), (B, res, res, c), DT)
    ww = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), jnp.float32)
    ss = jax.random.normal(jax.random.PRNGKey(2), (B, c), jnp.float32)

    def loss(x_, w_, s_):
        y_ = ops.modulated_conv2d(x_, w_, s_, up=up, padding=1,
                                  resample_filter=FIR)
        return jnp.mean(jnp.abs(y_.astype(jnp.float32)))

    g = jax.jit(lambda x_, w_, s_: sum(
        jnp.sum(jnp.abs(t)) for t in jax.grad(loss, argnums=(0, 1, 2))(
            x_, w_, s_)))
    timed(f"{name} unfused {res}^2 c{c} up{up} fwd+bwd", g, xx, ww, ss)


def fused_case(name, res, c, up=1):
    xx = jax.random.normal(jax.random.PRNGKey(0), (B, res, res, c), DT)
    ww = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), jnp.float32)
    ss = jax.random.normal(jax.random.PRNGKey(2), (B, c), jnp.float32)

    def loss(x_, w_, s_):
        y_ = ops.modulated_conv2d(x_, w_, s_, up=up, padding=1,
                                  resample_filter=FIR, fused=True)
        return jnp.mean(jnp.abs(y_.astype(jnp.float32)))

    g = jax.jit(lambda x_, w_, s_: sum(
        jnp.sum(jnp.abs(t)) for t in jax.grad(loss, argnums=(0, 1, 2))(
            x_, w_, s_)))
    timed(f"{name} fused(bgc) {res}^2 c{c} up{up} fwd+bwd", g, xx, ww, ss)


unfused_case("sr-ish", 512, 128)
fused_case("sr-ish", 512, 128)
unfused_case("sr-ish", 256, 256)
fused_case("sr-ish", 256, 256)
unfused_case("sr-up", 256, 256, up=2)
fused_case("sr-up", 256, 256, up=2)
print("DONE", flush=True)
