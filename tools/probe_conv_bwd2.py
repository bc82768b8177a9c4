"""Conv fwd vs bwd, measured INSIDE one jit (lax.scan over 16 distinct
inputs) so tunnel dispatch overhead (~2 ms/call, r3 finding) cannot
pollute per-op numbers.

Usage: python tools/probe_conv_bwd2.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

K = 16          # scan length inside the jit
ITERS = 10      # dispatches per measurement


def timed(name, fn, *a):
    fn(*a)
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS / K * 1000
    print(f"{name}: {dt:.3f} ms/op", flush=True)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def probe(tag, b, h, c1, c2, dt):
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (K, b, h, h, c1), dt)
    w = jax.random.normal(key, (3, 3, c1, c2), dt)

    @jax.jit
    def fwd(xs_, w_):
        def body(acc, x_):
            return acc + jnp.sum(conv(x_, w_)), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32), xs_)[0]

    timed(f"{tag} fwd   ", fwd, xs, w)

    @jax.jit
    def bwd(xs_, w_):
        def body(acc, x_):
            gx, gw = jax.grad(lambda a, ww: jnp.sum(conv(a, ww)),
                              argnums=(0, 1))(x_, w_)
            return acc + jnp.sum(gx) + jnp.sum(gw), None
        return jax.lax.scan(body, jnp.zeros((), jnp.float32), xs_)[0]

    timed(f"{tag} dx+dw ", bwd, xs, w)


probe("conv3x3 b2 256^2 c128 bf16", 2, 256, 128, 128, jnp.bfloat16)
probe("conv3x3 b2 128^2 c256 bf16", 2, 128, 256, 256, jnp.bfloat16)

# lhs-dilated (up=2) conv, trunk shape
def convup(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


key = jax.random.PRNGKey(1)
xs = jax.random.normal(key, (K, 2, 128, 128, 256), jnp.bfloat16)
w = jax.random.normal(key, (3, 3, 256, 128), jnp.bfloat16)


@jax.jit
def fwd_up(xs_, w_):
    def body(acc, x_):
        return acc + jnp.sum(convup(x_, w_)), None
    return jax.lax.scan(body, jnp.zeros((), jnp.float32), xs_)[0]


timed("convup2 b2 128->256 bf16 fwd   ", fwd_up, xs, w)


@jax.jit
def bwd_up(xs_, w_):
    def body(acc, x_):
        gx, gw = jax.grad(lambda a, ww: jnp.sum(convup(a, ww)),
                          argnums=(0, 1))(x_, w_)
        return acc + jnp.sum(gx) + jnp.sum(gw), None
    return jax.lax.scan(body, jnp.zeros((), jnp.float32), xs_)[0]


timed("convup2 b2 128->256 bf16 dx+dw ", bwd_up, xs, w)

# depthwise FIR up=2 (the img-skip upsample)
from hfa_gp_tpu.core import ops  # noqa: E402

k = ops.make_fir_kernel([1, 3, 3, 1])
xs = jax.random.normal(key, (K, 2, 128, 128, 96), jnp.float32)


@jax.jit
def fir_f(xs_):
    def body(acc, x_):
        return acc + jnp.sum(ops.upsample2d(x_, k)), None
    return jax.lax.scan(body, jnp.zeros((), jnp.float32), xs_)[0]


timed("fir up2 b2 128^2 c96 fwd", fir_f, xs)


@jax.jit
def fir_b(xs_):
    def body(acc, x_):
        gx = jax.grad(lambda a: jnp.sum(ops.upsample2d(a, k)))(x_)
        return acc + jnp.sum(gx), None
    return jax.lax.scan(body, jnp.zeros((), jnp.float32), xs_)[0]


timed("fir up2 b2 128^2 c96 dx ", fir_b, xs)
