"""Raw conv forward/dx/dw timings at trunk shapes (r3: backbone bwd is
15x fwd inside one jit — is XLA's conv backward itself the problem?).

Each variant is ONE jit dispatched ITERS times with a single trailing
drain, so the tunnel RTT amortizes to RTT/ITERS.

Usage: python tools/probe_conv_bwd.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = 50


def timed(name, fn, *a):
    fn(*a)
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def probe(tag, b, h, c1, c2, dt):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, h, c1), dt)
    w = jax.random.normal(key, (3, 3, c1, c2), dt)

    f = jax.jit(lambda x_, w_: jnp.sum(conv(x_, w_)))
    timed(f"{tag} fwd", f, x, w)

    gx = jax.jit(lambda x_, w_: jnp.sum(
        jax.grad(lambda a: jnp.sum(conv(a, w_)))(x_)))
    timed(f"{tag} dx ", gx, x, w)

    gw = jax.jit(lambda x_, w_: jnp.sum(
        jax.grad(lambda a: jnp.sum(conv(x_, a)))(w_)))
    timed(f"{tag} dw ", gw, x, w)

    gb = jax.jit(lambda x_, w_: sum(
        jnp.sum(t) for t in jax.grad(
            lambda a, bw: jnp.sum(conv(a, bw)), argnums=(0, 1))(x_, w_)))
    timed(f"{tag} dx+dw", gb, x, w)


probe("conv3x3 b2 256^2 c128 bf16", 2, 256, 128, 128, jnp.bfloat16)
probe("conv3x3 b8 256^2 c128 bf16", 8, 256, 128, 128, jnp.bfloat16)
probe("conv3x3 b2 256^2 c128 fp32", 2, 256, 128, 128, jnp.float32)
probe("conv3x3 b2 128^2 c256 bf16", 2, 128, 256, 256, jnp.bfloat16)

# depthwise FIR (up=2) backward
from hfa_gp_tpu.core import ops  # noqa: E402

key = jax.random.PRNGKey(1)
x = jax.random.normal(key, (2, 128, 128, 96), jnp.float32)
k = ops.make_fir_kernel([1, 3, 3, 1])
f = jax.jit(lambda x_: jnp.sum(ops.upsample2d(x_, k)))
timed("fir up2 b2 128^2 c96 fwd", f, x)
g = jax.jit(lambda x_: jnp.sum(
    jax.grad(lambda a: jnp.sum(ops.upsample2d(a, k)))(x_)))
timed("fir up2 b2 128^2 c96 dx ", g, x)
