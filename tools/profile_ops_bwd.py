"""Per-op backward probe for the StyleGAN trunk ops (r3: backbone bwd
is 15x fwd — find the op whose TPU backward blows up).

Times fwd and fwd+bwd for each op at the real flagship shapes
(batch 2, bf16): modconv up=1 / up=2, the FIR skip upsample
(depthwise lhs-dilated conv), torgb 1x1, bias_act.

Usage: python tools/profile_ops_bwd.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import ops

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 20
DT = jnp.bfloat16


def timed(name, fn, *a):
    t0 = time.perf_counter()
    v = float(fn(*a))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.2f} ms   (compile+1 {c:.0f}s)", flush=True)


def probe(name, f, x, w, s):
    fwd = jax.jit(lambda x_, w_, s_: jnp.sum(jnp.abs(f(x_, w_, s_))))
    timed(f"{name} fwd", fwd, x, w, s)
    g = jax.jit(jax.grad(
        lambda x_, w_, s_: jnp.sum(jnp.abs(f(x_, w_, s_))),
        argnums=(0, 1, 2)))

    def drain(x_, w_, s_):
        gx, gw, gs = g(x_, w_, s_)
        return jnp.sum(jnp.abs(gx)) + jnp.sum(jnp.abs(gw)) \
            + jnp.sum(jnp.abs(gs))

    timed(f"{name} fwd+bwd", drain, x, w, s)


key = jax.random.PRNGKey(0)

# modconv up=1 at 256^2, 128ch (backbone b256 conv1)
x = jax.random.normal(key, (B, 256, 256, 128), DT)
w = jax.random.normal(key, (3, 3, 128, 128), jnp.float32)
s = jax.random.normal(key, (B, 128), jnp.float32)
probe("modconv up1 256^2 c128", lambda x_, w_, s_: ops.modulated_conv2d(
    x_, w_, s_, padding=1), x, w, s)

# modconv up=2 128->256, 256->128 ch (backbone b256 conv0)
x = jax.random.normal(key, (B, 128, 128, 256), DT)
w = jax.random.normal(key, (3, 3, 256, 128), jnp.float32)
s = jax.random.normal(key, (B, 256), jnp.float32)
probe("modconv up2 128->256 c256->128",
      lambda x_, w_, s_: ops.modulated_conv2d(x_, w_, s_, up=2), x, w, s)

# torgb 1x1 to 96 at 256^2
x = jax.random.normal(key, (B, 256, 256, 128), DT)
w = jax.random.normal(key, (1, 1, 128, 96), jnp.float32)
s = jax.random.normal(key, (B, 128), jnp.float32)
probe("torgb 1x1 256^2 128->96", lambda x_, w_, s_: ops.modulated_conv2d(
    x_, w_, s_, demodulate=False), x, w, s)

# FIR skip upsample: depthwise lhs-dilated conv on the 96-ch img
x = jax.random.normal(key, (B, 128, 128, 96), jnp.float32)
up_f = jax.jit(lambda x_: jnp.sum(jnp.abs(
    ops.upsample2d(x_, ops.make_fir_kernel([1, 3, 3, 1])))))
timed("upfirdn up2 128^2 c96 fwd", up_f, x)
up_g = jax.jit(jax.grad(lambda x_: jnp.sum(jnp.abs(
    ops.upsample2d(x_, ops.make_fir_kernel([1, 3, 3, 1]))))))
timed("upfirdn up2 128^2 c96 fwd+bwd",
      lambda x_: jnp.sum(jnp.abs(up_g(x_))), x)

# bias_act lrelu at 256^2
x = jax.random.normal(key, (B, 256, 256, 128), DT)
b = jax.random.normal(key, (128,), jnp.float32)
ba_f = jax.jit(lambda x_, b_: jnp.sum(jnp.abs(
    ops.bias_act(x_, b_, act="lrelu", clamp=256.0))))
timed("bias_act lrelu fwd", ba_f, x, b)
ba_g = jax.jit(jax.grad(lambda x_, b_: jnp.sum(jnp.abs(
    ops.bias_act(x_, b_, act="lrelu", clamp=256.0))), argnums=(0, 1)))
timed("bias_act lrelu fwd+bwd", lambda x_, b_: sum(
    jnp.sum(jnp.abs(t)) for t in ba_g(x_, b_)), x, b)
