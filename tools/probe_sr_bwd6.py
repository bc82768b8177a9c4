"""SR img-chain gap, remat attempts (r5). Barriers and dtype changes
measured neutral-or-worse (probe_sr_bwd5); the overhead is the backward
GRAPH around the torgb taps (probe_sr_bwd4: zero-valued cotangents cost
the same as real ones). Last lever: change what AD saves vs recomputes.

  full           baseline
  remat-sr       jax.checkpoint over the whole SR apply (save nothing:
                 bwd reruns the forward once, then a self-contained bwd)
  remat-layer    jax.checkpoint around each synth_layer (localizes each
                 layer's residuals; taps read the SAVED layer output)
  remat-block    jax.checkpoint around each (conv0, conv1) pair

Usage: python tools/probe_sr_bwd6.py [batch]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import ops
from hfa_gp_tpu.models.eg3d import networks as nets

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 20
DT = jnp.bfloat16

cfg = nets.SRConfig()
params = nets.init_superresolution(jax.random.PRNGKey(0), cfg)
ws = jax.random.normal(jax.random.PRNGKey(3), (B, 14, 512))
feat = jax.random.normal(jax.random.PRNGKey(4), (B, 128, 128, 32),
                         jnp.float32)
w_last3 = jnp.tile(ws[:, -1:, :], (1, 3, 1))


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


def sr_body(sp, f, *, layer_wrap=lambda fn: fn, block_wrap=None):
    x = f.astype(DT)
    img = jnp.transpose(f[..., :3], (0, 3, 1, 2))
    for bname in ("block0", "block1"):
        p = sp[bname]

        def convs(p_, x_):
            x_ = layer_wrap(partial(
                nets.synth_layer_apply, up=2, fir=cfg.fir,
                conv_clamp=cfg.conv_clamp, noise_mode="none"))(
                p_["conv0"], x_, w_last3[:, 0])
            return layer_wrap(partial(
                nets.synth_layer_apply, fir=cfg.fir,
                conv_clamp=cfg.conv_clamp, noise_mode="none"))(
                p_["conv1"], x_, w_last3[:, 1])

        x = (block_wrap(convs) if block_wrap else convs)(p, x)
        y = nets.torgb_apply_cm(p["torgb"], x, w_last3[:, 2],
                                conv_clamp=cfg.conv_clamp)
        img = ops.upsample2d_cm(img, cfg.fir) + y.astype(jnp.float32)
    return jnp.mean(jnp.abs(jnp.transpose(img, (0, 2, 3, 1))))


def grad_sum(loss):
    return jax.jit(lambda sp, f: sum(
        jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(
            jax.grad(loss, argnums=(0, 1))(sp, f))))


timed("full", grad_sum(sr_body), params, feat)
timed("remat-sr", grad_sum(jax.checkpoint(sr_body)), params, feat)
timed("remat-layer",
      grad_sum(partial(sr_body, layer_wrap=jax.checkpoint)), params, feat)
timed("remat-block",
      grad_sum(partial(sr_body, block_wrap=jax.checkpoint)), params, feat)
print("DONE", flush=True)
