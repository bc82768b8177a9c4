"""Componentized RGB train-step profile at the REAL training config
(windowed Pallas sampler, bf16 trunks) — locates where the 307 ms
batch-2 step goes (r3). Pipelined timing: ITERS dispatches, one drain.

Components (each fwd+bwd via value_and_grad of a scalarized loss):
  synthesis  — latent → image (the EG3D generator, sampler VJP)
  lpips      — perceptual loss on 512² pairs
  encoder    — image → weights head
  full       — the actual train step (train/rgb.make_train_step)

Usage: python tools/profile_train2.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models import lpips as lpips_mod
from hfa_gp_tpu.models.avatar import heads
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig, synthesis
from hfa_gp_tpu.models.eg3d.renderer import RenderConfig
from hfa_gp_tpu.train import rgb as rgb_train
from hfa_gp_tpu.train.state import init_state, make_optimizer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 10

cfg = heads.AvatarConfig(eg3d=EG3DConfig(
    compute_dtype=jnp.bfloat16,
    render=RenderConfig(use_pallas_sampler=True,
                        decoder_dtype=jnp.bfloat16)))
params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg)
lp = lpips_mod.init_lpips(jax.random.PRNGKey(1))
img = jax.random.uniform(jax.random.PRNGKey(2),
                         (B, cfg.size, cfg.size, 3),
                         minval=-1, maxval=1)
label = jnp.tile(camera.flip_yz_label(
    camera.sample_camera_label(None, n=1, mode=None)), (B, 1))


def timed(name, fn, *a):
    t0 = time.perf_counter()
    v = float(fn(*a))
    print(f"{name} compile+1: {time.perf_counter() - t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.1f} ms  (last={v:.4f})", flush=True)


# synthesis fwd only
lat = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.eg3d.num_ws, 512))
syn_f = jax.jit(lambda l: jnp.mean(jnp.abs(
    synthesis(params["generator"], cfg.eg3d, l, label)["image"])))
timed("synthesis fwd", syn_f, lat)

# synthesis fwd+bwd (wrt latent AND generator params — grads of params
# exercise the sampler scatter into planes like the real step)
@jax.jit
def syn_g(l):
    g = jax.grad(lambda gp, l_: jnp.mean(jnp.abs(
        synthesis(gp, cfg.eg3d, l_, label)["image"])))(
        params["generator"], l)
    # drain INSIDE the jit — per-leaf eager sums cost ~2 ms tunnel
    # dispatch each; summing every leaf defeats DCE (CLAUDE.md)
    return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))


timed("synthesis fwd+bwd", syn_g, lat)

# lpips fwd+bwd
a = jax.random.uniform(jax.random.PRNGKey(4),
                       (B, cfg.size, cfg.size, 3), minval=-1, maxval=1)
img512 = jax.random.uniform(jax.random.PRNGKey(6),
                            (B, cfg.size, cfg.size, 3),
                            minval=-1, maxval=1)
lp_g = jax.jit(jax.grad(lambda x: jnp.mean(
    lpips_mod.lpips_distance(lp, x, img512))))
timed("lpips fwd+bwd", lambda x: jnp.sum(jnp.abs(lp_g(x))), a)

# encoder fwd+bwd
enc_g = jax.jit(jax.grad(lambda x: jnp.mean(jnp.abs(
    heads.rgb_get_weights(params, cfg, x)))))
timed("encoder fwd+bwd", lambda x: jnp.sum(jnp.abs(enc_g(x))), img)

# the full train step
tx = make_optimizer(3e-4)
state = init_state(params, tx)
step = rgb_train.make_train_step(cfg, tx, tune_iter=10**6, donate=False)


def full(s):
    s2, m = step(s, lp, img, label)
    return m["loss"]


timed("full train step", full, state)
