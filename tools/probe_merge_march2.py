"""Fix candidates for the merge+march bwd composition blow-up
(probe_merge_march: pair fwd 11 ms, fwd+bwd 157.8; march-only 7.0,
merge-only 13.6 — ~137 ms is interaction). Hypothesis: with the march's
inputs produced by the one-hot merge einsum (a dot, so not cheaply
rematerializable), XLA materializes the march's backward residuals —
all (B,R,N,1)-minor tensors, 128x lane padding — instead of recomputing
them as it does when the march consumes plain function args.

Candidates:
  R: jax.checkpoint(ray_march)  — store only the march INPUTS (already
     materialized as the einsum output); recompute the elementwise
     march in the bwd so residuals fuse instead of materializing.
  T: channel-first march (transpose N to minor before marching).

Usage: python tools/probe_merge_march2.py [batch]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import camera as cam
from hfa_gp_tpu.models.avatar import heads
from hfa_gp_tpu.models.eg3d import renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 10

acfg = heads.AvatarConfig(eg3d=EG3DConfig(
    compute_dtype=jnp.bfloat16,
    render=rnd.RenderConfig(use_pallas_sampler=True,
                            decoder_dtype=jnp.bfloat16)))
cfg = acfg.eg3d.render
params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg=acfg)
dec = params["generator"]["decoder"]
res = cfg.neural_rendering_resolution
label = jnp.tile(cam.flip_yz_label(
    cam.sample_camera_label(None, n=1, mode=None)), (B, 1))
c2w, intr = cam.unpack_label(label)
ro, rd = cam.generate_rays(c2w, intr, res)
planes = jax.random.normal(jax.random.PRNGKey(1),
                           (B, 3, 256, 256, 32), jnp.float32)


def timed(name, fn, *a):
    t0 = time.perf_counter()
    v = float(fn(*a))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.1f} ms  (compile {c:.0f}s)", flush=True)


R = res * res
N1 = cfg.depth_resolution
N2 = cfg.depth_resolution_importance
k = jax.random.PRNGKey(2)
d1 = jnp.sort(jax.random.uniform(k, (B, R, N1, 1), minval=2.2,
                                 maxval=3.3), axis=-2)
d2 = jnp.sort(jax.random.uniform(jax.random.fold_in(k, 1),
                                 (B, R, N2, 1), minval=2.2,
                                 maxval=3.3), axis=-2)
c1 = jax.random.normal(jax.random.fold_in(k, 2), (B, R, N1, 32))
c2 = jax.random.normal(jax.random.fold_in(k, 3), (B, R, N2, 32))
s1 = jax.random.normal(jax.random.fold_in(k, 4), (B, R, N1, 1))
s2 = jax.random.normal(jax.random.fold_in(k, 5), (B, R, N2, 1))

march_remat = jax.checkpoint(partial(rnd.ray_march, cfg=cfg))


def pair_loss(c1_, s1_, c2_, s2_, marcher):
    d, c, s = rnd.unify_samples(d1, c1_, s1_, d2, c2_, s2_,
                                sorted_inputs=True)
    rgb, dep, w = marcher(c, s, d)
    return jnp.mean(jnp.abs(rgb)) + jnp.mean(jnp.abs(dep))


def grad_of(marcher):
    @jax.jit
    def g(c1_, s1_, c2_, s2_):
        gr = jax.grad(pair_loss, argnums=(0, 1, 2, 3))(
            c1_, s1_, c2_, s2_, marcher)
        return sum(jnp.sum(jnp.abs(x)) for x in gr)
    return g


timed("pair fwd+bwd (remat march)", grad_of(march_remat), c1, s1, c2, s2)

# ---- full render with the remat march ----
orig_march = rnd.ray_march


def remat_march_global(colors, densities, depths, cfg_):
    return jax.checkpoint(partial(orig_march, cfg=cfg_))(
        colors, densities, depths)


def full_loss(pl_):
    f, d, w = rnd._render_core_windowed(dec, cfg, pl_, ro, rd, None)
    return jnp.mean(jnp.abs(f))


@jax.jit
def full_g(pl_):
    return jnp.sum(jnp.abs(jax.grad(full_loss)(pl_)))


rnd.ray_march = remat_march_global
timed("full fwd+bwd (remat march)", full_g, planes)
rnd.ray_march = orig_march

# grad parity: remat vs plain (same math, must match to fp tolerance)
g_plain = jax.jit(lambda *a: jax.grad(pair_loss, argnums=(0, 1, 2, 3))(
    *a, orig_march and (lambda c, s, d: orig_march(c, s, d, cfg))))
g_remat = jax.jit(lambda *a: jax.grad(pair_loss, argnums=(0, 1, 2, 3))(
    *a, march_remat))
ga = g_plain(c1, s1, c2, s2)
gb = g_remat(c1, s1, c2, s2)
err = max(float(jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(x)) + 1e-12))
          for x, y in zip(ga, gb))
print(f"remat grad parity: max rel err {err:.2e}", flush=True)
