"""Bisect the windowed-render BACKWARD below the stage level (r3:
render fwd 50 ms, fwd+bwd 219 ms at batch 2; raw sampler bwd kernels
are only ~23 ms — where are the other ~145 ms?).

Pieces (each fwd and fwd+bwd, pipelined in-process timing):
  eval      planes → (rgb, sigma) at fixed coarse depths
            (plan + quad-pack + sampler kernel + mean + decoder +
             unblock + squash) — the eval_points closure
  march     (colors, densities, depths) → composite
  merge     rank-merge of two sorted sample lists
Usage: python tools/probe_render_bwd.py [batch]
"""

import sys
import time

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
nd = cfg.depth_resolution
depths = rnd.sample_stratified(ro, cfg.ray_start, cfg.ray_end, nd)


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


# --- eval_points in isolation (reuse the renderer's own closure by
# calling the windowed core with n_fine=0: coarse-only = one eval +
# one march). Then subtract march to get eval.
import dataclasses

cfg0 = dataclasses.replace(cfg, depth_resolution_importance=0)


def eval_march(pl_):
    f, d, w = rnd._render_core_windowed(dec, cfg0, pl_, ro, rd, None)
    return jnp.mean(jnp.abs(f))


timed("eval+march fwd", jax.jit(eval_march), planes)


@jax.jit
def eval_march_g(pl_):
    return jnp.sum(jnp.abs(jax.grad(eval_march)(pl_)))


timed("eval+march fwd+bwd", eval_march_g, planes)

# --- march alone at the unified size (2*nd samples)
n2 = 2 * nd
cols = jax.random.uniform(jax.random.PRNGKey(2), (B, res * res, n2, 32))
dens = jax.random.normal(jax.random.PRNGKey(3), (B, res * res, n2, 1))
dep2 = jnp.sort(jax.random.uniform(jax.random.PRNGKey(4),
                                   (B, res * res, n2, 1),
                                   minval=2.25, maxval=3.3), axis=2)


def march_loss(c_, d_):
    rgb, dd, w = rnd.ray_march(c_, d_, dep2, cfg)
    return jnp.mean(jnp.abs(rgb)) + jnp.mean(jnp.abs(w))


timed("march(96) fwd", jax.jit(march_loss), cols, dens)


@jax.jit
def march_g(c_, d_):
    g0, g1 = jax.grad(march_loss, argnums=(0, 1))(c_, d_)
    return jnp.sum(jnp.abs(g0)) + jnp.sum(jnp.abs(g1))


timed("march(96) fwd+bwd", march_g, cols, dens)

# --- rank merge alone
d1 = depths
d2 = dep2[:, :, :nd] * 0 + d1  # sorted like d1
c1 = cols[:, :, :nd]
s1 = dens[:, :, :nd]


def merge_loss(c_, s_):
    dd, cc, ss = rnd.unify_samples(d1, c_, s_, d1 + 1e-3, c_, s_,
                                   sorted_inputs=True)
    return jnp.mean(jnp.abs(cc)) + jnp.mean(jnp.abs(ss))


timed("merge fwd", jax.jit(merge_loss), c1, s1)


@jax.jit
def merge_g(c_, s_):
    g0, g1 = jax.grad(merge_loss, argnums=(0, 1))(c_, s_)
    return jnp.sum(jnp.abs(g0)) + jnp.sum(jnp.abs(g1))


timed("merge fwd+bwd", merge_g, c1, s1)

# --- ablation: one 96-depth coarse-only pass = same total points and
# march size as the full coarse+fine pipeline; the full-minus-this
# difference isolates {coarse-weights march, CDF machinery, merge,
# second-pass overhead} in fwd AND bwd.
cfg96 = dataclasses.replace(cfg, depth_resolution=2 * nd,
                            depth_resolution_importance=0)


def eval96(pl_):
    f, d, w = rnd._render_core_windowed(dec, cfg96, pl_, ro, rd, None)
    return jnp.mean(jnp.abs(f))


timed("eval96+march fwd", jax.jit(eval96), planes)


@jax.jit
def eval96_g(pl_):
    return jnp.sum(jnp.abs(jax.grad(eval96)(pl_)))


timed("eval96+march fwd+bwd", eval96_g, planes)


# --- the full pipeline (coarse+fine+merge), as profile_bwd2 measures
def full_loss(pl_):
    f, d, w = rnd._render_core_windowed(dec, cfg, pl_, ro, rd, None)
    return jnp.mean(jnp.abs(f))


timed("full fwd", jax.jit(full_loss), planes)


@jax.jit
def full_g(pl_):
    return jnp.sum(jnp.abs(jax.grad(full_loss)(pl_)))


timed("full fwd+bwd", full_g, planes)
