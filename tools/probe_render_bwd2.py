"""Surgical ablations of the full windowed render bwd (r3): replace one
piece at a time with a shape-identical stub and watch the fwd+bwd time.
Usage: python tools/probe_render_bwd2.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

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


def run(name):
    def full_loss(pl_):
        f, d, w = rnd._render_core_windowed(dec, cfg, pl_, ro, rd, None)
        return jnp.mean(jnp.abs(f))

    @jax.jit
    def full_g(pl_):
        return jnp.sum(jnp.abs(jax.grad(full_loss)(pl_)))

    timed(name, full_g, planes)


run("full fwd+bwd (baseline)")

# --- A: merge -> plain concat (no rank one-hot)
orig_unify = rnd.unify_samples


def concat_unify(d1, c1, s1, d2, c2, s2, **kw):
    return (jnp.concatenate([d1, d2], axis=-2),
            jnp.concatenate([c1, c2], axis=-2),
            jnp.concatenate([s1, s2], axis=-2))


rnd.unify_samples = concat_unify
run("A: merge->concat")
rnd.unify_samples = orig_unify

# --- B: importance depths -> fixed linspace (kills CDF machinery and
# the coarse-weights march feed; merge still runs)
orig_imp = rnd.sample_importance_windowed


def fixed_imp(z_vals, weights, n_windows, n_per, ray_start, ray_end,
              rng=None):
    b, r, n, _ = z_vals.shape
    d = jnp.linspace(ray_start + 1e-3, ray_end - 1e-3, n_windows * n_per)
    return jnp.broadcast_to(d[None, None, :, None],
                            (b, r, n_windows * n_per, 1))


rnd.sample_importance_windowed = fixed_imp
run("B: importance->linspace")
rnd.sample_importance_windowed = orig_imp

# --- C: final march -> mean composite (kills cumprod bwd)
orig_march = rnd.ray_march
calls = {"n": 0}


def mean_march(colors, densities, depths, cfg_):
    rgb = jnp.mean(colors[:, :, :-1] * jax.nn.softplus(
        densities[:, :, :-1] - 1.0), axis=-2) * 2 - 1
    w = jnp.mean(densities, axis=-2, keepdims=True) \
        * jnp.ones_like(depths[:, :, :-1])
    return rgb, jnp.mean(depths, axis=-2), w


rnd.ray_march = mean_march
run("C: march->mean")
rnd.ray_march = orig_march

# --- D: A+B+C together
rnd.unify_samples = concat_unify
rnd.sample_importance_windowed = fixed_imp
rnd.ray_march = mean_march
run("D: concat+linspace+meanmarch")
rnd.unify_samples = orig_unify
rnd.sample_importance_windowed = orig_imp
rnd.ray_march = orig_march
