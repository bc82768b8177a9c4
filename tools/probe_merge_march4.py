"""Re-measure after the marcher tri-matmul transmittance + argsort
inv_rank fixes: pair fwd+bwd (was 157.8 ms) and full render fwd+bwd
(was 211.6 ms) at batch 2.

Usage: python tools/probe_merge_march4.py [batch]
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


def pair_loss(c1_, s1_, c2_, s2_):
    d, c, s = rnd.unify_samples(d1, c1_, s1_, d2, c2_, s2_,
                                sorted_inputs=True)
    rgb, dep, w = rnd.ray_march(c, s, d, cfg)
    return jnp.mean(jnp.abs(rgb)) + jnp.mean(jnp.abs(dep))


@jax.jit
def pair_g(c1_, s1_, c2_, s2_):
    gr = jax.grad(pair_loss, argnums=(0, 1, 2, 3))(c1_, s1_, c2_, s2_)
    return sum(jnp.sum(jnp.abs(x)) for x in gr)


timed("pair fwd+bwd", pair_g, c1, s1, c2, s2)


def full_loss(pl_):
    f, d, w = rnd._render_core_windowed(dec, cfg, pl_, ro, rd, None)
    return jnp.mean(jnp.abs(f))


fwd = jax.jit(full_loss)
timed("full fwd", fwd, planes)


@jax.jit
def full_g(pl_):
    return jnp.sum(jnp.abs(jax.grad(full_loss)(pl_)))


timed("full fwd+bwd", full_g, planes)
