"""Bisect the windowed render fwd/bwd by pipeline stage (r3: render is
62 ms fwd / 168 ms bwd at batch 2 — the kernels account for ~30 ms;
find the rest). Each stage is one jit; grads wrt planes (the training
path); drains inside the jit.

Usage: python tools/probe_render.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import camera as cam
from hfa_gp_tpu.core.pallas import triplane as tpl
from hfa_gp_tpu.models.eg3d import renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 10

cfg0 = EG3DConfig(render=rnd.RenderConfig(use_pallas_sampler=True,
                                          decoder_dtype=jnp.bfloat16))
cfg = cfg0.render
res = cfg.neural_rendering_resolution
label = jnp.tile(cam.flip_yz_label(
    cam.sample_camera_label(None, n=1, mode=None)), (B, 1))
c2w, intr = cam.unpack_label(label)
ro, rd = cam.generate_rays(c2w, intr, res)
planes = jax.random.normal(jax.random.PRNGKey(0),
                           (B, 3, 256, 256, 32), jnp.float32) * 0.3
dec = {"fc0": {"weight": jax.random.normal(jax.random.PRNGKey(1),
                                           (64, 32)) * 0.3,
               "bias": jnp.zeros((64,))},
       "fc1": {"weight": jax.random.normal(jax.random.PRNGKey(2),
                                           (33, 64)) * 0.3,
               "bias": jnp.zeros((33,))}}


def timed(name, fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.1f} ms (compile {c:.0f}s)", flush=True)


depths = rnd.sample_stratified(ro, cfg.ray_start, cfg.ray_end,
                               cfg.depth_resolution)
n = cfg.depth_resolution
pts = (ro[:, :, None, :] + depths * rd[:, :, None, :]).reshape(B, -1, 3)


def stage_loss(pl_, upto):
    pq = tpl.quad_pack_planes(pl_.astype(jnp.bfloat16))
    plan, txy, origins, _ = tpl.plan_blocks(
        pts, rnd._PLANE_INV, cfg.box_warp, res=res, n_depth=n,
        plane_hw=256, tile=cfg.sampler_tile,
        depth_window=cfg.sampler_depth_window, slab=cfg.sampler_slab)
    blocked = tpl.sample_blocked(plan, txy, origins, pq,
                                 group=cfg.sampler_group)
    if upto == "sample":
        return jnp.mean(jnp.abs(blocked))
    nbp = plan.n_blocks // (B * 3)
    feats = blocked.reshape(B, 3, nbp, 32, plan.points).mean(axis=1)
    if upto == "mean":
        return jnp.mean(jnp.abs(feats))
    y = rnd.decoder_apply_cp(dec, cfg, feats)
    if upto == "decoder":
        return jnp.mean(jnp.abs(y.astype(jnp.float32)))
    y = tpl._unblock_feats(y.reshape(B * nbp, -1, plan.points), plan, B)
    y = y.reshape(B, res * res, n, -1).astype(jnp.float32)
    if upto == "unblock":
        return jnp.mean(jnp.abs(y))
    sigma = y[..., 0:1]
    rgb = jax.nn.sigmoid(y[..., 1:]) * 1.002 - 0.001
    r_, d_, w_ = rnd.ray_march(rgb, sigma, depths, cfg)
    return jnp.mean(jnp.abs(r_)) + jnp.mean(w_)


for upto in ("sample", "mean", "decoder", "unblock", "march"):
    f = jax.jit(lambda p, u=upto: stage_loss(p, u))
    timed(f"coarse→{upto:8s} fwd", f, planes)

    @jax.jit
    def g(p, u=upto):
        return jnp.sum(jnp.abs(jax.grad(
            lambda q: stage_loss(q, u))(p)))

    timed(f"coarse→{upto:8s} f+b", g, planes)

# the full render (coarse+fine+unify) for reference
full_f = jax.jit(lambda p: jnp.mean(jnp.abs(rnd.render_rays(
    dec, cfg, p, ro, rd, rng=None)[0])))
timed("full render fwd", full_f, planes)


@jax.jit
def full_g(p):
    return jnp.sum(jnp.abs(jax.grad(lambda q: jnp.mean(jnp.abs(
        rnd.render_rays(dec, cfg, q, ro, rd, rng=None)[0])))(p)))


timed("full render f+b", full_g, planes)
