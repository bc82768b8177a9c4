"""Component breakdown of the windowed-sampler synthesis path."""
import sys

sys.path.insert(0, "/root/repo")
import dataclasses
import os
import time

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import camera
from hfa_gp_tpu.core.pallas import triplane as tpl
from hfa_gp_tpu.models.eg3d import networks as nets
from hfa_gp_tpu.models.eg3d import renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig, init_generator

B = int(os.environ.get("B", 4))


def timeit(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    v = float(fn(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:7.1f} ms (compile {c:.0f}s val {v:.0f})",
          flush=True)


def main():
    cfg = EG3DConfig(compute_dtype=jnp.bfloat16)
    rcfg = dataclasses.replace(cfg.render, use_pallas_sampler=True,
                               sampler_group=4)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    ws = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.num_ws, 512))
    label = jnp.tile(camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None)), (B, 1))

    bb = jax.jit(lambda p, w: nets.backbone_apply(
        p["backbone"], cfg.backbone, w, compute_dtype=jnp.bfloat16))
    timeit("backbone", lambda p, w: jnp.sum(jnp.abs(bb(p, w))), params, ws)

    planes_img = bb(params, ws)
    planes = jnp.transpose(planes_img.reshape(B, 256, 256, 3, 32),
                           (0, 3, 1, 2, 4))
    c2w, intr = camera.unpack_label(label)
    ro, rd = camera.generate_rays(c2w, intr, 128)
    depths = jnp.linspace(2.25, 3.3, 48)[None, None, :, None]
    pts = (ro[:, :, None, :] + depths * rd[:, :, None, :]).reshape(B, -1, 3)

    def plan_only(pts):
        plan, txy, org, _ = tpl.plan_blocks(
            pts, rnd._PLANE_INV, 1.0, res=128, n_depth=48, plane_hw=256,
            tile=16, depth_window=4, slab=(40, 48))
        return jnp.sum(txy) + jnp.sum(org)
    timeit("plan_blocks (prepass)", jax.jit(plan_only), pts)

    def quadpack(planes):
        return jnp.sum(jnp.abs(
            tpl.quad_pack_planes(planes.astype(jnp.bfloat16))
            .astype(jnp.float32)))
    timeit("quad_pack_planes", jax.jit(quadpack), planes)

    def sample_only(planes, pts):
        plan, txy, org, _ = tpl.plan_blocks(
            pts, rnd._PLANE_INV, 1.0, res=128, n_depth=48, plane_hw=256,
            tile=16, depth_window=4, slab=(40, 48))
        pq = tpl.quad_pack_planes(planes.astype(jnp.bfloat16))
        out = tpl.sample_blocked(plan, txy, org, pq, group=4)
        return jnp.sum(jnp.abs(out))
    timeit("plan+pack+sample (1 pass)", jax.jit(sample_only), planes, pts)

    def render(p, planes, ro, rd):
        f, d, w = rnd.render_rays(p["decoder"], rcfg, planes, ro, rd)
        return jnp.sum(jnp.abs(f))
    timeit("render_rays (full, 2 passes)", jax.jit(render), params, planes,
           ro, rd)

    feat_img = jax.random.normal(jax.random.PRNGKey(7), (B, 128, 128, 32))
    rgb = feat_img[..., :3]
    sr = jax.jit(lambda p, rgb, x, w: jnp.sum(jnp.abs(
        nets.superresolution_apply(p["superresolution"], cfg.sr, rgb, x, w,
                                   compute_dtype=jnp.bfloat16))))
    timeit("superres", sr, params, rgb, feat_img, ws)


def parts():
    cfg = EG3DConfig(compute_dtype=jnp.bfloat16)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    rcfg = cfg.render
    key = jax.random.PRNGKey(3)
    R, N = 128 * 128, 48
    d1 = jnp.sort(jax.random.uniform(key, (B, R, N, 1), minval=2.25,
                                     maxval=3.3), axis=2)
    d2 = jnp.sort(jax.random.uniform(key, (B, R, N, 1), minval=2.25,
                                     maxval=3.3), axis=2)
    c1 = jax.random.normal(key, (B, R, N, 32))
    s1 = jax.random.normal(key, (B, R, N, 1))
    w1 = jax.nn.softplus(jax.random.normal(key, (B, R, N - 1, 1)))

    def unify(d1, c1, s1, d2):
        d, c, s = rnd.unify_samples(d1, c1, s1, d2, c1, s1)
        return jnp.sum(jnp.abs(c)) + jnp.sum(d) + jnp.sum(s)
    timeit("unify_samples (sort-merge 96)", jax.jit(unify), d1, c1, s1, d2)

    def march(c1, s1, d1):
        r_, dd, w_ = rnd.ray_march(c1, s1, d1, rcfg)
        return jnp.sum(jnp.abs(r_))
    timeit("ray_march 48", jax.jit(march), c1, s1, d1)

    def imp(d1, w1):
        f = rnd.sample_importance(d1, w1, 48)
        return jnp.sum(f)
    timeit("sample_importance", jax.jit(imp), d1, w1)

    blocked = jax.random.normal(key, (B * 3 * 64 * 12, 32, 1024))

    def dec(blocked):
        nbp = 64 * 12
        x = blocked.reshape(B, 3, nbp, 32, 1024).mean(axis=1)
        y = rnd.decoder_apply_cp(params["decoder"], rcfg, x)
        return jnp.sum(jnp.abs(y))
    timeit("plane-mean + decoder_cp", jax.jit(dec), blocked)

    plan = tpl.BlockPlan(B * 3 * 64 * 12, 1024, 16, 4, 40, 48, 128, 48,
                         256)
    y33 = jax.random.normal(key, (B * 64 * 12, 33, 1024))

    def unb(y33):
        out = tpl._unblock_feats(y33, plan, B)
        return jnp.sum(jnp.abs(out))
    timeit("unblock 33ch (1 pass)", jax.jit(unb), y33)


if __name__ == "__main__":
    parts()
