"""TRUE component breakdown (pipelined timing: N dispatches, one drain
— subtracts the axon tunnel's ~33 ms round-trip floor)."""
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

B = int(os.environ.get("B", 8))


def timeit(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    v = float(fn(*args)[1])
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    v = float(out[1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:7.1f} ms/iter (pipelined x{iters}; "
          f"compile {c:.0f}s val {v:.0f})", flush=True)


def main():
    cfg = EG3DConfig(compute_dtype=jnp.bfloat16)
    rcfg = dataclasses.replace(cfg.render, use_pallas_sampler=True,
                               sampler_group=8)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    ws = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.num_ws, 512))
    label = jnp.tile(camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None)), (B, 1))

    bb = jax.jit(lambda p, w: nets.backbone_apply(
        p["backbone"], cfg.backbone, w, compute_dtype=jnp.bfloat16))
    timeit("backbone", jax.jit(
        lambda p, w: (0, jnp.sum(jnp.abs(bb(p, w))))), params, ws)

    planes_img = bb(params, ws)
    planes = jnp.transpose(planes_img.reshape(B, 256, 256, 3, 32),
                           (0, 3, 1, 2, 4))
    c2w, intr = camera.unpack_label(label)
    ro, rd = camera.generate_rays(c2w, intr, 128)
    depths = jnp.linspace(2.25, 3.3, 48)[None, None, :, None]
    pts = (ro[:, :, None, :] + depths * rd[:, :, None, :]).reshape(B, -1, 3)

    def sample_only(planes, pts):
        plan, txy, org, _ = tpl.plan_blocks(
            pts, rnd._PLANE_INV, 1.0, res=128, n_depth=48, plane_hw=256,
            tile=16, depth_window=4, slab=(40, 48))
        pq = tpl.quad_pack_planes(planes.astype(jnp.bfloat16))
        out = tpl.sample_blocked(plan, txy, org, pq, group=8)
        return 0, jnp.sum(jnp.abs(out))
    timeit("plan+pack+sample (1 pass)", jax.jit(sample_only), planes, pts)

    def render(p, planes, ro, rd):
        f, d, w = rnd.render_rays(p["decoder"], rcfg, planes, ro, rd)
        return 0, jnp.sum(jnp.abs(f))
    timeit("render_rays (both passes)", jax.jit(render), params, planes,
           ro, rd)

    feat_img = jax.random.normal(jax.random.PRNGKey(7), (B, 128, 128, 32))
    rgb = feat_img[..., :3]
    timeit("superres", jax.jit(lambda p, r_, x, w: (0, jnp.sum(jnp.abs(
        nets.superresolution_apply(p["superresolution"], cfg.sr, r_, x, w,
                                   compute_dtype=jnp.bfloat16))))),
        params, rgb, feat_img, ws)


if __name__ == "__main__":
    main()
