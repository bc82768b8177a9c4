"""TPU benchmark: windowed MXU sampler vs the XLA packed row-gather.

Workload = one coarse pass of the flagship config: batch 4, 128² rays,
48 depths, 256²×32 planes, real FFHQ camera geometry (radius 2.7,
focal 4.2647). Timing fetches a scalar (axon block_until_ready caveat,
CLAUDE.md)."""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import camera as cam
from hfa_gp_tpu.core.pallas import triplane as tp
from hfa_gp_tpu.models.eg3d import renderer as rnd

B, RES, ND, HW, C = 4, 128, 48, 256, 32


def t(name, fn, *a, iters=5):
    t0 = time.perf_counter(); v = float(fn(*a)); c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*a))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:7.1f} ms   (compile {c:.0f}s, val {v:.1f})",
          flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    kp, kc = jax.random.split(key)
    planes = jax.random.normal(kp, (B, 3, HW, HW, C), jnp.float32) * 0.5

    label = cam.sample_camera_label(kc, n=B, r=2.7,
                                    horizontal_stddev=0.3,
                                    vertical_stddev=0.2, mode="normal")
    c2w, intr = cam.unpack_label(cam.flip_yz_label(label))
    ro, rd = cam.generate_rays(c2w, intr, RES)
    depths = jnp.linspace(2.25, 3.3, ND)
    pts = ro[:, :, None, :] + depths[None, None, :, None] * rd[:, :, None, :]
    coords = pts.reshape(B, -1, 3)

    # overflow stats for candidate configs
    for tile, dw, slab in [(8, 4, (32, 48)), (8, 4, (40, 48)),
                           (16, 4, (40, 48)), (16, 4, (48, 64)),
                           (8, 8, (48, 64)), (16, 8, (64, 80)),
                           (16, 4, (48, 48))]:
        _, _, _, ovf = tp.plan_blocks(
            coords, rnd._PLANE_INV, 1.0, res=RES, n_depth=ND, plane_hw=HW,
            tile=tile, depth_window=dw, slab=slab)
        print(f"tile {tile} dw {dw} slab {slab}: overflow "
              f"{float(jnp.mean(ovf.astype(jnp.float32))):.5f}", flush=True)

    def xla_path(planes, coords):
        packed = rnd.pack_planes(planes)
        f = rnd.sample_from_packed(packed, coords, 1.0, B, HW, HW)
        return jnp.sum(jnp.abs(f))

    t("xla packed row-gather", jax.jit(xla_path), planes, coords)

    for tile, dw, slab, grp, dt in [
            (8, 4, (32, 48), 1, jnp.bfloat16),
            (16, 4, (40, 48), 4, jnp.bfloat16),
            (16, 4, (40, 48), 1, jnp.bfloat16),
            (8, 8, (48, 64), 8, jnp.bfloat16),
            (16, 8, (64, 80), 2, jnp.bfloat16),
            (16, 16, (80, 96), 1, jnp.bfloat16)]:
        def pallas_path(planes, coords, tile=tile, dw=dw, slab=slab,
                        grp=grp, dt=dt):
            f = tp.sample_from_planes_windowed(
                planes, coords, 1.0, rnd._PLANE_INV, res=RES, n_depth=ND,
                tile=tile, depth_window=dw, slab=slab, dtype=dt, group=grp)
            return jnp.sum(jnp.abs(f))
        t(f"pallas t{tile} d{dw} s{slab} g{grp} "
          f"{'bf16' if dt == jnp.bfloat16 else 'f32'}",
          jax.jit(pallas_path), planes, coords)


if __name__ == "__main__":
    main()
