"""Sampler backward: VMEM-accumulator vs HBM-RMW kernel, measured at
the real training shapes (r3). Pipelined timing: N dispatches, one
trailing scalar drain (CLAUDE.md tunnel rules).

Usage: python tools/bench_bwd3.py [batch]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hfa_gp_tpu.core.pallas import triplane as tp
from hfa_gp_tpu.models.eg3d import renderer as rnd

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
HW, C = 256, 32
RES, ND, TILE, DW = 128, 48, 16, 4
ITERS = 20


def timed(name, fn, *args):
    fn(*args)  # compile
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*args)
    out = fn(*args)
    _ = float(out)             # one trailing drain gates the queue
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)
    return dt


def run(slab, label):
    key = jax.random.PRNGKey(0)
    kp, kc, kg = jax.random.split(key, 3)
    planes = jax.random.normal(kp, (B, 3, HW, HW, C), jnp.float32)
    # geometry-shaped coords: front camera ray grid
    from hfa_gp_tpu.core import camera
    lab = camera.flip_yz_label(camera.sample_camera_label(
        None, n=B, mode=None))
    intr = np.asarray(lab[:, 16:]).reshape(B, 3, 3)
    extr = np.asarray(lab[:, :16]).reshape(B, 4, 4)
    ro, rd = camera.generate_rays(jnp.asarray(extr), jnp.asarray(intr),
                                  RES)
    depths = jnp.linspace(2.25, 3.3, ND)
    pts = (ro[:, :, None, :]
           + depths[None, None, :, None] * rd[:, :, None, :])
    coords = pts.reshape(B, -1, 3)

    plan, txy, origins, ovf = tp.plan_blocks(
        coords, rnd._PLANE_INV, 1.0, res=RES, n_depth=ND, plane_hw=HW,
        tile=TILE, depth_window=DW, slab=slab)
    print(f"[{label}] nb={plan.n_blocks} P={plan.points} slab={slab} "
          f"overflow={float(jnp.mean(ovf.astype(jnp.float32))):.4f}",
          flush=True)
    pq = tp.quad_pack_planes(planes.astype(jnp.bfloat16))
    g = jax.random.normal(kg, (plan.n_blocks, C, plan.points),
                          jnp.float32)

    fwd = jax.jit(lambda t_, o_, p_: jnp.sum(
        tp._sample_blocked_impl(plan, t_, o_, p_, group=4)))
    bwd_v = jax.jit(lambda t_, o_, g_: jnp.sum(
        tp._sample_blocked_bwd_vmem(plan, t_, o_, g_, pq.shape,
                                    group=4, interpret=False)))
    bwd_h = jax.jit(lambda t_, o_, g_: jnp.sum(
        tp._sample_blocked_bwd_hbm(plan, t_, o_, g_, pq.shape,
                                   group=4, interpret=False)))

    timed(f"[{label}] fwd", fwd, txy, origins, pq)
    timed(f"[{label}] bwd vmem", bwd_v, txy, origins, g)
    timed(f"[{label}] bwd hbm", bwd_h, txy, origins, g)


run((40, 48), "coarse")
run((64, 80), "fine-slab")
