"""A/B the windowed-sampler plane dtype on the flagship synthesis path.

bf16 planes need 16-texel-aligned slab x-origins (Mosaic HBM tiling);
fp32 planes admit 8 — so at IDENTICAL guaranteed footprint coverage the
fp32 slab is 8 texels narrower (triplane.effective_slab), cutting
K4 = Sy/4·Sx, the VPU weight-build AND MXU contraction length, by ~17%
at the default (40, 48) → (40, 40). The trade is 2× slab DMA bytes.
This measures which wins end-to-end at batches 8/16, pipelined timing
(dispatch N, drain one scalar — CLAUDE.md tunnel rules).

Usage: python tools/profile_fp32slab.py [batches...]
"""
import sys

sys.path.insert(0, "/root/repo")
import dataclasses
import time

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models.eg3d.generator import (EG3DConfig, init_generator,
                                              synthesis)

ITERS = 10


def bench(name, b, cfg):
    params = init_generator(jax.random.PRNGKey(0), cfg)
    ws = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.num_ws, 512))
    label = jnp.tile(camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None)), (b, 1))
    full = jax.jit(
        lambda p, w, c: jnp.sum(jnp.abs(synthesis(p, cfg, w, c)["image"])))
    t0 = time.perf_counter()
    v = float(full(params, ws, label))  # compile + warm
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = full(params, ws, label)
    v = float(out)  # one drain gates all queued programs
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name} b={b}: {dt*1000:7.1f} ms/batch = {b/dt:5.2f} fps/chip "
          f"(compile {comp:.0f}s val {v:.0f})", flush=True)


def main():
    batches = [int(x) for x in sys.argv[1:]] or [8, 16]
    base = EG3DConfig(compute_dtype=jnp.bfloat16)
    for b in batches:
        for dt, name in [(jnp.bfloat16, "bf16 slab(40,48)"),
                         (jnp.float32, "fp32 slab(40,40)")]:
            cfg = dataclasses.replace(base, render=dataclasses.replace(
                base.render, use_pallas_sampler=True, sampler_group=8,
                decoder_dtype=jnp.bfloat16, sampler_dtype=dt))
            bench(name, b, cfg)


if __name__ == "__main__":
    main()
