"""End-to-end synthesis timing: XLA row-gather vs Pallas windowed
sampler, plus bf16 decoder, on the flagship 512² config (batch 4)."""
import sys

sys.path.insert(0, "/root/repo")
import dataclasses
import time

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models.eg3d.generator import (EG3DConfig, init_generator,
                                              synthesis)

import os
B = int(os.environ.get('B', 4))


def timeit(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    v = float(fn(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:7.1f} ms  ({B/dt:.2f} fps/chip at batch {B}; "
          f"compile {c:.0f}s val {v:.0f})", flush=True)


def run(name, cfg):
    params = init_generator(jax.random.PRNGKey(0), cfg)
    ws = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.num_ws, 512))
    label = jnp.tile(camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None)), (B, 1))
    full = jax.jit(
        lambda p, w, c: jnp.sum(jnp.abs(synthesis(p, cfg, w, c)["image"])))
    timeit(name, full, params, ws, label)


def main():
    base = EG3DConfig(compute_dtype=jnp.bfloat16)
    if B <= 4:
        run("xla row-gather        ", base)
    for grp, fine, name in [
            (8, "stratified", "pallas stratified fine (exact)"),
            (8, "pallas", "pallas ref-placement fine     ")]:
        cfg = dataclasses.replace(base, render=dataclasses.replace(
            base.render, use_pallas_sampler=True, sampler_group=grp,
            sampler_fine=fine, decoder_dtype=jnp.bfloat16))
        run(name, cfg)


if __name__ == "__main__":
    main()
