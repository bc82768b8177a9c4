"""Windowed-stratified vs reference fine-placement statistic (VERDICT
r2 #3c).

The TPU-fast default (`sampler_fine="stratified"`) places fine samples
at within-window CDF quantiles; the reference places them at GLOBAL
inverse-CDF quantiles (public EG3D renderer `sample_importance`, called
from code/networks/headnerf.py:112's synthesis path — reproduced
exactly by `sampler_fine="xla"`). This tool renders the SAME random
generators/poses both ways and reports a PSNR-style distribution of the
image delta, so the perf default's quality cost is a measured number,
not a bound argument.

The two variants differ ONLY in the fine-depth placement function —
both render through the exact fp32 XLA sampling backend
(renderer._render_core), so the statistic isolates PLACEMENT from the
Pallas/bf16 sampling deltas (those are bounded separately in
tests/test_pallas_triplane.py). Backend-independent by construction:
runs identically on CPU and TPU.

Usage: python tools/placement_stat.py [n_gen] [size]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import dataclasses
from unittest import mock

import numpy as np


def main():
    n_gen = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    import jax
    import jax.numpy as jnp

    from hfa_gp_tpu.core import camera
    from hfa_gp_tpu.models.eg3d import networks as nets
    from hfa_gp_tpu.models.eg3d import renderer as rnd
    from hfa_gp_tpu.models.eg3d.generator import (EG3DConfig,
                                                  init_generator,
                                                  synthesis)

    base = EG3DConfig(
        backbone=nets.BackboneConfig(img_resolution=256),
        render=rnd.RenderConfig(
            neural_rendering_resolution=size,
            use_pallas_sampler=False))      # exact fp32 XLA backend
    cfg = base
    rcfg = base.render
    dw = rcfg.sampler_depth_window
    n_fine = rcfg.depth_resolution_importance
    assert n_fine % dw == 0

    def windowed_placement(z_vals, weights, n_importance, rng=None):
        # the windowed-stratified policy, shape-compatible with
        # renderer.sample_importance so it can stand in for it
        assert n_importance == n_fine
        return rnd.sample_importance_windowed(
            z_vals, weights, n_windows=n_fine // dw, n_per=dw,
            ray_start=rcfg.ray_start, ray_end=rcfg.ray_end, rng=rng)

    @jax.jit
    def render_ref(params, ws, label):
        return synthesis(params, cfg, ws, label)["image_raw"]

    def render_strat_traced(params, ws, label):
        with mock.patch.object(rnd, "sample_importance",
                               windowed_placement):
            return jax.jit(synthesis, static_argnums=1)(
                params, cfg, ws, label)["image_raw"]

    psnrs = []
    for i in range(n_gen):
        kp, kw, kc = jax.random.split(jax.random.PRNGKey(i), 3)
        params = init_generator(kp, base)
        ws = jax.random.normal(kw, (1, base.num_ws, 512))
        label = camera.flip_yz_label(camera.sample_camera_label(
            kc, n=1, mode="gaussian"))
        label = jnp.asarray(label)
        a = render_strat_traced(params, ws, label)
        b = render_ref(params, ws, label)
        mse = float(jnp.mean((a - b) ** 2))
        psnrs.append(10 * np.log10(4.0 / max(mse, 1e-12)))
        print(f"gen {i}: psnr={psnrs[-1]:.2f} dB", flush=True)

    arr = np.asarray(psnrs)
    print(f"stratified-vs-global fine placement over {n_gen} random "
          f"generators x gaussian poses ({size}px raw, exact fp32 XLA "
          f"backend both sides): "
          f"psnr mean={arr.mean():.2f} dB  min={arr.min():.2f}  "
          f"p5={np.percentile(arr, 5):.2f}  max={arr.max():.2f}",
          flush=True)


if __name__ == "__main__":
    main()
