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

Usage: python tools/placement_stat.py [n_gen] [size]
Writes a summary line; run on the TPU (CPU works but is slow).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import dataclasses

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

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")

    base = EG3DConfig(
        backbone=nets.BackboneConfig(img_resolution=256),
        render=rnd.RenderConfig(
            neural_rendering_resolution=size,
            use_pallas_sampler=on_tpu,
            pallas_interpret=not on_tpu))
    cfg_s = dataclasses.replace(
        base, render=dataclasses.replace(base.render,
                                         sampler_fine="stratified"))
    cfg_x = dataclasses.replace(
        base, render=dataclasses.replace(base.render, sampler_fine="xla"))

    @jax.jit
    def render_both(params, ws, label):
        a = synthesis(params, cfg_s, ws, label)["image_raw"]
        b = synthesis(params, cfg_x, ws, label)["image_raw"]
        return a, b

    psnrs = []
    for i in range(n_gen):
        kp, kw, kc = jax.random.split(jax.random.PRNGKey(i), 3)
        params = init_generator(kp, base)
        ws = jax.random.normal(kw, (1, base.num_ws, 512))
        label = camera.flip_yz_label(camera.sample_camera_label(
            kc, n=1, mode="gaussian"))
        a, b = render_both(params, ws, jnp.asarray(label))
        mse = float(jnp.mean((a - b) ** 2))
        psnrs.append(10 * np.log10(4.0 / max(mse, 1e-12)))
        print(f"gen {i}: psnr={psnrs[-1]:.2f} dB", flush=True)

    arr = np.asarray(psnrs)
    print(f"stratified-vs-xla fine placement over {n_gen} random "
          f"generators x gaussian poses ({size}px raw): "
          f"psnr mean={arr.mean():.2f} dB  min={arr.min():.2f}  "
          f"p5={np.percentile(arr, 5):.2f}  max={arr.max():.2f}",
          flush=True)


if __name__ == "__main__":
    main()
