import sys; sys.path.insert(0, "/root/repo")
import time, dataclasses, jax, jax.numpy as jnp
import numpy as np
from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models.eg3d import networks as nets, renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig, init_generator, synthesis

B = 4
base = EG3DConfig(compute_dtype=jnp.bfloat16)
params = init_generator(jax.random.PRNGKey(0), base)
ws = jax.random.normal(jax.random.PRNGKey(1), (B, base.num_ws, 512))
label = jnp.tile(camera.flip_yz_label(camera.sample_camera_label(None, n=1, mode=None)), (B,1))

def t(name, cfg, iters=3):
    fn = jax.jit(lambda p, w, c: jnp.sum(jnp.abs(synthesis(p, cfg, w, c)["image"])))
    t0=time.perf_counter(); v=float(fn(params, ws, label))
    print(f"{name} compile+1: {time.perf_counter()-t0:.1f}s val={v:.0f}", flush=True)
    t0=time.perf_counter()
    for _ in range(iters): v=float(fn(params, ws, label))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)


cfg_p = dataclasses.replace(base, render=dataclasses.replace(base.render, use_pallas_marcher=True))
t("pallas marcher", cfg_p)
