import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
import numpy as np
from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models.eg3d import networks as nets, renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig, init_generator, synthesis

cfg = EG3DConfig(compute_dtype=jnp.bfloat16)
params = init_generator(jax.random.PRNGKey(0), cfg)
B = 4
ws = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.num_ws, 512))
label = jnp.tile(camera.flip_yz_label(camera.sample_camera_label(None, n=1, mode=None)), (B,1))

def timeit(name, fn, *args, iters=3):
    t0=time.perf_counter()
    v = float(fn(*args))
    print(f"{name} compile+1: {time.perf_counter()-t0:.1f} s", flush=True)
    t0=time.perf_counter()
    for _ in range(iters): v = float(fn(*args))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)

planes_img = jax.jit(lambda p, ws: nets.backbone_apply(p["backbone"], cfg.backbone, ws, compute_dtype=cfg.compute_dtype))(params, ws)
planes = jnp.transpose(planes_img.reshape(B, 256,256,3,32), (0,3,1,2,4))
c2w, intr = camera.unpack_label(label)
ro, rd = camera.generate_rays(c2w, intr, 128)

full = jax.jit(lambda p, ws, c: jnp.sum(jnp.abs(synthesis(p, cfg, ws, c)["image"])))
timeit("full synthesis", full, params, ws, label)
