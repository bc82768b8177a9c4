import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
import numpy as np
from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models.eg3d import networks as nets, renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig, init_generator

B = 2
cfg = EG3DConfig(compute_dtype=jnp.bfloat16)
params = init_generator(jax.random.PRNGKey(0), cfg)
ws = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.num_ws, 512))
label = jnp.tile(camera.flip_yz_label(camera.sample_camera_label(None, n=1, mode=None)), (B,1))

def t(name, fn, *a, iters=3):
    t0=time.perf_counter(); v=float(fn(*a))
    print(f"{name} compile+1: {time.perf_counter()-t0:.0f}s", flush=True)
    t0=time.perf_counter()
    for _ in range(iters): v=float(fn(*a))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)

# grad backbone
g_bb = jax.jit(jax.grad(lambda w: jnp.mean(jnp.abs(
    nets.backbone_apply(params["backbone"], cfg.backbone, w,
                        compute_dtype=cfg.compute_dtype)))))
t("grad backbone", lambda w: jnp.sum(jnp.abs(g_bb(w))), ws)

# grad render_rays (wrt planes)
planes = jax.random.normal(jax.random.PRNGKey(2), (B, 3, 256, 256, 32))
c2w, intr = camera.unpack_label(label)
ro, rd = camera.generate_rays(c2w, intr, 128)
g_rr = jax.jit(jax.grad(lambda p: jnp.mean(jnp.abs(
    rnd.render_rays(params["decoder"], cfg.render, p, ro, rd)[0]))))
t("grad render_rays", lambda p: jnp.sum(jnp.abs(g_rr(p))), planes)

# grad SR
feat = jax.random.normal(jax.random.PRNGKey(3), (B, 128, 128, 32))
g_sr = jax.jit(jax.grad(lambda f: jnp.mean(jnp.abs(
    nets.superresolution_apply(params["superresolution"], cfg.sr,
                               f[..., :3], f, ws,
                               compute_dtype=cfg.compute_dtype)))))
t("grad superres", lambda f: jnp.sum(jnp.abs(g_sr(f))), feat)
