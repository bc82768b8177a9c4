import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
import numpy as np
from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models import lpips as lpips_mod
from hfa_gp_tpu.models.avatar import heads
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig, synthesis
from hfa_gp_tpu.core import ops

B = 2
cfg = heads.AvatarConfig(eg3d=EG3DConfig(compute_dtype=jnp.bfloat16))
params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg)
lp = lpips_mod.init_lpips(jax.random.PRNGKey(1))
img = jax.random.uniform(jax.random.PRNGKey(2), (B, 256, 256, 3), minval=-1, maxval=1)
label = jnp.tile(camera.flip_yz_label(camera.sample_camera_label(None, n=1, mode=None)), (B,1))

def t(name, fn, *a, iters=3):
    t0=time.perf_counter(); v=float(fn(*a))
    print(f"{name} compile+1: {time.perf_counter()-t0:.0f}s", flush=True)
    t0=time.perf_counter()
    for _ in range(iters): v=float(fn(*a))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)

# grad through synthesis only (latent -> image -> mean)
lat = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.eg3d.num_ws, 512))
g_syn = jax.jit(jax.grad(lambda l: jnp.mean(jnp.abs(
    synthesis(params["generator"], cfg.eg3d, l, label)["image"]))))
t("grad synthesis (wrt latent)", lambda l: jnp.sum(jnp.abs(g_syn(l))), lat)

# grad through LPIPS only
a = jax.random.uniform(jax.random.PRNGKey(4), (B,256,256,3), minval=-1, maxval=1)
g_lp = jax.jit(jax.grad(lambda x: jnp.mean(lpips_mod.lpips_distance(lp, x, img))))
t("grad lpips", lambda x: jnp.sum(jnp.abs(g_lp(x))), a)

# grad through encoder only
g_enc = jax.jit(jax.grad(lambda x: jnp.mean(jnp.abs(
    heads.rgb_get_weights(params, cfg, x)))))
t("grad encoder", lambda x: jnp.sum(jnp.abs(g_enc(x))), img)
