import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
import numpy as np
from hfa_gp_tpu.models.eg3d import renderer as rnd

B, H, W, C, M = 4, 256, 256, 32, 128*128*16
planes = jax.random.normal(jax.random.PRNGKey(0), (B, 3, H, W, C), jnp.float32)
coords = jax.random.uniform(jax.random.PRNGKey(1), (B, M, 3), minval=-0.5, maxval=0.5)

def t(name, fn, *a, iters=3):
    t0=time.perf_counter(); v=float(fn(*a))
    print(f"{name} compile+1: {time.perf_counter()-t0:.0f}s", flush=True)
    t0=time.perf_counter()
    for _ in range(iters): v=float(fn(*a))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms", flush=True)

# a) grad through the packed path (current training path)
def f_packed(planes):
    packed = rnd.pack_planes(planes)
    feats = rnd.sample_from_packed(packed, coords, 1.0, B, H, W)
    return jnp.mean(jnp.abs(feats))
t("grad packed gather", jax.jit(lambda p: jnp.sum(jnp.abs(jax.grad(f_packed)(p)))), planes)

# b) grad through the reference 4-corner path
def f_plain(planes):
    feats = rnd.sample_from_planes(planes, coords, 1.0)
    return jnp.mean(jnp.abs(feats))
t("grad plain gather", jax.jit(lambda p: jnp.sum(jnp.abs(jax.grad(f_plain)(p)))), planes)
