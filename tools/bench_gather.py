import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
import numpy as np
from functools import partial

B3, H, W, C, M = 12, 256, 256, 32, 128*128*48
key = jax.random.PRNGKey(0)
planes = jax.random.normal(key, (B3, H, W, C), jnp.float32)
grid = jax.random.uniform(jax.random.PRNGKey(1), (B3, M, 2), minval=-1.1, maxval=1.1)

def t(name, fn, *a, iters=3):
    t0=time.perf_counter(); v=float(fn(*a)); c=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(iters): v=float(fn(*a))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms (compile {c:.0f}s, val {v:.0f})", flush=True)

def coords(grid, dtype):
    x = (grid[...,0]+1.0)*(W/2.0)-0.5
    y = (grid[...,1]+1.0)*(H/2.0)-0.5
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    return x, y, x0.astype(jnp.int32), y0.astype(jnp.int32), (x-x0).astype(dtype), (y-y0).astype(dtype)

def rowgather(planes, grid):
    dtype = planes.dtype
    x, y, x0i, y0i, wx, wy = coords(grid, dtype)
    flat = planes.reshape(B3, H*W, C)
    def gather(yi, xi):
        valid = (xi>=0)&(xi<W)&(yi>=0)&(yi<H)
        idx = jnp.clip(yi,0,H-1)*W + jnp.clip(xi,0,W-1)
        vals = jax.vmap(lambda f,i: f[i])(flat, idx)
        return vals * valid[...,None].astype(dtype)
    v00=gather(y0i,x0i); v01=gather(y0i,x0i+1); v10=gather(y0i+1,x0i); v11=gather(y0i+1,x0i+1)
    wx=wx[...,None]; wy=wy[...,None]
    out = v00*(1-wx)*(1-wy)+v01*wx*(1-wy)+v10*(1-wx)*wy+v11*wx*wy
    return jnp.sum(jnp.abs(out.astype(jnp.float32)))

def patchgather(planes, grid):
    dtype = planes.dtype
    x, y, x0i, y0i, wx, wy = coords(grid, dtype)
    import jax.lax as lax
    dn = lax.GatherDimensionNumbers(offset_dims=(1,2,3), collapsed_slice_dims=(), start_index_map=(0,1))
    def one(img, y0, x0):
        starts = jnp.stack([y0, x0], axis=-1)
        return lax.gather(img, starts, dn, slice_sizes=(2,2,C), mode=lax.GatherScatterMode.CLIP)
    patch = jax.vmap(one)(planes, y0i, x0i)  # (B3, M, 2, 2, C)
    sy = (y0i - jnp.clip(y0i, 0, H-2)).clip(0,1)  # 1 when clamped down
    sx = (x0i - jnp.clip(x0i, 0, W-2)).clip(0,1)
    # dy slot = clip(dy+sy,0,1); dx slot = clip(dx+sx,0,1)
    def corner(dy, dx):
        ty = jnp.clip(dy+sy,0,1); tx = jnp.clip(dx+sx,0,1)
        py = jnp.where(ty[...,None,None]==1, patch[:,:,1], patch[:,:,0])
        v = jnp.where(tx[...,None]==1, py[:,:,1], py[:,:,0])
        yi = y0i+dy; xi = x0i+dx
        valid = (xi>=0)&(xi<W)&(yi>=0)&(yi<H)
        return v*valid[...,None].astype(dtype)
    v00=corner(0,0); v01=corner(0,1); v10=corner(1,0); v11=corner(1,1)
    wx=wx[...,None]; wy=wy[...,None]
    out = v00*(1-wx)*(1-wy)+v01*wx*(1-wy)+v10*(1-wx)*wy+v11*wx*wy
    return jnp.sum(jnp.abs(out.astype(jnp.float32)))

t("patchgather fp32", jax.jit(patchgather), planes, grid)
t("patchgather bf16", jax.jit(patchgather), planes.astype(jnp.bfloat16), grid)
