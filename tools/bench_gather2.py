import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
import numpy as np

B3, H, W, C, M = 12, 256, 256, 32, 128*128*48
planes = jax.random.normal(jax.random.PRNGKey(0), (B3, H, W, C), jnp.float32)
grid = jax.random.uniform(jax.random.PRNGKey(1), (B3, M, 2), minval=-1.1, maxval=1.1)

def t(name, fn, *a, iters=3):
    t0=time.perf_counter(); v=float(fn(*a)); c=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(iters): v=float(fn(*a))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.1f} ms (compile {c:.0f}s, val {v:.0f})", flush=True)

def common(grid, dtype):
    x = (grid[...,0]+1.0)*(W/2.0)-0.5
    y = (grid[...,1]+1.0)*(H/2.0)-0.5
    x0 = jnp.floor(x); y0 = jnp.floor(y)
    return (x0.astype(jnp.int32), y0.astype(jnp.int32),
            (x-x0).astype(dtype)[...,None], (y-y0).astype(dtype)[...,None])

def quadgather(planes, grid):
    dtype = planes.dtype
    x0i, y0i, wx, wy = common(grid, dtype)
    px = jnp.roll(planes, -1, axis=2)
    py = jnp.roll(planes, -1, axis=1)
    pxy = jnp.roll(px, -1, axis=1)
    packed = jnp.concatenate([planes, px, py, pxy], axis=-1)
    flat = packed.reshape(B3, H*W, 4*C)
    y0c = jnp.clip(y0i,0,H-1); x0c = jnp.clip(x0i,0,W-1)
    idx = y0c*W + x0c
    rows = jax.vmap(lambda f,i: f[i])(flat, idx)
    sy = y0i - y0c; sx = x0i - x0c
    r = [rows[...,k*C:(k+1)*C] for k in range(4)]
    def corner(dy,dx):
        yi=y0i+dy; xi=x0i+dx
        valid = ((xi>=0)&(xi<W)&(yi>=0)&(yi<H)).astype(dtype)[...,None]
        ty = jnp.clip(dy+sy,0,1)[...,None]; tx = jnp.clip(dx+sx,0,1)[...,None]
        v = jnp.where(ty==1, jnp.where(tx==1, r[3], r[2]),
                      jnp.where(tx==1, r[1], r[0]))
        return v*valid
    v00=corner(0,0); v01=corner(0,1); v10=corner(1,0); v11=corner(1,1)
    return v00*(1-wx)*(1-wy)+v01*wx*(1-wy)+v10*(1-wx)*wy+v11*wx*wy


f = lambda p, g: jnp.sum(jnp.abs(quadgather(p, g).astype(jnp.float32)))
t("quadgather fp32", jax.jit(f), planes, grid)
t("quadgather bf16", jax.jit(f), planes.astype(jnp.bfloat16), grid)
