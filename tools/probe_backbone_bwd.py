"""Backbone backward bisect (r3): raw convs are healthy (~2x fwd) but
the composed trunk bwd is 15x fwd. Times fwd and fwd+bwd of the trunk
truncated at each resolution, bf16 vs fp32, one jit per config.

Usage: python tools/probe_backbone_bwd.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.models.eg3d import networks as nets
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig

B = 2
ITERS = 10

cfg = EG3DConfig().backbone
params = nets.init_backbone(jax.random.PRNGKey(0), cfg)
ws = jax.random.normal(jax.random.PRNGKey(1), (B, 14, 512))


def timed(name, fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.1f} ms (compile {c:.0f}s)", flush=True)


def trunk(p, max_res, dt):
    from hfa_gp_tpu.core import ops
    x, img = None, None
    w_idx = 0
    for res in cfg.block_resolutions:
        if res > max_res:
            break
        is_first = res == 4
        num_conv = 1 if is_first else 2
        ws_block = ws[:, w_idx:w_idx + num_conv + 1]
        if is_first:
            ws_block = jnp.concatenate(
                [ws_block, jnp.zeros_like(ws_block[:, :1])], axis=1)
        x, img = nets.block_apply(p[f"b{res}"], x, img, ws_block,
                                  fir=cfg.fir, conv_clamp=cfg.conv_clamp,
                                  up=not is_first, compute_dtype=dt)
        w_idx += num_conv
    return jnp.mean(jnp.abs(img))


for dt, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "fp32")):
    for max_res in (64, 128, 256):
        f = jax.jit(lambda p: trunk(p, max_res, dt))
        timed(f"trunk<= {max_res} {tag} fwd ", f, params)

        # drain INSIDE the jit: one dispatch per call (a python
        # tree-sum drain would add ~2 ms tunnel dispatch per leaf)
        @jax.jit
        def gsum(p, _m=max_res, _d=dt):
            g = jax.grad(lambda q: trunk(q, _m, _d))(p)
            return sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(g))

        timed(f"trunk<= {max_res} {tag} f+b ", gsum, params)
