"""SR backward follow-up (r5). probe_sr_bwd.py showed the 4 modconvs
cost ~24 ms of the 42 ms SR fwd+bwd (batch 2, RTT-corrected) and the
pixel-shuffle reformulation LOSES — so (a) how healthy is a raw XLA conv
fwd vs bwd at the SR shapes, (b) does the modulation wrapper add
anything on top, and (c) where do the remaining ~18 ms (torgb + img
skip chain + noise/bias_act) go?

Usage: python tools/probe_sr_bwd2.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import ops
from hfa_gp_tpu.models.eg3d import networks as nets

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 20
DT = jnp.bfloat16
FIR = (1, 3, 3, 1)


def timed(name, fn, *a):
    t0 = time.perf_counter()
    v = float(fn(*a))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000 - 33.0 / ITERS
    print(f"{name}: {dt:.2f} ms  (compile {c:.0f}s, last={v:.3f})",
          flush=True)


def raw_conv_case(res, c):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, res, res, c), DT)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), DT)

    conv = lambda x_, w_: jax.lax.conv_general_dilated(
        x_, w_, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    f = jax.jit(lambda x_, w_: jnp.sum(jnp.abs(conv(x_, w_))))
    timed(f"raw conv {res}^2 c{c} fwd", f, x, w)

    g = jax.jit(lambda x_, w_: sum(
        jnp.sum(jnp.abs(t)) for t in jax.grad(
            lambda a_, b_: jnp.mean(jnp.abs(conv(a_, b_))),
            argnums=(0, 1))(x_, w_)))
    timed(f"raw conv {res}^2 c{c} fwd+bwd", g, x, w)


raw_conv_case(512, 128)
raw_conv_case(256, 256)

# --- full SR vs SR-without-img-chain --------------------------------------
cfg = nets.SRConfig()
params = nets.init_superresolution(jax.random.PRNGKey(0), cfg)
ws = jax.random.normal(jax.random.PRNGKey(3), (B, 14, 512))
feat = jax.random.normal(jax.random.PRNGKey(4), (B, 128, 128, 32),
                         jnp.float32)


def sr_loss(sp, f):
    img = nets.superresolution_apply(sp, cfg, f[..., :3], f, ws,
                                     noise_mode="none", rng=None,
                                     compute_dtype=DT)
    return jnp.mean(jnp.abs(img))


g_full = jax.jit(lambda f: sum(
    jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(
        jax.grad(sr_loss, argnums=(0, 1))(params, f))))
timed("SR full fwd+bwd", g_full, feat)


def sr_noimg_loss(sp, f):
    """Both blocks' feature paths (conv0+conv1, the FLOPs), NO torgb and
    NO img upsample/accumulate — isolates the 3-channel skip chain."""
    w_last = jnp.tile(ws[:, -1:, :], (1, 3, 1))
    x = f.astype(DT)
    for bname in ("block0", "block1"):
        p = params[bname]
        x = nets.synth_layer_apply(p["conv0"], x, w_last[:, 0], up=2,
                                   fir=cfg.fir, conv_clamp=cfg.conv_clamp,
                                   noise_mode="none")
        x = nets.synth_layer_apply(p["conv1"], x, w_last[:, 1],
                                   fir=cfg.fir, conv_clamp=cfg.conv_clamp,
                                   noise_mode="none")
    return jnp.mean(jnp.abs(x.astype(jnp.float32)))


g_noimg = jax.jit(lambda f: sum(
    jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(
        jax.grad(sr_noimg_loss, argnums=(0, 1))(params, f))))
timed("SR no-img-chain fwd+bwd", g_noimg, feat)


def sr_noclamp_loss(sp, f):
    """Full SR but conv_clamp disabled (clamp bwd = extra compare+select
    pass over every activation)."""
    import dataclasses
    c2 = dataclasses.replace(cfg, conv_clamp=None)
    img = nets.superresolution_apply(sp, c2, f[..., :3], f, ws,
                                     noise_mode="none", rng=None,
                                     compute_dtype=DT)
    return jnp.mean(jnp.abs(img))


g_noclamp = jax.jit(lambda f: sum(
    jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(
        jax.grad(sr_noclamp_loss, argnums=(0, 1))(params, f))))
timed("SR no-clamp fwd+bwd", g_noclamp, feat)
print("DONE", flush=True)
