"""SR img-chain gap bisection (r5). After the cm chain + per-sample
torgb, full SR fwd+bwd is still 41.0 vs 23.6 ms without the img chain.
The HLO diff says the extra bytes are on the BIG feature tensors (copies
/ multiplies / conv recompute), not the 3-channel img tensors — i.e. the
cost is what torgb's tap on x does to the REST of the graph. Bisect:

  full          baseline (img chain as shipped)
  sg-torgb      torgb consumes stop_gradient(x): fwd identical, but the
                cotangent fork into x (and AD residuals for it) removed
  sep-torgb     torgb consumes an INDEPENDENT input of x's shape: the x
                fork removed from fwd AND bwd (upper bound on the win)
  no-upsample   img = torgb1(x512) only (both torgbs still computed;
                drops upsample+add — isolates the accumulate chain)
  cm-loss       loss on the channel-major img (drops the final NHWC
                transpose from fwd+bwd)

Usage: python tools/probe_sr_bwd4.py [batch]
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

cfg = nets.SRConfig()
params = nets.init_superresolution(jax.random.PRNGKey(0), cfg)
ws = jax.random.normal(jax.random.PRNGKey(3), (B, 14, 512))
feat = jax.random.normal(jax.random.PRNGKey(4), (B, 128, 128, 32),
                         jnp.float32)
w_last3 = jnp.tile(ws[:, -1:, :], (1, 3, 1))


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


def sr_variant(sp, f, *, torgb_in="x", upsample=True, cm_loss=False):
    """Hand-rolled SR mirroring superresolution_apply with taps."""
    x = f.astype(DT)
    img = jnp.transpose(f[..., :3], (0, 3, 1, 2))  # initial rgb, cm
    for bname in ("block0", "block1"):
        p = sp[bname]
        x = nets.synth_layer_apply(p["conv0"], x, w_last3[:, 0], up=2,
                                   fir=cfg.fir, conv_clamp=cfg.conv_clamp,
                                   noise_mode="none")
        x = nets.synth_layer_apply(p["conv1"], x, w_last3[:, 1],
                                   fir=cfg.fir, conv_clamp=cfg.conv_clamp,
                                   noise_mode="none")
        if torgb_in == "x":
            xin = x
        elif torgb_in == "sg":
            xin = jax.lax.stop_gradient(x)
        else:  # independent tensor (folded in as a dummy fn of f's mean)
            xin = jnp.full_like(x, 0.1) + jnp.mean(f) * 0
        y = nets.torgb_apply_cm(p["torgb"], xin, w_last3[:, 2],
                                conv_clamp=cfg.conv_clamp)
        y = y.astype(jnp.float32)
        if upsample:
            img = ops.upsample2d_cm(img, cfg.fir) + y
        else:
            img = y
    if cm_loss:
        return jnp.mean(jnp.abs(img))
    return jnp.mean(jnp.abs(jnp.transpose(img, (0, 2, 3, 1))))


def grad_sum(**kw):
    def loss(sp, f):
        return sr_variant(sp, f, **kw)

    return jax.jit(lambda sp, f: sum(
        jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(
            jax.grad(loss, argnums=(0, 1))(sp, f))))


timed("full", grad_sum(), params, feat)
timed("sg-torgb", grad_sum(torgb_in="sg"), params, feat)
timed("sep-torgb", grad_sum(torgb_in="sep"), params, feat)
timed("no-upsample", grad_sum(upsample=False), params, feat)
timed("cm-loss", grad_sum(cm_loss=True), params, feat)
print("DONE", flush=True)
