"""SR img-chain gap, fix attempts (r5). probe_sr_bwd4 pinned the 34 ms
fwd+bwd gap on the torgb tap's cotangent fork into x at 512²; the HLO
diff (probe_sr_hlo) shows ~13 GB of extra traffic as duplicated
elementwise chains (multiply x11 on bf16[2,512,512,128]) and H-major
copies — XLA duplicating cheap producers into BOTH consumers' backward
fusions and relayouting between them. Try forced materialization
boundaries:

  full          baseline (as shipped)
  barrier-tap   x = optimization_barrier(x) right before the torgb tap
                (both consumers read one buffer)
  barrier-all   barrier after EVERY synth layer in the SR blocks
  tap-f32       torgb consumes x upcast to fp32 (decouples the bf16
                chain's layout from the tap's dot_general)
  dce-floor     loss on x only, torgb still computed (composition floor)

Usage: python tools/probe_sr_bwd5.py [batch]
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


def sr_variant(sp, f, *, barrier="none", tap_dtype=None, loss_on="img"):
    x = f.astype(DT)
    img = jnp.transpose(f[..., :3], (0, 3, 1, 2))
    for bname in ("block0", "block1"):
        p = sp[bname]
        x = nets.synth_layer_apply(p["conv0"], x, w_last3[:, 0], up=2,
                                   fir=cfg.fir, conv_clamp=cfg.conv_clamp,
                                   noise_mode="none")
        if barrier == "all":
            x = jax.lax.optimization_barrier(x)
        x = nets.synth_layer_apply(p["conv1"], x, w_last3[:, 1],
                                   fir=cfg.fir, conv_clamp=cfg.conv_clamp,
                                   noise_mode="none")
        if barrier in ("tap", "all"):
            x = jax.lax.optimization_barrier(x)
        xin = x if tap_dtype is None else x.astype(tap_dtype)
        y = nets.torgb_apply_cm(p["torgb"], xin, w_last3[:, 2],
                                conv_clamp=cfg.conv_clamp)
        y = y.astype(jnp.float32)
        img = ops.upsample2d_cm(img, cfg.fir) + y
    if loss_on == "x":
        return jnp.mean(jnp.abs(x)) + 0.0 * jnp.mean(img)
    return jnp.mean(jnp.abs(jnp.transpose(img, (0, 2, 3, 1))))


def grad_sum(**kw):
    def loss(sp, f):
        return sr_variant(sp, f, **kw)

    return jax.jit(lambda sp, f: sum(
        jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(
            jax.grad(loss, argnums=(0, 1))(sp, f))))


timed("full", grad_sum(), params, feat)
timed("barrier-tap", grad_sum(barrier="tap"), params, feat)
timed("barrier-all", grad_sum(barrier="all"), params, feat)
timed("tap-f32", grad_sum(tap_dtype=jnp.float32), params, feat)
timed("dce-floor (loss on x)", grad_sum(loss_on="x"), params, feat)
print("DONE", flush=True)
