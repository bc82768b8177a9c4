"""Decompose the ~60 ms gap between render-core fwd+bwd (83.6 ms,
tools/probe_merge_march4.py) and full synthesis fwd+bwd (143.7 ms,
tools/profile_train2.py) at batch 2:

  bb     — backbone → reshape/transpose to (B,3,H,W,C) planes, param grads
  sr     — superresolution on random 128² features, param+input grads
  rcdec  — render core, grads wrt (decoder params, planes)  [vs 83.6 wrt
           planes only: isolates the decoder param-grad matmuls]
  bb+rc  — backbone composed with render core, grads wrt backbone+decoder
           params (the transpose bwd now sits BETWEEN two real consumers)

Pipelined timing: ITERS dispatches, one scalar drain (CLAUDE.md rules).

Usage: python tools/probe_syn_gap.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import camera as cam
from hfa_gp_tpu.models.avatar import heads
from hfa_gp_tpu.models.eg3d import networks as nets
from hfa_gp_tpu.models.eg3d import renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 10

acfg = heads.AvatarConfig(eg3d=EG3DConfig(
    compute_dtype=jnp.bfloat16,
    render=rnd.RenderConfig(use_pallas_sampler=True,
                            decoder_dtype=jnp.bfloat16)))
ecfg = acfg.eg3d
cfg = ecfg.render
params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg=acfg)
gen = params["generator"]
res = cfg.neural_rendering_resolution
label = jnp.tile(cam.flip_yz_label(
    cam.sample_camera_label(None, n=1, mode=None)), (B, 1))
c2w, intr = cam.unpack_label(label)
ro, rd = cam.generate_rays(c2w, intr, res)
ws = jax.random.normal(jax.random.PRNGKey(3), (B, ecfg.num_ws, 512))
planes = jax.random.normal(jax.random.PRNGKey(1),
                           (B, 3, 256, 256, 32), jnp.float32)


def timed(name, fn, *a):
    t0 = time.perf_counter()
    v = float(fn(*a))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.1f} ms  (compile {c:.0f}s, last={v:.3f})",
          flush=True)


def make_planes(bb, ws_):
    p = nets.backbone_apply(bb, ecfg.backbone, ws_,
                            noise_mode="const", rng=None,
                            compute_dtype=ecfg.compute_dtype)
    h = w = ecfg.backbone.img_resolution
    p = p.reshape(B, h, w, 3, ecfg.plane_channels)
    return jnp.transpose(p, (0, 3, 1, 2, 4))


@jax.jit
def bb_g(ws_):
    g = jax.grad(lambda bb: jnp.mean(jnp.abs(make_planes(bb, ws_))))(
        gen["backbone"])
    return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))


timed("bb fwd+bwd (param grads)", bb_g, ws)

feat = jax.random.normal(jax.random.PRNGKey(4), (B, res, res, 32),
                         jnp.float32)


def sr_loss(sp, f):
    img = nets.superresolution_apply(sp, ecfg.sr, f[..., :3], f, ws,
                                     noise_mode="none", rng=None,
                                     compute_dtype=ecfg.compute_dtype)
    return jnp.mean(jnp.abs(img))


@jax.jit
def sr_g(f):
    gp, gf = jax.grad(sr_loss, argnums=(0, 1))(gen["superresolution"], f)
    return (sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(gp))
            + jnp.sum(jnp.abs(gf)))


timed("sr fwd+bwd (param+input grads)", sr_g, feat)


def rc_loss(dec, pl):
    f, d, w = rnd._render_core_windowed(dec, cfg, pl, ro, rd, None)
    return jnp.mean(jnp.abs(f))


@jax.jit
def rcdec_g(pl):
    gd, gp = jax.grad(rc_loss, argnums=(0, 1))(gen["decoder"], pl)
    return (sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(gd))
            + jnp.sum(jnp.abs(gp)))


timed("render core fwd+bwd (dec+planes grads)", rcdec_g, planes)


def bbrc_loss(bb, dec, ws_):
    pl = make_planes(bb, ws_)
    f, d, w = rnd._render_core_windowed(dec, cfg, pl, ro, rd, None)
    return jnp.mean(jnp.abs(f))


@jax.jit
def bbrc_g(ws_):
    g = jax.grad(bbrc_loss, argnums=(0, 1))(gen["backbone"],
                                            gen["decoder"], ws_)
    return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))


timed("bb+render fwd+bwd", bbrc_g, ws)
print("DONE", flush=True)
