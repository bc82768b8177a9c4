"""Bisect the synthesis BACKWARD (r3: fwd 71 ms, fwd+bwd 323 ms at
batch 2 — where do the other 250 ms go?). Times fwd and fwd+bwd of each
stage in isolation at the real flagship config (bf16 trunks, windowed
Pallas sampler):

  backbone   ws → planes              (conv trunk)
  render     planes → features       (plan+sampler+decoder+march)
  sr         features → 512² image   (SR head)

Usage: python tools/profile_bwd2.py [batch]
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
cfg = acfg.eg3d
params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg=acfg)
gp = params["generator"]
ws = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.num_ws, 512))
label = jnp.tile(cam.flip_yz_label(
    cam.sample_camera_label(None, n=1, mode=None)), (B, 1))
res = cfg.render.neural_rendering_resolution
c2w, intr = cam.unpack_label(label)
ro, rd = cam.generate_rays(c2w, intr, res)


def timed(name, fn, *a):
    t0 = time.perf_counter()
    v = float(fn(*a))
    print(f"{name} compile+1: {time.perf_counter() - t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        fn(*a)
    v = float(fn(*a))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)


h = w = cfg.backbone.img_resolution


def mk_planes(bb, ws_):
    p = nets.backbone_apply(bb, cfg.backbone, ws_,
                            compute_dtype=cfg.compute_dtype)
    p = p.reshape(B, h, w, 3, cfg.plane_channels)
    return jnp.transpose(p, (0, 3, 1, 2, 4))


planes = jax.jit(mk_planes)(gp["backbone"], ws)
planes = jax.block_until_ready(planes)

# --- backbone
bb_f = jax.jit(lambda bb: jnp.mean(jnp.abs(mk_planes(bb, ws))))
timed("backbone fwd", bb_f, gp["backbone"])
@jax.jit
def bb_g(bb):
    g = jax.grad(lambda b_: jnp.mean(jnp.abs(mk_planes(b_, ws))))(bb)
    # drain INSIDE the jit (one dispatch; per-leaf eager sums cost
    # ~2 ms tunnel dispatch EACH and poisoned the first r3 numbers);
    # summing all leaves also defeats DCE (CLAUDE.md)
    return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))


timed("backbone fwd+bwd", bb_g, gp["backbone"])


# --- render (wrt planes AND decoder params)
def render_loss(pl_, dec):
    f, d, _ = rnd.render_rays(dec, cfg.render, pl_, ro, rd, rng=None)
    return jnp.mean(jnp.abs(f))


def drain_all(tree):
    return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(tree))


r_f = jax.jit(render_loss)
timed("render fwd", r_f, planes, gp["decoder"])
@jax.jit
def r_g(pl_, dec):
    g0, g1 = jax.grad(render_loss, argnums=(0, 1))(pl_, dec)
    return jnp.sum(jnp.abs(g0)) + sum(
        jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g1))


timed("render fwd+bwd", r_g, planes, gp["decoder"])

# --- SR head
feat = jax.random.normal(jax.random.PRNGKey(5), (B, res, res, 32))


def sr_loss(sp, f):
    img = nets.superresolution_apply(sp, cfg.sr, f[..., :3], f, ws,
                                     compute_dtype=cfg.compute_dtype)
    return jnp.mean(jnp.abs(img))


sr_f = jax.jit(sr_loss)
timed("sr fwd", sr_f, gp["superresolution"], feat)
@jax.jit
def sr_g(sp, f):
    g0, g1 = jax.grad(sr_loss, argnums=(0, 1))(sp, f)
    return jnp.sum(jnp.abs(g1)) + sum(
        jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g0))


timed("sr fwd+bwd", sr_g, gp["superresolution"], feat)
