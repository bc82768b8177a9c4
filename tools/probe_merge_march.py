"""The r4 render-bwd mystery: probe_render_bwd2 at HEAD shows
full fwd+bwd 211.6 ms, merge->concat 70.6, march->mean 75.1,
both-stubbed 64.1 (batch 2). Each stub alone recovers ~140 ms, so the
cost is the COMPOSITION ray_march(unify_samples(...)) in the backward,
not either op. Hypotheses:
  (1) XLA duplicates the one-hot merge einsum into many march-bwd
      consumer fusions (fusion recompute) -> barrier between them fixes
  (2) layout/padding pathology on the (B,R,96,34) chain
This probe times the merge+march pair IN ISOLATION and inside the full
render with an optimization_barrier after unify.

Usage: python tools/probe_merge_march.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import camera as cam
from hfa_gp_tpu.models.avatar import heads
from hfa_gp_tpu.models.eg3d import renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
ITERS = 10

acfg = heads.AvatarConfig(eg3d=EG3DConfig(
    compute_dtype=jnp.bfloat16,
    render=rnd.RenderConfig(use_pallas_sampler=True,
                            decoder_dtype=jnp.bfloat16)))
cfg = acfg.eg3d.render
params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg=acfg)
dec = params["generator"]["decoder"]
res = cfg.neural_rendering_resolution
label = jnp.tile(cam.flip_yz_label(
    cam.sample_camera_label(None, n=1, mode=None)), (B, 1))
c2w, intr = cam.unpack_label(label)
ro, rd = cam.generate_rays(c2w, intr, res)
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
    print(f"{name}: {dt:.1f} ms  (compile {c:.0f}s)", flush=True)


# ---- isolated merge+march pair at the real shapes ----
R = res * res
N1 = cfg.depth_resolution
N2 = cfg.depth_resolution_importance
k = jax.random.PRNGKey(2)
d1 = jnp.sort(jax.random.uniform(k, (B, R, N1, 1), minval=2.2,
                                 maxval=3.3), axis=-2)
d2 = jnp.sort(jax.random.uniform(jax.random.fold_in(k, 1),
                                 (B, R, N2, 1), minval=2.2,
                                 maxval=3.3), axis=-2)
c1 = jax.random.normal(jax.random.fold_in(k, 2), (B, R, N1, 32))
c2 = jax.random.normal(jax.random.fold_in(k, 3), (B, R, N2, 32))
s1 = jax.random.normal(jax.random.fold_in(k, 4), (B, R, N1, 1))
s2 = jax.random.normal(jax.random.fold_in(k, 5), (B, R, N2, 1))


def pair_loss(c1_, s1_, c2_, s2_, barrier):
    d, c, s = rnd.unify_samples(d1, c1_, s1_, d2, c2_, s2_,
                                sorted_inputs=True)
    if barrier:
        d, c, s = jax.lax.optimization_barrier((d, c, s))
    rgb, dep, w = rnd.ray_march(c, s, d, cfg)
    return jnp.mean(jnp.abs(rgb)) + jnp.mean(jnp.abs(dep))


def grad_of(barrier):
    @jax.jit
    def g(c1_, s1_, c2_, s2_):
        gr = jax.grad(pair_loss, argnums=(0, 1, 2, 3))(
            c1_, s1_, c2_, s2_, barrier)
        return sum(jnp.sum(jnp.abs(x)) for x in gr)
    return g


fwd_pair = jax.jit(lambda a, b_, c_, d_: pair_loss(a, b_, c_, d_, False))
timed("pair fwd", fwd_pair, c1, s1, c2, s2)
timed("pair fwd+bwd", grad_of(False), c1, s1, c2, s2)
timed("pair fwd+bwd (barrier)", grad_of(True), c1, s1, c2, s2)

# march alone on the merged-size list
dm = jnp.concatenate([d1, d2], axis=-2)
cm = jnp.concatenate([c1, c2], axis=-2)
sm = jnp.concatenate([s1, s2], axis=-2)


@jax.jit
def march_g(c_, s_):
    def l(c__, s__):
        rgb, dep, w = rnd.ray_march(c__, s__, dm, cfg)
        return jnp.mean(jnp.abs(rgb)) + jnp.mean(jnp.abs(dep))
    gr = jax.grad(l, argnums=(0, 1))(c_, s_)
    return sum(jnp.sum(jnp.abs(x)) for x in gr)


timed("march-only fwd+bwd", march_g, cm, sm)


# merge alone
@jax.jit
def merge_g(c1_, s1_, c2_, s2_):
    def l(a, b_, c_, d_):
        d, c, s = rnd.unify_samples(d1, a, b_, d2, c_, d_,
                                    sorted_inputs=True)
        return (jnp.mean(jnp.abs(c)) + jnp.mean(jnp.abs(s))
                + jnp.mean(jnp.abs(d)))
    gr = jax.grad(l, argnums=(0, 1, 2, 3))(c1_, s1_, c2_, s2_)
    return sum(jnp.sum(jnp.abs(x)) for x in gr)


timed("merge-only fwd+bwd", merge_g, c1, s1, c2, s2)

# ---- full render with a barrier after unify ----
orig_unify = rnd.unify_samples


def barrier_unify(*a, **kw):
    return jax.lax.optimization_barrier(orig_unify(*a, **kw))


def full_loss(pl_):
    f, d, w = rnd._render_core_windowed(dec, cfg, pl_, ro, rd, None)
    return jnp.mean(jnp.abs(f))


@jax.jit
def full_g(pl_):
    return jnp.sum(jnp.abs(jax.grad(full_loss)(pl_)))


rnd.unify_samples = barrier_unify
timed("full fwd+bwd (barrier after unify)", full_g, planes)
rnd.unify_samples = orig_unify
