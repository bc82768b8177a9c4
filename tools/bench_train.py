"""RGB train-step throughput, pipelined like bench.py (dispatch N
steps through donated state, ONE trailing drain — the tunnel's ~33 ms
RTT amortizes to RTT/N). This is the latent-subspace-fitting headline
(BASELINE.md target 2).

Usage: python tools/bench_train.py [batch] [flags: remat chunk sampler]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import jax
import jax.numpy as jnp

from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models import lpips as lpips_mod
from hfa_gp_tpu.models.avatar import heads
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig
from hfa_gp_tpu.models.eg3d.renderer import RenderConfig
from hfa_gp_tpu.train import rgb as rgb_train
from hfa_gp_tpu.train.state import init_state, make_optimizer

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
flags = sys.argv[2:]
N = 20

cfg = heads.AvatarConfig(eg3d=EG3DConfig(
    compute_dtype=jnp.bfloat16,
    render=RenderConfig(
        remat="remat" in flags,
        ray_chunk=4096 if "chunk" in flags else None,
        use_pallas_sampler="nosampler" not in flags,
        decoder_dtype=jnp.bfloat16)))
params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg)
lp = lpips_mod.init_lpips(jax.random.PRNGKey(1))
tx = make_optimizer(3e-4)
state = init_state(params, tx)
step = rgb_train.make_train_step(cfg, tx, tune_iter=10**6, donate=True)

real = jax.random.uniform(jax.random.PRNGKey(2),
                          (batch, cfg.size, cfg.size, 3), minval=-1,
                          maxval=1)
label = jnp.tile(camera.flip_yz_label(
    camera.sample_camera_label(None, n=1, mode=None)), (batch, 1))

t0 = time.perf_counter()
state, m = step(state, lp, real, label)
print(f"compile+1: {time.perf_counter() - t0:.1f}s "
      f"loss={float(m['loss']):.4f}", flush=True)

t0 = time.perf_counter()
for _ in range(N):
    state, m = step(state, lp, real, label)
_ = float(m["loss"])                       # ONE drain gates the queue
dt = (time.perf_counter() - t0) / N
print(f"train step (batch {batch}, {' '.join(flags) or 'plain'}): "
      f"{dt * 1000:.1f} ms ({batch / dt:.2f} samples/sec)", flush=True)
