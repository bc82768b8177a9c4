"""Stage-level profile of the arcface train step on the v5e (VERDICT r4
item: 19-21% MFU → find where the non-conv time goes).

Measurement discipline (CLAUDE.md tunnel rules): every variant is a
lax.scan of K copies INSIDE one jit — per-iter = (total − one RTT)/K;
no per-call dispatch loops (2 ms HTTP POST per dispatch), no python
pytree drains (leaf-wise eager fetches). Inputs are made carry-dependent
(imgs += ε·prev_loss) so XLA cannot hoist the body.

Stages:
  fwd        backbone forward only
  fwd_bwd    backbone forward+backward (grads drained via in-jit tree-sum)
  pfc        PartialFC loss fwd+bwd at fixed embeddings
  opt        optimizer update only (precomputed grads)
  full       the real train step
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hfa_gp_tpu.models.arcface import registry
from hfa_gp_tpu.parallel import mesh as mesh_mod
from hfa_gp_tpu.parallel.partial_fc import PartialFC
from hfa_gp_tpu.train import arcface as arc

BATCH = int(os.environ.get("ARC_BATCH", 256))
IDS = int(os.environ.get("ARC_IDS", 1_000_000))
K = int(os.environ.get("ARC_SCAN", 8))
NETWORK = os.environ.get("ARC_NET", "iresnet50")
DTYPE = jnp.bfloat16


def timed(name, fn, *args):
    out = fn(*args)                      # compile + 1 run
    s = float(out)
    t0 = time.perf_counter()
    s2 = float(fn(*args))                # one dispatch, K iters inside
    dt = (time.perf_counter() - t0 - 0.033) / K
    print(f"{name:10s}: {dt * 1e3:8.2f} ms/iter   (drain {s:.3e}/{s2:.3e})",
          flush=True)
    return dt


def main():
    mesh = mesh_mod.make_mesh(n_data=1, n_model=1,
                              devices=jax.devices()[:1])
    ce_pal = os.environ.get("ARC_CE_PALLAS", "auto")  # "0" = XLA paths
    pfc = PartialFC(mesh, num_classes=IDS, embedding_dim=512,
                    matmul_dtype=DTYPE,
                    ce_pallas=False if ce_pal == "0" else ce_pal)
    tx, fc_tx = arc.make_optimizers(total_steps=10_000, lr=0.1)
    with jax.sharding.set_mesh(mesh):
        state = arc.init_state(jax.random.PRNGKey(0), pfc, tx, fc_tx,
                               NETWORK)
        imgs0 = jax.random.normal(jax.random.PRNGKey(2),
                                  (BATCH, 112, 112, 3), jnp.float32)
        labs = jax.random.randint(jax.random.PRNGKey(3), (BATCH,), 0,
                                  IDS, jnp.int32)
        # nonzero: emb/||emb|| at zeros is NaN (poisons the pfc drain)
        emb0 = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 512),
                                 jnp.float32)

        def apply_bb(bb, stats, imgs):
            return registry.backbone_apply(NETWORK, bb, stats, imgs,
                                           train=True,
                                           rng=jax.random.PRNGKey(0),
                                           dtype=DTYPE)

        @jax.jit
        def fwd(bb, stats, imgs):
            def body(c, _):
                emb, _ = apply_bb(bb, stats, imgs + 1e-12 * c)
                return jnp.sum(emb), None
            s, _ = jax.lax.scan(body, 0.0, None, length=K)
            return s

        @jax.jit
        def fwd_bwd(bb, stats, imgs):
            def loss_fn(bb, imgs):
                emb, _ = apply_bb(bb, stats, imgs)
                return jnp.sum(emb * emb)

            def body(c, _):
                g = jax.grad(loss_fn)(bb, imgs + 1e-12 * c)
                return jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x), g, 0.0), None
            s, _ = jax.lax.scan(body, 0.0, None, length=K)
            return s

        @jax.jit
        def pfc_fb(w, emb):
            def body(c, _):
                l, g = jax.value_and_grad(pfc.loss)(
                    w, emb + 1e-12 * c, labs)
                return l + jnp.sum(jnp.abs(g)) * 1e-12, None
            s, _ = jax.lax.scan(body, 0.0, None, length=K)
            return s

        @jax.jit
        def opt_only(bb, opt_state, g_like, w, fc_opt, g_fc):
            def body(c, _):
                g = jax.tree.map(lambda x: x + 1e-12 * c, g_like)
                upd, _ = tx.update(g, opt_state, bb)
                bb2 = optax.apply_updates(bb, upd)
                fupd, _ = fc_tx.update(
                    jax.tree.map(lambda x: x + 1e-12 * c, g_fc),
                    fc_opt, w)
                w2 = optax.apply_updates(w, fupd)
                return (jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x), bb2, 0.0)
                    + jnp.sum(w2) * 1e-12), None
            s, _ = jax.lax.scan(body, 0.0, None, length=K)
            return s

        # donate: K pipelined non-donating steps would hold K live
        # 4 GB fc-table+momentum states (OOMs a 16 GB v5e at 1M ids) —
        # so `full` runs LAST, after every probe that reads `state`
        step = arc.make_train_step(pfc, tx, fc_tx, NETWORK, dtype=DTYPE,
                                   donate=True)

        def full(state):
            t0 = None
            for i in range(K + 1):
                state, m = step(state, imgs0, labs,
                                jax.random.fold_in(jax.random.PRNGKey(1),
                                                   i))
                if i == 0:
                    _ = float(m["loss"])     # compile boundary
                    t0 = time.perf_counter()
            s = float(m["loss"])
            dt = (time.perf_counter() - t0 - 0.033) / K
            print(f"{'full':10s}: {dt * 1e3:8.2f} ms/iter   (loss {s:.4f})",
                  flush=True)
            return dt

        print(f"net={NETWORK} batch={BATCH} ids={IDS:,} K={K}", flush=True)
        timed("fwd", fwd, state.backbone, state.batch_stats, imgs0)
        timed("fwd_bwd", fwd_bwd, state.backbone, state.batch_stats,
              imgs0)
        timed("pfc", pfc_fb, state.fc_weight, emb0)
        g_like = jax.tree.map(jnp.zeros_like, state.backbone)
        g_fc = jnp.zeros_like(state.fc_weight)
        timed("opt", opt_only, state.backbone, state.opt_state, g_like,
              state.fc_weight, state.fc_opt_state, g_fc)
        del g_like, g_fc
        t_full = full(state)   # donates state — must run last
        flops = 11.75e9 * 3 * BATCH
        print(f"MFU at full: {flops / t_full / 197e12 * 100:.1f}% "
              f"(conv fwd+bwd only, 197 bf16 TFLOP/s peak)", flush=True)


if __name__ == "__main__":
    main()
