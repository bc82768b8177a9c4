"""Attribute the arcface full-step time by DELTAS between real step
variants (the isolated-stage probes hoist loop-invariant work and miss
interactions — r4: stage sum 145 ms vs full 210 ms at batch 256/1M ids).

Variants (each its own jit, drained EVERY dispatch — serial +2 ms/step
tunnel overhead is noise at this scale):
  C  backbone-only: loss=sum(emb²), backbone SGD update, fc untouched
  B  + PartialFC CE loss (grads to backbone AND fc), fc NOT updated
  A  + fc optimizer update  (the real step)
A−B = fc optimizer in situ; B−C = CE fwd+bwd in situ; C = backbone+opt.

env: ARC_BATCH, ARC_IDS, ARC_BLOCK (0 = direct CE path), ARC_SCAN
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

from hfa_gp_tpu.models.arcface import registry
from hfa_gp_tpu.parallel import mesh as mesh_mod
from hfa_gp_tpu.parallel.partial_fc import PartialFC
from hfa_gp_tpu.train import arcface as arc

BATCH = int(os.environ.get("ARC_BATCH", 256))
IDS = int(os.environ.get("ARC_IDS", 1_000_000))
K = int(os.environ.get("ARC_SCAN", 10))
BLOCK = int(os.environ.get("ARC_BLOCK", -1))   # -1 = auto
NETWORK = os.environ.get("ARC_NET", "iresnet50")
DTYPE = jnp.bfloat16


def time_variant(name, fn, state, imgs, labs):
    # every variant donates its state (two live 4 GB fc tables OOM the
    # chip at 1M ids) and returns the final one for the next variant.
    # THREE rounds, report the LAST: the first ~40 post-compile steps
    # of each program run ~20% slow while the allocator churns toward
    # a stable layout (r4; also re-triggered when switching programs —
    # a single-round probe here once read C backbone-only SLOWER than
    # the full step)
    key = jax.random.PRNGKey(1)
    st, m = fn(state, imgs, labs, key)          # compile
    _ = float(m)
    i = 0
    for r in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            st, m = fn(st, imgs, labs, jax.random.fold_in(key, i))
            _ = float(m)                        # drain every step
            i += 1
        dt = (time.perf_counter() - t0) / K - 0.035   # RTT + dispatch
    print(f"{name:12s}: {dt * 1e3:8.2f} ms/step", flush=True)
    return dt, st


def main():
    mesh = mesh_mod.make_mesh(n_data=1, n_model=1,
                              devices=jax.devices()[:1])
    blk = None if BLOCK == 0 else ("auto" if BLOCK < 0 else BLOCK)
    pfc = PartialFC(mesh, num_classes=IDS, embedding_dim=512,
                    matmul_dtype=DTYPE, ce_block_rows=blk)
    print(f"net={NETWORK} batch={BATCH} ids={IDS:,} "
          f"ce_block_rows={pfc.ce_block_rows}", flush=True)
    tx, fc_tx = arc.make_optimizers(total_steps=10_000, lr=0.1)
    with jax.sharding.set_mesh(mesh):
        state = arc.init_state(jax.random.PRNGKey(0), pfc, tx, fc_tx,
                               NETWORK)
        imgs = jax.random.normal(jax.random.PRNGKey(2),
                                 (BATCH, 112, 112, 3), jnp.float32)
        labs = jax.random.randint(jax.random.PRNGKey(3), (BATCH,), 0,
                                  IDS, jnp.int32)

        def apply_bb(bb, stats, imgs, kbb):
            return registry.backbone_apply(NETWORK, bb, stats, imgs,
                                           train=True, rng=kbb,
                                           dtype=DTYPE)

        @partial(jax.jit, donate_argnums=(0,))
        def step_c(state, imgs, labs, key):
            def loss_fn(bb):
                emb, ns = apply_bb(bb, state.batch_stats, imgs, key)
                return jnp.sum(emb * emb) * 1e-6, ns
            (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state.backbone)
            upd, opt = tx.update(g, state.opt_state, state.backbone)
            bb = optax.apply_updates(state.backbone, upd)
            return state._replace(backbone=bb, batch_stats=ns,
                                  opt_state=opt), loss

        @partial(jax.jit, donate_argnums=(0,))
        def step_b(state, imgs, labs, key):
            def loss_fn(bb, w):
                emb, ns = apply_bb(bb, state.batch_stats, imgs, key)
                return pfc.loss(w, emb, labs), ns
            (loss, ns), (g, gw) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.backbone, state.fc_weight)
            upd, opt = tx.update(g, state.opt_state, state.backbone)
            bb = optax.apply_updates(state.backbone, upd)
            # gw computed but NOT applied (full-tree sum at nonzero
            # weight so DCE/slice-propagation can't delete the fc bwd)
            loss = loss + jnp.sum(gw) * 1e-20
            return state._replace(backbone=bb, batch_stats=ns,
                                  opt_state=opt), loss

        real = arc.make_train_step(pfc, tx, fc_tx, NETWORK, dtype=DTYPE,
                                   donate=True)

        def step_a(state, imgs, labs, key):
            st, m = real(state, imgs, labs, key)
            return st, m["loss"]

        c, state = time_variant("C backbone", step_c, state, imgs, labs)
        b, state = time_variant("B +CE", step_b, state, imgs, labs)
        a, state = time_variant("A real", step_a, state, imgs, labs)
        print(f"CE in situ (B-C): {(b - c) * 1e3:7.2f} ms", flush=True)
        print(f"fc opt in situ (A-B): {(a - b) * 1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
