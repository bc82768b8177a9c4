"""Pipeline-depth sensitivity of the arcface step timing.

r4 finding: at 1M ids the 40-deep pipelined+donated timing loop reads
~210 ms/step while a drain-every-step loop reads ~167 ms — queueing D
donated steps holds D in-flight output states near the 16 GB ceiling.
This probe times the SAME compiled step at several drain depths D
(dispatch D steps, drain the last loss, repeat): per-step =
(elapsed − n_drains·RTT)/steps with RTT measured in-process from a
no-op drain.

env: ARC_BATCH, ARC_IDS, ARC_BLOCK (0 = direct CE), ARC_DEPTHS
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.parallel import mesh as mesh_mod
from hfa_gp_tpu.parallel.partial_fc import PartialFC
from hfa_gp_tpu.train import arcface as arc

BATCH = int(os.environ.get("ARC_BATCH", 256))
IDS = int(os.environ.get("ARC_IDS", 1_000_000))
BLOCK = int(os.environ.get("ARC_BLOCK", -1))
DEPTHS = tuple(int(d) for d in
               os.environ.get("ARC_DEPTHS", "1,2,4,8,40").split(","))
NETWORK = os.environ.get("ARC_NET", "iresnet50")


def main():
    mesh = mesh_mod.make_mesh(n_data=1, n_model=1,
                              devices=jax.devices()[:1])
    blk = None if BLOCK == 0 else ("auto" if BLOCK < 0 else BLOCK)
    pfc = PartialFC(mesh, num_classes=IDS, embedding_dim=512,
                    matmul_dtype=jnp.bfloat16, ce_block_rows=blk)
    tx, fc_tx = arc.make_optimizers(total_steps=10_000, lr=0.1)
    step = arc.make_train_step(pfc, tx, fc_tx, NETWORK,
                               dtype=jnp.bfloat16, donate=True)
    print(f"net={NETWORK} batch={BATCH} ids={IDS:,} "
          f"ce_block_rows={pfc.ce_block_rows}", flush=True)
    with jax.sharding.set_mesh(mesh):
        state = arc.init_state(jax.random.PRNGKey(0), pfc, tx, fc_tx,
                               NETWORK)
        imgs = jax.random.normal(jax.random.PRNGKey(2),
                                 (BATCH, 112, 112, 3), jnp.float32)
        labs = jax.random.randint(jax.random.PRNGKey(3), (BATCH,), 0,
                                  IDS, jnp.int32)
        key = jax.random.PRNGKey(1)
        state, m = step(state, imgs, labs, key)     # compile
        _ = float(m["loss"])

        # measure the scalar-drain RTT on an already-materialized value
        z = jnp.zeros(())
        _ = float(z)
        t0 = time.perf_counter()
        for _ in range(10):
            _ = float(z + 1.0)
        rtt = (time.perf_counter() - t0) / 10
        print(f"scalar RTT ≈ {rtt * 1e3:.1f} ms", flush=True)

        for depth in DEPTHS:
            n_rounds = max(1, 24 // depth)
            steps = n_rounds * depth
            i = 0
            t0 = time.perf_counter()
            for _ in range(n_rounds):
                for _ in range(depth):
                    state, m = step(state, imgs, labs,
                                    jax.random.fold_in(key, i))
                    i += 1
                _ = float(m["loss"])                # drain this round
            el = time.perf_counter() - t0
            per = (el - n_rounds * rtt) / steps
            print(f"depth {depth:3d}: {per * 1e3:8.2f} ms/step "
                  f"({steps} steps, {n_rounds} drains)", flush=True)


if __name__ == "__main__":
    main()
