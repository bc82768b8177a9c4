"""Multi-process worker for tests/test_distributed.py.

Runs ONE hybrid DP×MP arcface train step on a (4 data × 2 model) GLOBAL
mesh and prints the loss + an fc-weight checksum. With --nproc 2 each
process owns 4 virtual CPU devices and rendezvouses through
jax.distributed (the reference's multi-NODE contract,
arcface_torch/train.py:24-36 + dist.sh); with --nproc 1 the same program
runs single-process on 8 local devices — the two must agree bit-for-bit
on the math (same seeds, same global batch).

Run directly:  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python tests/distributed_worker.py --pid 0 --nproc 2 --port 29800 &
  ... --pid 1 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main(pid: int, nproc: int, port: int) -> None:
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    from hfa_gp_tpu.parallel import mesh as mesh_mod
    from hfa_gp_tpu.parallel.partial_fc import PartialFC
    from hfa_gp_tpu.train import arcface as arc

    assert jax.device_count() == 8, jax.device_count()
    assert jax.process_count() == nproc, jax.process_count()
    mesh = mesh_mod.make_mesh(n_data=4, n_model=2)

    pfc = PartialFC(mesh, num_classes=32, embedding_dim=512)
    tx, fc_tx = arc.make_optimizers(total_steps=4, lr=0.01)
    step = arc.make_train_step(pfc, tx, fc_tx, "iresnet18",
                               dtype=jnp.float32, donate=False)
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((8, 112, 112, 3)).astype(np.float32)
    labs = rng.integers(0, 32, 8).astype(np.int32)

    with jax.sharding.set_mesh(mesh):
        state = arc.init_state(jax.random.PRNGKey(2), pfc, tx, fc_tx,
                               "iresnet18")
        state = state._replace(
            backbone=mesh_mod.replicate(mesh, state.backbone),
            batch_stats=mesh_mod.replicate(mesh, state.batch_stats),
            opt_state=mesh_mod.replicate(mesh, state.opt_state))
        local = mesh_mod.process_local_batch((imgs, labs))
        imgs_s, labs_s = mesh_mod.shard_batch(mesh, local)
        state2, m = step(state, imgs_s, labs_s, jax.random.PRNGKey(0))
        loss = float(m["loss"])
        chk = float(jax.jit(lambda w: jnp.sum(jnp.abs(w)))(
            state2.fc_weight))
    assert np.isfinite(loss)
    print(f"worker pid={pid} loss={loss:.6f} chk={chk:.4f}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, default=0)
    p.add_argument("--nproc", type=int, default=1)
    p.add_argument("--port", type=int, default=29800)
    a = p.parse_args()
    main(a.pid, a.nproc, a.port)
