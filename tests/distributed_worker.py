"""Multi-process worker for tests/test_distributed.py.

Three modes, each run on an 8-device GLOBAL mesh that is either one
process (--nproc 1, 8 local virtual CPU devices) or two rendezvoused
processes × 4 devices (--nproc 2, jax.distributed over gloo). The
multi-process run must reproduce the single-process math bit-for-bit
(same seeds, same global batch):

  arcface — one hybrid DP×MP arcface train step (4 data × 2 model);
            the reference's multi-NODE contract,
            arcface_torch/train.py:24-36 + dist.sh.
  avatar  — one RGB avatar train step (8 data × 1) where each process
            loads ONLY its rows of the seed-synced permutation
            (BatchIterator num_shards — DistributedSampler parity,
            utils_distributed_sampler.py:11-126); prints the rows it
            touched so the test can assert the reads were disjoint.
            Ref analog: code/train_rgb.py:53-57,85-92.
  reenact — the full run_recon_video_rgb CLI on a tiny config: frames
            render data-parallel across both processes, the primary
            writes them, and the frame bytes must equal the
            single-process run's. Ref: code/run_recon_video_rgb.py.

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


def run_arcface(pid: int) -> None:
    import jax.numpy as jnp
    import numpy as np

    from hfa_gp_tpu.parallel import mesh as mesh_mod
    from hfa_gp_tpu.parallel.partial_fc import PartialFC
    from hfa_gp_tpu.train import arcface as arc

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


def _tiny_avatar_cfg(dim_shape: int = 4):
    from hfa_gp_tpu.models.avatar import heads
    from hfa_gp_tpu.models.eg3d import networks as nets
    from hfa_gp_tpu.models.eg3d import renderer as rnd
    from hfa_gp_tpu.models.eg3d.generator import EG3DConfig
    return heads.AvatarConfig(size=64, dim_shape=dim_shape, eg3d=EG3DConfig(
        mapping=nets.MappingConfig(num_layers=2),
        backbone=nets.BackboneConfig(img_resolution=32, channel_base=2048,
                                     channel_max=128),
        sr=nets.SRConfig(input_resolution=16, output_resolution=64,
                         in_channels=32, block_channels=(32, 16)),
        render=rnd.RenderConfig(depth_resolution=8,
                                depth_resolution_importance=8,
                                neural_rendering_resolution=16)))


class _Recording:
    """Dataset proxy that records which rows THIS process decodes."""

    def __init__(self, ds):
        self.ds = ds
        self.rows = []

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        self.rows.append(int(i))
        return self.ds[i]


def run_avatar(pid: int, data_root: str) -> None:
    import jax.numpy as jnp
    import numpy as np

    from hfa_gp_tpu.data import BatchIterator, HeadData
    from hfa_gp_tpu.models import lpips as lpips_mod
    from hfa_gp_tpu.models.avatar import heads
    from hfa_gp_tpu.parallel import mesh as mesh_mod
    from hfa_gp_tpu.train import rgb as rgb_train
    from hfa_gp_tpu.train.state import init_state, make_optimizer

    cfg = _tiny_avatar_cfg()
    mesh = mesh_mod.make_mesh(n_data=8, n_model=1)
    ds = _Recording(HeadData("train", size=64,
                             root=f"{data_root}/nerface_dataset",
                             person="person_3"))
    loader = BatchIterator(ds, 8, num_shards=jax.process_count(),
                           shard_index=jax.process_index())
    real, label = next(iter(loader))

    params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg)
    lpips_params = lpips_mod.init_lpips(jax.random.PRNGKey(99))
    tx = make_optimizer(1e-3)
    step = rgb_train.make_train_step(cfg, tx, tune_iter=0, donate=False)
    with jax.sharding.set_mesh(mesh):
        state = init_state(mesh_mod.replicate(mesh, params), tx)
        state = state._replace(
            opt_state=mesh_mod.replicate(mesh, state.opt_state))
        lp = mesh_mod.replicate(mesh, lpips_params)
        real_s, label_s = mesh_mod.shard_batch(mesh, (real, label))
        state2, m = step(state, lp, real_s, label_s)
        loss = float(m["loss"])
        chk = float(jax.jit(lambda t: sum(
            jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(t)))(
                state2.params))
    assert np.isfinite(loss)
    print(f"worker pid={pid} loss={loss:.6f} chk={chk:.4f} "
          f"rows={sorted(ds.rows)}", flush=True)


def run_reenact(pid: int, data_root: str, out_dir: str) -> None:
    import glob
    import hashlib

    import hfa_gp_tpu.cli.common as common
    from hfa_gp_tpu.cli import run_recon_video_rgb

    orig = common.avatar_config

    def tiny(args, params_len=None, n_data=1):
        return _tiny_avatar_cfg(dim_shape=args.latent_dim_shape)

    common.avatar_config = tiny
    try:
        args = run_recon_video_rgb.build_argparser().parse_args([
            "--size", "64", "--dataset_root", data_root,
            "--person", "person_3", "--latent_dim_shape", "4",
            "--demo_dir", out_dir, "--demo_name", "t",
            "--render_batch", "8", "--fps", "4"])
        run_recon_video_rgb.main(args)
    finally:
        common.avatar_config = orig

    h = hashlib.sha256()
    pngs = sorted(glob.glob(os.path.join(out_dir, "t", "*.png")))
    for p in pngs:
        with open(p, "rb") as f:
            h.update(f.read())
    print(f"worker pid={pid} frames={len(pngs)} sha={h.hexdigest()}",
          flush=True)


def main(pid: int, nproc: int, port: int, mode: str, data: str,
         out: str) -> None:
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.process_count() == nproc, jax.process_count()
    if mode == "arcface":
        run_arcface(pid)
    elif mode == "avatar":
        run_avatar(pid, data)
    elif mode == "reenact":
        run_reenact(pid, data, out)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, default=0)
    p.add_argument("--nproc", type=int, default=1)
    p.add_argument("--port", type=int, default=29800)
    p.add_argument("--mode", type=str, default="arcface",
                   choices=["arcface", "avatar", "reenact"])
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--out", type=str, default=None)
    a = p.parse_args()
    main(a.pid, a.nproc, a.port, a.mode, a.data, a.out)
