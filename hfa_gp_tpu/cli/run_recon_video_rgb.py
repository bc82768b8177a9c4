"""RGB-driven video reenactment CLI (reference code/run_recon_video_rgb.py).

TPU-native upgrades over the reference's one-frame-at-a-time loop
(run_recon_video_rgb.py:216-236): frames render in jitted batches, and
with --n_data > 1 the frame batch shards over the mesh 'data' axis —
multi-chip data-parallel video rendering over ICI (BASELINE config 5).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..data import HeadDataTest
from ..models.avatar import heads
from ..parallel import mesh as mesh_mod
from ..utils import pytree_io
from ..utils.logging import save_image
from . import common


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    common.add_common_flags(p)
    p.add_argument("--dataset_type", type=str, default="test")
    p.add_argument("--suffix", type=str, default=".png")
    p.add_argument("--ds_path", type=str, default=None)
    p.add_argument("--model_path", type=str, default=None,
                   help="orbax checkpoint dir (train_rgb output)")
    p.add_argument("--model_npz", type=str, default=None,
                   help="params-only npz (pytree_io format)")
    p.add_argument("--demo_name", type=str, default="demo")
    p.add_argument("--demo_dir", type=str, default="./demo")
    p.add_argument("--cat_video", action="store_true", default=False)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--render_batch", type=int, default=4)
    p.add_argument("--smooth_sigma", type=float, default=None)
    return p


def load_params(args, cfg):
    if args.model_npz is not None:
        return pytree_io.load_npz(args.model_npz)
    if args.model_path is not None:
        from ..train import checkpoint as ckpt
        from ..train.state import init_state, make_optimizer
        params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(args.lr)
        state = ckpt.restore(args.model_path, init_state(params, tx))
        return state.params
    print("WARNING: no --model_path/--model_npz; using random init")
    return heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg)


def main(args) -> None:
    from ..parallel import distributed
    distributed.maybe_initialize(args)   # multi-host: global devices
    mesh = mesh_mod.make_mesh_for_batch(args.render_batch, n_model=args.n_model)
    n_data = mesh.shape[mesh_mod.DATA_AXIS]
    # n_data must reach the config: with the Pallas sampler on a multi-
    # device mesh the render must wrap in shard_map over 'data'
    # (renderer._render_windowed_dp) — XLA cannot auto-partition the
    # Pallas custom call. Same wiring as cli/train_rgb.py.
    cfg = common.avatar_config(args, n_data=n_data)
    root = f"{args.dataset_root}/{args.dataset}"
    dataset = HeadDataTest(args.dataset_type, size=args.size, root=root,
                           person=args.person, ds_path=args.ds_path,
                           suffix=args.suffix,
                           smooth_sigma=args.smooth_sigma)
    params = load_params(args, cfg)
    save_path = os.path.join(args.demo_dir, args.demo_name)
    os.makedirs(save_path, exist_ok=True)

    bs = max(args.render_batch, n_data)
    bs -= bs % n_data

    @jax.jit
    def reenact(params, image, label):
        weights = heads.rgb_get_weights(params, cfg, image)
        if cfg.out_pose:
            weights, _pose = weights
        latent = heads.get_latent(params, weights, cfg)
        return heads.get_image(params, cfg, latent, label)

    import contextlib

    from ..utils.observability import trace as profiler_trace
    tracer = profiler_trace(args.trace_dir) if args.trace_dir \
        else contextlib.nullcontext()
    with jax.sharding.set_mesh(mesh), tracer:
        params = mesh_mod.replicate(mesh, params)
        n = len(dataset)
        frame_idx = 0
        for start in range(0, n, bs):
            idxs = list(range(start, min(start + bs, n)))
            pad = bs - len(idxs)
            # each process loads + feeds only ITS rows of the padded
            # global batch; the render output is gathered back
            gidxs = idxs + [idxs[-1]] * pad
            items = [dataset[i] for i in mesh_mod.process_slice(gidxs)]
            imgs = np.stack([it[0] for it in items])
            labels = np.stack([it[1] for it in items])
            imgs_s, labels_s = mesh_mod.shard_batch(mesh, (imgs, labels))
            out = mesh_mod.host_gather(reenact(params, imgs_s, labels_s))
            if distributed.is_primary():
                for j in range(len(idxs)):
                    save_image(out[j], os.path.join(
                        save_path, f"{frame_idx:05d}.png"))
                    frame_idx += 1
            else:
                frame_idx += len(idxs)

    if not distributed.is_primary():
        return
    gt_dir = dataset.ds_path if args.cat_video else None
    common.write_video(save_path,
                       os.path.join(save_path,
                                    f"{args.demo_name}"
                                    f"{'cat' if args.cat_video else 'rec'}"
                                    ".mp4"),
                       fps=args.fps, side_by_side_dir=gt_dir)
    print(f"==> wrote {frame_idx} frames to {save_path}")


if __name__ == "__main__":
    main(build_argparser().parse_args())
