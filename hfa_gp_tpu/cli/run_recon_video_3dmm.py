"""3DMM-driven video reenactment CLI.

The reference's run_recon_video_3dmm.py is broken at import time as
shipped (SURVEY.md §2.1: imports of absent `HeadNeRF`/`trainer.Trainer`);
this is the working equivalent: per-frame expression coefficients →
Weights_3DMM → subspace → EG3D, with optional fixed-camera navigation
(--fix_cam) and label rotation (--cam_angle)."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..core import camera as cam
from ..data import HeadData3DMM
from ..models.avatar import heads
from ..parallel import mesh as mesh_mod
from ..utils import pytree_io
from ..utils.logging import save_image
from . import common


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    common.add_common_flags(p)
    p.add_argument("--dataset_type", type=str, default="test")
    p.add_argument("--params_len", type=int, default=76)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--model_npz", type=str, default=None)
    p.add_argument("--demo_name", type=str, default="demo3dmm")
    p.add_argument("--demo_dir", type=str, default="./demo")
    p.add_argument("--cat_video", action="store_true", default=False)
    p.add_argument("--fix_cam", action="store_true", default=False)
    p.add_argument("--cam_angle", type=float, default=0.0,
                   help="extra yaw rotation (degrees) on every label")
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--render_batch", type=int, default=4)
    return p


def load_params(args, cfg):
    if args.model_npz is not None:
        return pytree_io.load_npz(args.model_npz)
    if args.model_path is not None:
        from ..train import checkpoint as ckpt
        from ..train.state import init_state, make_optimizer
        params = heads.init_avatar_3dmm(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(args.lr)
        state = ckpt.restore(args.model_path, init_state(params, tx))
        return state.params
    print("WARNING: no --model_path/--model_npz; using random init")
    return heads.init_avatar_3dmm(jax.random.PRNGKey(0), cfg)


def main(args) -> None:
    from ..parallel import distributed
    distributed.maybe_initialize(args)   # multi-host: global devices
    mesh = mesh_mod.make_mesh_for_batch(args.render_batch, n_model=args.n_model)
    n_data = mesh.shape[mesh_mod.DATA_AXIS]
    # n_data in the config gates the shard_map-DP Pallas render path
    # (renderer._render_windowed_dp); same wiring as cli/train_rgb.py.
    cfg = common.avatar_config(args, params_len=args.params_len,
                               n_data=n_data)
    root = f"{args.dataset_root}/{args.dataset}"
    dataset = HeadData3DMM(args.dataset_type, size=args.size, root=root,
                           person=args.person)
    if args.cam_angle:
        dataset.rotate_labels(args.cam_angle)
    params = load_params(args, cfg)
    save_path = os.path.join(args.demo_dir, args.demo_name)
    os.makedirs(save_path, exist_ok=True)

    bs = max(args.render_batch, n_data)
    bs -= bs % n_data

    fixed_label = np.asarray(cam.flip_yz_label(
        cam.sample_camera_label(None, n=1, mode=None)))[0] \
        if args.fix_cam else None

    @jax.jit
    def reenact(params, coeffs, label):
        return heads.t3dmm_forward(params, cfg, coeffs, label)

    with jax.sharding.set_mesh(mesh):
        params = mesh_mod.replicate(mesh, params)
        n = len(dataset)
        frame_idx = 0
        for start in range(0, n, bs):
            idxs = list(range(start, min(start + bs, n)))
            pad = bs - len(idxs)
            gidxs = idxs + [idxs[-1]] * pad
            # process-local rows only (multi-host shard_batch contract)
            items = [dataset[i] for i in mesh_mod.process_slice(gidxs)]
            labels = np.stack([fixed_label if fixed_label is not None
                               else it[1] for it in items])
            coeffs = np.stack([it[2] for it in items])
            coeffs_s, labels_s = mesh_mod.shard_batch(mesh,
                                                      (coeffs, labels))
            out = mesh_mod.host_gather(reenact(params, coeffs_s, labels_s))
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
    common.write_video(save_path, os.path.join(save_path, "rec.mp4"),
                       fps=args.fps, side_by_side_dir=gt_dir)
    print(f"==> wrote {frame_idx} frames to {save_path}")


if __name__ == "__main__":
    main(build_argparser().parse_args())
