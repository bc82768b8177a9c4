"""Audio-driven video reenactment CLI.

Working equivalent of the reference's run_recon_video_audio.py (broken at
import time as shipped, and with an use-before-assign in its no-smoothing
branch — SURVEY.md §2.1): DeepSpeech windows → AudioNet [+ AudioAttNet
smoothing with --smooth] → Weights_3DMM → subspace → EG3D."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..data import HeadDataAudio
from ..models.avatar import heads
from ..parallel import mesh as mesh_mod
from ..train import audio as audio_train
from ..utils import pytree_io
from ..utils.logging import save_image
from . import common


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    common.add_common_flags(p)
    p.add_argument("--dataset_type", type=str, default="val")
    p.add_argument("--dim_aud", type=int, default=64)
    p.add_argument("--win_size", type=int, default=16)
    p.add_argument("--smo_size", type=int, default=8)
    p.add_argument("--smooth", action="store_true", default=False,
                   help="use AudioAttNet window smoothing")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--model_npz", type=str, default=None)
    p.add_argument("--demo_name", type=str, default="demoaudio")
    p.add_argument("--demo_dir", type=str, default="./demo")
    p.add_argument("--cat_video", action="store_true", default=False)
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--render_batch", type=int, default=4)
    return p


def load_params(args, cfg):
    if args.model_npz is not None:
        return pytree_io.load_npz(args.model_npz)
    if args.model_path is not None:
        from ..train import checkpoint as ckpt
        from ..train.state import init_state
        params = audio_train.init_audio_params(jax.random.PRNGKey(0), cfg)
        # the audio trainer checkpoints a multi_transform opt_state
        # (train/audio.make_audio_optimizer) — the restore template's
        # optimizer tree must match it
        tx = audio_train.make_audio_optimizer(args.lr)
        state = ckpt.restore(args.model_path, init_state(params, tx))
        return state.params
    print("WARNING: no --model_path/--model_npz; using random init")
    return audio_train.init_audio_params(jax.random.PRNGKey(0), cfg)


def main(args) -> None:
    import dataclasses

    from ..parallel import distributed
    distributed.maybe_initialize(args)   # multi-host: global devices
    mesh = mesh_mod.make_mesh_for_batch(args.render_batch, n_model=args.n_model)
    n_data = mesh.shape[mesh_mod.DATA_AXIS]
    # n_data in the config gates the shard_map-DP Pallas render path
    # (renderer._render_windowed_dp); same wiring as cli/train_rgb.py.
    cfg = dataclasses.replace(common.avatar_config(args, n_data=n_data),
                              dim_aud=args.dim_aud,
                              win_size=args.win_size,
                              smo_size=args.smo_size)
    root = f"{args.dataset_root}/{args.dataset}"
    dataset = HeadDataAudio(args.dataset_type, size=args.size, root=root,
                            person=args.person, smo_size=args.smo_size)
    params = load_params(args, cfg)
    save_path = os.path.join(args.demo_dir, args.demo_name)
    os.makedirs(save_path, exist_ok=True)

    bs = max(args.render_batch, n_data)
    bs -= bs % n_data
    smooth = args.smooth

    @jax.jit
    def reenact(params, aud_window, label):
        code = audio_train._encode_audio(params, cfg, aud_window, smooth)
        return heads.audio_forward(params["model"], cfg, code, label)

    with jax.sharding.set_mesh(mesh):
        params = mesh_mod.replicate(mesh, params)
        n = len(dataset)
        frame_idx = 0
        for start in range(0, n, bs):
            idxs = list(range(start, min(start + bs, n)))
            pad = bs - len(idxs)
            # process-local rows only (multi-host shard_batch contract)
            full = mesh_mod.process_slice(idxs + [idxs[-1]] * pad)
            labels = np.stack([dataset[i][1] for i in full])
            if smooth:
                auds = np.stack([dataset.get_audio_window(i)
                                 for i in full])
            else:
                auds = np.stack([dataset.get_audio(i) for i in full])
            auds_s, labels_s = mesh_mod.shard_batch(mesh, (auds, labels))
            out = mesh_mod.host_gather(reenact(params, auds_s, labels_s))
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
