"""Shared CLI plumbing: flags (reference names/defaults), config
construction, video assembly.

Flag names and defaults mirror reference code/train_rgb.py:159-202 /
run_recon_video_rgb.py:276-328 so command lines port over unchanged. The
DDP flags (--addr/--port) are accepted but ignored — multi-chip runs via
the jax mesh, not process groups."""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.avatar.heads import AvatarConfig
from ..models.eg3d.generator import EG3DConfig
from ..utils import pytree_io


def add_common_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--iter", type=int, default=800000)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--dataset", type=str, default="nerface_dataset")
    p.add_argument("--dataset_root", type=str, default="./datasets")
    p.add_argument("--person", type=str, default="person_3")
    p.add_argument("--resume_ckpt", type=str, default=None)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--start_iter", type=int, default=0)
    p.add_argument("--display_freq", type=int, default=5000)
    p.add_argument("--save_freq", type=int, default=5000)
    p.add_argument("--latent_dim_style", type=int, default=512)
    p.add_argument("--latent_dim_shape", type=int, default=50)
    p.add_argument("--exp_path", type=str, default="./exps/")
    p.add_argument("--exp_name", type=str, default="v1")
    p.add_argument("--tune_iter", type=int, default=50000)
    p.add_argument("--out_pose", action="store_true", default=False)
    p.add_argument("--use_softmax", action="store_true", default=False)
    # second-person subspace (reference train_rgb.py:167-178)
    p.add_argument("--person_2", type=str, default=None)
    p.add_argument("--run_id", type=str, default="nerface2")
    p.add_argument("--run_id_2", type=str, default=None)
    p.add_argument("--emb_dir", type=str, default="./PTI/embeddings/")
    p.add_argument("--init", action="store_true", default=False,
                   help="init person-2 bases from PTI pivots in emb_dir")
    p.add_argument("--same_bases", action="store_true", default=False)
    # accepted for command-line parity; the mesh replaces process groups
    p.add_argument("--addr", type=str, default="localhost")
    p.add_argument("--port", type=str, default="12345")
    # multi-host rendezvous (parallel/distributed.py; ref
    # arcface_torch/train.py:24-36 WORLD_SIZE/RANK env also honored)
    from ..parallel.distributed import add_distributed_flags
    add_distributed_flags(p)
    # TPU-native additions
    p.add_argument("--eg3d_weights", type=str, default=None,
                   help="npz from tools/convert_pickle.py "
                        "(ffhqrebalanced512-128.pkl)")
    p.add_argument("--lpips_weights", type=str, default=None,
                   help="npz from tools/convert_lpips.py")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="bfloat16 compute in conv trunks")
    p.add_argument("--n_model", type=int, default=1,
                   help="mesh model-axis size (ray sharding)")
    p.add_argument("--pallas_marcher", action="store_true", default=False,
                   help="fused Pallas compositing kernel (inference)")
    p.add_argument("--pallas_sampler", action="store_true", default=None,
                   help="windowed MXU tri-plane sampler (inference; "
                        "default: on when a TPU is attached)")
    p.add_argument("--no_pallas_sampler", dest="pallas_sampler",
                   action="store_false",
                   help="force the XLA row-gather sampler")
    p.add_argument("--trace_dir", type=str, default=None,
                   help="capture a jax.profiler trace into this dir")


def avatar_config(args, params_len: int | None = None,
                  n_data: int = 1) -> AvatarConfig:
    from ..models.eg3d import networks as nets
    from ..models.eg3d import renderer as rnd
    from ..parallel import mesh as mesh_mod
    # windowed MXU sampler: on by default on an accelerator (it has a
    # custom VJP, so training uses it too). Ray sharding (n_model > 1)
    # keeps the XLA path — rays from ONE image spread across chips and
    # the Pallas call cannot be auto-partitioned over them. Pure-DP
    # meshes (n_data > 1) DO get the Pallas path: the render wraps in
    # shard_map over the data axis (renderer._render_windowed_dp).
    # --pallas_sampler / --no_pallas_sampler override.
    sampler = getattr(args, "pallas_sampler", None)
    if sampler is None:
        # gate on TPU specifically: the pltpu kernel does not lower on
        # GPU backends ("axon" is the tunneled TPU PJRT plugin)
        sampler = (jax.devices()[0].platform in ("tpu", "axon")
                   and args.n_model == 1)
    render = rnd.RenderConfig(
        ray_shard_axis=mesh_mod.MODEL_AXIS if args.n_model > 1 else None,
        data_shard_axis=(mesh_mod.DATA_AXIS
                         if bool(sampler) and n_data > 1 else None),
        use_pallas_marcher=getattr(args, "pallas_marcher", False),
        use_pallas_sampler=bool(sampler),
        decoder_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    eg3d = EG3DConfig(
        render=render,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    kw = dict(size=args.size, dim=args.latent_dim_style,
              dim_shape=args.latent_dim_shape,
              use_softmax=args.use_softmax,
              out_pose=getattr(args, "out_pose", False),
              person_2=getattr(args, "person_2", None) is not None,
              same_bases=getattr(args, "same_bases", False), eg3d=eg3d)
    if params_len is not None:
        kw["params_len"] = params_len
    return AvatarConfig(**kw)


def load_init_bases_2(args, cfg):
    """PTI pivot init for person 2 (reference headnerf.py:60-69)."""
    if not (getattr(args, "init", False) and args.run_id_2):
        return None
    import os

    from ..models.avatar.subspace import load_pti_bases
    emb = os.path.join(args.emb_dir, args.run_id_2, "PTI")
    return load_pti_bases(emb, cfg.dim_shape, cfg.eg3d.num_ws, cfg.dim)


def load_generator_weights(args):
    if args.eg3d_weights is None:
        return None
    return pytree_io.load_npz(args.eg3d_weights)


def load_lpips(args, key=None):
    from ..models import lpips as lpips_mod
    if args.lpips_weights is not None:
        return pytree_io.load_npz(args.lpips_weights)
    import sys
    print("=" * 70 + "\nWARNING: no --lpips_weights — the LPIPS loss uses "
          "RANDOM AlexNet\nfeatures (a random-projection distance, not "
          "perceptual). Convert the\ntorch `lpips` package weights with "
          "tools/convert_lpips.py for real runs.\n" + "=" * 70,
          file=sys.stderr)
    return lpips_mod.init_lpips(key if key is not None
                                else jax.random.PRNGKey(777))


def make_dirs(args) -> dict[str, str]:
    base = os.path.join(args.exp_path, args.exp_name)
    dirs = {n: os.path.join(base, n)
            for n in ("log", "checkpoint", "display", "bases")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    return dirs


def save_args(args, dirs: dict[str, str]) -> None:
    """Persist the run config (the reference stores `args` inside every
    checkpoint, trainer_rgb.py:148; a json beside the logs is kinder)."""
    import json
    with open(os.path.join(dirs["log"], "args.json"), "w") as f:
        json.dump({k: v for k, v in vars(args).items()
                   if isinstance(v, (int, float, str, bool, type(None)))},
                  f, indent=2)


def write_video(png_dir: str, out_path: str, fps: int = 24,
                side_by_side_dir: str | None = None) -> str:
    """Assemble sorted pngs into a video (libx264 when an ffmpeg backend
    exists, MJPEG-AVI fallback otherwise), optional side-by-side GT concat
    (run_recon_video_rgb.py:239-272). Returns the written path."""
    from PIL import Image

    from ..utils.video import write_video_frames
    frames = sorted(glob.glob(os.path.join(png_dir, "*.png")))
    gt_frames = sorted(
        f for f in glob.glob(os.path.join(side_by_side_dir, "*"))
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )[:len(frames)] if side_by_side_dir else None

    def gen():
        for i, f in enumerate(frames):
            img = np.asarray(Image.open(f).convert("RGB"))
            if gt_frames:
                gt = np.asarray(Image.open(gt_frames[i]).convert("RGB")
                                .resize((img.shape[1], img.shape[0])))
                img = np.concatenate([gt, img], axis=1)
            yield img

    return write_video_frames(gen(), out_path, fps=fps)
