"""Audio-driven training CLI (reference code/train_audio.py).

Phase switch at --nosmo_iters (default 300000, train_audio.py defaults):
before it, AudioNet on single windows; after, AudioNet + AudioAttNet over
smo_size windows (one recompile at the boundary)."""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..data import HeadDataAudio, infinite_batches, process_sharded
from ..parallel import mesh as mesh_mod
from ..train import audio as audio_train
from ..train import checkpoint as ckpt
from ..train.state import init_state, make_optimizer
from ..utils.logging import MetricsWriter, display_image
from . import common


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    common.add_common_flags(p)
    p.add_argument("--params_len", type=int, default=76)
    p.add_argument("--dim_aud", type=int, default=64)
    p.add_argument("--win_size", type=int, default=16)
    p.add_argument("--smo_size", type=int, default=8)
    p.add_argument("--nosmo_iters", type=int, default=300000)
    return p


def main(args) -> None:
    from ..parallel import distributed
    distributed.maybe_initialize(args)   # multi-host: global devices
    dirs = common.make_dirs(args)
    common.save_args(args, dirs)
    writer = MetricsWriter(dirs["log"], primary=distributed.is_primary())
    mesh = mesh_mod.make_mesh_for_batch(args.batch_size, n_model=args.n_model)
    base_cfg = common.avatar_config(args,
                                    n_data=mesh.shape[mesh_mod.DATA_AXIS])
    import dataclasses
    cfg = dataclasses.replace(base_cfg, dim_aud=args.dim_aud,
                              win_size=args.win_size,
                              smo_size=args.smo_size)
    root = f"{args.dataset_root}/{args.dataset}"

    dataset = HeadDataAudio("train", size=args.size, root=root,
                            person=args.person, smo_size=args.smo_size)

    gen_params = common.load_generator_weights(args)
    params = audio_train.init_audio_params(jax.random.PRNGKey(0), cfg,
                                           gen_params)
    lpips_params = common.load_lpips(args)
    tx = audio_train.make_audio_optimizer(args.lr)
    step_plain = audio_train.make_train_step(cfg, tx, args.tune_iter,
                                             smooth=False)
    step_smooth = audio_train.make_train_step(cfg, tx, args.tune_iter,
                                              smooth=True)

    with jax.sharding.set_mesh(mesh):
        state = init_state(mesh_mod.replicate(mesh, params), tx)
        state = state._replace(
            opt_state=mesh_mod.replicate(mesh, state.opt_state))
        lpips_params = mesh_mod.replicate(mesh, lpips_params)

        if args.resume_ckpt is not None:
            state = ckpt.restore(args.resume_ckpt, state)
            args.start_iter = int(state.step)

        # index-based loader so audio windows can be gathered per step;
        # process-sharded: each process draws only ITS rows of the
        # seed-synced global permutation
        idx_iter = infinite_batches(process_sharded(
            list(range(len(dataset))), args.batch_size,
            collate=lambda items: np.asarray(items)))

        # strictly '>' on resume: state.step == nosmo_iters means the
        # last executed step was i = nosmo_iters - 1 (plain phase), so
        # the AudAtt optimizer reset has NOT run yet — '>=' would skip
        # it for a checkpoint saved exactly at the boundary
        was_smooth = args.start_iter > args.nosmo_iters
        for idx in range(args.iter):
            i = idx + args.start_iter
            ids = next(idx_iter)
            imgs = np.stack([dataset[int(j)][0] for j in ids])
            labels = np.stack([dataset[int(j)][1] for j in ids])
            smooth = i >= args.nosmo_iters
            if smooth and not was_smooth:
                # fresh AudAtt Adam at the phase switch (reference parity)
                state = state._replace(opt_state=mesh_mod.replicate(
                    mesh, audio_train.reset_audattnet_opt(
                        jax.device_get(state.opt_state), tx,
                        jax.device_get(state.params))))
                was_smooth = True
            if smooth:
                wins = np.stack([dataset.get_audio_window(int(j))
                                 for j in ids])
                step_fn = step_smooth
            else:
                wins = np.stack([dataset.get_audio(int(j)) for j in ids])
                step_fn = step_plain
            batch = mesh_mod.shard_batch(mesh, (imgs, labels, wins))
            state, metrics = step_fn(state, lpips_params, *batch)
            writer.scalars(idx, l2_loss=metrics["l2_loss"],
                           lpips_loss=metrics["lpips_loss"])

            if (i + 1) % args.display_freq == 0:
                print(f"[Iter {i}/{args.iter}] "
                      f"[l2 loss: {float(metrics['l2_loss']):f}] "
                      f"[lpips loss: {float(metrics['lpips_loss']):f}]")
                display_image(imgs[:1], f"{dirs['display']}/{i}source.png")

            if (i + 1) % args.save_freq == 0:
                ckpt.save(state, dirs["checkpoint"], step=i)
    writer.close()


if __name__ == "__main__":
    main(build_argparser().parse_args())
