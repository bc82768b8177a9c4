"""RGB-driven training CLI (reference code/train_rgb.py).

One process drives the whole mesh: the global batch is sharded over the
'data' axis (the reference splits batch_size across DDP ranks,
train_rgb.py:88); renderer rays shard over 'model' when --n_model > 1.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..data import BatchIterator, HeadData, infinite_batches, \
    process_sharded
from ..models.avatar import heads
from ..parallel import mesh as mesh_mod
from ..train import checkpoint as ckpt
from ..train import rgb as rgb_train
from ..train.state import init_state, make_optimizer
from ..utils.logging import MetricsWriter, display_image
from . import common


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    common.add_common_flags(p)
    return p


def main(args) -> None:
    from ..parallel import distributed
    distributed.maybe_initialize(args)   # multi-host: global devices
    dirs = common.make_dirs(args)
    common.save_args(args, dirs)
    writer = MetricsWriter(dirs["log"], primary=distributed.is_primary())
    mesh = mesh_mod.make_mesh_for_batch(args.batch_size, n_model=args.n_model)
    cfg = common.avatar_config(args, n_data=mesh.shape[mesh_mod.DATA_AXIS])
    root = f"{args.dataset_root}/{args.dataset}"

    print("==> preparing dataset")
    dataset = HeadData("train", size=args.size, root=root,
                       person=args.person)
    dataset_test = HeadData("test", size=args.size, root=root,
                            person=args.person)
    # seed-synced permutation; each process loads ONLY its rows
    loader = infinite_batches(process_sharded(dataset, args.batch_size))
    loader_test = infinite_batches(
        BatchIterator(dataset_test, 1, shuffle=False))

    print("==> initializing trainer")
    gen_params = common.load_generator_weights(args)
    params = heads.init_avatar_rgb(
        jax.random.PRNGKey(0), cfg, gen_params,
        init_bases_2=common.load_init_bases_2(args, cfg))
    lpips_params = common.load_lpips(args)
    tx = make_optimizer(args.lr)
    step_fn = rgb_train.make_train_step(cfg, tx, args.tune_iter)
    sample_fn = rgb_train.make_eval_step(cfg)

    with jax.sharding.set_mesh(mesh):
        state = init_state(mesh_mod.replicate(mesh, params), tx)
        state = state._replace(
            opt_state=mesh_mod.replicate(mesh, state.opt_state))
        lpips_params = mesh_mod.replicate(mesh, lpips_params)

        if args.resume_ckpt is not None:
            state = ckpt.restore(args.resume_ckpt, state)
            args.start_iter = int(state.step)
            print(f"==> resume from iteration {args.start_iter}")

        print("==> training")
        for idx in range(args.iter):
            i = idx + args.start_iter
            real_image, label = next(loader)   # already process-local rows
            batch = mesh_mod.shard_batch(mesh, (real_image, label))
            state, metrics = step_fn(state, lpips_params, *batch)

            writer.scalars(idx, l2_loss=metrics["l2_loss"],
                           lpips_loss=metrics["lpips_loss"])

            if (i + 1) % args.display_freq == 0:
                print(f"[Iter {i}/{args.iter}] "
                      f"[l2 loss: {float(metrics['l2_loss']):f}] "
                      f"[lpips loss: {float(metrics['lpips_loss']):f}]")
                real_t, label_t = next(loader_test)
                recon = sample_fn(state.params, real_t, label_t)
                bases = rgb_train.sample_bases(state.params, cfg)
                for b_id in range(bases.shape[0]):
                    display_image(np.asarray(bases[b_id]),
                                  f"{dirs['bases']}/{b_id}person_1.png")
                display_image(real_t, f"{dirs['display']}/{i}source.png")
                display_image(np.asarray(recon),
                              f"{dirs['display']}/{i}recon.png")
                writer.image(i, "source", real_t)
                writer.image(i, "recon", np.asarray(recon))

            if (i + 1) % args.save_freq == 0:
                ckpt.save(state, dirs["checkpoint"], step=i)
    writer.close()


if __name__ == "__main__":
    main(build_argparser().parse_args())
