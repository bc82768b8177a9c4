"""Distributed arcface trainer + synthetic speed benchmark.

Parity with the reference's `arcface_torch/train.py` on the synthetic
config (configs/3millions.py + docs/speed_benchmark.md): random 112²
images, N identities, hybrid DP×MP over the (data, model) mesh, reports
samples/sec (the reference's headline arcface metric: 2271 samples/sec MP
/ 5300 PFC-0.1 on 8×V100).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import mesh as mesh_mod
from ..parallel.partial_fc import PartialFC
from ..train import arcface as arc


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--network", type=str, default="iresnet50")
    p.add_argument("--num_classes", type=int, default=3_000_000)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--sample_rate", type=float, default=1.0)
    p.add_argument("--num_steps", type=int, default=20)
    p.add_argument("--warmup_steps", type=int, default=2)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--optimizer", type=str, default="sgd",
                   choices=["sgd", "adamw"],
                   help="sgd = conv-backbone recipe; adamw = the ViT "
                        "recipe (PartialFCAdamW)")
    p.add_argument("--weight_decay", type=float, default=None,
                   help="default: 5e-4 for sgd, 0.1 for adamw "
                        "(reference configs)")
    p.add_argument("--clip_grad", type=float, default=5.0,
                   help="backbone global-norm gradient clip "
                        "(arcface_torch/train.py:157-166); 0 disables")
    p.add_argument("--margin", type=str, default="arcface",
                   choices=["arcface", "cosface"])
    p.add_argument("--n_model", type=int, default=1)
    p.add_argument("--fp32", action="store_true", default=False)
    p.add_argument("--val_bin", type=str, default=None,
                   help="LFW-style .bin for in-training verification "
                        "(CallBackVerification parity)")
    p.add_argument("--verbose", type=int, default=10,
                   help="verification frequency in steps")
    from ..parallel.distributed import add_distributed_flags
    add_distributed_flags(p)
    return p


def main(args) -> None:
    from ..parallel import distributed
    distributed.maybe_initialize(args)   # multi-host: global devices
    mesh = mesh_mod.make_mesh_for_batch(args.batch_size,
                                        n_model=args.n_model)
    n_model = mesh.shape[mesh_mod.MODEL_AXIS]
    num_classes = args.num_classes
    if num_classes % n_model:
        num_classes += n_model - num_classes % n_model
    m2, m3 = (0.5, 0.0) if args.margin == "arcface" else (0.0, 0.4)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    pfc = PartialFC(mesh, num_classes, 512, m2=m2, m3=m3,
                    sample_rate=args.sample_rate,
                    matmul_dtype=None if args.fp32 else dtype)
    wd = args.weight_decay if args.weight_decay is not None \
        else (0.1 if args.optimizer == "adamw" else 5e-4)
    tx, fc_tx = arc.make_optimizers(
        args.num_steps, lr=args.lr, warmup_steps=args.warmup_steps,
        weight_decay=wd, optimizer=args.optimizer,
        clip_grad_norm=args.clip_grad or None)
    step = arc.make_train_step(pfc, tx, fc_tx, args.network, dtype=dtype)

    rng = np.random.default_rng(0)
    with jax.sharding.set_mesh(mesh):
        state = arc.init_state(jax.random.PRNGKey(0), pfc, tx, fc_tx,
                               args.network)
        state = state._replace(
            backbone=mesh_mod.replicate(mesh, state.backbone),
            batch_stats=mesh_mod.replicate(mesh, state.batch_stats),
            opt_state=mesh_mod.replicate(mesh, state.opt_state))

        from functools import partial
        batch_sh = mesh_mod.data_parallel_sharding(mesh)

        @partial(jax.jit, out_shardings=(batch_sh, batch_sh))
        def synth_batch_dev(key):
            # SyntheticDataset equivalent (arcface_torch/dataset.py:32-34)
            # generated ON DEVICE, directly data-sharded — host batches
            # would measure the data link, not the trainer, and a
            # device-local batch would break under multi-host (every
            # process runs this same program on its mesh shard)
            k1, k2 = jax.random.split(key)
            imgs = jax.random.normal(
                k1, (args.batch_size, 112, 112, 3), jnp.float32)
            labs = jax.random.randint(k2, (args.batch_size,), 0,
                                      num_classes, jnp.int32)
            return imgs, labs

        def synth_batch(i=0):
            return synth_batch_dev(jax.random.PRNGKey(i))

        # warmup / compile
        imgs, labs = synth_batch()
        state, metrics = step(state, imgs, labs, jax.random.PRNGKey(1))
        jax.block_until_ready(metrics["loss"])

        val = None
        if args.val_bin:
            from .eval_verification import load_bin
            from ..models.arcface.verification import evaluate_pairs
            val = load_bin(args.val_bin)

        t0 = time.perf_counter()
        for i in range(args.num_steps):
            imgs, labs = synth_batch(i)
            state, metrics = step(state, imgs, labs,
                                  jax.random.PRNGKey(i))
            if val is not None and (i + 1) % args.verbose == 0:
                from ..models.arcface import registry
                embed = jax.jit(lambda x: registry.backbone_apply(
                    args.network, state.backbone, state.batch_stats,
                    jnp.asarray(x), train=False))
                acc, std, _ = evaluate_pairs(embed, *val)
                print(f"[step {i + 1}] verification acc {acc:.4f} "
                      f"± {std:.4f}")
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0

    sps = args.num_steps * args.batch_size / dt
    print(f"samples/sec: {sps:.1f}  (loss {float(metrics['loss']):.4f}, "
          f"mesh {mesh.shape}, classes {num_classes}, "
          f"sample_rate {args.sample_rate})")
    return sps


if __name__ == "__main__":
    main(build_argparser().parse_args())
