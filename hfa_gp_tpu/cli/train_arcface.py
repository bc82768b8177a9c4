"""Distributed arcface trainer: real-data training + synthetic speed
benchmark in one CLI.

Parity with the reference's `arcface_torch/train.py`:
  * real data (--rec): ArrayRecord pack (the MXNet RecordIO analog,
    train.py:56-63 → dataset.py:19-75), per-process sharded reads from a
    seed-synced epoch permutation (DistributedSampler.set_epoch contract);
  * checkpoint/resume (--output/--save_freq/--resume): Orbax snapshots of
    the FULL state — backbone, batch stats, the 'model'-axis-sharded
    PartialFC table, BOTH optimizer states (incl. the row-sparse momentum
    buffers) and the step — every save_freq steps (train.py:120-128,
    178-187; PartialFC custom state_dict at partial_fc.py:214-237).
    Restore reshards onto whatever mesh the resuming run built, so a
    checkpoint written on 4×2 resumes on 8×1 (the per-rank .pt files of
    the reference cannot do that);
  * end-of-train export (--export): backbone → portable StableHLO +
    an XLA FLOPs/bytes report (train.py:198-201, torch2onnx.py);
  * interval logging (--log_freq): samples/sec, ETA, loss meter, lr —
    CallBackLogging parity (utils/utils_callbacks.py:59-116);
  * synthetic default: random 112² images, N identities, hybrid DP×MP
    over the (data, model) mesh, reporting samples/sec (the reference's
    headline arcface metric: 2271 samples/sec MP / 5300 PFC-0.1 on
    8×V100; configs/3millions.py + docs/speed_benchmark.md).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from ..parallel import mesh as mesh_mod
from ..parallel.partial_fc import PartialFC
from ..train import arcface as arc
from ..train import checkpoint as ckpt_mod


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--network", type=str, default="iresnet50")
    p.add_argument("--num_classes", type=int, default=3_000_000)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--sample_rate", type=float, default=1.0)
    p.add_argument("--num_steps", type=int, default=20)
    p.add_argument("--warmup_steps", type=int, default=2)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
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
    # -- production surface ------------------------------------------------
    p.add_argument("--rec", type=str, default=None,
                   help="ArrayRecord training pack (data/record_dataset)."
                        " Default: on-device synthetic benchmark data "
                        "(SyntheticDataset, arcface_torch/dataset.py:32)")
    p.add_argument("--output", type=str, default=None,
                   help="work dir for checkpoints/export/logs "
                        "(cfg.output in the reference)")
    p.add_argument("--save_freq", type=int, default=0,
                   help="checkpoint every N steps into "
                        "{output}/checkpoint (0 = final save only; "
                        "needs --output)")
    p.add_argument("--resume", action="store_true", default=False,
                   help="resume from the latest checkpoint in "
                        "{output}/checkpoint (train.py:120-128)")
    p.add_argument("--export", action="store_true", default=False,
                   help="export the trained backbone as StableHLO to "
                        "{output}/model.stablehlo (train.py:198-201)")
    p.add_argument("--log_freq", type=int, default=0,
                   help="interval logging every N steps (samples/sec, "
                        "ETA, loss, lr — CallBackLogging parity); 0 "
                        "keeps the loop fetch-free for benchmarking")
    p.add_argument("--val_bin", type=str, default=None,
                   help="LFW-style .bin for in-training verification "
                        "(CallBackVerification parity)")
    p.add_argument("--verbose", type=int, default=10,
                   help="verification frequency in steps")
    from ..parallel.distributed import add_distributed_flags
    add_distributed_flags(p)
    return p


def _export_backbone(args, state, out_dir: str) -> str:
    """Trained backbone → StableHLO (+ FLOPs report). Portable to any
    XLA runtime — the reference's ONNX-export analog."""
    import json

    import numpy as np

    from ..models.arcface import registry
    from ..utils import export as export_mod

    bb, st = jax.device_get((state.backbone, state.batch_stats))

    def embed(x):
        return registry.backbone_apply(args.network, bb, st, x,
                                       train=False)

    from jax import export as jexport
    try:                      # dynamic batch like the reference's ONNX
        shape = jexport.symbolic_shape("b, 112, 112, 3")
        arg = jax.ShapeDtypeStruct(shape, jnp.float32)
        blob = export_mod.export_stablehlo(embed, (arg,))
    except Exception:         # fall back to a concrete batch dim
        arg = jax.ShapeDtypeStruct((args.batch_size, 112, 112, 3),
                                   jnp.float32)
        blob = export_mod.export_stablehlo(embed, (arg,))
    path = os.path.join(out_dir, "model.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    cost = export_mod.flops(
        embed, np.zeros((1, 112, 112, 3), np.float32))
    with open(os.path.join(out_dir, "model_cost.json"), "w") as f:
        json.dump({k: v for k, v in cost.items()
                   if isinstance(v, (int, float))}, f, indent=2)
    return path


def main(args) -> None:
    from ..parallel import distributed
    from ..utils.observability import ThroughputLogger, init_logging
    distributed.maybe_initialize(args)   # multi-host: global devices
    if args.output:
        os.makedirs(os.path.abspath(args.output), exist_ok=True)
    logger = init_logging(
        rank=jax.process_index(),
        log_file=(os.path.join(args.output, "training.log")
                  if args.output and distributed.is_primary() else None))
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

    ckpt_dir = None
    if args.output:
        ckpt_dir = os.path.join(os.path.abspath(args.output), "checkpoint")
        os.makedirs(ckpt_dir, exist_ok=True)

    with jax.sharding.set_mesh(mesh):
        state = arc.init_state(jax.random.PRNGKey(args.seed), pfc, tx,
                               fc_tx, args.network)
        state = state._replace(
            backbone=mesh_mod.replicate(mesh, state.backbone),
            batch_stats=mesh_mod.replicate(mesh, state.batch_stats),
            opt_state=mesh_mod.replicate(mesh, state.opt_state))

        start_step = 0
        if args.resume and ckpt_dir:
            last = ckpt_mod.latest_step(ckpt_dir)
            if last is not None:
                # restore reshards onto THIS run's mesh: the abstract
                # state (fresh init above) carries the target shardings
                state = ckpt_mod.restore(
                    os.path.join(ckpt_dir, f"{last:06d}"), state)
                start_step = int(state.step)
                logger.info("resumed from %s (step %d)",
                            ckpt_dir, start_step)

        if args.rec:
            from ..data import EpochSeededBatches
            from ..data.record_dataset import RecordFaceDataset
            ds = RecordFaceDataset(args.rec, size=112)
            stream = EpochSeededBatches(
                ds, args.batch_size, seed=args.seed,
                num_shards=jax.process_count(),
                shard_index=jax.process_index())

            def get_batch(i):
                return mesh_mod.shard_batch(mesh, stream.load(i))
        else:
            from functools import partial
            batch_sh = mesh_mod.data_parallel_sharding(mesh)

            @partial(jax.jit, out_shardings=(batch_sh, batch_sh))
            def synth_batch_dev(key):
                # SyntheticDataset equivalent (dataset.py:32-34),
                # generated ON DEVICE, directly data-sharded — host
                # batches would measure the data link, not the trainer,
                # and every process runs this same global program
                k1, k2 = jax.random.split(key)
                imgs = jax.random.normal(
                    k1, (args.batch_size, 112, 112, 3), jnp.float32)
                labs = jax.random.randint(k2, (args.batch_size,), 0,
                                          num_classes, jnp.int32)
                return imgs, labs

            def get_batch(i):
                return synth_batch_dev(jax.random.PRNGKey(i))

        val = None
        if args.val_bin:
            from .eval_verification import load_bin
            val = load_bin(args.val_bin)

        tlog = None
        if args.log_freq:
            tlog = ThroughputLogger(args.log_freq, args.num_steps,
                                    args.batch_size, logger=logger)

        t0 = time.perf_counter()
        timed_steps = 0
        metrics = {"loss": jnp.zeros(())}
        for i in range(start_step, args.num_steps):
            imgs, labs = get_batch(i)
            state, metrics = step(state, imgs, labs,
                                  jax.random.PRNGKey(i))
            if i == start_step:
                # first step carries the compile: restart the clock
                jax.block_until_ready(metrics["loss"])
                t0 = time.perf_counter()
                timed_steps = 0
            else:
                timed_steps += 1
            if tlog and (i + 1) % args.log_freq == 0:
                tlog(i + 1, float(metrics["loss"]),
                     lr=float(fc_tx.sched(i)))
            if val is not None and (i + 1) % args.verbose == 0:
                from ..models.arcface import registry
                from ..models.arcface.verification import evaluate_pairs
                embed = jax.jit(lambda x: registry.backbone_apply(
                    args.network, state.backbone, state.batch_stats,
                    jnp.asarray(x), train=False))
                acc, std, _ = evaluate_pairs(embed, *val)
                logger.info("[step %d] verification acc %.4f ± %.4f",
                            i + 1, acc, std)
            if ckpt_dir and args.save_freq \
                    and (i + 1) % args.save_freq == 0:
                path = ckpt_mod.save(state, ckpt_dir)
                logger.info("checkpoint -> %s", path)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0

        if ckpt_dir and int(state.step) > (ckpt_mod.latest_step(ckpt_dir)
                                           or -1):
            path = ckpt_mod.save(state, ckpt_dir)
            logger.info("final checkpoint -> %s", path)

    sps = max(timed_steps, 1) * args.batch_size / dt if dt > 0 else 0.0
    print(f"samples/sec: {sps:.1f}  (loss {float(metrics['loss']):.4f}, "
          f"mesh {mesh.shape}, classes {num_classes}, "
          f"sample_rate {args.sample_rate})")
    if args.export and args.output and distributed.is_primary():
        path = _export_backbone(args, state, os.path.abspath(args.output))
        logger.info("exported backbone -> %s", path)
    return sps


if __name__ == "__main__":
    main(build_argparser().parse_args())
