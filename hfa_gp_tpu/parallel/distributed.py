"""Multi-host (multi-process) execution entry point.

TPU-native replacement for the reference's multi-NODE rendezvous
(arcface_torch/train.py:24-36: WORLD_SIZE/RANK env vars →
`dist.init_process_group("nccl")`; 2-node launch in arcface_torch/dist.sh):
`jax.distributed.initialize` connects every process to one coordinator,
after which `jax.devices()` returns the GLOBAL device list — meshes built
from it span hosts, and XLA routes collectives over ICI within a slice /
DCN across slices. On CPU test rigs the same code path runs over gloo
(tests/test_distributed.py: 2 processes × 4 virtual devices).

Precedence: explicit flags > reference-style env vars > single-process
no-op. Flag names follow jax.distributed.initialize; the env fallback
accepts the exact variables the reference's `torch.distributed.launch`
sets, so `dist.sh`-style launchers port over unchanged.
"""

from __future__ import annotations

import argparse
import os

import jax


def add_distributed_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (multi-host rendezvous; "
                        "ref arcface_torch/train.py:24-36)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total process count (ref WORLD_SIZE)")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's rank (ref RANK)")


def maybe_initialize(args=None) -> bool:
    """Initialize jax.distributed when configured; no-op otherwise.

    Returns True when running multi-process. Sources, in order:
      1. --coordinator_address/--num_processes/--process_id flags;
      2. WORLD_SIZE/RANK (+MASTER_ADDR/MASTER_PORT) env vars — the
         reference's rendezvous contract (arcface_torch/train.py:24-36);
      3. neither set → single-process (the reference's TCP fallback,
         train.py:29-36, collapses to a no-op here: one process already
         owns every local device).
    """
    coord = getattr(args, "coordinator_address", None)
    nproc = getattr(args, "num_processes", None)
    pid = getattr(args, "process_id", None)
    if coord is None and "WORLD_SIZE" in os.environ:
        nproc = int(os.environ["WORLD_SIZE"])
        pid = int(os.environ.get("RANK", 0))
        coord = (os.environ.get("MASTER_ADDR", "127.0.0.1") + ":"
                 + os.environ.get("MASTER_PORT", "12345"))
    if coord is None or (nproc is not None and nproc <= 1):
        return False
    if jax.process_count() > 1:   # already initialized (idempotent)
        return True
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    return True


def is_primary() -> bool:
    """True on the process that should own logging/checkpoint-metadata
    writes (the reference's `rank == 0` gates, train_rgb.py:128-150)."""
    return jax.process_index() == 0
