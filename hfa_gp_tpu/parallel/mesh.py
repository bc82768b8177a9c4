"""Device-mesh construction and data-parallel sharding helpers.

TPU-native replacement for the reference's NCCL process-group setup
(reference code/train_rgb.py:53-57 `dist.init_process_group("nccl")`,
DDP wrapping at trainer_rgb.py:56): one 2-D `jax.sharding.Mesh`
(data × model) over ICI; gradients sync through the `psum` XLA inserts
for batch-sharded inputs under jit — and, unlike the reference's RGB
trainer (which bypasses DDP via `.module`, SURVEY.md §2.1), the sync here
is structural: it cannot be skipped.

Axes:
  * 'data'  — batch dimension (DP). Global batch = per-chip × mesh size,
    like the reference's `args.batch_size // world_size` split
    (train_rgb.py:88).
  * 'model' — tensor/model parallel axis: ray sharding in the renderer
    (the sequence-parallel analog, SURVEY.md §2.5) and the class-sharded
    PartialFC softmax (parallel/partial_fc.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data
    axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def make_mesh_for_batch(batch_size: int, n_model: int = 1,
                        devices=None) -> Mesh:
    """Mesh whose data axis divides the global batch (the reference
    asserts divisibility implicitly via batch_size // world_size,
    train_rgb.py:88; here we auto-shrink the data axis instead)."""
    devices = devices if devices is not None else jax.devices()
    avail = max(len(devices) // n_model, 1)
    n_data = 1
    for d in range(1, avail + 1):
        if batch_size % d == 0:
            n_data = d
    if n_data * n_model < len(devices):
        import logging
        logging.getLogger(__name__).warning(
            "batch_size %d does not divide across all %d devices - using a "
            "%dx%d mesh (%d devices idle); pick a batch divisible by the "
            "device count to use the whole slice",
            batch_size, len(devices), n_data, n_model,
            len(devices) - n_data * n_model)
    return make_mesh(n_data=n_data, n_model=n_model, devices=devices)


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch with its leading axis split across 'data'.

    Single-process: a plain device_put. Multi-process (after
    parallel.distributed.maybe_initialize): `tree` holds this PROCESS's
    slice of the global batch — the reference's per-rank loader contract
    (`args.batch_size // world_size`, train_rgb.py:88) — and the global
    array is assembled via jax.make_array_from_process_local_data (the
    global shape is deduced from the sharding: local rows × the number
    of data-axis shards per process)."""
    sh = data_parallel_sharding(mesh)
    if jax.process_count() > 1:
        def put(x):
            return jax.make_array_from_process_local_data(sh, x, None)
    else:
        def put(x):
            return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, tree)


def process_local_batch(tree):
    """Slice this process's rows out of a GLOBAL host batch.

    Multi-host DP contract: every process assembles the same global
    batch (BatchIterator is seed-synced — the analog of the reference's
    sync_random_seed DistributedSampler, utils_distributed_sampler.py),
    then keeps rows [pid·local, (pid+1)·local) — which is exactly the
    slice make_array_from_process_local_data expects, because mesh
    construction orders devices process-contiguously (jax.devices()
    sorts by process). Single-process: identity."""
    n, pid = jax.process_count(), jax.process_index()
    if n == 1:
        return tree

    def sl(x):
        assert x.shape[0] % n == 0, \
            f"global batch {x.shape[0]} must divide process count {n}"
        local = x.shape[0] // n
        return x[pid * local:(pid + 1) * local]

    return jax.tree_util.tree_map(sl, tree)


def process_slice(seq):
    """This process's contiguous share of a GLOBAL per-batch sequence
    (e.g. the frame indices of one reenactment batch): rows
    [pid·local, (pid+1)·local) — the slice whose loaded data
    `shard_batch` expects under multi-process. Single-process:
    identity."""
    n, pid = jax.process_count(), jax.process_index()
    if n == 1:
        return seq
    assert len(seq) % n == 0, \
        f"global batch {len(seq)} must divide process count {n}"
    local = len(seq) // n
    return seq[pid * local:(pid + 1) * local]


def host_gather(x):
    """Globally-sharded device array → full numpy array on EVERY host.
    Single-process: plain fetch. Multi-process: all-gather over the
    process set (a sharded output is not fully addressable on any one
    host, so np.asarray would throw)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / optimizer state) on the mesh.
    Works multi-process too: every process passes the same host values
    (same PRNG seed), which jax.device_put assumes for fully-replicated
    shardings."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
