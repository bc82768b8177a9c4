"""ArcFace identity-count sweep on the v5e (VERDICT r2 #4) — the
reference's docs/speed_benchmark.md:63-93 table, re-run on one chip.

Sweeps num_classes × {full softmax, PartialFC-0.1} on iresnet50,
batch 256, bf16 compute, synthetic on-device data; pipelined timing
(dispatch N steps through donated state, drain ONE trailing scalar —
CLAUDE.md tunnel rules). Reports samples/sec + the FC memory footprint
(weight + momentum), which is what bounds per-chip identity capacity —
the class axis shards linearly over 'model' chips (shard-local init,
parallel/partial_fc.py).

Usage: python tools/bench_arcface.py [ids,ids,...] [steps]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hfa_gp_tpu.parallel import mesh as mesh_mod
from hfa_gp_tpu.parallel.partial_fc import PartialFC
from hfa_gp_tpu.train import arcface as arc

import os

BATCH = int(os.environ.get("ARC_BATCH", 256))
NETWORK = "iresnet50"


def run(num_classes: int, sample_rate: float, steps: int) -> float:
    mesh = mesh_mod.make_mesh(n_data=1, n_model=1,
                              devices=jax.devices()[:1])
    ce_blk = os.environ.get("ARC_CE_BLOCK", "auto")   # "0" = direct CE
    ce_pal = os.environ.get("ARC_CE_PALLAS", "auto")  # "0" = XLA paths
    pfc = PartialFC(mesh, num_classes=num_classes, embedding_dim=512,
                    sample_rate=sample_rate, matmul_dtype=jnp.bfloat16,
                    ce_block_rows=None if ce_blk == "0" else
                    ("auto" if ce_blk == "auto" else int(ce_blk)),
                    ce_pallas=False if ce_pal == "0" else ce_pal)
    tx, fc_tx = arc.make_optimizers(total_steps=10_000, lr=0.1)
    step = arc.make_train_step(pfc, tx, fc_tx, NETWORK,
                               dtype=jnp.bfloat16, donate=True)

    with jax.sharding.set_mesh(mesh):
        state = arc.init_state(jax.random.PRNGKey(0), pfc, tx, fc_tx,
                               NETWORK)
        key = jax.random.PRNGKey(1)
        imgs = jax.random.normal(jax.random.PRNGKey(2),
                                 (BATCH, 112, 112, 3), jnp.float32)
        labs = jax.random.randint(jax.random.PRNGKey(3), (BATCH,), 0,
                                  num_classes, jnp.int32)

        state, m = step(state, imgs, labs, key)       # compile
        _ = float(m["loss"])
        # three rounds; report the LAST (steady state): the first
        # ~40 post-compile steps run ~20% slow while the allocator
        # churns toward a stable layout near the 16 GB ceiling
        # (measured r4: round 1 ≈ 210 ms/step, steady 167 ms at
        # 1M ids; tools/probe_arc_pipeline.py)
        i = 0
        for r in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                state, m = step(state, imgs, labs,
                                jax.random.fold_in(key, i))
                i += 1
            _ = float(m["loss"])                      # one drain
            dt = (time.perf_counter() - t0) / steps
            print(f"  round {r}: {dt * 1e3:.1f} ms/step", flush=True)
    sps = BATCH / dt
    fc_gb = 2 * num_classes * 512 * 4 / 1e9
    mode = "full" if sample_rate >= 1.0 else f"pfc{sample_rate}"
    print(f"ids={num_classes:>9,} {mode:8s}: {sps:8.0f} samples/sec "
          f"({dt * 1e3:.1f} ms/step, fc+momentum {fc_gb:.1f} GB)",
          flush=True)
    return sps


def main():
    """One SUBPROCESS per config: the chip is single-claim and XLA
    holds donated/compiled buffers for the process lifetime, so
    back-to-back configs in one process OOM at sizes that run fine
    fresh (observed: 1M full after a 125k pair). OOM itself is a
    recorded result — the reference's sweep table has OOM cells too
    (docs/speed_benchmark.md:63-77)."""
    import subprocess

    ids = ([int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1
           else [125_000, 1_000_000, 2_000_000])
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    for n in ids:
        for rate in (1.0, 0.1):
            r = subprocess.run(
                [sys.executable, __file__, "--one", str(n), str(rate),
                 str(steps)], capture_output=True, text=True,
                timeout=900)
            out = r.stdout.strip().splitlines()
            if r.returncode == 0 and out:
                print(out[-1], flush=True)
            else:
                err = r.stdout + r.stderr
                tag = ("OOM" if ("RESOURCE_EXHAUSTED" in err
                                 or "Ran out of memory" in err)
                       else f"rc={r.returncode}")
                mode = "full" if rate >= 1.0 else f"pfc{rate}"
                print(f"ids={n:>9,} {mode:8s}: {tag} "
                      f"(fc+momentum {2 * n * 512 * 4 / 1e9:.1f} GB)",
                      flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run(int(sys.argv[2]), float(sys.argv[3]), int(sys.argv[4]))
    else:
        main()
