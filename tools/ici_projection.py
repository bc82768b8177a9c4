"""Multi-chip ICI scaling projection (VERDICT r2 #7).

Derives bytes-over-ICI per training step from the REAL flagship model
(param pytree sizes + renderer activation shapes), cross-checks the
collective census captured on the 8-device virtual mesh
(tools/trace_multichip.py), and projects scaling efficiency at 8/32/256
chips for v5e and v5p ICI bandwidths — the methodology the reference
documents with measured nodes in docs/speed_benchmark.md:63-93.

Model (scaling-book recipe):
  * DP gradient sync: ring all-reduce moves 2*(n-1)/n * grad_bytes per
    chip; overlappable with the backward, so efficiency is computed
    both overlapped (comm hidden up to bwd time) and serial (upper
    bound on loss).
  * PartialFC hybrid: all_gather of L2-normed embeddings over the model
    axis (batch*512*4B), two scalar psum rounds for the distributed
    softmax (max + sum: batch*4B each), plus DP sync of backbone grads.
  * Per-chip compute time is taken from MEASURED single-chip step times
    (see STATUS.md), so the projection inherits real MXU utilization.

ICI numbers (public): v5e 2D torus, 4 links x 45 GB/s/dir per chip;
v5p 3D torus, 6 links x 90 GB/s/dir per chip. All-reduce effective
bandwidth per chip ~ links*bw (bidirectional ring pipelining).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import json


def tree_bytes(tree):
    import jax
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(tree) if hasattr(x, "size"))


def body():
    import jax
    import jax.numpy as jnp

    from hfa_gp_tpu.models import lpips as lpips_mod
    from hfa_gp_tpu.models.avatar import heads
    from hfa_gp_tpu.train import rgb as rgb_train

    cfg = heads.AvatarConfig()            # flagship 512² config
    params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg)

    # --- gradient bytes: what the DP all-reduce actually carries.
    # train/rgb.py takes grads of the FULL params pytree (frozen
    # branches get zeros but still sync; tune_iter freezing is a mask,
    # not a pytree split) → grad bytes = fp32 params bytes.
    grad_bytes = tree_bytes(
        jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), params))

    arrays = {k: tree_bytes(v) for k, v in params.items()} \
        if isinstance(params, dict) else {}

    # --- arcface: r50 backbone + PartialFC
    from hfa_gp_tpu.models.arcface import init_backbone
    bparams, _ = init_backbone(jax.random.PRNGKey(0), "r50")
    arc_grad_bytes = tree_bytes(
        jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), bparams))

    out = {
        "avatar_grad_bytes": int(grad_bytes),
        "avatar_param_groups": {k: int(v) for k, v in arrays.items()},
        "arcface_r50_grad_bytes": int(arc_grad_bytes),
    }

    # --- measured single-chip step times (STATUS.md; update when
    # re-measured). These set the compute side of the ratio.
    MEAS = {
        # seconds per step, batch per chip
        "rgb_train": {"t": None, "batch": 2},      # filled from argv
        # 1M ids PFC-0.1, fresh-process pipelined measurement (r3;
        # the r2 15.9k samples/s figure was a drain bug — see STATUS)
        "arcface_pfc01": {"t": 256.0 / 1383.0, "batch": 256},
    }
    if len(sys.argv) > 1:
        MEAS["rgb_train"]["t"] = float(sys.argv[1])
    else:
        MEAS["rgb_train"]["t"] = 0.31               # r2 number

    # --- ICI models: (name, per-chip all-reduce GB/s effective)
    ICI = {"v5e": 4 * 45e9, "v5p": 6 * 90e9}

    rows = []
    for n in (8, 32, 256):
        for hw, bw in ICI.items():
            # RGB trainer: pure DP (the windowed sampler shard_map path)
            t_comp = MEAS["rgb_train"]["t"]
            ar_bytes = 2 * (n - 1) / n * grad_bytes
            t_comm = ar_bytes / bw
            eff_overlap = min(1.0, t_comp / max(t_comp, t_comm))
            eff_serial = t_comp / (t_comp + t_comm)
            rows.append({
                "prog": "rgb_train(DP)", "chips": n, "ici": hw,
                "comm_MB_per_chip": round(ar_bytes / 1e6, 1),
                "t_comp_ms": round(t_comp * 1e3, 1),
                "t_comm_ms": round(t_comm * 1e3, 2),
                "eff_overlapped": round(eff_overlap, 4),
                "eff_serial": round(eff_serial, 4),
            })
        # arcface hybrid: DP backbone sync + MP embedding all-gather
        for hw, bw in ICI.items():
            t_comp = MEAS["arcface_pfc01"]["t"]
            b = MEAS["arcface_pfc01"]["batch"]
            ar_bytes = 2 * (n - 1) / n * arc_grad_bytes
            # all_gather embeddings: global batch b*n rows x 512 x 4B
            # arrive at each chip; + same again for the grad scatter
            ag_bytes = 2 * (b * n * 512 * 4) * (n - 1) / n
            t_comm = (ar_bytes + ag_bytes) / bw
            rows.append({
                "prog": "arcface(DPxMP)", "chips": n, "ici": hw,
                "comm_MB_per_chip": round((ar_bytes + ag_bytes) / 1e6, 1),
                "t_comp_ms": round(t_comp * 1e3, 1),
                "t_comm_ms": round(t_comm * 1e3, 2),
                "eff_overlapped": round(
                    min(1.0, t_comp / max(t_comp, t_comm)), 4),
                "eff_serial": round(t_comp / (t_comp + t_comm), 4),
            })
    out["projection"] = rows
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    body()
