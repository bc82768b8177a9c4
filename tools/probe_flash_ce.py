"""On-HARDWARE parity check of the Pallas flash-CE kernel vs the dense
XLA statistics (interpret mode already matches on CPU; the full-step
profile suggested a hardware-only backward divergence). C=100k keeps
the same tile shapes as the 1M production point (1000 fwd / 800 bwd)
at 1/10 the runtime.

Usage: python tools/probe_flash_ce.py [C] [B] [mm=bf16|fp32]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hfa_gp_tpu.parallel.pallas_ce import flash_ce_stats, pick_tile

C = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
MM = jnp.bfloat16 if (len(sys.argv) < 4 or sys.argv[3] == "bf16") \
    else None
D, S = 512, 64.0

rng = np.random.default_rng(0)
ne = rng.standard_normal((B, D)).astype(np.float32)
ne /= np.linalg.norm(ne, axis=1, keepdims=True)
w = rng.standard_normal((C, D)).astype(np.float32)
lab = rng.integers(-1, C, B).astype(np.int32)
ne, w, lab = jnp.asarray(ne), jnp.asarray(w), jnp.asarray(lab)
tf, tb = pick_tile(C, 1024), pick_tile(C, 800)
print(f"C={C} B={B} tiles fwd={tf} bwd={tb} mm={MM}", flush=True)


def dense(ne_, w_):
    nw = w_ / jnp.linalg.norm(w_, axis=1, keepdims=True)
    nem, nwm = (ne_, nw) if MM is None else (ne_.astype(MM),
                                             nw.astype(MM))
    logit = jnp.clip(jnp.dot(nem, nwm.T,
                             preferred_element_type=jnp.float32), -1, 1)
    tgt = jnp.where(lab >= 0,
                    logit[jnp.arange(B), jnp.maximum(lab, 0)], 0.0)
    # target column EXCLUDED (the kernel's contract)
    e = jnp.exp(logit * S - S)
    e = jnp.where(jnp.arange(C)[None, :] == lab[:, None], 0.0, e)
    return jnp.sum(e, axis=1), tgt


def flash(ne_, w_):
    return flash_ce_stats(ne_, w_, lab, S, MM, tf, tb, False)


def scalarize(fn, a, b):
    def g(ne_, w_):
        se, tgt = fn(ne_, w_)
        return jnp.sum(jnp.log(se) * a + tgt * b)
    return g


@jax.jit
def compare():
    se_p, tgt_p = flash(ne, w)
    se_d, tgt_d = dense(ne, w)
    outs = {
        "se_rel": jnp.max(jnp.abs(se_p - se_d) / (jnp.abs(se_d) + 1e-30)),
        "tgt_abs": jnp.max(jnp.abs(tgt_p - tgt_d)),
    }
    for nm, (a, b) in {"dse": (1.0, 0.0), "dtgt": (0.0, 1.0),
                       "both": (1.0, 0.7)}.items():
        gp = jax.grad(scalarize(flash, a, b), argnums=(0, 1))(ne, w)
        gd = jax.grad(scalarize(dense, a, b), argnums=(0, 1))(ne, w)
        for i, part in ((0, "dne"), (1, "dw")):
            scale = jnp.max(jnp.abs(gd[i])) + 1e-30
            outs[f"{nm}.{part}"] = jnp.max(jnp.abs(gp[i] - gd[i])) / scale
    return outs


t0 = time.perf_counter()
res = {k: float(v) for k, v in compare().items()}
print(f"compile+run {time.perf_counter() - t0:.0f}s", flush=True)
for k, v in res.items():
    print(f"{k}: {v:.3e}", flush=True)
print("DONE", flush=True)
