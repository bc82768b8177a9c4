"""SR backward HLO attribution (r5). The channel-major img chain did NOT
move the 19 ms full-vs-no-img-chain gap (probe_sr_cm_r5.log: 42.1 vs
23.7 ms at batch 2), so the 3-channel NHWC layout hypothesis is dead.
Compile BOTH variants, summarize the optimized HLO (op class x shape,
bytes), and diff — whatever big work exists only in the full graph is
the gap.

Usage: python tools/probe_sr_hlo.py [batch]
"""
import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.models.eg3d import networks as nets

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
DT = jnp.bfloat16

cfg = nets.SRConfig()
params = nets.init_superresolution(jax.random.PRNGKey(0), cfg)
ws = jax.random.normal(jax.random.PRNGKey(3), (B, 14, 512))
feat = jax.random.normal(jax.random.PRNGKey(4), (B, 128, 128, 32),
                         jnp.float32)


def sr_loss(sp, f):
    img = nets.superresolution_apply(sp, cfg, f[..., :3], f, ws,
                                     noise_mode="none", rng=None,
                                     compute_dtype=DT)
    return jnp.mean(jnp.abs(img))


def sr_noimg_loss(sp, f):
    w_last = jnp.tile(ws[:, -1:, :], (1, 3, 1))
    x = f.astype(DT)
    for bname in ("block0", "block1"):
        p = params[bname]
        x = nets.synth_layer_apply(p["conv0"], x, w_last[:, 0], up=2,
                                   fir=cfg.fir, conv_clamp=cfg.conv_clamp,
                                   noise_mode="none")
        x = nets.synth_layer_apply(p["conv1"], x, w_last[:, 1],
                                   fir=cfg.fir, conv_clamp=cfg.conv_clamp,
                                   noise_mode="none")
    return jnp.mean(jnp.abs(x.astype(jnp.float32)))


def grad_sum(loss):
    def f(sp, f_):
        return sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(
            jax.grad(loss, argnums=(0, 1))(sp, f_)))
    return f


DTB = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
       "s8": 1, "u8": 1, "s64": 8, "f64": 8, "u64": 8}


def nbytes(shape_str):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTB.get(dt, 4)


def summarize(name, fn):
    comp = jax.jit(fn).lower(params, feat).compile()
    txt = comp.as_text()
    path = f"/tmp/sr_{name}.hlo"
    with open(path, "w") as fh:
        fh.write(txt)
    print(f"[{name}] HLO {len(txt)} chars -> {path}", flush=True)
    counts = Counter()
    big = Counter()
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.-]+ = (\S+?\[[^\]]*\]\S*) (\S+)\(",
                     ls)
        if not m:
            continue
        shape, op = m.group(1), m.group(2)
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        nb = nbytes(shape)
        key = (op, shape.split("{")[0])
        counts[key] += 1
        big[key] += nb
    rows = sorted(big.items(), key=lambda kv: -kv[1])[:40]
    for (op, shape), nb in rows:
        print(f"  {nb/1e6:9.1f} MB x{counts[(op, shape)]:3d}  {op:16s} "
              f"{shape}", flush=True)
    try:
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print(f"  cost_analysis: flops={ca.get('flops', 0)/1e9:.1f}G "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.2f}GB", flush=True)
    except Exception as e:  # pragma: no cover
        print("  cost_analysis unavailable:", e, flush=True)
    return counts, big


c_full, b_full = summarize("full", grad_sum(sr_loss))
c_noimg, b_noimg = summarize("noimg", grad_sum(sr_noimg_loss))

print("\n== present-in-full minus noimg (by bytes) ==", flush=True)
delta = {k: b_full[k] - b_noimg.get(k, 0) for k in b_full}
for k, d in sorted(delta.items(), key=lambda kv: -kv[1])[:40]:
    if d <= 0:
        break
    op, shape = k
    print(f"  {d/1e6:9.1f} MB  x{c_full[k]:3d} (vs {c_noimg.get(k, 0):3d})"
          f"  {op:16s} {shape}", flush=True)
print("DONE", flush=True)
