"""Dump the optimized HLO of the slow merge+march backward and of the
fast merge-only backward, and diff the expensive ops. No timing — just
compile (still goes through the axon tunnel compiler).

Usage: python tools/probe_merge_march3.py [batch]
"""
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hfa_gp_tpu.models.avatar import heads
from hfa_gp_tpu.models.eg3d import renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2

acfg = heads.AvatarConfig(eg3d=EG3DConfig(
    compute_dtype=jnp.bfloat16,
    render=rnd.RenderConfig(use_pallas_sampler=True,
                            decoder_dtype=jnp.bfloat16)))
cfg = acfg.eg3d.render
res = cfg.neural_rendering_resolution
R = res * res
N1 = cfg.depth_resolution
N2 = cfg.depth_resolution_importance
k = jax.random.PRNGKey(2)
d1 = jnp.sort(jax.random.uniform(k, (B, R, N1, 1), minval=2.2,
                                 maxval=3.3), axis=-2)
d2 = jnp.sort(jax.random.uniform(jax.random.fold_in(k, 1),
                                 (B, R, N2, 1), minval=2.2,
                                 maxval=3.3), axis=-2)
c1 = jax.random.normal(jax.random.fold_in(k, 2), (B, R, N1, 32))
c2 = jax.random.normal(jax.random.fold_in(k, 3), (B, R, N2, 32))
s1 = jax.random.normal(jax.random.fold_in(k, 4), (B, R, N1, 1))
s2 = jax.random.normal(jax.random.fold_in(k, 5), (B, R, N2, 1))


def pair_loss(c1_, s1_, c2_, s2_):
    d, c, s = rnd.unify_samples(d1, c1_, s1_, d2, c2_, s2_,
                                sorted_inputs=True)
    rgb, dep, w = rnd.ray_march(c, s, d, cfg)
    return jnp.mean(jnp.abs(rgb)) + jnp.mean(jnp.abs(dep))


def pair_grad(c1_, s1_, c2_, s2_):
    gr = jax.grad(pair_loss, argnums=(0, 1, 2, 3))(c1_, s1_, c2_, s2_)
    return sum(jnp.sum(jnp.abs(x)) for x in gr)


print("lower+compile pair fwd+bwd ...", flush=True)
comp = jax.jit(pair_grad).lower(c1, s1, c2, s2).compile()
txt = comp.as_text()
with open("/tmp/pair_bwd.hlo", "w") as f:
    f.write(txt)
print(f"HLO: {len(txt)} chars -> /tmp/pair_bwd.hlo", flush=True)

# summarize: big-shape ops, dots/convs/transposes/sorts with byte sizes
DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
      "s8": 1, "u8": 1, "s64": 8, "f64": 8}


def nbytes(shape_str):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DT.get(dt, 4)


rows = []
for line in txt.splitlines():
    ls = line.strip()
    m = re.match(r"(?:ROOT )?%?[\w.-]+ = (\S+\[\S*\]?\S*) (\w+)", ls)
    if not m:
        continue
    shape, op = m.group(1), m.group(2)
    if op in ("parameter", "constant", "get-tuple-element", "tuple",
              "bitcast"):
        continue
    nb = nbytes(shape)
    if nb >= 64 * 1024 * 1024 or op in ("dot", "sort", "transpose",
                                        "custom-call"):
        rows.append((nb, op, shape, ls[:200]))

rows.sort(reverse=True)
print("\n== ops >=64MB or dot/sort/transpose/custom-call ==")
seen = set()
for nb, op, shape, ls in rows[:60]:
    key = (op, shape)
    if key in seen:
        continue
    seen.add(key)
    cnt = sum(1 for r in rows if (r[1], r[2]) == key)
    print(f"{nb/1e6:9.1f} MB  x{cnt:3d}  {op:12s} {shape}")
print("\n== fusion count ==", txt.count(" fusion("))
