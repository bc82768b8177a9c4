"""Windowed MXU tri-plane sampler — the TPU answer to EG3D's grid_sample.

Reference hot path: the tri-plane bilinear lookup inside G.synthesis
(code/networks/headnerf.py:112; renderer math from the public EG3D repo).
Round-1 finding (CLAUDE.md): TPU gathers are ISSUE-bound — the XLA
row-gather formulation (renderer.grid_sample_packed) tops out at ~54M
rows/s and eats ~60% of synthesis time, while the MXU sits idle.

This kernel re-expresses bilinear sampling as a small matmul per block:

  * Points are blocked by (ray tile × depth window). Camera geometry
    makes each block's plane footprint tiny (tools/footprint.py: p95
    ≤ 32–35 texels for a 16×16-ray × 4-depth block), so a (S×S) plane
    slab DMA'd to VMEM covers every bilinear corner the block touches.
  * For each block, a weight matrix W (P points × S·S texels) holds the
    bilinear weights: W[p, (y,x)] = tri(y - py) · tri(x - px) with
    tri(t) = max(0, 1 - |t|) and (py, px) the point's fractional texel
    coords relative to the slab origin. This is EXACTLY the bilinear
    kernel, including grid_sample's zeros padding: out-of-plane corners
    match no slab texel and contribute 0.
  * features = W @ slab  — one (P × S²) @ (S² × C) MXU matmul replaces
    P issue-bound gathers.

Weights and slab are cast to bf16 for the matmul (fp32 accumulation);
max abs error vs the fp32 XLA path is ~1e-2 on unit-scale features —
below the bf16 trunk noise the pipeline already runs with.

The slab origin per block is computed host-side (XLA prepass) from the
block's uv bbox. Blocks whose footprint exceeds the slab (pathological
poses, or importance-sampled depth windows that straddle a silhouette)
lose the out-of-slab corners (they read as zeros); `plan_blocks` returns
an `overflow` fraction so callers can measure that envelope — see
tests/test_pallas_triplane.py and tools/bench_triplane.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Block planning (XLA prepass)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BlockPlan:
    """Static geometry of a blocked sampling pass."""
    n_blocks: int          # total blocks NB
    points: int            # points per block P
    tile: int              # ray tile side T (T×T rays per block)
    depth_window: int      # depth samples per block
    slab: int              # slab side S (S×S texels in VMEM)
    res: int               # render resolution (rays = res²)
    n_depth: int           # depth samples per ray
    plane_hw: int          # plane resolution


def _block_coords(texel_xy: jax.Array, plan: BlockPlan) -> jax.Array:
    """(B3, res, res, N, 2) texel coords → (NB, 2, P) blocked, where
    blocks iterate (b3, tile_y, tile_x, window) and P iterates
    (ray_y, ray_x, depth)."""
    b3 = texel_xy.shape[0]
    t, dw = plan.tile, plan.depth_window
    nt = plan.res // t
    nw = plan.n_depth // dw
    x = texel_xy.reshape(b3, nt, t, nt, t, nw, dw, 2)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (b3, nty, ntx, nw, t, t, dw, 2)
    x = x.reshape(plan.n_blocks, plan.points, 2)
    return x.transpose(0, 2, 1)              # (NB, 2, P)


def _unblock_feats(blocked: jax.Array, plan: BlockPlan, b3: int) -> jax.Array:
    """(NB, P, C) → (B3, res*res*N, C), inverting _block_coords."""
    t, dw = plan.tile, plan.depth_window
    nt = plan.res // t
    nw = plan.n_depth // dw
    c = blocked.shape[-1]
    x = blocked.reshape(b3, nt, nt, nw, t, t, dw, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # (b3, nty, t, ntx, t, nw, dw, c)
    return x.reshape(b3, plan.res * plan.res * plan.n_depth, c)


def plan_blocks(coordinates: jax.Array, plane_inv: np.ndarray,
                box_warp: float, *, res: int, n_depth: int, plane_hw: int,
                tile: int, depth_window: int, slab: int
                ) -> tuple[BlockPlan, jax.Array, jax.Array, jax.Array]:
    """coordinates (B, M=res²·N, 3) world points → (plan, txy (NB,2,P)
    fp32 slab-relative texel coords, origins (NB,3) int32
    [b3, oy, ox], overflow (NB,) bool)."""
    b = coordinates.shape[0]
    b3 = b * 3
    nb = b3 * (res // tile) ** 2 * (n_depth // depth_window)
    p = tile * tile * depth_window
    plan = BlockPlan(nb, p, tile, depth_window, slab, res, n_depth, plane_hw)

    coords = (2.0 / box_warp) * coordinates
    inv = jnp.asarray(plane_inv, jnp.float32)
    uv = jnp.einsum("bmj,pjk->bpmk", coords.astype(jnp.float32), inv)[..., :2]
    texel = (uv + 1.0) * (plane_hw / 2.0) - 0.5
    texel = texel.reshape(b3, res, res, n_depth, 2)

    txy = _block_coords(texel, plan)                       # (NB, 2, P)
    mn = jnp.floor(jnp.min(txy, axis=-1))                  # (NB, 2) [x, y]
    mx = jnp.ceil(jnp.max(txy, axis=-1)) + 1.0             # +1 bilinear apron
    center = (mn + mx) / 2.0
    org = jnp.clip(jnp.round(center - slab / 2.0), 0, plane_hw - slab)
    org = org.astype(jnp.int32)                            # (NB, 2) [ox, oy]
    overflow = jnp.any(mx - mn > slab, axis=-1)
    # clip degenerate coords (inf/nan-free guarantee for the kernel)
    txy = jnp.clip(txy, -2.0 * plane_hw, 2.0 * plane_hw)
    # make coords slab-relative here (saves SMEM→VPU broadcasts in-kernel)
    txy = txy - org[:, :, None].astype(jnp.float32)
    b3_idx = jnp.repeat(jnp.arange(b3, dtype=jnp.int32), nb // b3)
    origins = jnp.stack([b3_idx, org[:, 1], org[:, 0]], axis=-1)  # b3, oy, ox
    return plan, txy, origins, overflow


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _sampler_kernel(origins_ref, txy_ref, planes_ref, out_ref,
                    slab_ref, sem_ref, *, slab: int, channels: int):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(j, slot):
        return pltpu.make_async_copy(
            planes_ref.at[origins_ref[j, 0],
                          pl.ds(origins_ref[j, 1], slab),
                          pl.ds(origins_ref[j, 2], slab), :],
            slab_ref.at[slot],
            sem_ref.at[slot],
        )

    # double-buffered slab prefetch: block i's DMA was started at step
    # i-1 (block 0 starts its own); kick off block i+1's before compute.
    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        dma(i + 1, jax.lax.rem(i + 1, 2)).start()

    dma(i, slot).wait()

    p = txy_ref.shape[1]
    k = slab * slab
    px = txy_ref[0, 0, :].reshape(p, 1)           # slab-relative fp32
    py = txy_ref[0, 1, :].reshape(p, 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)
    yr = (j // slab).astype(jnp.float32)
    xc = (j % slab).astype(jnp.float32)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(yr - py))
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(xc - px))
    w = (ty * tx).astype(jnp.bfloat16)            # (P, K) bilinear weights

    s = slab_ref[slot].reshape(k, channels).astype(jnp.bfloat16)
    out_ref[0, :, :] = jnp.dot(w, s, preferred_element_type=jnp.float32)


def sample_blocked(plan: BlockPlan, txy: jax.Array, origins: jax.Array,
                   planes_flat: jax.Array) -> jax.Array:
    """txy (NB,2,P) slab-relative, origins (NB,3) int32,
    planes_flat (B3, H, W, C) → (NB, P, C) fp32 bilinear features."""
    b3, h, w_, c = planes_flat.shape
    assert h == w_ == plan.plane_hw
    nb, _, p = txy.shape
    s = plan.slab

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 2, p), lambda i, org: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),      # planes stay in HBM
        ],
        out_specs=pl.BlockSpec((1, p, c), lambda i, org: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s, s, c), planes_flat.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_sampler_kernel, slab=s, channels=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, p, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * p * s * s * c,
            bytes_accessed=nb * (p * s * s * 2 + s * s * c * 4 + p * c * 4),
            transcendentals=0,
        ),
    )(origins, txy, planes_flat)
    return out


def sample_from_planes_windowed(planes: jax.Array, coordinates: jax.Array,
                                box_warp: float, plane_inv: np.ndarray,
                                *, res: int, n_depth: int, tile: int,
                                depth_window: int, slab: int) -> jax.Array:
    """Drop-in for renderer.sample_from_planes on blocked-friendly shapes.

    planes (B, 3, H, W, C); coordinates (B, res²·n_depth, 3) ordered
    (ray_row, ray_col, depth) → (B, 3, M, C) fp32 features."""
    b, n_planes, h, w_, c = planes.shape
    plan, txy, origins, _ = plan_blocks(
        coordinates, plane_inv, box_warp, res=res, n_depth=n_depth,
        plane_hw=h, tile=tile, depth_window=depth_window, slab=slab)
    planes_flat = planes.reshape(b * n_planes, h, w_, c)
    blocked = sample_blocked(plan, txy, origins, planes_flat)
    feats = _unblock_feats(blocked, plan, b * n_planes)
    return feats.reshape(b, n_planes, -1, c)
