"""Windowed MXU tri-plane sampler — the TPU answer to EG3D's grid_sample.

Reference hot path: the tri-plane bilinear lookup inside G.synthesis
(code/networks/headnerf.py:112; renderer math from the public EG3D repo).
Round-1 finding (CLAUDE.md): TPU gathers are ISSUE-bound — the XLA
row-gather formulation (renderer.grid_sample_packed) tops out at ~54M
rows/s and eats ~60% of synthesis time, while the MXU sits idle.

This kernel re-expresses bilinear sampling as small matmuls per block:

  * Points are blocked by (ray tile × depth window). Camera geometry
    makes each block's plane footprint tiny (tools/footprint.py: p95
    ≤ 32–35 texels for a 16×16-ray × 4-depth block), so a plane slab
    DMA'd to VMEM covers every bilinear corner the block touches.
  * Planes are stored QUAD-PACKED: (B3, H/4, W, 4·C) with four
    consecutive y-rows stacked into 128 channels. That fills the
    128-lane minor dim with real data (a zero-padded (…, 32→128)
    layout was measured DMA-bound: 4× redundant bytes at ~150 GB/s
    effective ate ~3.5 µs/block), and makes each DMA row a contiguous
    Sx·128·2B run.
  * For each block, ONE weight matrix W (Sy/4·Sx × P) holds
    one-hot(y-quad) · tri(x - px), anchored on the quad containing
    floor(py) (clamped to quad 0 so the top plane edge keeps its
    in-plane corner). Two MXU matmuls — W against the slab and W
    against a ONE-QUAD-SHIFTED view of the same slab — produce
    x-interpolated features for rows 0..3 of the anchor quad plus the
    straddling row 4; a cheap (C, P) epilogue applies the 5 y-triangle
    weights. Slabs carry Sy/4 + 1 quad rows so the shifted view always
    exists; `quad_pack_planes` appends one ZERO quad row at the plane
    bottom so edge slabs stay in-bounds and off-plane rows read zeros.
    This is EXACTLY bilinear with grid_sample's zeros padding:
    out-of-plane corners match no slab texel (x) or carry zero
    triangle weight / read the zero pad (y) and contribute 0.
  * vs one direct (P × Sy·Sx) @ (Sy·Sx × 128) matmul, the quad split
    halves MXU work and quarters the VPU weight-build; the shifted-slab
    trick (r3) then removes the SECOND weight build entirely — the
    (K4, P) compare/select/cast chain was the kernel's VPU bottleneck
    (CLAUDE.md: v5e VPU is 1024 elem-ops/cycle).

Weights and slab are bf16 (fp32 accumulation); max abs error vs the
fp32 XLA path is ~2e-2 on unit-scale features — below the bf16 trunk
noise the pipeline already runs with. (An fp32-dot variant that skips
the casts measured faster at batch 4 but slower at the batch-8
operating point — tools/profile_sampler_e2e.py.)

Slab origins are computed host-side (XLA prepass) from each block's uv
bbox, aligned to the quad/tile grid (oy mult 4, ox mult 16 — Mosaic
needs provably tile-aligned HBM slice offsets for bf16). Blocks whose
footprint exceeds the slab (pathological poses, or importance-sampled
depth windows straddling a silhouette) lose the out-of-slab corners
(they read zeros); `plan_blocks` returns an `overflow` mask so callers
can measure that envelope — see tests/test_pallas_triplane.py and
tools/bench_triplane.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Y_ALIGN = 4     # quad height; oy offsets are in quad units
X_ALIGN = 16    # bf16 sublane tile of the packed-plane W dim


def x_align_for(dtype) -> int:
    """Mosaic needs HBM slice offsets provably aligned to the sublane
    tile: 16 texels for bf16 planes, 8 for fp32. fp32 planes therefore
    admit a narrower slab at the SAME footprint coverage (slab_x −
    (align − 1) is the guaranteed span): (40, 40) fp32 covers exactly
    what (40, 48) bf16 does, cutting K4 = Sy/4·Sx — the VPU weight
    build AND MXU contraction length — by 17%."""
    return 8 if jnp.dtype(dtype).itemsize == 4 else 16


def effective_slab(slab: tuple[int, int], x_align: int) -> tuple[int, int]:
    """Shrink a bf16-sized (Sy, Sx) slab for a finer x alignment at
    IDENTICAL guaranteed footprint coverage: the span a slab always
    covers is Sx − (align − 1), so (Sy, Sx−8) at align 8 covers exactly
    what (Sy, Sx) covers at align 16."""
    sy, sx = slab
    return (sy, sx - (X_ALIGN - x_align))


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
    slab_y: int            # slab height in texels (mult of 4)
    slab_x: int            # slab width in texels (mult of 16)
    res: int               # render resolution (rays = res²)
    n_depth: int           # depth samples per ray
    plane_hw: int          # plane resolution
    x_align: int = 16      # HBM x-offset alignment (16 bf16 / 8 fp32)


def _block_coords(texel_xy: jax.Array, plan: BlockPlan) -> jax.Array:
    """(B3, res, res, N, 2) texel coords → (NB, 2, P) blocked, where
    blocks iterate (b3, tile_y, tile_x, window) and P iterates
    (depth, ray_y, ray_x).

    The kernel is fully LANE-MAJOR in P: coords are (1, P) rows, the
    matmul emits (C, P), the output is (NB, C, P). Layouts with P on
    sublanes were measured pathological both ways: reading (P, 1)
    columns from a (…, P, 2) block makes the pipeline DMA row-count
    bound (P tiny rows per block ≈ 2.6 µs), and (P,)→(P, 1) reshapes
    force a lane→sublane relayout (~2 µs/block).

    STAGED so every materialized transpose keeps a large minor dim: the
    original single 8-D transpose (minor dims (dw, 2)) let XLA pick a
    T(8,128)-tiled layout with 42× padding expansion — a 12 GB HLO temp
    at batch 16 (compile-time OOM) and multi-GB hidden copies at
    batch 8. Depth-outermost P ordering is what makes the second stage's
    minor dim the contiguous t·t ray tile."""
    b3 = texel_xy.shape[0]
    t, dw = plan.tile, plan.depth_window
    nw = plan.n_depth // dw
    nt = plan.res // t
    # (b3, nty, ty, ntx, tx, n, 2) → (2, b3, nty, ntx, ty, tx, n):
    # minor n = n_depth lanes
    x = texel_xy.reshape(b3, nt, t, nt, t, plan.n_depth, 2)
    x = x.transpose(6, 0, 1, 3, 2, 4, 5)
    # (2, B', tt, nw, dw) → (2, B', nw, dw, tt): minor tt = t·t lanes
    x = x.reshape(2, b3 * nt * nt, t * t, nw, dw)
    x = x.transpose(0, 1, 3, 4, 2)
    x = x.reshape(2, plan.n_blocks, plan.points)
    return x.transpose(1, 0, 2)


def unblock_feats(blocked: jax.Array, plan: BlockPlan, b3: int) -> jax.Array:
    """(NB, C, P) → (B3, res*res*N, C), inverting _block_coords.

    Same staging rule: only the FINAL materialization (the (…, C)
    target layout itself) has a sub-128 minor dim; the depth unfold
    keeps the t·t ray tile minor."""
    t, dw = plan.tile, plan.depth_window
    nt = plan.res // t
    nw = plan.n_depth // dw
    c = blocked.shape[1]
    # (B_, C, dw, tt) → (B_, dw, C, tt): minor tt = t·t lanes
    x = blocked.reshape(b3 * nt * nt * nw, c, dw, t * t)
    x = x.transpose(0, 2, 1, 3)
    # (b3, nty, ntx, n, c, ty, tx) → (b3, nty, ty, ntx, tx, n, c)
    x = x.reshape(b3, nt, nt, nw * dw, c, t, t)
    x = x.transpose(0, 1, 5, 2, 6, 3, 4)
    return x.reshape(b3, plan.res * plan.res * plan.n_depth, c)


# legacy private name (pre-promotion callers: tools/, renderer history)
_unblock_feats = unblock_feats


def quad_pack_planes(planes: jax.Array) -> jax.Array:
    """(B, 3, H, W, C) → (B·3, H/4 + 1, W, 4C) with 4 consecutive
    y-rows stacked into channels (the kernel's HBM layout), plus ONE
    zero quad row appended at the bottom: slab DMAs read Sy/4 + 1 quad
    rows (the shifted-view trick), and the pad both keeps bottom-edge
    slabs in-bounds and supplies grid_sample's zeros for row H."""
    b, n3, h, w, c = planes.shape
    x = planes.reshape(b * n3, h // 4, 4, w, c)
    x = x.transpose(0, 1, 3, 2, 4)
    x = x.reshape(b * n3, h // 4, w, 4 * c)
    return jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))


def plan_blocks(coordinates: jax.Array, plane_inv: np.ndarray,
                box_warp: float, *, res: int, n_depth: int, plane_hw: int,
                tile: int, depth_window: int,
                slab: int | tuple[int, int],
                x_align: int = X_ALIGN
                ) -> tuple[BlockPlan, jax.Array, jax.Array, jax.Array]:
    """coordinates (B, M=res²·N, 3) world points → (plan, txy (NB,2,P)
    fp32 slab-relative texel coords, origins (NB,) packed int32
    [b3·2²⁰ | (oy/4)·2¹⁰ | ox], overflow (NB,) bool)."""
    sy, sx = (slab, slab) if isinstance(slab, int) else slab
    assert sy % Y_ALIGN == 0 and sx % x_align == 0, (sy, sx, x_align)
    b = coordinates.shape[0]
    b3 = b * 3
    # packed-origin word budget: 10 bits each for ox and oy/4, and b3
    # lives at bits 20..30 (int32 sign bit must stay clear) — exceeding
    # these would silently DMA the wrong slabs
    assert plane_hw - sx <= 0x3FF and (plane_hw - sy) // Y_ALIGN <= 0x3FF, \
        f"plane_hw {plane_hw} too large for 10-bit packed origins"
    assert b3 < 2048, f"batch*3 = {b3} overflows the 11-bit plane index"
    nb = b3 * (res // tile) ** 2 * (n_depth // depth_window)
    p = tile * tile * depth_window
    plan = BlockPlan(nb, p, tile, depth_window, sy, sx, res, n_depth,
                     plane_hw, x_align)

    coords = (2.0 / box_warp) * coordinates
    inv = jnp.asarray(plane_inv, jnp.float32)
    uv = jnp.einsum("bmj,pjk->bpmk", coords.astype(jnp.float32), inv)[..., :2]
    texel = (uv + 1.0) * (plane_hw / 2.0) - 0.5
    texel = texel.reshape(b3, res, res, n_depth, 2)

    txy = _block_coords(texel, plan)                       # (NB, 2, P)
    mn = jnp.floor(jnp.min(txy, axis=2))                   # (NB, 2) [x, y]
    mx = jnp.floor(jnp.max(txy, axis=2)) + 2.0             # +1 bilinear apron
    # y coverage is sy + 1 rows: the anchor quad row floor(py) must sit
    # in the slab's sy rows, and row floor(py)+1 is reached through the
    # one-quad-shifted matmul view (the slab DMA carries sy/4 + 1 quads)
    size = jnp.asarray([sx, sy + 1], jnp.float32)
    align = np.array([x_align, Y_ALIGN], np.int32)
    # align the slab's left/top edge DOWN from the footprint min: the
    # low side is always covered; the high side is covered whenever the
    # footprint fits in slab - (align - 1)
    org = (jnp.clip(mn, 0, None).astype(jnp.int32) // align) * align
    # the high-side clip must itself land on the alignment grid, or the
    # kernel's pl.multiple_of(ox, x_align) promise to Mosaic is false
    # for right/bottom-edge blocks (a misaligned tile DMA reads the
    # wrong slab silently)
    assert plane_hw % x_align == 0 and (plane_hw - sy) % Y_ALIGN == 0, \
        (plane_hw, x_align, sy)
    hi = np.array([plane_hw - sx, plane_hw - sy], np.int32)
    org = jnp.clip(org, 0, hi)                             # (NB, 2) [ox, oy]
    orgf = org.astype(jnp.float32)
    # overflow = bilinear corners INSIDE the plane that fall outside the
    # slab (off-plane corners are zeros either way)
    lim = float(plane_hw)
    overflow = jnp.any((jnp.clip(mn, 0, lim) < orgf)
                       | (jnp.clip(mx, 0, lim) > orgf + size), axis=-1)
    # make coords slab-relative here (saves SMEM→VPU broadcasts in-kernel)
    txy = txy - orgf[:, :, None]
    # slab-relative clip: preserves every nonzero bilinear weight
    # (x beyond [-1, sx] / y beyond [-1, sy+4] contributes zero either
    # way), bounds the combined-coordinate weight build (_quad_weights
    # needs |xx − px| ≤ sx + 3 and va ≤ sy/4 + 2), and keeps the kernel
    # inf-free on degenerate rays
    assert _qshift(sx) * (sy // 4 + 2) + sx + 3 <= 4096, \
        f"slab {slab} too large for the combined-coordinate weight build"
    lo = jnp.asarray([-4.0, -8.0], jnp.float32)
    hi = jnp.asarray([sx + 3.0, sy + 8.0], jnp.float32)
    txy = jnp.clip(txy, lo[None, :, None], hi[None, :, None])
    b3_idx = jnp.repeat(jnp.arange(b3, dtype=jnp.int32), nb // b3)
    # one packed scalar-prefetch word per block ((NB, 3) in SMEM would be
    # lane-padded to (NB, 128) and blow the 1MB SMEM budget at large NB)
    origins = (b3_idx << 20) | ((org[:, 1] // Y_ALIGN) << 10) | org[:, 0]
    return plan, txy, origins, overflow


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _qshift(slab_x: int) -> float:
    """Combined-coordinate quad shift (see _quad_weights): the smallest
    power of two ≥ slab_x + 4, so a quad mismatch pushes |d| past the
    triangle support (needs S ≥ slab_x + 4 under plan_blocks' coord
    clip) while keeping px + S·va small enough to round exactly."""
    return float(1 << int(np.ceil(np.log2(slab_x + 4))))


def _quad_weights(vv, xx, px, py, wdt, shift: float):
    """The (K4, P) one-hot(y-quad)·tri(x) bilinear weight build — the
    kernel's VPU-bound dominant term (CLAUDE.md: v5e VPU is 1024
    elem-ops/cycle; everything (K4, P)-shaped here is ~66 ms/pass at
    batch 8).

    bf16 path (default): ONE triangle over a combined coordinate
    d = (xx + S·vv) − (px + S·va), S = _qshift(slab_x). When the
    slab row's quad vv differs from the point's anchor quad va,
    |d| ≥ S − (sx + 3) ≥ 1 and the triangle clamps to zero — the quad
    compare+select of the r2 build (2 of its 7 ops on the dominant
    term) folds into the x-triangle for free. Relies on plan_blocks'
    slab-relative coord clip (px ∈ [-4, sx+3], py ∈ [-8, sy+8]): it
    bounds |xx − px| ≤ sx + 3 and va ≤ sy/4 + 2, so cross-quad
    collisions are impossible and px + S·va ≤ 4096 (plan_blocks
    asserts) rounds at ≤ 2⁻¹³ absolute — invisible under the bf16
    weight cast.

    fp32 path (the X_ALIGN=8 exactness variant): keeps the exact
    compare/select build, bit-identical to the XLA reference.

    Returns (wa (K4, P) in wdt, vaf (1, P) = 4·va fp32 anchor row)."""
    vaq = jnp.maximum(jnp.floor(jnp.floor(py) * 0.25), 0.0)   # (1, P)
    if jnp.dtype(wdt) == jnp.float32:
        tx = jnp.maximum(0.0, 1.0 - jnp.abs(xx - px))
        wa = jnp.where(vv == vaq.astype(jnp.int32), tx, 0.0)
    else:
        xq = xx + shift * vv.astype(jnp.float32)     # (K4, 1) row const
        pq = px + shift * vaq                         # (1, P)
        wa = jnp.maximum(0.0, 1.0 - jnp.abs(xq - pq)).astype(wdt)
    return wa, vaq * 4.0


def _sampler_kernel(origins_ref, txy_ref, planes_ref, out_ref,
                    slab_ref, sem_ref, *, slab_y: int, slab_x: int,
                    channels: int, group: int, n_blocks: int,
                    x_align: int = X_ALIGN):
    """One grid step processes `group` blocks (amortizes fixed cost);
    slab DMAs are double-buffered one block ahead."""
    i = pl.program_id(0)
    sy4 = slab_y // 4
    k4 = sy4 * slab_x

    def dma(j, slot):
        word = origins_ref[j]
        oy4 = (word >> 10) & 0x3FF
        ox = pl.multiple_of(word & 0x3FF, x_align)
        return pltpu.make_async_copy(
            planes_ref.at[word >> 20, pl.ds(oy4, sy4 + 1),
                          pl.ds(ox, slab_x), :],
            slab_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    base = i * group
    # everything below is LANE-MAJOR in P: coords (1, P), weights
    # (K4, P), matmul output (4C, P) — no sublane relayouts anywhere
    vv = jax.lax.broadcasted_iota(jnp.int32, (k4, 1), 0) // slab_x
    xx = (jax.lax.broadcasted_iota(jnp.int32, (k4, 1), 0)
          % slab_x).astype(jnp.float32)

    def body(gi, carry):
        j = base + gi
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_blocks)
        def _():
            dma(j + 1, jax.lax.rem(j + 1, 2)).start()

        dma(j, slot).wait()

        px = txy_ref[gi, 0:1, :]                 # (1, P) slab-relative
        py = txy_ref[gi, 1:2, :]
        # anchor quad = quad of floor(py), clamped to 0: for py in
        # [-1, 0) the in-plane corner is row 0 of quad 0 and the
        # y-triangles below zero out every other row — exactly
        # grid_sample's zeros padding at the top edge. ONE weight
        # build (the r2 kernel built a second (K4, P) select for the
        # quad of floor(py)+1 — the VPU bottleneck), quad select
        # folded into the triangle (_quad_weights); weights match the
        # plane dtype: bf16 planes → bf16 MXU dots, fp32 planes
        # (X_ALIGN=8 narrow-slab variant) skip the casts
        wa, vaf = _quad_weights(vv, xx, px, py, slab_ref.dtype,
                                _qshift(slab_x))

        s_all = slab_ref[slot]                   # (sy4 + 1, Sx, 4C)
        s = s_all[0:sy4].reshape(k4, 4 * channels)
        # one-quad-shifted view, channel row 0 only: supplies the
        # straddling row floor(py)+4·0... i.e. anchor-quad row 4
        sn = s_all[1:sy4 + 1, :, 0:channels].reshape(k4, channels)
        # contract K4 on both: (K4, 4C) × (K4, P) → (4C, P)
        dn = (((0,), (0,)), ((), ()))
        fa = jax.lax.dot_general(s, wa, dn,
                                 preferred_element_type=jnp.float32)
        fb = jax.lax.dot_general(sn, wa, dn,
                                 preferred_element_type=jnp.float32)

        # y triangle epilogue: rows 0..3 of the anchor quad from fa,
        # the straddle row 4 from the shifted view
        acc = jnp.zeros((channels, py.shape[1]), jnp.float32)
        for r in range(4):
            tya = jnp.maximum(0.0, 1.0 - jnp.abs(vaf + r - py))
            acc = acc + tya * fa[r * channels:(r + 1) * channels, :]
        ty4 = jnp.maximum(0.0, 1.0 - jnp.abs(vaf + 4.0 - py))
        # out matches the plane dtype (bf16 default): fp32 y-epilogue
        # accumulation, half the output write/read bytes — the renderer
        # casts to the bf16 decoder right after the plane mean anyway
        out_ref[gi, :, :] = (acc + ty4 * fb).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, group, body, 0)


def _bwd_slab_update(wa, vaf, py, g, *, slab_x: int, sy4: int,
                     channels: int, compute_dtype):
    """Shared backward cotangent assembly: the (sy4+1, Sx, 4C) slab
    update d slab = wa @ (y-folded g)ᵀ, with the anchor-quad rows ds at
    quads [0, sy4) and the straddle row dx at quads [1, sy4+1) channel
    block 0 (the shifted view's rows). Used by both the VMEM-accumulator
    fast path and the HBM-RMW fallback — keep them in lockstep here."""
    c4 = 4 * channels
    ga = []
    for r in range(4):
        tya = jnp.maximum(0.0, 1.0 - jnp.abs(vaf + r - py))
        ga.append((tya * g).astype(compute_dtype))
    ga4 = jnp.concatenate(ga, axis=0)         # (4C, P)
    ty4 = jnp.maximum(0.0, 1.0 - jnp.abs(vaf + 4.0 - py))
    g5 = (ty4 * g).astype(compute_dtype)      # (C, P) straddle row

    dn = (((1,), (1,)), ((), ()))
    ds = jax.lax.dot_general(wa, ga4, dn,
                             preferred_element_type=jnp.float32)
    dx = jax.lax.dot_general(wa, g5, dn,
                             preferred_element_type=jnp.float32)
    # full-width stores only: sub-lane-range writes may not lower
    zq = jnp.zeros((1, slab_x, c4), jnp.float32)
    up = jnp.concatenate([ds.reshape(sy4, slab_x, c4), zq], axis=0)
    dxp = jnp.concatenate(
        [dx.reshape(sy4, slab_x, channels),
         jnp.zeros((sy4, slab_x, 3 * channels), jnp.float32)],
        axis=-1)
    return up + jnp.concatenate([zq, dxp], axis=0)


def _sampler_bwd_kernel_hbm(origins_ref, txy_ref, g_ref, zeros_ref, grad_ref,
                        slab_ref, sem_ref, *, slab_y: int, slab_x: int,
                        channels: int, group: int, n_blocks: int,
                        x_align: int = X_ALIGN,
                        compute_dtype=jnp.bfloat16):
    """Backward of _sampler_kernel wrt the quad-packed planes.

    The op is LINEAR in the planes: d planes = Σ_blocks W · (y-folded g)ᵀ
    scattered into each block's slab region. The TPU grid runs blocks
    sequentially, so the scatter is a race-free read-modify-write DMA
    against the fp32 accumulation buffer (aliased zeros → grad_ref).
    Fully serialized RMW per block — overlapping slabs between
    consecutive blocks are common (adjacent tiles/windows)."""
    del zeros_ref  # aliased into grad_ref; only referenced for init
    i = pl.program_id(0)
    sy4 = slab_y // 4
    k4 = sy4 * slab_x
    base = i * group
    vv = jax.lax.broadcasted_iota(jnp.int32, (k4, 1), 0) // slab_x
    xx = (jax.lax.broadcasted_iota(jnp.int32, (k4, 1), 0)
          % slab_x).astype(jnp.float32)

    def region(j):
        word = origins_ref[j]
        oy4 = (word >> 10) & 0x3FF
        ox = pl.multiple_of(word & 0x3FF, x_align)
        return grad_ref.at[word >> 20, pl.ds(oy4, sy4 + 1),
                           pl.ds(ox, slab_x), :]

    def body(gi, carry):
        j = base + gi
        rd = pltpu.make_async_copy(region(j), slab_ref, sem_ref)
        rd.start()

        px = txy_ref[gi, 0:1, :]
        py = txy_ref[gi, 1:2, :]
        wa, vaf = _quad_weights(vv, xx, px, py, compute_dtype,
                                _qshift(slab_x))
        up = _bwd_slab_update(wa, vaf, py, g_ref[gi, :, :],
                              slab_x=slab_x, sy4=sy4, channels=channels,
                              compute_dtype=compute_dtype)

        rd.wait()
        slab_ref[...] = slab_ref[...] + up
        wr = pltpu.make_async_copy(slab_ref, region(j), sem_ref)
        wr.start()
        wr.wait()
        return carry

    jax.lax.fori_loop(0, group, body, 0)


def _sampler_bwd_kernel_vmem(origins_ref, txy_ref, g_ref, out_ref,
                             acc_ref, sem_ref, *, slab_y: int,
                             slab_x: int, channels: int, group: int,
                             blocks_per_plane: int,
                             x_align: int = X_ALIGN,
                             compute_dtype=jnp.bfloat16):
    """Backward of _sampler_kernel with a FULL-PLANE fp32 VMEM
    accumulator (the fast path; _sampler_bwd_kernel_hbm is the fallback
    for planes too large for VMEM).

    Blocks are plane-major (b3 outermost in plan_blocks' ordering), so
    each plane is a contiguous run of blocks_per_plane blocks. Each
    block's W·(y-folded g)ᵀ adds straight into the accumulator at its
    slab offset — a VPU read-modify-write in VMEM instead of the old
    kernel's two serialized HBM DMAs per block — and the accumulator is
    DMA'd out to HBM ONCE per plane (b3 copies total, vs 2 per block).
    Requires blocks_per_plane % group == 0 (enforced by the caller) so
    no grid step straddles work from a padded tail."""
    i = pl.program_id(0)
    sy4 = slab_y // 4
    k4 = sy4 * slab_x
    base = i * group
    vv = jax.lax.broadcasted_iota(jnp.int32, (k4, 1), 0) // slab_x
    xx = (jax.lax.broadcasted_iota(jnp.int32, (k4, 1), 0)
          % slab_x).astype(jnp.float32)

    def body(gi, carry):
        j = base + gi

        @pl.when(jax.lax.rem(j, blocks_per_plane) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        px = txy_ref[gi, 0:1, :]
        py = txy_ref[gi, 1:2, :]
        wa, vaf = _quad_weights(vv, xx, px, py, compute_dtype,
                                _qshift(slab_x))
        up = _bwd_slab_update(wa, vaf, py, g_ref[gi, :, :],
                              slab_x=slab_x, sy4=sy4, channels=channels,
                              compute_dtype=compute_dtype)

        word = origins_ref[j]
        oy4 = (word >> 10) & 0x3FF
        ox = pl.multiple_of(word & 0x3FF, x_align)
        cur = acc_ref[pl.ds(oy4, sy4 + 1), pl.ds(ox, slab_x), :]
        acc_ref[pl.ds(oy4, sy4 + 1), pl.ds(ox, slab_x), :] = cur + up

        @pl.when(jax.lax.rem(j + 1, blocks_per_plane) == 0)
        def _():
            cp = pltpu.make_async_copy(acc_ref, out_ref.at[word >> 20],
                                       sem_ref)
            cp.start()
            cp.wait()

        return carry

    jax.lax.fori_loop(0, group, body, 0)


def sample_blocked(plan: BlockPlan, txy: jax.Array, origins: jax.Array,
                   planes_quad: jax.Array, *, group: int = 8,
                   interpret: bool = False) -> jax.Array:
    """Differentiable windowed sampling: txy (NB,2,P) slab-relative,
    origins (NB,) packed int32, planes_quad (B3, H/4+1, W, 4C) from
    quad_pack_planes → (NB, C, P) features in the PLANE dtype
    (lane-major in P; fp32 accumulation inside the kernel — a bf16
    output halves the write and every downstream read, and the
    renderer's plane mean feeds the bf16 decoder right after).

    Gradients flow to planes_quad only (the op is linear in it; the
    backward is a sequential RMW scatter kernel). txy/origins get zero
    cotangents — correct for the renderer, where sample coordinates
    carry no parameter dependence (stratified coarse depths are
    deterministic and importance depths are stop_gradient'ed, matching
    the reference)."""
    return _sampler_ad(plan, group, interpret, planes_quad.shape,
                        planes_quad.dtype.name)(txy, origins, planes_quad)


@functools.lru_cache(maxsize=None)
def _sampler_ad(plan: BlockPlan, group: int, interpret: bool,
                pshape: tuple, pdtype_name: str):
    pdtype = jnp.dtype(pdtype_name)

    def fwd(txy, origins, planes_quad):
        return _sample_blocked_impl(plan, txy, origins, planes_quad,
                                    group=group, interpret=interpret)

    f = jax.custom_vjp(fwd)

    def f_fwd(txy, origins, planes_quad):
        return fwd(txy, origins, planes_quad), (txy, origins)

    def f_bwd(res, g):
        txy, origins = res
        grad = _sample_blocked_bwd(plan, txy, origins, g, pshape,
                                   group=group, interpret=interpret,
                                   compute_dtype=pdtype)
        return (jnp.zeros_like(txy),
                np.zeros(origins.shape, jax.dtypes.float0),
                grad.astype(pdtype))

    f.defvjp(f_fwd, f_bwd)
    return f


def _sample_blocked_impl(plan: BlockPlan, txy: jax.Array,
                         origins: jax.Array, planes_quad: jax.Array, *,
                         group: int = 8,
                         interpret: bool = False) -> jax.Array:
    """Forward pallas_call (see sample_blocked)."""
    b3, h4p, w_, c4 = planes_quad.shape
    # h4p includes quad_pack_planes' one zero pad quad row
    assert (h4p - 1) * 4 == w_ == plan.plane_hw, (planes_quad.shape, plan)
    assert c4 % 4 == 0
    c = c4 // 4
    nb, _, p = txy.shape
    sy, sx = plan.slab_y, plan.slab_x

    nb_pad = -(-nb // group) * group
    if nb_pad != nb:
        txy = jnp.pad(txy, ((0, nb_pad - nb), (0, 0), (0, 0)))
        origins = jnp.pad(origins, (0, nb_pad - nb))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_pad // group,),
        in_specs=[
            pl.BlockSpec((group, 2, p), lambda i, org: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),         # planes stay in HBM
        ],
        out_specs=pl.BlockSpec((group, c, p), lambda i, org: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, sy // 4 + 1, sx, c4), planes_quad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_sampler_kernel, slab_y=sy, slab_x=sx,
                          channels=c, group=group, n_blocks=nb_pad,
                          x_align=plan.x_align),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_pad, c, p),
                                       planes_quad.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * p * (sy // 4) * sx * (c4 + c) * 2,
            bytes_accessed=nb * (p * (sy // 4) * sx * 2 * 2
                                 + (sy // 4 + 1) * sx * c4 * 2
                                 + p * c * planes_quad.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(origins, txy, planes_quad)
    return out[:nb] if nb_pad != nb else out


# VMEM budget for the full-plane backward accumulator: acc (H/4·W·4C
# fp32) + double-buffered txy/g blocks must fit in ~16 MB/core VMEM.
_BWD_ACC_VMEM_BUDGET = 10 * 1024 * 1024


def _sample_blocked_bwd(plan: BlockPlan, txy: jax.Array,
                        origins: jax.Array, g: jax.Array,
                        planes_shape: tuple, *, group: int = 8,
                        interpret: bool = False,
                        compute_dtype=jnp.bfloat16) -> jax.Array:
    """d(sample_blocked)/d(planes_quad) → (B3, H/4+1, W, 4C) fp32
    (the pad quad row's gradient is sliced off by quad_pack_planes'
    AD transpose).

    Fast path (_sampler_bwd_kernel_vmem): a full-plane fp32 VMEM
    accumulator, one HBM write per PLANE. Fallback
    (_sampler_bwd_kernel_hbm): sequential RMW scatter through HBM, two
    DMAs per BLOCK — used when the plane doesn't fit the VMEM budget or
    the block count doesn't tile the grid cleanly."""
    b3, h4, w_, c4 = planes_shape
    nb = txy.shape[0]
    blocks_per_plane = nb // b3
    acc_bytes = h4 * w_ * c4 * 4
    if (acc_bytes <= _BWD_ACC_VMEM_BUDGET
            and nb == b3 * blocks_per_plane
            and blocks_per_plane % group == 0):
        return _sample_blocked_bwd_vmem(plan, txy, origins, g,
                                        planes_shape, group=group,
                                        interpret=interpret,
                                        compute_dtype=compute_dtype)
    return _sample_blocked_bwd_hbm(plan, txy, origins, g, planes_shape,
                                   group=group, interpret=interpret,
                                   compute_dtype=compute_dtype)


def _sample_blocked_bwd_vmem(plan: BlockPlan, txy: jax.Array,
                             origins: jax.Array, g: jax.Array,
                             planes_shape: tuple, *, group: int,
                             interpret: bool,
                             compute_dtype=jnp.bfloat16) -> jax.Array:
    b3, h4, w_, c4 = planes_shape
    c = c4 // 4
    nb, _, p = txy.shape
    sy, sx = plan.slab_y, plan.slab_x
    blocks_per_plane = nb // b3
    assert blocks_per_plane % group == 0 and nb == b3 * blocks_per_plane

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // group,),
        in_specs=[
            pl.BlockSpec((group, 2, p), lambda i, org: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, c, p), lambda i, org: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((h4, w_, c4), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_sampler_bwd_kernel_vmem, slab_y=sy, slab_x=sx,
                          channels=c, group=group,
                          blocks_per_plane=blocks_per_plane,
                          x_align=plan.x_align,
                          compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b3, h4, w_, c4), jnp.float32),
        interpret=interpret,
    )(origins, txy, g)


def _sample_blocked_bwd_hbm(plan: BlockPlan, txy: jax.Array,
                            origins: jax.Array, g: jax.Array,
                            planes_shape: tuple, *, group: int = 8,
                            interpret: bool = False,
                            compute_dtype=jnp.bfloat16) -> jax.Array:
    """Fallback: sequential RMW scatter of each block's W·(y-folded g)ᵀ
    into an fp32 accumulator aliased over a zeros input."""
    b3, h4, w_, c4 = planes_shape
    c = c4 // 4
    nb, _, p = txy.shape
    sy, sx = plan.slab_y, plan.slab_x

    nb_pad = -(-nb // group) * group
    if nb_pad != nb:
        txy = jnp.pad(txy, ((0, nb_pad - nb), (0, 0), (0, 0)))
        origins = jnp.pad(origins, (0, nb_pad - nb))
        g = jnp.pad(g, ((0, nb_pad - nb), (0, 0), (0, 0)))

    zeros = jnp.zeros((b3, h4, w_, c4), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_pad // group,),
        in_specs=[
            pl.BlockSpec((group, 2, p), lambda i, org: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, c, p), lambda i, org: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # accumulator (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((sy // 4 + 1, sx, c4), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    grad = pl.pallas_call(
        functools.partial(_sampler_bwd_kernel_hbm, slab_y=sy, slab_x=sx,
                          channels=c, group=group, n_blocks=nb_pad,
                          x_align=plan.x_align,
                          compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b3, h4, w_, c4), jnp.float32),
        # zeros (operand 3, counting the scalar-prefetch arg) IS the
        # accumulator output
        input_output_aliases={3: 0},
        interpret=interpret,
    )(origins, txy, g, zeros)
    return grad


def sample_from_planes_windowed(planes: jax.Array, coordinates: jax.Array,
                                box_warp: float, plane_inv: np.ndarray,
                                *, res: int, n_depth: int, tile: int,
                                depth_window: int,
                                slab: int | tuple[int, int],
                                dtype=jnp.bfloat16,
                                group: int = 8,
                                interpret: bool = False) -> jax.Array:
    """Drop-in for renderer.sample_from_planes on blocked-friendly shapes.

    planes (B, 3, H, W, C); coordinates (B, res²·n_depth, 3) ordered
    (ray_row, ray_col, depth) → (B, 3, M, C) fp32 features (the kernel
    emits the plane dtype; this wrapper unblocks in it — half the
    transpose bytes — then restores the fp32 contract)."""
    b, n_planes, h, w_, c = planes.shape
    plan, txy, origins, _ = plan_blocks(
        coordinates, plane_inv, box_warp, res=res, n_depth=n_depth,
        plane_hw=h, tile=tile, depth_window=depth_window, slab=slab,
        x_align=x_align_for(dtype))
    planes_quad = quad_pack_planes(planes.astype(dtype))
    blocked = sample_blocked(plan, txy, origins, planes_quad,
                             group=group, interpret=interpret)
    feats = unblock_feats(blocked, plan, b * n_planes)
    return feats.reshape(b, n_planes, -1, c).astype(jnp.float32)
