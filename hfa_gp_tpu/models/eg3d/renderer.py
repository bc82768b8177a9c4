"""EG3D volume renderer, TPU-native.

Rebuilds the pickle-internal ImportanceRenderer / OSGDecoder /
MipRayMarcher2 / RaySampler pipeline (reference: `G.synthesis` call at
code/networks/headnerf.py:112; architecture from the public EG3D repo,
arXiv 2112.07945 — see PAPERS.md).

TPU-first choices:
  * All sample counts are static (48 coarse + 48 fine for the FFHQ
    config), so the whole march is straight-line tensor code — no
    data-dependent control flow, everything fuses under jit.
  * Tri-plane lookup is a vectorized bilinear gather (zeros padding,
    align_corners=False semantics) expressed with one flat `jnp.take`
    per corner — XLA lowers this to TPU gathers; a fused Pallas variant
    lives in core/pallas for the hot path.
  * Importance resampling uses a broadcast-compare inverse-CDF instead of
    searchsorted — O(Nc*Nf) VPU ops, zero dynamism.
  * The per-ray axis is embarrassingly parallel — `parallel.rays` shards
    it over the mesh for multi-chip rendering (the reference's analog of
    sequence parallelism, SURVEY.md §2.5).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core import ops

Params = dict[str, Any]


@dataclass(frozen=True)
class RenderConfig:
    """rendering_kwargs of the ffhqrebalanced512-128 config."""
    ray_start: float = 2.25
    ray_end: float = 3.3
    box_warp: float = 1.0
    depth_resolution: int = 48
    depth_resolution_importance: int = 48
    neural_rendering_resolution: int = 128
    decoder_lr_mul: float = 1.0
    decoder_hidden: int = 64
    decoder_output_dim: int = 32
    white_back: bool = False
    clamp_mode: str = "softplus"
    # Mesh axis to shard the ray dimension over (sequence-parallel analog:
    # rays are embarrassingly parallel until image assembly, SURVEY.md
    # §2.5). None = no constraint. Requires an active mesh
    # (jax.sharding.use_mesh) when set.
    ray_shard_axis: str | None = None
    # Mesh axis the BATCH is sharded over (DP pods). When set together
    # with use_pallas_sampler, render_rays wraps the windowed render in
    # shard_map over this axis: batch entries are independent through
    # the whole render, so the Pallas custom call partitions trivially —
    # each shard runs the kernel on its local batch (correct by
    # construction; XLA cannot auto-partition a custom call). Requires
    # an ambient mesh (jax.sharding.set_mesh).
    data_shard_axis: str | None = None
    # Fused Pallas compositing kernel (core/pallas/raymarch.py).
    # Inference-only: pallas_call has no VJP here — training keeps the
    # XLA formulation.
    use_pallas_marcher: bool = False
    # Windowed MXU tri-plane sampler (core/pallas/triplane.py) — the
    # gather-free bilinear lookup replacing the TPU-issue-bound packed
    # row-gather (CLAUDE.md). Differentiable: a custom VJP scatters
    # d/d(planes) through a sequential RMW Pallas kernel, so training
    # can run through it too. CAVEAT: the VJP flows to the PLANES only —
    # sample coordinates get zero cotangents (fine for this renderer,
    # where depths are stratified constants or stop_gradient'ed
    # importance samples, but a trainable-camera/pose-refinement use
    # would silently get no gradient through coordinates; use the XLA
    # path for that).
    use_pallas_sampler: bool = False
    sampler_tile: int = 16              # ray tile side per block
    sampler_depth_window: int = 4       # depth samples per block
    # Plane/weight dtype inside the kernel. fp32 allows X_ALIGN=8 HBM
    # slice offsets → a narrower slab at identical footprint coverage
    # (see triplane.x_align_for); the defaults below auto-shrink.
    sampler_dtype: Any = jnp.bfloat16
    sampler_slab: tuple = (40, 48)      # (Sy, Sx) coarse-pass slab (bf16)
    sampler_slab_fine: tuple = (64, 80)  # fine pass: importance depths
    sampler_group: int = 4              # blocks per pallas grid step
    # Fine-pass mode:
    #  "stratified" (default): windowed stratified importance sampling
    #    (sample_importance_windowed) — n_per fine samples per static
    #    depth window, at within-window CDF quantiles. Exact bilinear,
    #    coarse-tight footprints, full Pallas speed; sample PLACEMENT
    #    differs from the reference's global quantiles (same target
    #    distribution, stratified quadrature).
    #  "xla": the reference's global-quantile placement with exact
    #    row-gathers (slow: fine index-windows can span the whole
    #    frustum — the reference's +0.01 CDF floor scatters ~10% of
    #    fine samples uniformly in depth).
    #  "pallas": reference placement through the windowed kernel —
    #    exact for diffuse densities, approximate (zeros for
    #    out-of-slab corners) on sharp surfaces
    #    (tools/overflow_envelope.py).
    sampler_fine: str = "stratified"
    # Debug: jax.debug.print the fraction of blocks whose bilinear
    # footprint exceeded the slab (those corners read zeros). The
    # default slabs were sized for FFHQ-like pose distributions
    # (stddev ~0.3); turn this on when sampling wider camera ranges.
    sampler_debug_overflow: bool = False
    pallas_interpret: bool = False      # interpret-mode (CPU tests)
    # MLP compute dtype for the OSG decoder (bf16 halves the biggest
    # matmuls; sigma/rgb emitted fp32).
    decoder_dtype: Any = jnp.float32
    # Process rays in lax.map chunks of this many rays (must divide R);
    # bounds intermediate memory for large batches. None = whole image.
    ray_chunk: int | None = None
    # jax.checkpoint the per-pass point evaluation: recompute the
    # tri-plane gathers in the backward instead of storing the (B,3,M,C)
    # residuals — trades ~30% step time for ~2x batch headroom.
    remat: bool = False


# ---------------------------------------------------------------------------
# Tri-plane feature lookup
# ---------------------------------------------------------------------------

# Fixed plane bases (the *corrected* EG3D convention): rows are the world
# axes spanning each plane. project_onto_planes maps a world point into
# each plane's (u, v).
PLANE_AXES = np.array([
    [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
    [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
    [[0, 0, 1], [1, 0, 0], [0, 1, 0]],
], dtype=np.float32)
_PLANE_INV = np.linalg.inv(PLANE_AXES)  # (3, 3, 3)


def project_onto_planes(coordinates: jax.Array) -> jax.Array:
    """(B, M, 3) world coords → (B, 3, M, 2) per-plane uv."""
    inv = jnp.asarray(_PLANE_INV, coordinates.dtype)
    proj = jnp.einsum("bmj,pjk->bpmk", coordinates, inv)
    return proj[..., :2]


def grid_sample_2d(image: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear grid sample, padding_mode='zeros', align_corners=False.

    image: (B, H, W, C); grid: (B, M, 2) in [-1, 1] (x=width, y=height).
    Returns (B, M, C). Matches torch.nn.functional.grid_sample semantics
    used by EG3D's sample_from_planes.
    """
    b, h, w, c = image.shape
    x = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    y = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = image.reshape(b, h * w, c)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        # ROW gather (whole C-vector per index) — vmapped integer
        # indexing lowers to an XLA gather with slice_sizes (1, C); a
        # take_along_axis here would broadcast the index over C and
        # degrade to per-element gathers (~50x slower on TPU).
        vals = jax.vmap(lambda f, i: f[i])(flat, idx)
        return vals * valid[..., None].astype(image.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None].astype(image.dtype)
    wy = wy[..., None].astype(image.dtype)
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def sample_from_planes(planes: jax.Array, coordinates: jax.Array,
                       box_warp: float) -> jax.Array:
    """planes: (B, 3, H, W, C); coordinates: (B, M, 3) world.
    Returns (B, 3, M, C) bilinear features per plane."""
    b, n_planes, h, w, c = planes.shape
    coords = (2.0 / box_warp) * coordinates
    uv = project_onto_planes(coords)                    # (B, 3, M, 2)
    flat_planes = planes.reshape(b * n_planes, h, w, c)
    flat_uv = uv.reshape(b * n_planes, -1, 2)
    feats = grid_sample_2d(flat_planes, flat_uv)
    return feats.reshape(b, n_planes, -1, c)


# -- packed fast path -------------------------------------------------------
#
# TPU gathers are issue-bound: 4 separate 32-channel corner gathers run
# ~7x slower than ONE 128-channel row gather. `pack_planes` concatenates
# the (x+1), (y+1), (x+1,y+1) shifted copies into the channel dim so each
# bilinear sample needs a single row gather; border clamping is undone by
# a slot-shift select (weights already mask out-of-bounds corners).


def pack_planes(planes: jax.Array) -> jax.Array:
    """(B, 3, H, W, C) → (B*3, H*W, 4C) corner-packed flat planes."""
    b, n_planes, h, w, c = planes.shape
    p = planes.reshape(b * n_planes, h, w, c)
    px = jnp.roll(p, -1, axis=2)
    py = jnp.roll(p, -1, axis=1)
    pxy = jnp.roll(px, -1, axis=1)
    packed = jnp.concatenate([p, px, py, pxy], axis=-1)
    return packed.reshape(b * n_planes, h * w, 4 * c)


def grid_sample_packed(packed_flat: jax.Array, grid: jax.Array,
                       h: int, w: int) -> jax.Array:
    """packed_flat: (N, H*W, 4C) from pack_planes; grid: (N, M, 2) in
    [-1,1]. Returns (N, M, C). Numerically identical to grid_sample_2d."""
    c4 = packed_flat.shape[-1]
    c = c4 // 4
    dtype = packed_flat.dtype
    x = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    y = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(dtype)[..., None]
    wy = (y - y0).astype(dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y0c = jnp.clip(y0i, 0, h - 1)
    x0c = jnp.clip(x0i, 0, w - 1)
    rows = jax.vmap(lambda f, i: f[i])(packed_flat, y0c * w + x0c)
    sy = y0i - y0c
    sx = x0i - x0c
    r = [rows[..., k * c:(k + 1) * c] for k in range(4)]

    def corner(dy, dx):
        yi = y0i + dy
        xi = x0i + dx
        valid = ((xi >= 0) & (xi < w) & (yi >= 0)
                 & (yi < h)).astype(dtype)[..., None]
        ty = jnp.clip(dy + sy, 0, 1)[..., None]
        tx = jnp.clip(dx + sx, 0, 1)[..., None]
        v = jnp.where(ty == 1, jnp.where(tx == 1, r[3], r[2]),
                      jnp.where(tx == 1, r[1], r[0]))
        return v * valid

    v00 = corner(0, 0)
    v01 = corner(0, 1)
    v10 = corner(1, 0)
    v11 = corner(1, 1)
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def sample_from_packed(packed_flat: jax.Array, coordinates: jax.Array,
                       box_warp: float, b: int, h: int, w: int
                       ) -> jax.Array:
    """Packed-plane version of sample_from_planes → (B, 3, M, C)."""
    coords = (2.0 / box_warp) * coordinates
    uv = project_onto_planes(coords)                    # (B, 3, M, 2)
    flat_uv = uv.reshape(packed_flat.shape[0], -1, 2)
    feats = grid_sample_packed(packed_flat, flat_uv, h, w)
    return feats.reshape(b, 3, -1, feats.shape[-1])


# ---------------------------------------------------------------------------
# OSGDecoder
# ---------------------------------------------------------------------------


def init_decoder(key, cfg: RenderConfig, n_features: int = 32) -> Params:
    k0, k1 = jax.random.split(key)
    return {
        "fc0": {"weight": jax.random.normal(
            k0, (cfg.decoder_hidden, n_features)) / cfg.decoder_lr_mul,
            "bias": jnp.zeros((cfg.decoder_hidden,))},
        "fc1": {"weight": jax.random.normal(
            k1, (1 + cfg.decoder_output_dim, cfg.decoder_hidden))
            / cfg.decoder_lr_mul,
            "bias": jnp.zeros((1 + cfg.decoder_output_dim,))},
    }


def decoder_apply(params: Params, cfg: RenderConfig,
                  sampled_features: jax.Array
                  ) -> tuple[jax.Array, jax.Array]:
    """(B, 3, M, C) plane features → (rgb (B, M, 32), sigma (B, M, 1)).

    Features are MEAN-aggregated over the 3 planes; 2-layer MLP with
    softplus; color squashed to (-0.001, 1.001) via the EG3D sigmoid
    trick."""
    x = sampled_features.mean(axis=1)                   # (B, M, C)
    x = x.astype(cfg.decoder_dtype)
    x = ops.fully_connected(x, **params["fc0"],
                            lr_multiplier=cfg.decoder_lr_mul)
    x = jax.nn.softplus(x)
    x = ops.fully_connected(x, **params["fc1"],
                            lr_multiplier=cfg.decoder_lr_mul)
    x = x.astype(jnp.float32)
    sigma = x[..., 0:1]
    rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
    return rgb, sigma


# ---------------------------------------------------------------------------
# Depth sampling
# ---------------------------------------------------------------------------


def sample_stratified(ray_origins: jax.Array, ray_start: float,
                      ray_end: float, depth_resolution: int,
                      rng: jax.Array | None = None) -> jax.Array:
    """(B, R, 3) → (B, R, N, 1) stratified depths. rng=None → midpoints
    fixed at the bin starts (deterministic inference)."""
    b, r, _ = ray_origins.shape
    n = depth_resolution
    depths = jnp.linspace(ray_start, ray_end, n, dtype=jnp.float32)
    depths = jnp.broadcast_to(depths[None, None, :, None], (b, r, n, 1))
    delta = (ray_end - ray_start) / (n - 1)
    if rng is not None:
        depths = depths + jax.random.uniform(rng, (b, r, n, 1)) * delta
    return depths


def _smooth_weights(weights: jax.Array) -> jax.Array:
    """max_pool1d(k=2,s=1,p=1) → avg_pool1d(k=2,s=1) → +0.01 smoothing of
    marcher weights before building the importance pdf (EG3D
    sample_importance)."""
    # weights: (N, L). torch max_pool padding is -inf.
    neg_inf = jnp.full_like(weights[:, :1], -jnp.inf)
    padded = jnp.concatenate([neg_inf, weights, neg_inf], axis=1)
    m = jnp.maximum(padded[:, :-1], padded[:, 1:])      # (N, L+1)
    a = (m[:, :-1] + m[:, 1:]) / 2.0                    # (N, L)
    return a + 0.01


def sample_pdf(bins: jax.Array, weights: jax.Array, n_importance: int,
               rng: jax.Array | None = None,
               eps: float = 1e-5,
               u: jax.Array | None = None) -> jax.Array:
    """Inverse-CDF sampling. bins: (N, B); weights: (N, B-?) as in EG3D
    (weights may be shorter than bins-1 after trimming; the CDF simply
    spans the first len(weights)+1 bins). Returns (N, n_importance).

    TPU formulation: the searchsorted is a broadcast compare-and-sum —
    static shapes, no sorting."""
    n_rays, n_w = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)

    if u is None:
        if rng is None:
            u = jnp.linspace(0.0, 1.0, n_importance)
            u = jnp.broadcast_to(u[None], (n_rays, n_importance))
        else:
            u = jax.random.uniform(rng, (n_rays, n_importance))

    # searchsorted + gather, TPU-style: one broadcast compare matrix and
    # four masked REDUCTIONS over it. cdf and bins are both monotone
    # nondecreasing, so cdf[inds-1] == max{cdf[k] : cdf[k] <= u} etc. —
    # no gathers at all (a row-gather formulation here cost ~90 ms/pass:
    # 6M 8-byte rows are issue-bound on TPU).
    bins_pad = bins[:, :n_w + 1]
    le = cdf[:, None, :] <= u[:, :, None]             # (N, n_imp, n_w+1)
    cdf_b = jnp.broadcast_to(cdf[:, None, :], le.shape)
    bin_b = jnp.broadcast_to(bins_pad[:, None, :], le.shape)
    # below: mask never empty (cdf[0] = 0 <= u)
    cdf_lo = jnp.max(jnp.where(le, cdf_b, -1.0), axis=-1)
    bin_lo = jnp.max(jnp.where(le, bin_b, -jnp.inf), axis=-1)
    # above: fill with the LAST entry — it's >= every candidate, so it
    # only wins when the mask is empty (u == cdf[-1]), matching the
    # clamped index `min(inds, n_w)`
    cdf_hi = jnp.min(jnp.where(le, cdf_b[..., -1:], cdf_b), axis=-1)
    bin_hi = jnp.min(jnp.where(le, bin_b[..., -1:], bin_b), axis=-1)
    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bin_lo + (u - cdf_lo) / denom * (bin_hi - bin_lo)


def sample_importance(z_vals: jax.Array, weights: jax.Array,
                      n_importance: int,
                      rng: jax.Array | None = None) -> jax.Array:
    """z_vals: (B, R, N, 1); weights: (B, R, N-1, 1) midpoint weights from
    the coarse march → (B, R, n_importance, 1) fine depths."""
    b, r, n, _ = z_vals.shape
    z = z_vals.reshape(b * r, n)
    w = weights.reshape(b * r, -1)
    w = _smooth_weights(w)
    z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
    fine = sample_pdf(z_mid, w[:, 1:-1], n_importance, rng=rng)
    if rng is not None:
        # iid-uniform u gives an unordered sample; sorting the DEPTHS
        # (same set — sample_pdf is monotone in u, so this equals
        # sorting u first) is a cheap keys-only lax.sort and lets
        # unify_samples use the rank merge in TRAINING too, instead of
        # the feature-row sort whose transposed backward costs ~16x
        # (see _apply_ranks). rng=None u is linspace, already sorted.
        fine = jnp.sort(fine, axis=-1)
    fine = jax.lax.stop_gradient(fine)
    return fine.reshape(b, r, n_importance, 1)


def _eval_cdf(bins: jax.Array, cdf: jax.Array, x: jax.Array,
              eps: float = 1e-5) -> jax.Array:
    """Piecewise-linear CDF F(x): bins (N, K) nondecreasing, cdf (N, K)
    on those bins, x (N, Q) query depths → (N, Q). The exact forward map
    of sample_pdf's inverse, via the same masked reductions."""
    le = bins[:, None, :] <= x[:, :, None]            # (N, Q, K)
    bin_b = jnp.broadcast_to(bins[:, None, :], le.shape)
    cdf_b = jnp.broadcast_to(cdf[:, None, :], le.shape)
    # below: fill with FIRST entry (wins only when x < bins[0] → F=cdf[0])
    bin_lo = jnp.max(jnp.where(le, bin_b, bin_b[..., :1]), axis=-1)
    cdf_lo = jnp.max(jnp.where(le, cdf_b, cdf_b[..., :1]), axis=-1)
    # above: fill with LAST entry (wins only when x >= bins[-1] → F=cdf[-1])
    bin_hi = jnp.min(jnp.where(le, bin_b[..., -1:], bin_b), axis=-1)
    cdf_hi = jnp.min(jnp.where(le, cdf_b[..., -1:], cdf_b), axis=-1)
    denom = jnp.where(bin_hi - bin_lo < eps, 1.0, bin_hi - bin_lo)
    t = jnp.clip((x - bin_lo) / denom, 0.0, 1.0)
    return cdf_lo + t * (cdf_hi - cdf_lo)


def sample_importance_windowed(z_vals: jax.Array, weights: jax.Array,
                               n_windows: int, n_per: int,
                               ray_start: float, ray_end: float,
                               rng: jax.Array | None = None
                               ) -> jax.Array:
    """Windowed stratified importance sampling — the TPU-native fine
    placement policy for the windowed sampler (`sampler_fine=
    "stratified"`).

    The reference places all n_importance samples at GLOBAL quantiles of
    the smoothed coarse CDF; its +0.01 pdf floor then scatters a tail of
    samples across the whole frustum, so consecutive-index groups can
    span arbitrary depth ranges (tools/overflow_envelope.py) — bad for
    windowed gathering. Here each of the n_windows static depth windows
    gets exactly n_per samples, placed at CDF quantiles WITHIN that
    window: samples land inside their window by construction (the
    smoothing floor keeps the CDF strictly increasing, so the
    piecewise-linear inverse stays in-segment), footprints stay as
    tight as the coarse pass, and the bilinear lookups remain exact.
    Same target distribution, stratified quadrature."""
    b, r, n, _ = z_vals.shape
    nr = b * r
    z = z_vals.reshape(nr, n)
    w = _smooth_weights(weights.reshape(nr, -1))[:, 1:-1]
    z_mid = 0.5 * (z[:, :-1] + z[:, 1:])

    eps = 1e-5
    ww = w + eps
    pdf = ww / jnp.sum(ww, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)
    bins = z_mid[:, :cdf.shape[1]]

    edges = jnp.linspace(ray_start, ray_end, n_windows + 1)
    edges = jnp.broadcast_to(edges[None], (nr, n_windows + 1))
    f_edges = _eval_cdf(bins, cdf, edges)             # (NR, W+1)
    f_lo = f_edges[:, :-1, None]                      # (NR, W, 1)
    f_hi = f_edges[:, 1:, None]
    if rng is None:
        frac = (jnp.arange(n_per) + 0.5) / n_per      # midpoint strata
        frac = frac[None, None, :]
    else:
        frac = (jnp.arange(n_per)[None, None, :]
                + jax.random.uniform(rng, (nr, n_windows, n_per))) / n_per
    u = (f_lo + frac * (f_hi - f_lo)).reshape(nr, n_windows * n_per)
    fine = sample_pdf(bins, w, n_windows * n_per, u=u)
    fine = jax.lax.stop_gradient(fine)
    return fine.reshape(b, r, n_windows * n_per, 1)


# ---------------------------------------------------------------------------
# Ray marcher (MipRayMarcher2)
# ---------------------------------------------------------------------------


def ray_march(colors: jax.Array, densities: jax.Array, depths: jax.Array,
              cfg: RenderConfig
              ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mip-style midpoint compositing.

    colors (B,R,N,C), densities (B,R,N,1), depths (B,R,N,1) →
    (rgb (B,R,C) in [-1,1], depth (B,R,1), weights (B,R,N-1,1))."""
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2

    if cfg.clamp_mode == "softplus":
        densities_mid = jax.nn.softplus(densities_mid - 1.0)
    else:
        raise ValueError(cfg.clamp_mode)

    density_delta = densities_mid * deltas
    dd = density_delta[..., 0]                         # (B, R, N-1)
    alpha = 1.0 - jnp.exp(-dd)
    # Transmittance WITHOUT cumprod. The reference computes
    # T_i = cumprod(1 - alpha + 1e-10)_{j<i}; since 1 - alpha_j =
    # exp(-dd_j), each factor's log is logaddexp(-dd_j, log 1e-10)
    # (stable for any dd >= 0) and the exclusive prefix sum is ONE
    # strictly-upper-triangular matmul on the MXU. jnp.cumprod's AD
    # lowers to ~45 strided slice/mul/pad ops on (…, N, 1)-minor
    # layouts (128x lane padding) and cost ~2/3 of the whole render
    # backward at batch 2 (tools/probe_merge_march*.py: merged-march
    # bwd 157.8 -> see STATUS r4); the matmul's backward is just the
    # transposed matmul. HIGHEST precision: the exponent sum reaches
    # ~1e3, and bf16-reduced fp32 dots would cost ~1e-4 absolute there.
    log_t = jnp.logaddexp(-dd, math.log(1e-10))
    n1 = dd.shape[-1]
    tri = jnp.asarray(np.triu(np.ones((n1, n1), np.float32), 1))
    excl = jnp.einsum("brn,nm->brm", log_t, tri,
                      precision=jax.lax.Precision.HIGHEST)
    weights = (alpha * jnp.exp(excl))[..., None]       # (B, R, N-1, 1)

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=-2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) \
        / jnp.maximum(weight_total, 1e-10)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths),
                               jnp.max(depths))
    if cfg.white_back:
        composite_rgb = composite_rgb + 1 - weight_total
    composite_rgb = composite_rgb * 2 - 1
    return composite_rgb, composite_depth, weights


def _sort_rows_by_key(keys: jax.Array, feats: jax.Array) -> jax.Array:
    """Sort (B,R,N,F) feature rows by per-row (B,R,N) keys via ONE
    lax.sort_key_val on the lane-flattened layout — no take_along_axis
    (whose broadcast index lowers to per-element gathers on TPU)."""
    b, r, n, f = feats.shape
    keys_b = jnp.broadcast_to(keys[..., None], (b, r, n, f))
    keys2 = jnp.swapaxes(keys_b, -1, -2).reshape(b * r * f, n)
    vals2 = jnp.swapaxes(feats, -1, -2).reshape(b * r * f, n)
    _, sorted_vals = jax.lax.sort_key_val(keys2, vals2, dimension=-1)
    return jnp.swapaxes(sorted_vals.reshape(b, r, f, n), -1, -2)


@jax.custom_vjp
def _permute_rows(feats: jax.Array, depths: jax.Array) -> jax.Array:
    return _sort_rows_by_key(depths, feats)


def _permute_rows_fwd(feats, depths):
    b, r, n, _ = feats.shape
    # the permutation itself (for the backward): sort iota by depth
    iota = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32)[None, None, :], (b, r, n))
    d2 = depths.reshape(b * r, n)
    _, perm = jax.lax.sort_key_val(d2, iota.reshape(b * r, n),
                                   dimension=-1)
    return _sort_rows_by_key(depths, feats), perm.reshape(b, r, n)


def _permute_rows_bwd(perm, g):
    # out[i] = in[perm[i]]  ⇒  d_in[perm[i]] = d_out[i]: sorting the
    # cotangent rows BY perm restores input order — the scatter becomes
    # one more key-value sort (the naive transpose would be ~1.5 s of
    # per-element gathers; this is ~40 ms).
    return _sort_rows_by_key(perm, g), None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@jax.custom_vjp
def _apply_ranks(feats: jax.Array, rank: jax.Array) -> jax.Array:
    """out[..., rank[..., s], :] = feats[..., s, :] — apply a per-ray
    permutation given as destination ranks, via one batched one-hot
    matmul (MXU).

    Custom VJP: JAX's native transpose of the one-hot einsum is the
    SAME matmul contracting over the one-hot's OTHER axis; XLA's
    transposed-batched-matmul path made that ~130 ms at batch 2 / 96
    samples (vs ~8 ms forward; measured r3,
    tools/probe_render_bwd2.py). A permutation's transpose IS the
    inverse permutation, so the backward builds the inverse one-hot
    directly — d_feats[s] = g[rank[s]] = Σ_p (rank[s]==p)·g[p] — and
    contracts it in the identical (fast) orientation as the forward.
    (A vmap'd row-gather bwd was tried first: 34-float rows hit the
    per-element TPU gather path and DOUBLED the step time.)"""
    n = rank.shape[-1]
    dst = jnp.arange(n, dtype=jnp.int32)
    onehot = (rank[..., None, :] == dst[:, None]).astype(feats.dtype)
    return jnp.einsum("brks,brsf->brkf", onehot, feats)


def _apply_ranks_fwd(feats, rank):
    return _apply_ranks(feats, rank), rank


def _apply_ranks_bwd(rank, g):
    n = rank.shape[-1]
    # inverse permutation (inv_rank[rank[s]] = s), then re-enter the
    # forward einsum verbatim: d_feats[s] = g[rank[s]] means scattering
    # g[p] to slot inv_rank[p] — exactly _apply_ranks(g, inv_rank).
    # argsort(rank) via ONE keys-only sort_key_val: the N² broadcast
    # compare-reduce this replaces materialized four s32 (B,R,N,N)
    # tensors (~1.2 GB each at batch 2) in the backward HLO.
    iota = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32), rank.shape)
    _, inv_rank = jax.lax.sort_key_val(rank, iota, dimension=-1)
    return (_apply_ranks(g, inv_rank),
            np.zeros(rank.shape, jax.dtypes.float0))


_apply_ranks.defvjp(_apply_ranks_fwd, _apply_ranks_bwd)


def unify_samples(d1, c1, s1, d2, c2, s2, *, sorted_inputs: bool = False):
    """Depth-sort-merge of coarse+fine samples along the sample axis.

    sorted_inputs=True (deterministic inference: stratified depths and
    linspace-u importance depths are both monotone per ray) switches to
    a closed-form rank merge: ranks come from one broadcast compare per
    list and the permutation applies as a batched one-hot matmul on the
    MXU — no lax.sort (which pays the key comparisons once per feature
    column, ~110 ms/frame at batch 4)."""
    depths = jnp.concatenate([d1, d2], axis=-2)
    colors = jnp.concatenate([c1, c2], axis=-2)
    sigmas = jnp.concatenate([s1, s2], axis=-2)
    feats = jnp.concatenate([depths, colors, sigmas], axis=-1)  # (B,R,N,F)
    c = colors.shape[-1]

    if sorted_inputs:
        k1 = jax.lax.stop_gradient(d1[..., 0])          # (B, R, N1)
        k2 = jax.lax.stop_gradient(d2[..., 0])
        # stable-merge ranks (list 1 wins ties, like a stable sort of
        # the concatenation)
        r1 = jnp.arange(k1.shape[-1], dtype=jnp.int32) \
            + jnp.sum(k2[..., None, :] < k1[..., :, None], axis=-1)
        r2 = jnp.arange(k2.shape[-1], dtype=jnp.int32) \
            + jnp.sum(k1[..., None, :] <= k2[..., :, None], axis=-1)
        rank = jnp.concatenate([r1, r2], axis=-1)       # (B, R, N)
        feats_sorted = _apply_ranks(feats, rank)
    else:
        keys = jax.lax.stop_gradient(depths[..., 0])
        feats_sorted = _permute_rows(feats, keys)

    return (feats_sorted[..., :1], feats_sorted[..., 1:1 + c],
            feats_sorted[..., 1 + c:])


# ---------------------------------------------------------------------------
# Full importance renderer
# ---------------------------------------------------------------------------


def run_model(decoder_params: Params, cfg: RenderConfig, planes: jax.Array,
              coordinates: jax.Array) -> tuple[jax.Array, jax.Array]:
    feats = sample_from_planes(planes, coordinates, cfg.box_warp)
    return decoder_apply(decoder_params, cfg, feats)


def run_model_packed(decoder_params: Params, cfg: RenderConfig,
                     packed: jax.Array, coordinates: jax.Array,
                     b: int, h: int, w: int):
    feats = sample_from_packed(packed, coordinates, cfg.box_warp, b, h, w)
    return decoder_apply(decoder_params, cfg, feats)


def render_rays(decoder_params: Params, cfg: RenderConfig,
                planes: jax.Array, ray_origins: jax.Array,
                ray_directions: jax.Array,
                rng: jax.Array | None = None
                ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The ImportanceRenderer: coarse march → importance resample → unified
    march. planes (B,3,H,W,C); rays (B,R,3) → (feature (B,R,32),
    depth (B,R,1), weight_sum (B,R,1)).

    With cfg.ray_chunk set, rays process in lax.map chunks — rays are
    fully independent through both passes, so chunking bounds the
    (B, M, ·) intermediates and raises the per-chip batch envelope.
    ray_chunk applies only to the XLA gather path: the windowed
    (use_pallas_sampler) path bounds memory through its own
    tile×depth-window blocking instead and ignores the flag."""
    b, r, _ = ray_origins.shape

    if cfg.ray_shard_axis is not None:
        from jax.sharding import PartitionSpec as P
        spec = P(None, cfg.ray_shard_axis)
        ray_origins = jax.lax.with_sharding_constraint(ray_origins, spec)
        ray_directions = jax.lax.with_sharding_constraint(ray_directions,
                                                          spec)

    _, _, ph, pw, _ = planes.shape

    if cfg.use_pallas_sampler:
        if cfg.data_shard_axis is not None:
            return _render_windowed_dp(decoder_params, cfg, planes,
                                       ray_origins, ray_directions, rng)
        return _render_core_windowed(decoder_params, cfg, planes,
                                     ray_origins, ray_directions, rng)

    packed = pack_planes(planes)        # once; reused by both passes

    chunk = cfg.ray_chunk
    if chunk and chunk < r:
        assert r % chunk == 0, (
            f"ray_chunk ({chunk}) must divide the ray count ({r}) — "
            f"silently falling back to the unchunked path would "
            f"materialize the full (B, R·N, ·) intermediates")
        nch = r // chunk
        ro = jnp.swapaxes(ray_origins.reshape(b, nch, chunk, 3), 0, 1)
        rd = jnp.swapaxes(ray_directions.reshape(b, nch, chunk, 3), 0, 1)
        if rng is not None:
            keys = jax.random.split(rng, nch)
            xs = (ro, rd, keys)
        else:
            xs = (ro, rd, jnp.zeros((nch,), jnp.uint32))

        def one(args):
            o, d, k = args
            key = k if rng is not None else None
            return _render_core(decoder_params, cfg, packed, o, d, key,
                                ph, pw)

        if cfg.remat:
            # without this, lax.map's backward stores every chunk's
            # residuals — same peak memory as the unchunked path
            one = jax.checkpoint(one)

        rgb, depth, wsum = jax.lax.map(one, xs)
        swap = lambda x: jnp.swapaxes(x, 0, 1).reshape(b, r, -1)
        return swap(rgb), swap(depth), swap(wsum)

    return _render_core(decoder_params, cfg, packed, ray_origins,
                        ray_directions, rng, ph, pw)


def decoder_apply_cp(params: Params, cfg: RenderConfig,
                     x: jax.Array) -> jax.Array:
    """OSGDecoder on channels-FIRST features: (..., C, P) plane-averaged
    features → (..., 33, P) [sigma; raw rgb logits pre-squash]. Same
    math as decoder_apply, laid out for the windowed sampler's blocked
    tensors (avoids a huge (…, 32)-minor transpose — XLA pads those
    copies 4× on lanes)."""

    def fc(h, w, bias, act):
        out_dim, in_dim = w.shape
        gain = cfg.decoder_lr_mul / math.sqrt(in_dim)
        wg = (w * gain).astype(h.dtype)
        y = jnp.einsum("oc,...cp->...op", wg, h)
        y = y + (bias * cfg.decoder_lr_mul).astype(y.dtype)[..., :, None]
        return jax.nn.softplus(y) if act else y

    x = x.astype(cfg.decoder_dtype)
    h = fc(x, params["fc0"]["weight"], params["fc0"]["bias"], act=True)
    y = fc(h, params["fc1"]["weight"], params["fc1"]["bias"], act=False)
    # stays in compute dtype: the caller unblocks this (big transposes)
    # before casting — bf16 halves those copy bytes both directions
    return y


def _render_windowed_dp(decoder_params: Params, cfg: RenderConfig,
                        planes: jax.Array, ray_origins: jax.Array,
                        ray_directions: jax.Array,
                        rng: jax.Array | None):
    """Windowed render under shard_map over cfg.data_shard_axis.

    Batch entries are independent through plan_blocks → Pallas sampler →
    decoder → marcher, so partitioning on the batch is exact: each mesh
    shard runs the (per-chip) Pallas kernel on its local batch slice and
    no collectives are needed until the caller's loss psum. This is the
    pod-scale DP path — without it, XLA cannot partition the Pallas
    custom call and a sharded-batch jit would replicate or fail (STATUS
    r2 'pod caveat'). Ray (model-axis) sharding keeps the XLA gather
    path instead."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = cfg.data_shard_axis
    mesh = jax.sharding.get_abstract_mesh()
    assert axis in mesh.axis_names, (axis, mesh)
    spec_b = P(axis)

    if rng is None:
        def local(params, pl_, ro, rd):
            return _render_core_windowed(params, cfg, pl_, ro, rd, None)
        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(), spec_b, spec_b, spec_b),
                       out_specs=(spec_b, spec_b, spec_b),
                       check_vma=False)
        return fn(decoder_params, planes, ray_origins, ray_directions)

    def local_rng(params, pl_, ro, rd, key):
        # distinct stratified jitter per shard
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return _render_core_windowed(params, cfg, pl_, ro, rd, key)

    fn = shard_map(local_rng, mesh=mesh,
                   in_specs=(P(), spec_b, spec_b, spec_b, P()),
                   out_specs=(spec_b, spec_b, spec_b),
                   check_vma=False)
    return fn(decoder_params, planes, ray_origins, ray_directions, rng)


def _render_core_windowed(decoder_params: Params, cfg: RenderConfig,
                          planes: jax.Array, ray_origins: jax.Array,
                          ray_directions: jax.Array,
                          rng: jax.Array | None):
    """ImportanceRenderer on the windowed MXU sampler
    (core/pallas/triplane.py). Differentiable — the sampler carries a
    custom VJP (sequential RMW scatter for d/d(planes)), so training
    runs through this path too. The plane mean and the OSG decoder run
    in BLOCKED (…, C, P) layout so only the 33-channel decoder output
    is unblocked back to ray order."""
    from ...core.pallas import triplane as tpl

    b, r, _ = ray_origins.shape
    res = int(round(math.sqrt(r)))
    assert res * res == r, "windowed sampler needs a square ray grid"
    assert res % cfg.sampler_tile == 0
    _, _, ph, pw, c = planes.shape
    xal = tpl.x_align_for(cfg.sampler_dtype)
    planes_quad = tpl.quad_pack_planes(planes.astype(cfg.sampler_dtype))
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3

    def eval_points(depths, slab):
        n = depths.shape[2]
        slab = tpl.effective_slab(slab, xal)
        pts = ray_origins[:, :, None, :] \
            + depths * ray_directions[:, :, None, :]
        plan, txy, origins, overflow = tpl.plan_blocks(
            pts.reshape(b, -1, 3), _PLANE_INV, cfg.box_warp,
            res=res, n_depth=n, plane_hw=ph, tile=cfg.sampler_tile,
            depth_window=cfg.sampler_depth_window, slab=slab,
            x_align=xal)
        if cfg.sampler_debug_overflow:
            jax.debug.print(
                "triplane sampler: {f:.4f} of {n} blocks overflow the "
                "{s} slab (out-of-slab corners read zeros)",
                f=jnp.mean(overflow.astype(jnp.float32)),
                n=plan.n_blocks, s=slab)
        blocked = tpl.sample_blocked(plan, txy, origins, planes_quad,
                                     group=cfg.sampler_group,
                                     interpret=cfg.pallas_interpret)
        nbp = plan.n_blocks // (b * 3)
        # fp32-accumulated plane mean over the (bf16) sampler output;
        # the decoder casts to its compute dtype right after, so XLA
        # fuses mean+cast into one pass over the half-width features
        feats = blocked.reshape(b, 3, nbp, c, plan.points).mean(
            axis=1, dtype=jnp.float32)
        y = decoder_apply_cp(decoder_params, cfg, feats)  # (b,nbp,33,P)
        # unblock in the decoder's compute dtype (bf16 halves the
        # transpose bytes, fwd AND bwd); cast to fp32 at the 33-channel
        # tail where compositing wants full precision
        y = tpl.unblock_feats(y.reshape(b * nbp, -1, plan.points),
                               plan, b)                   # (b, R·N, 33)
        y = y.reshape(b, r, n, -1).astype(jnp.float32)
        sigma = y[..., 0:1]
        rgb = jax.nn.sigmoid(y[..., 1:]) * (1 + 2 * 0.001) - 0.001
        return rgb, sigma

    def eval_points_xla(depths):
        """Exact packed row-gather fallback (fine pass default).

        Ray-chunked via lax.map: the (B, 3, M, 4C) gather temporaries
        pad 4x on lanes and OOM HBM at batch 8 if materialized whole.
        bf16 rows: measured same gather speed (issue-bound), half HBM."""
        n = depths.shape[2]
        packed = pack_planes(planes.astype(jnp.bfloat16))
        chunk = min(4096, r)
        while r % chunk:
            chunk //= 2
        nch = r // chunk
        ro_c = jnp.swapaxes(ray_origins.reshape(b, nch, chunk, 3), 0, 1)
        rd_c = jnp.swapaxes(ray_directions.reshape(b, nch, chunk, 3),
                            0, 1)
        d_c = jnp.swapaxes(depths.reshape(b, nch, chunk, n, 1), 0, 1)

        def one(args):
            o, d_dir, dep = args
            pts = o[:, :, None, :] + dep * d_dir[:, :, None, :]
            rgb, sigma = run_model_packed(decoder_params, cfg, packed,
                                          pts.reshape(b, -1, 3), b, ph,
                                          pw)
            return (rgb.reshape(b, chunk, n, -1),
                    sigma.reshape(b, chunk, n, 1))

        rgb, sigma = jax.lax.map(one, (ro_c, rd_c, d_c))
        swap = lambda x: jnp.swapaxes(x, 0, 1).reshape(b, r, n, -1)
        return swap(rgb), swap(sigma)

    if cfg.remat:
        # same trade as the XLA path: recompute each pass's sampler/
        # decoder residuals in the backward instead of storing both
        eval_points = jax.checkpoint(eval_points, static_argnums=(1,))
        eval_points_xla = jax.checkpoint(eval_points_xla)

    if cfg.use_pallas_marcher and not cfg.white_back:
        from ...core.pallas.raymarch import pallas_ray_march
        marcher = lambda c_, d_, z_: pallas_ray_march(c_, d_, z_)
    else:
        marcher = lambda c_, d_, z_: ray_march(c_, d_, z_, cfg)

    depths_coarse = sample_stratified(ray_origins, cfg.ray_start,
                                      cfg.ray_end, cfg.depth_resolution,
                                      rng=rngs[0])
    colors_c, densities_c = eval_points(depths_coarse, cfg.sampler_slab)

    n_fine = cfg.depth_resolution_importance
    if n_fine > 0:
        _, _, weights = marcher(colors_c, densities_c, depths_coarse)
        if cfg.sampler_fine == "stratified":
            assert n_fine % cfg.sampler_depth_window == 0, (
                f"depth_resolution_importance ({n_fine}) must be a "
                f"multiple of sampler_depth_window "
                f"({cfg.sampler_depth_window}) — truncation would "
                f"silently drop fine samples")
            depths_fine = sample_importance_windowed(
                depths_coarse, weights,
                n_windows=n_fine // cfg.sampler_depth_window,
                n_per=cfg.sampler_depth_window,
                ray_start=cfg.ray_start, ray_end=cfg.ray_end,
                rng=rngs[1])
            # samples sit inside their static depth window → coarse-pass
            # footprints; exact bilinear, full Pallas speed
            colors_f, densities_f = eval_points(depths_fine,
                                                cfg.sampler_slab)
        else:
            depths_fine = sample_importance(depths_coarse, weights,
                                            n_fine, rng=rngs[1])
            if cfg.sampler_fine == "pallas":
                colors_f, densities_f = eval_points(depths_fine,
                                                    cfg.sampler_slab_fine)
            else:
                colors_f, densities_f = eval_points_xla(depths_fine)
        depths, colors, densities = unify_samples(
            depths_coarse, colors_c, densities_c,
            depths_fine, colors_f, densities_f,
            # both lists are always sorted: stratified coarse jitter
            # stays in its bin; windowed-stratified fine is monotone by
            # construction; global-quantile fine is explicitly sorted
            # in sample_importance
            sorted_inputs=True)
        rgb_final, depth_final, weights = marcher(colors, densities,
                                                  depths)
    else:
        rgb_final, depth_final, weights = marcher(colors_c, densities_c,
                                                  depths_coarse)
    return rgb_final, depth_final, jnp.sum(weights, axis=2)


def _render_core(decoder_params: Params, cfg: RenderConfig,
                 packed: jax.Array, ray_origins: jax.Array,
                 ray_directions: jax.Array, rng: jax.Array | None,
                 ph: int, pw: int):
    b, r, _ = ray_origins.shape
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3

    depths_coarse = sample_stratified(ray_origins, cfg.ray_start,
                                      cfg.ray_end, cfg.depth_resolution,
                                      rng=rngs[0])

    def eval_points(depths):
        n = depths.shape[2]
        pts = ray_origins[:, :, None, :] \
            + depths * ray_directions[:, :, None, :]
        rgb, sigma = run_model_packed(decoder_params, cfg, packed,
                                      pts.reshape(b, -1, 3), b, ph, pw)
        rgb = rgb.reshape(b, r, n, -1)
        sigma = sigma.reshape(b, r, n, 1)
        return rgb, sigma

    if cfg.remat:
        eval_points = jax.checkpoint(eval_points)

    if cfg.use_pallas_marcher and not cfg.white_back:
        from ...core.pallas.raymarch import pallas_ray_march
        marcher = lambda c_, d_, z_: pallas_ray_march(c_, d_, z_)
    else:
        marcher = lambda c_, d_, z_: ray_march(c_, d_, z_, cfg)

    colors_c, densities_c = eval_points(depths_coarse)

    n_fine = cfg.depth_resolution_importance
    if n_fine > 0:
        _, _, weights = marcher(colors_c, densities_c, depths_coarse)
        depths_fine = sample_importance(depths_coarse, weights, n_fine,
                                        rng=rngs[1])
        colors_f, densities_f = eval_points(depths_fine)
        depths, colors, densities = unify_samples(
            depths_coarse, colors_c, densities_c,
            depths_fine, colors_f, densities_f,
            # always sorted: stratified coarse + explicitly-sorted
            # importance depths (sample_importance) → rank merge in
            # training too (the feature-row sort path stays for
            # sorted_inputs=False callers)
            sorted_inputs=True)
        rgb_final, depth_final, weights = marcher(colors, densities,
                                                  depths)
    else:
        rgb_final, depth_final, weights = marcher(colors_c, densities_c,
                                                  depths_coarse)
    return rgb_final, depth_final, jnp.sum(weights, axis=2)
