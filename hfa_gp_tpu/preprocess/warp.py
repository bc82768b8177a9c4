"""Differentiable affine warp + ArcFace crop alignment.

Rebuilds the reference's kornia `warp_affine` usage
(eg3d-pose-detection/models/losses.py:4-10 `resize_n_crop`,
models/networks.py:107-126 RecogNetWrapper) and the `estimate_norm`
similarity transform the pipeline feeds it (imported from the upstream
Deep3DFaceRecon `util.preprocess`; the reference tree itself ships no
`util/` — one of its broken-at-import seams).

TPU-first: the warp is one gather-free bilinear interpolation expressed
as jnp ops (fully differentiable w.r.t. both image and M); estimate_norm
is a closed-form Umeyama similarity solve (jnp, batched, differentiable)
instead of skimage's iterative least squares.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Canonical ArcFace 112x112 five-point targets (insightface convention,
# consumed by Deep3DFaceRecon util/preprocess.py estimate_norm).
ARCFACE_5PTS = np.array([
    [38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
    [41.5493, 92.3655], [70.7299, 92.2041]], dtype=np.float32)


def extract_5p(lm68: jax.Array) -> jax.Array:
    """68-point landmarks → 5 points (eyes centers, nose, mouth corners).
    Parity: Deep3DFaceRecon util/preprocess.py extract_5p."""
    idx = jnp.asarray([31, 37, 40, 43, 46, 49, 55]) - 1
    lm = lm68[..., idx, :]
    left_eye = (lm[..., 1, :] + lm[..., 2, :]) / 2
    right_eye = (lm[..., 3, :] + lm[..., 4, :]) / 2
    five = jnp.stack([left_eye, right_eye, lm[..., 0, :],
                      lm[..., 5, :], lm[..., 6, :]], axis=-2)
    return five


def umeyama_similarity(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Least-squares similarity transform (scale·R, t) mapping src→dst,
    closed-form (Umeyama 1991 — identical to skimage
    SimilarityTransform.estimate). src/dst: (..., N, 2) → (..., 2, 3)."""
    mu_s = src.mean(axis=-2, keepdims=True)
    mu_d = dst.mean(axis=-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d
    n = src.shape[-2]
    cov = jnp.einsum("...ni,...nj->...ij", dc, sc) / n   # (2, 2)
    u, s, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u) * jnp.linalg.det(vt)
    d = jnp.stack([jnp.ones_like(det), jnp.sign(det)], axis=-1)
    r = u @ (d[..., :, None] * vt)
    var_s = jnp.mean(jnp.sum(sc * sc, axis=-1), axis=-1)
    scale = jnp.sum(s * d, axis=-1) / jnp.maximum(var_s, 1e-12)
    sr = scale[..., None, None] * r
    t = mu_d.squeeze(-2) - jnp.einsum("...ij,...j->...i",
                                      sr, mu_s.squeeze(-2))
    return jnp.concatenate([sr, t[..., :, None]], axis=-1)


def estimate_norm(lm: jax.Array, h: int) -> jax.Array:
    """Landmarks → (B, 2, 3) affine M aligning the face to the 112²
    ArcFace crop. lm: (B, 68, 2) or (B, 5, 2) in image coords with y
    pointing UP (the recon convention); `h` flips it to raster coords
    first (util/preprocess.py estimate_norm: lm[:, -1] = H-1-lm[:, -1])."""
    if lm.shape[-2] == 68:
        lm = extract_5p(lm)
    lm = jnp.stack([lm[..., 0], h - 1 - lm[..., 1]], axis=-1)
    dst = jnp.broadcast_to(jnp.asarray(ARCFACE_5PTS),
                           lm.shape[:-2] + (5, 2))
    return umeyama_similarity(lm, dst)


def _invert_affine(m: jax.Array) -> jax.Array:
    """(..., 2, 3) → inverse (..., 2, 3). A degenerate M (|det| ~ 0)
    maps everything out of bounds (NaN-free zero output) instead of
    poisoning downstream losses with NaNs."""
    a = m[..., :2]
    t = m[..., 2]
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    ok = jnp.abs(det) > 1e-12
    safe_det = jnp.where(ok, det, 1.0)
    adj = jnp.stack([
        jnp.stack([a[..., 1, 1], -a[..., 0, 1]], axis=-1),
        jnp.stack([-a[..., 1, 0], a[..., 0, 0]], axis=-1)], axis=-2)
    ainv = adj / safe_det[..., None, None]
    tinv = -jnp.einsum("...ij,...j->...i", ainv, t)
    # out-of-bounds sentinel → every bilinear tap masks to zero
    tinv = jnp.where(ok[..., None], tinv, -1e9)
    return jnp.concatenate([ainv, tinv[..., :, None]], axis=-1)


def warp_affine(image: jax.Array, m: jax.Array, dsize: int,
                align_corners: bool = True) -> jax.Array:
    """kornia.geometry.warp_affine for NHWC: dst(p) = src(M⁻¹ p),
    bilinear, zero padding. Differentiable w.r.t. image AND m.

    image (B, H, W, C); m (B, 2, 3) source→destination pixel transform
    (kornia convention); returns (B, dsize, dsize, C)."""
    b, h, w, c = image.shape
    minv = _invert_affine(m.astype(jnp.float32))

    ys, xs = jnp.meshgrid(jnp.arange(dsize, dtype=jnp.float32),
                          jnp.arange(dsize, dtype=jnp.float32),
                          indexing="ij")
    ones = jnp.ones_like(xs)
    grid = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)  # (P, 3)
    src = jnp.einsum("bij,pj->bpi", minv, grid)               # (B, P, 2)
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def tap(xi, yi):
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0)
               & (yi <= h - 1)).astype(image.dtype)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = image.reshape(b, h * w, c)
        v = jax.vmap(lambda im, idx: im[idx])(flat, yc * w + xc)
        return v * inb[..., None]

    fx = fx[..., None].astype(image.dtype)
    fy = fy[..., None].astype(image.dtype)
    out = (tap(x0, y0) * (1 - fx) * (1 - fy)
           + tap(x0 + 1, y0) * fx * (1 - fy)
           + tap(x0, y0 + 1) * (1 - fx) * fy
           + tap(x0 + 1, y0 + 1) * fx * fy)
    return out.reshape(b, dsize, dsize, c)


def resize_n_crop(image: jax.Array, m: jax.Array,
                  dsize: int = 112) -> jax.Array:
    """losses.py:7-10 parity (NHWC)."""
    return warp_affine(image, m, dsize)


def perceptual_id_loss(recog_fn, image_a: jax.Array, image_b: jax.Array,
                       m: jax.Array, dsize: int = 112) -> jax.Array:
    """PerceptualLoss.forward (losses.py:12-34) end-to-end from images:
    warp both to the ArcFace crop, map [0,1]→[-1,1], embed with the
    frozen recognition net, 1 − cosine. `recog_fn`: (B,112,112,3)→(B,D)."""
    a = 2.0 * resize_n_crop(image_a, m, dsize) - 1.0
    b = 2.0 * resize_n_crop(image_b, m, dsize) - 1.0
    fa = recog_fn(a)
    fb = recog_fn(b)
    fa = fa / jnp.maximum(jnp.linalg.norm(fa, axis=-1, keepdims=True),
                          1e-12)
    fb = fb / jnp.maximum(jnp.linalg.norm(fb, axis=-1, keepdims=True),
                          1e-12)
    return jnp.mean(1.0 - jnp.sum(fa * fb, axis=-1))
