"""Face-reconstruction training losses.

Rebuilds reference eg3d-pose-detection/models/losses.py:13-113 (used by
Deep3DFaceRecon training; the inference pipeline only runs the regressor,
but the loss suite is part of the framework surface):

  * perceptual: 1 − cosine similarity of frozen arcface embeddings
  * photometric: masked L2 over rendered-vs-real pixels
  * landmark: weighted L2 over 68 points (eyes/nose/mouth ×20)
  * coefficient regularization: weighted L2 on id/exp/tex
  * reflectance: texture variance within the skin mask
  * gamma: SH coefficients pulled toward channel-mean
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def perceptual_loss(id_featureA: jax.Array,
                    id_featureB: jax.Array) -> jax.Array:
    """1 − <a, b> of unit-normalized embeddings (losses.py:13-19)."""
    cosine = jnp.sum(id_featureA * id_featureB, axis=-1)
    return jnp.mean(1.0 - cosine)


def perceptual_loss_from_images(recog_fn, image_a: jax.Array,
                                image_b: jax.Array, m: jax.Array,
                                dsize: int = 112) -> jax.Array:
    """Full PerceptualLoss.forward (losses.py:12-34): differentiable
    kornia-style affine crop to the ArcFace 112² frame, then 1 − cosine
    of the frozen embedder's features. See preprocess/warp.py."""
    from .warp import perceptual_id_loss
    return perceptual_id_loss(recog_fn, image_a, image_b, m, dsize)


def photo_loss(imageA: jax.Array, imageB: jax.Array,
               mask: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Masked per-pixel L2-norm (losses.py:40-52). images NHWC."""
    diff = jnp.sqrt(eps + jnp.sum((imageA - imageB) ** 2, axis=-1,
                                  keepdims=True))
    loss = jnp.sum(diff * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return loss


# eyes/nose/mouth landmarks get 20x weight (losses.py:54-68)
_LM_WEIGHTS = np.ones(68, dtype=np.float32)
_LM_WEIGHTS[28:31] = 20.0
_LM_WEIGHTS[48:68] = 20.0
_LM_WEIGHTS[17:27] = 1.0  # brows keep weight 1 (explicit for clarity)


def landmark_loss(predict_lm: jax.Array, gt_lm: jax.Array,
                  weight: jax.Array | None = None) -> jax.Array:
    """(B, 68, 2) weighted L2 / 224 normalization (losses.py:54-68)."""
    w = jnp.asarray(_LM_WEIGHTS) if weight is None else weight
    loss = jnp.sum((predict_lm - gt_lm) ** 2, axis=-1) * w
    return jnp.sum(jnp.mean(loss, axis=1)) / predict_lm.shape[0]


def reg_loss(coeffs: dict[str, jax.Array], w_id: float = 1.0,
             w_exp: float = 1.0, w_tex: float = 1.0) -> jax.Array:
    """Coefficient magnitude regularizer (losses.py:70-84)."""
    creg = w_id * jnp.sum(coeffs["id"] ** 2) \
        + w_exp * jnp.sum(coeffs["exp"] ** 2) \
        + w_tex * jnp.sum(coeffs["tex"] ** 2)
    return creg / coeffs["id"].shape[0]


def gamma_loss(gamma: jax.Array) -> jax.Array:
    """SH coeffs pulled toward the cross-channel mean (losses.py:76-84)."""
    g = gamma.reshape(-1, 3, 9)
    mean = jnp.mean(g, axis=1, keepdims=True)
    return jnp.mean((g - mean) ** 2)


def reflectance_loss(texture: jax.Array,
                     skin_mask: jax.Array) -> jax.Array:
    """Variance of skin-region texture (losses.py:86-98).
    texture (B, N, 3); skin_mask (N,)."""
    mask = skin_mask.reshape(1, -1, 1)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(texture * mask, axis=1, keepdims=True) / denom
    return jnp.sum(((texture - mean) * mask) ** 2) \
        / (texture.shape[0] * denom)
