"""Personalized low-dimensional latent subspace in EG3D's W+ space.

The core HFA-GP idea (reference code/networks/headnerf.py:55-57,81-102):
a learnable matrix `bases ∈ R^{dim_shape × (14·512)}` is orthonormalized
by QR each step; driving weights α mix the columns and a learnable mean
`delta` recenters:   w+ = α @ Qᵀ + delta,  reshaped (B, 14, 512).

`jnp.linalg.qr` signs may differ from `torch.qr` per column — the span
(and therefore training) is identical; checkpoint-parity tooling accounts
for sign (SURVEY.md §7.3 item 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_subspace(key: jax.Array, dim_shape: int, num_ws: int = 14,
                  dim: int = 512,
                  init_bases: jax.Array | None = None) -> dict:
    """`init_bases` (dim_shape, num_ws*dim) seeds the subspace from PTI
    W+ pivots (reference load_bases, headnerf.py:12-23,60-69)."""
    if init_bases is not None:
        bases = jnp.asarray(init_bases, jnp.float32) \
            .reshape(dim_shape, -1)
    else:
        bases = jax.random.normal(key, (dim_shape, num_ws * dim),
                                  jnp.float32)
    return {"bases": bases, "delta": bases.mean(axis=0)}


def load_pti_bases(emb_dir: str, dim_shape: int, num_ws: int = 14,
                   dim: int = 512) -> "jnp.ndarray":
    """Load per-direction W+ pivots `{emb_dir}/*/0.pt` (PTI embeddings) or
    `{emb_dir}/*/0.npy` to initialize a second person's bases
    (headnerf.py:12-23). Pivots stored (18, 512) are truncated to
    num_ws."""
    import os

    import numpy as np
    dirs = sorted(os.listdir(emb_dir))[:dim_shape]
    out = np.random.default_rng(0).standard_normal(
        (dim_shape, num_ws, dim)).astype(np.float32)
    for i, d in enumerate(dirs):
        base = None
        for fname, loader in (("0.npy", lambda p: np.load(p)),
                              ("0.pt", None)):
            p = os.path.join(emb_dir, d, fname)
            if os.path.exists(p):
                if loader is None:
                    import torch
                    base = torch.load(p, map_location="cpu") \
                        .squeeze(0).numpy()
                else:
                    base = loader(p)
                break
        if base is not None:
            out[i] = base[:num_ws]
    return jnp.asarray(out.reshape(dim_shape, num_ws * dim))


def orthonormal_basis(params: dict, eps: float = 1e-8) -> jax.Array:
    """Q (num_ws*dim, dim_shape) with orthonormal columns
    (headnerf.py:91: `torch.qr(bases.T)`)."""
    q, _ = jnp.linalg.qr((params["bases"] + eps).T)
    return q


def get_latent(params: dict, weights: jax.Array, dim: int = 512,
               eps: float = 1e-8) -> jax.Array:
    """weights (B, dim_shape) → W+ latent (B, num_ws, dim).

    Parity: headnerf.py:81-102 — `diag_embed(w) @ Qᵀ` summed over rows is
    exactly `w @ Qᵀ`."""
    q = orthonormal_basis(params, eps)
    b = weights.shape[0]
    out = weights @ q.T                                  # (B, num_ws*dim)
    return out.reshape(b, -1, dim) + params["delta"].reshape(1, -1, dim)
