"""Basel Face Model 2009 parametric head, TPU-native.

Rebuilds reference eg3d-pose-detection/models/bfm.py:26-299
(ParametricFaceModel): linear id/expression blend shapes, texture, Euler
rotation, perspective projection, 68-landmark selection, and 3-band
spherical-harmonics shading. All pure functions over a `BFMData` pytree
loaded from `BFM_model_front.mat` (or synthesized for tests).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# camera/projection constants (bfm.py:27-37)
CAMERA_DISTANCE = 10.0
FOCAL = 1015.0
CENTER = 112.0
INIT_LIT = np.array([0.8, 0, 0, 0, 0, 0, 0, 0, 0], dtype=np.float32)

# SH band constants (bfm.py:19-22)
_SH_A = np.array([np.pi, 2 * np.pi / np.sqrt(3.0),
                  2 * np.pi / np.sqrt(8.0)], dtype=np.float32)
_SH_C = np.array([1 / np.sqrt(4 * np.pi),
                  np.sqrt(3.0) / np.sqrt(4 * np.pi),
                  3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)],
                 dtype=np.float32)


@dataclass(frozen=True)
class BFMData:
    mean_shape: jax.Array    # (3N,)   recentered
    id_base: jax.Array       # (3N, 80)
    exp_base: jax.Array      # (3N, 64)
    mean_tex: jax.Array      # (3N,)
    tex_base: jax.Array      # (3N, 80)
    keypoints: jax.Array     # (68,) vertex ids
    face_buf: jax.Array      # (F, 3) triangle vertex ids
    point_buf: jax.Array     # (N, 8) faces per vertex


def load_bfm(path: str) -> BFMData:
    """Load BFM_model_front.mat (reference bfm.py:39-70, recenter=True)."""
    from scipy.io import loadmat
    m = loadmat(path)
    mean_shape = m["meanshape"].astype(np.float32).reshape(-1, 3)
    mean_shape = mean_shape - mean_shape.mean(axis=0, keepdims=True)
    return BFMData(
        mean_shape=jnp.asarray(mean_shape.reshape(-1)),
        id_base=jnp.asarray(m["idBase"].astype(np.float32)),
        exp_base=jnp.asarray(m["exBase"].astype(np.float32)),
        mean_tex=jnp.asarray(m["meantex"].astype(np.float32).reshape(-1)),
        tex_base=jnp.asarray(m["texBase"].astype(np.float32)),
        keypoints=jnp.asarray(
            np.squeeze(m["keypoints"]).astype(np.int64) - 1),
        face_buf=jnp.asarray(m["tri"].astype(np.int64) - 1),
        point_buf=jnp.asarray(m["point_buf"].astype(np.int64) - 1),
    )


def split_coeff(coeffs: jax.Array) -> dict[str, jax.Array]:
    """(B, 257) → id/exp/tex/angle/gamma/trans (bfm.py:252-273)."""
    return {
        "id": coeffs[:, :80],
        "exp": coeffs[:, 80:144],
        "tex": coeffs[:, 144:224],
        "angle": coeffs[:, 224:227],
        "gamma": coeffs[:, 227:254],
        "trans": coeffs[:, 254:257],
    }


def compute_shape(bfm: BFMData, id_coeff: jax.Array,
                  exp_coeff: jax.Array) -> jax.Array:
    """(B,80),(B,64) → (B,N,3) (bfm.py:86-99)."""
    b = id_coeff.shape[0]
    s = id_coeff @ bfm.id_base.T + exp_coeff @ bfm.exp_base.T \
        + bfm.mean_shape[None]
    return s.reshape(b, -1, 3)


def compute_texture(bfm: BFMData, tex_coeff: jax.Array,
                    normalize: bool = True) -> jax.Array:
    b = tex_coeff.shape[0]
    t = tex_coeff @ bfm.tex_base.T + bfm.mean_tex[None]
    if normalize:
        t = t / 255.0
    return t.reshape(b, -1, 3)


def compute_rotation(angles: jax.Array) -> jax.Array:
    """(B, 3) radians → (B, 3, 3) with pts @ R convention (bfm.py:174-207:
    returns (Rz·Ry·Rx)ᵀ)."""
    x, y, z = angles[:, 0], angles[:, 1], angles[:, 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rot_x = jnp.stack([one, zero, zero,
                       zero, cx, -sx,
                       zero, sx, cx], axis=1).reshape(-1, 3, 3)
    rot_y = jnp.stack([cy, zero, sy,
                       zero, one, zero,
                       -sy, zero, cy], axis=1).reshape(-1, 3, 3)
    rot_z = jnp.stack([cz, -sz, zero,
                       sz, cz, zero,
                       zero, zero, one], axis=1).reshape(-1, 3, 3)
    rot = rot_z @ rot_y @ rot_x
    return jnp.transpose(rot, (0, 2, 1))


def transform(face_shape: jax.Array, rot: jax.Array,
              trans: jax.Array) -> jax.Array:
    return face_shape @ rot + trans[:, None, :]


def to_camera(face_shape: jax.Array) -> jax.Array:
    """z ← camera_distance − z (bfm.py:210-212), non-mutating."""
    return face_shape.at[..., 2].set(CAMERA_DISTANCE - face_shape[..., 2])


def to_image(face_shape: jax.Array, focal: float = FOCAL,
             center: float = CENTER) -> jax.Array:
    """(B,N,3) camera coords → (B,N,2) image points (bfm.py:214-226)."""
    proj = np.array([[focal, 0, center], [0, focal, center], [0, 0, 1]],
                    dtype=np.float32).T
    p = face_shape @ jnp.asarray(proj)
    return p[..., :2] / p[..., 2:]


def compute_norm(bfm: BFMData, face_shape: jax.Array) -> jax.Array:
    """Per-vertex normals via face-normal accumulation (bfm.py:117-137)."""
    v1 = face_shape[:, bfm.face_buf[:, 0]]
    v2 = face_shape[:, bfm.face_buf[:, 1]]
    v3 = face_shape[:, bfm.face_buf[:, 2]]
    face_norm = jnp.cross(v1 - v2, v2 - v3)
    face_norm = face_norm / (jnp.linalg.norm(face_norm, axis=-1,
                                             keepdims=True) + 1e-12)
    face_norm = jnp.concatenate(
        [face_norm, jnp.zeros_like(face_norm[:, :1])], axis=1)
    vert = jnp.sum(face_norm[:, bfm.point_buf], axis=2)
    return vert / (jnp.linalg.norm(vert, axis=-1, keepdims=True) + 1e-12)


def compute_color(face_texture: jax.Array, face_norm: jax.Array,
                  gamma: jax.Array) -> jax.Array:
    """3-band SH shading (bfm.py:140-171)."""
    b = gamma.shape[0]
    gamma = gamma.reshape(b, 3, 9) + jnp.asarray(INIT_LIT)[None, None]
    gamma = jnp.transpose(gamma, (0, 2, 1))            # (B, 9, 3)
    a, c = _SH_A, _SH_C
    n = face_norm
    Y = jnp.concatenate([
        a[0] * c[0] * jnp.ones_like(n[..., :1]),
        -a[1] * c[1] * n[..., 1:2],
        a[1] * c[1] * n[..., 2:],
        -a[1] * c[1] * n[..., :1],
        a[2] * c[2] * n[..., :1] * n[..., 1:2],
        -a[2] * c[2] * n[..., 1:2] * n[..., 2:],
        0.5 * a[2] * c[2] / np.sqrt(3.0) * (3 * n[..., 2:] ** 2 - 1),
        -a[2] * c[2] * n[..., :1] * n[..., 2:],
        0.5 * a[2] * c[2] * (n[..., :1] ** 2 - n[..., 1:2] ** 2),
    ], axis=-1)                                         # (B, N, 9)
    rgb = jnp.einsum("bnk,bkc->bnc", Y, gamma)
    return rgb * face_texture


def compute_for_render(bfm: BFMData, coeffs: jax.Array):
    """(B, 257) → (face_vertex, face_texture, landmark) — the inference
    quantities (bfm.py:274-299; the renderer itself is disabled in the
    reference, facerecon_model.py:101-104)."""
    cd = split_coeff(coeffs)
    shape = compute_shape(bfm, cd["id"], cd["exp"])
    rot = compute_rotation(cd["angle"])
    shape_t = transform(shape, rot, cd["trans"])
    vertex = to_camera(shape_t)
    proj = to_image(vertex)
    landmark = proj[:, bfm.keypoints]
    texture = compute_texture(bfm, cd["tex"])
    return vertex, texture, landmark
