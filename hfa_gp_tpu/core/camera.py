"""Camera / label math.

Covers the reference's `code/cam_utils.py` (spherical camera sampling,
look-at cam2world) plus the 25-dim EG3D label convention
(`eg3d-pose-detection/camera2label.py:20-30`) and the ray sampler that
lives inside the EG3D pickle.

Convention hygiene (SURVEY.md §2.1 defects): the reference flips camera
columns [1,2,5,6,9,10] TWICE — once in the dataset (dataset.py:200) and
once in-place in every model forward (headnerf.py:108,132) — so the
generator actually sees the raw cameras.json convention. Here the flip
exists exactly once, as the explicit function `flip_yz_label`, and the
data pipeline / models compose it an *even* number of times by default to
reproduce the reference's net behavior.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# Normalized intrinsics appended to every label: focal 4.2647 (= 2985.29/700)
# in units of image width, principal point (0.5, 0.5).
# Reference: camera2label.py:23, trainer_rgb.py:32.
FIXED_INTRINSICS = np.array(
    [4.2647, 0.0, 0.5, 0.0, 4.2647, 0.5, 0.0, 0.0, 1.0], dtype=np.float32)

# Columns of the 25-dim label negated by the OpenCV→OpenGL flip
# (dataset.py:200) — entries (0,1),(0,2),(1,1),(1,2),(2,1),(2,2) of the 4x4.
_FLIP_COLS = np.array([1, 2, 5, 6, 9, 10])
FLIP_MASK = np.ones(25, dtype=np.float32)
FLIP_MASK[_FLIP_COLS] = -1.0


def flip_yz_label(label: jax.Array) -> jax.Array:
    """Negate the y/z rotation columns of the packed pose — the OpenCV↔OpenGL
    convention flip, as ONE pure function (vs the reference's two in-place
    mutations at dataset.py:200 and headnerf.py:108)."""
    return label * jnp.asarray(FLIP_MASK, label.dtype)


def pack_label(cam2world: jax.Array,
               intrinsics: jax.Array | np.ndarray | None = None) -> jax.Array:
    """(..., 4, 4) pose [+ (...,3,3) intrinsics] → (..., 25) label.

    Parity: camera2label.py:20-30 (flatten pose, append normalized K)."""
    batch = cam2world.shape[:-2]
    pose = cam2world.reshape(*batch, 16)
    if intrinsics is None:
        intr = jnp.asarray(FIXED_INTRINSICS, pose.dtype)
        intr = jnp.broadcast_to(intr, (*batch, 9))
    else:
        intr = jnp.asarray(intrinsics, pose.dtype).reshape(*batch, 9)
    return jnp.concatenate([pose, intr], axis=-1)


def unpack_label(label: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., 25) → ((..., 4, 4) cam2world, (..., 3, 3) intrinsics).

    Matches TriPlaneGenerator.synthesis's view of `c` (SURVEY.md §2.4)."""
    batch = label.shape[:-1]
    cam2world = label[..., :16].reshape(*batch, 4, 4)
    intrinsics = label[..., 16:25].reshape(*batch, 3, 3)
    return cam2world, intrinsics


def normalize_vecs(v: jax.Array, eps: float = 0.0) -> jax.Array:
    """Parity: cam_utils.py:6-10 (no epsilon in the reference)."""
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def create_cam2world_matrix(forward_vector: jax.Array,
                            origin: jax.Array) -> jax.Array:
    """Look-at cam2world. Parity: cam_utils.py:62-80.

    Column convention: rotation columns are (-left, up, -forward) with
    world up (0,1,0)."""
    f = normalize_vecs(forward_vector)
    up = jnp.broadcast_to(
        jnp.array([0.0, 1.0, 0.0], f.dtype), f.shape)
    left = normalize_vecs(jnp.cross(up, f))
    up2 = normalize_vecs(jnp.cross(f, left))
    rot = jnp.stack((-left, up2, -f), axis=-1)          # (..., 3, 3)
    batch = f.shape[:-1]
    m = jnp.tile(jnp.eye(4, dtype=f.dtype), (*batch, 1, 1))
    m = m.at[..., :3, :3].set(rot)
    m = m.at[..., :3, 3].set(origin)
    return m


def sample_camera_positions(key: jax.Array | None, n: int = 1, r: float = 1.0,
                            horizontal_stddev: float = 1.0,
                            vertical_stddev: float = 1.0,
                            horizontal_mean: float = math.pi * 0.5,
                            vertical_mean: float = math.pi * 0.5,
                            mode: str | None = "normal"):
    """Sample n camera origins on a radius-r sphere.

    Parity: cam_utils.py:12-58. `mode=None` returns the distribution mean
    (used by trainer sample_bases, trainer_rgb.py:112). Functional RNG via
    an explicit key instead of torch's global generator.
    """
    if mode is None:
        theta = jnp.full((n, 1), horizontal_mean, jnp.float32)
        phi = jnp.full((n, 1), vertical_mean, jnp.float32)
    else:
        kt, kp = jax.random.split(key)
        if mode == "uniform":
            theta = (jax.random.uniform(kt, (n, 1)) - 0.5) * 2 \
                * horizontal_stddev + horizontal_mean
            phi = (jax.random.uniform(kp, (n, 1)) - 0.5) * 2 \
                * vertical_stddev + vertical_mean
        elif mode in ("normal", "gaussian"):
            theta = jax.random.normal(kt, (n, 1)) * horizontal_stddev \
                + horizontal_mean
            phi = jax.random.normal(kp, (n, 1)) * vertical_stddev \
                + vertical_mean
        elif mode == "spherical_uniform":
            theta = (jax.random.uniform(kt, (n, 1)) - 0.5) * 2 \
                * horizontal_stddev + horizontal_mean
            v_stddev = vertical_stddev / math.pi
            v_mean = vertical_mean / math.pi
            v = (jax.random.uniform(kp, (n, 1)) - 0.5) * 2 * v_stddev + v_mean
            v = jnp.clip(v, 1e-5, 1 - 1e-5)
            phi = jnp.arccos(1 - 2 * v)
        elif mode == "truncated_gaussian":
            # Parity: cam_utils.py:35-37. The reference calls a
            # `truncated_normal_` helper it never defines (a latent
            # NameError inherited from pi-GAN); pi-GAN's helper resamples a
            # standard normal truncated to ±2σ, which is exactly
            # jax.random.truncated_normal(-2, 2).
            theta = jax.random.truncated_normal(kt, -2.0, 2.0, (n, 1)) \
                * horizontal_stddev + horizontal_mean
            phi = jax.random.truncated_normal(kp, -2.0, 2.0, (n, 1)) \
                * vertical_stddev + vertical_mean
        elif mode == "hybrid":
            ks, kt, kp, kt2, kp2 = jax.random.split(key, 5)
            u_theta = (jax.random.uniform(kt, (n, 1)) - 0.5) * 2 \
                * horizontal_stddev * 2 + horizontal_mean
            u_phi = (jax.random.uniform(kp, (n, 1)) - 0.5) * 2 \
                * vertical_stddev * 2 + vertical_mean
            g_theta = jax.random.normal(kt2, (n, 1)) * horizontal_stddev \
                + horizontal_mean
            g_phi = jax.random.normal(kp2, (n, 1)) * vertical_stddev \
                + vertical_mean
            pick = jax.random.uniform(ks, ()) < 0.5
            theta = jnp.where(pick, u_theta, g_theta)
            phi = jnp.where(pick, u_phi, g_phi)
        else:
            raise ValueError(f"unknown mode {mode!r}")

    phi = jnp.clip(phi, 1e-5, math.pi - 1e-5)
    x = r * jnp.sin(phi) * jnp.cos(theta)
    z = r * jnp.sin(phi) * jnp.sin(theta)
    y = r * jnp.cos(phi)
    points = jnp.concatenate([x, y, z], axis=-1)
    return points, phi, theta


def sample_camera_label(key: jax.Array | None, n: int = 1, r: float = 2.7,
                        horizontal_mean: float = 0.5 * math.pi,
                        vertical_mean: float = 0.5 * math.pi,
                        horizontal_stddev: float = 0.3,
                        vertical_stddev: float = 0.155,
                        mode: str | None = "gaussian") -> jax.Array:
    """Sampled look-at-origin pose packed to a 25-dim label.

    Parity: trainer_rgb.py:27-42 (cam_sampler / cam_sampler_pose)."""
    points, _, _ = sample_camera_positions(
        key, n=n, r=r, horizontal_mean=horizontal_mean,
        vertical_mean=vertical_mean, horizontal_stddev=horizontal_stddev,
        vertical_stddev=vertical_stddev, mode=mode)
    c2w = create_cam2world_matrix(-points, points)
    return pack_label(c2w)


def points_to_angles(points: jax.Array, r: float = 2.7
                     ) -> tuple[jax.Array, jax.Array]:
    """Camera positions on a radius-r sphere → (h, v) ∈ [0,1] yaw/pitch
    fractions of pi (inverse of sample_camera_positions; reference
    points2hv, run_recon_video_rgb.py:138-155)."""
    y = jnp.clip(points[..., 1] / r, -1.0, 1.0)
    phi = jnp.arccos(y)
    sin_phi = jnp.sqrt(jnp.maximum(1.0 - y * y, 1e-12))
    cos_theta = jnp.clip(points[..., 0] / (r * sin_phi), -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    return theta / math.pi, phi / math.pi


# ---------------------------------------------------------------------------
# Ray sampler (EG3D RaySampler, lives inside the pickle in the reference)
# ---------------------------------------------------------------------------


def generate_rays(cam2world: jax.Array, intrinsics: jax.Array,
                  resolution: int) -> tuple[jax.Array, jax.Array]:
    """Per-pixel camera rays.

    cam2world: (B, 4, 4) in the *OpenCV* convention (camera looks down +z,
    y down) — i.e. the pose as it appears in the label AFTER
    `flip_yz_label`, which is exactly what EG3D synthesis consumes in the
    reference (headnerf.py:108 flips in place right before G.synthesis).
    intrinsics: (B, 3, 3) normalized (focal in units
    of image width, principal point ~0.5). Returns
    (ray_origins (B, R, 3), ray_directions (B, R, 3)) with R = resolution².

    Pixel centers at (i + 0.5)/resolution in [0, 1], x = column, y = row —
    the EG3D RaySampler convention (SURVEY.md §2.4). Rays are generated for
    a camera looking down +z in camera space (OpenCV), then rotated by the
    cam2world rotation.
    """
    b = cam2world.shape[0]
    dtype = cam2world.dtype
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    i = (jnp.arange(resolution, dtype=dtype) + 0.5) / resolution
    yy, xx = jnp.meshgrid(i, i, indexing="ij")        # row, col
    x_cam = xx.reshape(-1)[None, :]                   # (1, R)
    y_cam = yy.reshape(-1)[None, :]
    z_cam = jnp.ones_like(x_cam)

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam

    x_lift, y_lift, z_lift = jnp.broadcast_arrays(x_lift, y_lift, z_cam)
    dirs_cam = jnp.stack([x_lift, y_lift, z_lift], axis=-1)  # (B, R, 3)
    rot = cam2world[:, :3, :3]
    dirs_world = jnp.einsum("bij,brj->bri", rot, dirs_cam)
    dirs_world = normalize_vecs(dirs_world)
    origins = jnp.broadcast_to(cam2world[:, None, :3, 3],
                               (b, dirs_world.shape[1], 3))
    return origins, dirs_world
