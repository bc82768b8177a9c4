"""NeRF pose helpers + spherical inverse tests."""

import numpy as np

import jax.numpy as jnp

from hfa_gp_tpu.core import camera
from hfa_gp_tpu.data import poses


def _random_poses(n=6, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        t = rng.standard_normal(3)
        out.append(np.concatenate([q, t[:, None]], 1))
    return np.stack(out)


def test_average_and_center_poses():
    p = _random_poses()
    avg = poses.average_poses(p)
    assert avg.shape == (3, 4)
    R = avg[:, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    centered, inv = poses.center_poses(p)
    assert centered.shape == p.shape
    # average of centered poses is (near) identity rotation, zero center
    avg_c = poses.average_poses(centered)
    np.testing.assert_allclose(avg_c[:, 3], 0, atol=1e-6)
    np.testing.assert_allclose(avg_c[:, :3], np.eye(3), atol=1e-6)


def test_spiral_and_spheric_paths():
    sp = poses.create_spiral_poses(np.array([1.0, 1.0, 0.5]), 4.0,
                                   n_poses=24)
    assert sp.shape == (24, 3, 4)
    for m in sp:
        np.testing.assert_allclose(m[:, :3].T @ m[:, :3], np.eye(3),
                                   atol=1e-6)
    sph = poses.create_spheric_poses(3.0, n_poses=12)
    assert sph.shape == (12, 3, 4)
    # constant distance from axis
    radii = np.linalg.norm(sph[:, :2, 3], axis=1)
    assert radii.std() < 1e-6


def test_points_to_angles_inverts_sampling():
    pts, phi, theta = camera.sample_camera_positions(
        None, n=1, r=2.7, horizontal_mean=0.4 * np.pi,
        vertical_mean=0.6 * np.pi, mode=None)
    h, v = camera.points_to_angles(pts, r=2.7)
    np.testing.assert_allclose(float(h[0]), 0.4, atol=1e-5)
    np.testing.assert_allclose(float(v[0]), 0.6, atol=1e-5)
