"""Camera/label math parity vs a clean-room torch implementation of
reference code/cam_utils.py."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from hfa_gp_tpu.core import camera


def torch_cam2world(forward, origin):
    """Reference cam_utils.py:62-80."""
    f = forward / forward.norm(dim=-1, keepdim=True)
    up = torch.tensor([0.0, 1.0, 0.0]).expand_as(f)
    left = torch.cross(up, f, dim=-1)
    left = left / left.norm(dim=-1, keepdim=True)
    up2 = torch.cross(f, left, dim=-1)
    up2 = up2 / up2.norm(dim=-1, keepdim=True)
    rot = torch.eye(4).unsqueeze(0).repeat(f.shape[0], 1, 1)
    rot[:, :3, :3] = torch.stack((-left, up2, -f), dim=-1)
    tr = torch.eye(4).unsqueeze(0).repeat(f.shape[0], 1, 1)
    tr[:, :3, 3] = origin
    return tr @ rot


def test_cam2world_matches_reference():
    rng = np.random.default_rng(0)
    fwd = rng.standard_normal((4, 3)).astype(np.float32)
    org = rng.standard_normal((4, 3)).astype(np.float32)
    got = camera.create_cam2world_matrix(jnp.asarray(fwd), jnp.asarray(org))
    want = torch_cam2world(torch.from_numpy(fwd), torch.from_numpy(org))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_flip_yz_label_involution():
    rng = np.random.default_rng(1)
    lab = jnp.asarray(rng.standard_normal((3, 25)).astype(np.float32))
    flipped = camera.flip_yz_label(lab)
    # negates exactly columns 1,2,5,6,9,10 and is an involution
    np.testing.assert_allclose(np.asarray(camera.flip_yz_label(flipped)),
                               np.asarray(lab))
    diff = np.flatnonzero(np.any(np.asarray(flipped) != np.asarray(lab),
                                 axis=0))
    np.testing.assert_array_equal(diff, [1, 2, 5, 6, 9, 10])


def test_pack_unpack_roundtrip():
    key = jax.random.PRNGKey(0)
    pts, _, _ = camera.sample_camera_positions(key, n=2, r=2.7,
                                               mode="gaussian",
                                               horizontal_stddev=0.3,
                                               vertical_stddev=0.155)
    c2w = camera.create_cam2world_matrix(-pts, pts)
    label = camera.pack_label(c2w)
    assert label.shape == (2, 25)
    np.testing.assert_allclose(np.asarray(label[:, 16:]),
                               np.tile(camera.FIXED_INTRINSICS, (2, 1)))
    c2w2, intr = camera.unpack_label(label)
    np.testing.assert_allclose(np.asarray(c2w2), np.asarray(c2w))
    # camera sits on the radius-2.7 sphere looking at the origin
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pts), axis=-1),
                               2.7, rtol=1e-5)


def test_mean_mode_label_matches_reference_constant():
    """mode=None at (0.5pi, 0.5pi): camera at (0, 0, 2.7) looking at origin
    (trainer_rgb.py:112-115)."""
    label = camera.sample_camera_label(None, n=1, mode=None)
    c2w, _ = camera.unpack_label(label)
    pos = np.asarray(c2w[0, :3, 3])
    np.testing.assert_allclose(pos, [0.0, 0.0, 2.7], atol=1e-4)


def test_generate_rays_geometry():
    # generate_rays consumes the OpenCV-convention pose — i.e. the label
    # AFTER flip_yz_label, exactly what EG3D synthesis sees in the
    # reference (headnerf.py:108 flips before G.synthesis).
    label = camera.flip_yz_label(camera.sample_camera_label(None, n=1,
                                                            mode=None))
    c2w, intr = camera.unpack_label(label)
    o, d = camera.generate_rays(c2w, intr, 16)
    assert o.shape == (1, 256, 3) and d.shape == (1, 256, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o[0, 0]), [0.0, 0.0, 2.7],
                               atol=1e-4)
    # central rays point back toward the origin (camera looks at origin)
    center = np.asarray(d[0]).mean(axis=0)
    center /= np.linalg.norm(center)
    np.testing.assert_allclose(center, [0.0, 0.0, -1.0], atol=1e-2)
