"""Preprocessing math parity vs clean-room numpy implementations of the
reference formulas (crop_images.py / 3dface2idr.py / bfm.py)."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from hfa_gp_tpu.core.camera import FIXED_INTRINSICS
from hfa_gp_tpu.preprocess import align, bfm, pose, smoothing


def test_pos_recovers_similarity():
    """POS must recover scale/translation of a known 2D embedding."""
    rng = np.random.default_rng(0)
    x3d = rng.standard_normal((5, 3))
    s_true, tx, ty = 3.0, 40.0, -12.0
    xp = np.stack([s_true * x3d[:, 0] + tx, s_true * x3d[:, 1] + ty],
                  axis=1)
    t, s = align.pos(xp.T, x3d.T)
    # POS solves for orthographic projection with free rotation rows; for
    # an axis-aligned embedding scale and translation are exact
    assert abs(s - s_true) < 1e-6
    np.testing.assert_allclose(t.flatten(), [tx, ty], atol=1e-6)


def test_extract_5p_shape():
    lm = np.arange(68 * 2, dtype=np.float32).reshape(68, 2)
    p5 = align.extract_5p(lm)
    assert p5.shape == (5, 2)
    # row 2 is lm[30] (nose tip, index 31-1)
    np.testing.assert_allclose(p5[2], lm[30])


def test_align_img_shapes():
    rng = np.random.default_rng(1)
    img = Image.fromarray(
        rng.integers(0, 255, (300, 400, 3), dtype=np.uint8))
    lm5 = np.array([[150, 120], [250, 120], [200, 170], [160, 220],
                    [240, 220]], dtype=np.float32)
    lm3d = np.array([[-0.3, 0.3, 0.1], [0.3, 0.3, 0.1], [0, 0, 0.3],
                     [-0.25, -0.3, 0.1], [0.25, -0.3, 0.1]],
                    dtype=np.float32)
    tp, img224, lm_new, img1024 = align.align_img(img, lm5, lm3d)
    assert img224.size == (224, 224)
    assert img1024.size == (1024, 1024)
    assert lm_new.shape == (5, 2)
    out = align.crop_final(img1024)
    assert out.size == (512, 512)


def test_pose_from_coeffs_matches_reference_math():
    rng = np.random.default_rng(2)
    angle = rng.uniform(-0.3, 0.3, (3, 3)).astype(np.float32)
    trans = rng.uniform(-0.5, 0.5, (3, 3)).astype(np.float32)

    got = np.asarray(pose.pose_from_coeffs(jnp.asarray(angle),
                                           jnp.asarray(trans)))

    for i in range(3):
        x, y, z = angle[i]
        rx = np.array([[1, 0, 0], [0, np.cos(x), -np.sin(x)],
                       [0, np.sin(x), np.cos(x)]])
        ry = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0],
                       [-np.sin(y), 0, np.cos(y)]])
        rz = np.array([[np.cos(z), -np.sin(z), 0],
                       [np.sin(z), np.cos(z), 0], [0, 0, 1]])
        R = (rz @ ry @ rx).T
        t = trans[i].astype(np.float64).copy()
        t[2] += -10
        c = -R @ t * 0.27
        c[1] += 0.006
        c[2] += 0.161
        want = np.eye(4)
        want[:3, :3] = R @ np.diag([1, -1, -1])
        want[:3, 3] = c
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_labels_from_coeffs_packs_intrinsics(tmp_path):
    angle = jnp.zeros((2, 3))
    trans = jnp.zeros((2, 3))
    labels = np.asarray(pose.labels_from_coeffs(angle, trans))
    assert labels.shape == (2, 25)
    np.testing.assert_allclose(labels[:, 16:],
                               np.tile(FIXED_INTRINSICS, (2, 1)),
                               atol=1e-6)
    # identity angles: camera sits at 0.27*10 = 2.7 on +z (plus offset)
    np.testing.assert_allclose(labels[0, 11], 2.7 + 0.161, atol=1e-5)

    # round-trip through the json writers + dataset reader contract
    names = ["f_0000.png", "f_0001.png"]
    pose.write_label_json(names, labels, str(tmp_path / "test.json"))
    import json
    data = json.load(open(tmp_path / "test.json"))
    assert data["labels"][0][0] == "f_0000.png"
    assert len(data["labels"][0][1]) == 25


def _synthetic_bfm(n_vert=40, n_face=60, seed=0):
    rng = np.random.default_rng(seed)
    return bfm.BFMData(
        mean_shape=jnp.asarray(
            rng.standard_normal(n_vert * 3).astype(np.float32)),
        id_base=jnp.asarray(
            rng.standard_normal((n_vert * 3, 80)).astype(np.float32)),
        exp_base=jnp.asarray(
            rng.standard_normal((n_vert * 3, 64)).astype(np.float32)),
        mean_tex=jnp.asarray(
            rng.uniform(0, 255, n_vert * 3).astype(np.float32)),
        tex_base=jnp.asarray(
            rng.standard_normal((n_vert * 3, 80)).astype(np.float32)),
        keypoints=jnp.asarray(rng.integers(0, n_vert, 68)),
        face_buf=jnp.asarray(rng.integers(0, n_vert, (n_face, 3))),
        point_buf=jnp.asarray(rng.integers(0, n_face, (n_vert, 8))),
    )


def test_bfm_render_quantities():
    model = _synthetic_bfm()
    rng = np.random.default_rng(3)
    coeffs = jnp.asarray(rng.standard_normal((2, 257)).astype(np.float32)
                         * 0.1)
    vertex, texture, landmark = bfm.compute_for_render(model, coeffs)
    assert vertex.shape == (2, 40, 3)
    assert texture.shape == (2, 40, 3)
    assert landmark.shape == (2, 68, 2)
    # camera-space z is positive (camera_distance - z with |z| small)
    assert float(vertex[..., 2].min()) > 0


def test_bfm_rotation_orthonormal():
    angles = jnp.asarray(np.random.default_rng(4)
                         .uniform(-1, 1, (5, 3)).astype(np.float32))
    R = np.asarray(bfm.compute_rotation(angles))
    for i in range(5):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)


def test_sh_color_ambient_term():
    """With gamma=0 the init_lit ambient band dominates: uniform normals →
    uniform scaling of texture."""
    model = _synthetic_bfm()
    tex = jnp.ones((1, 40, 3))
    norm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (40, 1))[None]
    color = np.asarray(bfm.compute_color(tex, norm, jnp.zeros((1, 27))))
    assert color.std() < 1e-5
    assert color.mean() > 0


def test_smooth_detection_dir(tmp_path):
    from scipy.ndimage import gaussian_filter1d
    rng = np.random.default_rng(5)
    seq = rng.standard_normal((12, 5, 2)).astype(np.float32)
    d = tmp_path / "detections"
    d.mkdir()
    for i, lm in enumerate(seq):
        np.savetxt(d / f"{i:04d}.txt", lm)
    n = smoothing.smooth_detection_dir(str(d))
    assert n == 12
    got = np.stack([np.loadtxt(d / f"{i:04d}.txt") for i in range(12)])
    want = gaussian_filter1d(seq, 2.0, axis=0)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# Differentiable affine crop (preprocess/warp.py — kornia warp_affine analog)
# ---------------------------------------------------------------------------


def test_warp_affine_matches_kornia_semantics():
    """warp_affine vs a clean-room torch replication of
    kornia.geometry.warp_affine (grid_sample of M^-1-mapped pixel grid,
    bilinear, zero padding, align_corners=True) — reference losses.py:7-10."""
    import torch
    import torch.nn.functional as TF

    from hfa_gp_tpu.preprocess import warp

    rng = np.random.default_rng(0)
    b, h, w, c, dsize = 2, 20, 26, 3, 14
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    theta = np.deg2rad(17.0)
    ms = []
    for i in range(b):
        s = 0.8 + 0.3 * i
        a = s * np.array([[np.cos(theta), -np.sin(theta)],
                          [np.sin(theta), np.cos(theta)]], np.float32)
        t = np.array([2.5 - i, -1.0 + 0.5 * i], np.float32)
        ms.append(np.concatenate([a, t[:, None]], axis=1))
    m = np.stack(ms)

    got = warp.warp_affine(jnp.asarray(img), jnp.asarray(m), dsize)

    src_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    m3 = np.concatenate([m, np.tile(np.array([[[0, 0, 1]]], np.float32),
                                    (b, 1, 1))], axis=1)
    minv = np.linalg.inv(m3)[:, :2]
    ys, xs = np.meshgrid(np.arange(dsize, dtype=np.float32),
                         np.arange(dsize, dtype=np.float32), indexing="ij")
    grid_px = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
    src_px = np.einsum("bij,pj->bpi", minv, grid_px)
    gx = 2 * src_px[..., 0] / (w - 1) - 1
    gy = 2 * src_px[..., 1] / (h - 1) - 1
    grid = torch.from_numpy(
        np.stack([gx, gy], -1).reshape(b, dsize, dsize, 2))
    want = TF.grid_sample(src_t, grid, mode="bilinear",
                          padding_mode="zeros", align_corners=True)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_estimate_norm_aligns_canonical_points():
    """M from estimate_norm maps the (y-flipped) landmarks onto the
    ArcFace 112 canonical five points; exactly for a pure similarity."""
    from hfa_gp_tpu.preprocess import warp

    rng = np.random.default_rng(1)
    h = 224
    s, th = 1.7, np.deg2rad(-12.0)
    r = s * np.array([[np.cos(th), -np.sin(th)],
                      [np.sin(th), np.cos(th)]], np.float32)
    t = np.array([40.0, 30.0], np.float32)
    # landmarks = inverse-similarity of the canonical points, y-up coords
    pts_raster = (warp.ARCFACE_5PTS - t) @ np.linalg.inv(r).T
    lm_yup = np.stack([pts_raster[:, 0], h - 1 - pts_raster[:, 1]], -1)
    m = warp.estimate_norm(jnp.asarray(lm_yup)[None], h)
    mapped = np.einsum("ij,pj->pi", np.asarray(m)[0, :, :2], pts_raster) \
        + np.asarray(m)[0, :, 2]
    np.testing.assert_allclose(mapped, warp.ARCFACE_5PTS, atol=1e-3)

    # 68-point input goes through extract_5p
    lm68 = rng.uniform(20, 200, (1, 68, 2)).astype(np.float32)
    m68 = warp.estimate_norm(jnp.asarray(lm68), h)
    assert np.asarray(m68).shape == (1, 2, 3)
    assert np.isfinite(np.asarray(m68)).all()


def test_perceptual_id_loss_end_to_end_and_grads():
    """Identical images → 0 loss; gradients flow back through the warp
    to the input image (the training path the reference reaches via the
    frozen ArcFace, networks.py:107-126)."""
    import jax

    from hfa_gp_tpu.preprocess import warp

    def recog_fn(x):                       # stand-in frozen embedder
        return x.reshape(x.shape[0], -1) @ jnp.ones(
            (x.shape[1] * x.shape[2] * x.shape[3], 16))

    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    m = np.array([[[1.5, 0.0, -8.0], [0.0, 1.5, -8.0]]], np.float32)

    loss_same = warp.perceptual_id_loss(recog_fn, jnp.asarray(img),
                                        jnp.asarray(img), jnp.asarray(m),
                                        dsize=32)
    assert float(loss_same) == pytest.approx(0.0, abs=1e-5)

    def f(a):
        return warp.perceptual_id_loss(
            recog_fn, a, jnp.asarray(0.5 * img + 0.2), jnp.asarray(m),
            dsize=32)

    g = jax.grad(f)(jnp.asarray(img))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0

    # grads also flow through M (differentiable alignment)
    g_m = jax.grad(lambda mm: warp.perceptual_id_loss(
        recog_fn, jnp.asarray(img), jnp.asarray(0.5 * img + 0.2), mm,
        dsize=32))(jnp.asarray(m))
    assert float(jnp.abs(g_m).max()) > 0
