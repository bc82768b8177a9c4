"""Avatar-layer tests: subspace math, encoder pyramid, audio nets, and the
three model heads end-to-end on a small EG3D config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models.avatar import audio as aud
from hfa_gp_tpu.models.avatar import encoder as enc
from hfa_gp_tpu.models.avatar import heads, subspace
from tests.test_eg3d import small_config


def test_subspace_orthonormal_and_span():
    key = jax.random.PRNGKey(0)
    p = subspace.init_subspace(key, dim_shape=6, num_ws=4, dim=32)
    q = subspace.orthonormal_basis(p)
    assert q.shape == (128, 6)
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(6), atol=1e-5)

    w = jax.random.normal(jax.random.PRNGKey(1), (3, 6))
    lat = subspace.get_latent(p, w, dim=32)
    assert lat.shape == (3, 4, 32)
    # latent - delta must lie in the row span of bases
    resid = np.asarray(lat.reshape(3, -1) - p["delta"][None])
    bases = np.asarray(p["bases"])
    coef, res, *_ = np.linalg.lstsq(bases.T, resid.T, rcond=None)
    recon = bases.T @ coef
    np.testing.assert_allclose(recon.T, resid, atol=1e-3)


def test_subspace_weights_zero_gives_delta():
    p = subspace.init_subspace(jax.random.PRNGKey(2), 5, 4, 16)
    lat = subspace.get_latent(p, jnp.zeros((2, 5)), dim=16)
    np.testing.assert_allclose(np.asarray(lat[0].reshape(-1)),
                               np.asarray(p["delta"]), atol=1e-6)


@pytest.mark.parametrize("size", [64, 256])
def test_encoder_shapes(size):
    key = jax.random.PRNGKey(3)
    p = enc.init_encoder(key, size, dim=512, dim_shape=50)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, size, size, 3))
    w = enc.encoder_apply(p, x)
    assert w.shape == (2, 50)
    assert np.isfinite(np.asarray(w)).all()


def test_encoder_pose_head():
    p = enc.init_encoder(jax.random.PRNGKey(5), 64, dim_shape=20,
                         out_pose=True)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 64, 64, 3))
    w, pose = enc.encoder_apply(p, x)
    assert w.shape == (2, 20) and pose.shape == (2, 25)


def test_audio_net_shapes():
    p = aud.init_audio_net(jax.random.PRNGKey(7), dim_aud=64)
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 16, 29))
    y = aud.audio_net_apply(p, x)
    assert y.shape == (4, 64)


def test_audio_att_net_convex_combination():
    p = aud.init_audio_att_net(jax.random.PRNGKey(9))
    x = jax.random.normal(jax.random.PRNGKey(10), (8, 64))
    y = aud.audio_att_net_apply(p, x)
    assert y.shape == (64,)
    # output is a convex combination of the rows → within row min/max
    lo = np.asarray(x).min(axis=0) - 1e-5
    hi = np.asarray(x).max(axis=0) + 1e-5
    yv = np.asarray(y)
    assert (yv >= lo).all() and (yv <= hi).all()


@pytest.fixture(scope="module")
def avatar_cfg():
    return heads.AvatarConfig(size=64, dim_shape=8, eg3d=small_config())


def test_rgb_head_end_to_end(avatar_cfg):
    cfg = avatar_cfg
    params = heads.init_avatar_rgb(jax.random.PRNGKey(11), cfg)
    img_in = jax.random.normal(jax.random.PRNGKey(12), (1, 64, 64, 3))
    label = camera.sample_camera_label(None, n=1, mode=None)
    out = heads.rgb_forward(params, cfg, img_in, label,
                            label_convention="opengl")
    assert out.shape == (1, 64, 64, 3)   # small SR config outputs 64
    assert np.isfinite(np.asarray(out)).all()


def test_3dmm_and_audio_heads(avatar_cfg):
    cfg = avatar_cfg
    label = camera.sample_camera_label(None, n=2, mode=None)
    p3 = heads.init_avatar_3dmm(jax.random.PRNGKey(13), cfg)
    coeffs = jax.random.normal(jax.random.PRNGKey(14), (2, cfg.params_len))
    img = heads.t3dmm_forward(p3, cfg, coeffs, label,
                              label_convention="opengl")
    assert img.shape == (2, 64, 64, 3)

    pa = heads.init_avatar_audio(jax.random.PRNGKey(15), cfg)
    code = jax.random.normal(jax.random.PRNGKey(16), (2, cfg.dim_aud))
    img2 = heads.audio_forward(pa, cfg, code, label,
                               label_convention="opengl")
    assert img2.shape == (2, 64, 64, 3)


def test_rgb_head_grads_reach_encoder_and_subspace(avatar_cfg):
    cfg = avatar_cfg
    params = heads.init_avatar_rgb(jax.random.PRNGKey(17), cfg)
    img_in = jax.random.normal(jax.random.PRNGKey(18), (1, 64, 64, 3))
    label = camera.sample_camera_label(None, n=1, mode=None)

    def loss(p):
        out = heads.rgb_forward(p, cfg, img_in, label,
                                label_convention="opengl")
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(params)
    g_enc = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), g["encoder"], 0.0)
    g_sub = float(jnp.abs(g["subspace"]["bases"]).sum()) \
        + float(jnp.abs(g["subspace"]["delta"]).sum())
    assert g_enc > 0 and g_sub > 0
