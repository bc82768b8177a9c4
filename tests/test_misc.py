"""Tests for the long-tail parity components: person_2 subspaces, PTI
init, Encoder_whole/pose2latent, recon losses, observability, pytree IO,
checkpointing."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfa_gp_tpu.models.avatar import encoder as enc
from hfa_gp_tpu.models.avatar import heads, subspace
from hfa_gp_tpu.preprocess import losses
from hfa_gp_tpu.utils import pytree_io
from hfa_gp_tpu.utils.observability import (AverageMeter, ThroughputLogger,
                                            init_logging)
from tests.test_eg3d import small_config


def test_person_2_subspace_paths():
    cfg = heads.AvatarConfig(size=64, dim_shape=4, person_2=True,
                             eg3d=small_config())
    params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg)
    assert "subspace_2" in params and "bases" in params["subspace_2"]
    w = jax.random.normal(jax.random.PRNGKey(1), (2, 4))
    l1 = heads.get_latent(params, w, cfg, person_2=False)
    l2 = heads.get_latent(params, w, cfg, person_2=True)
    assert l1.shape == l2.shape
    assert float(jnp.abs(l1 - l2).max()) > 0

    cfg_same = heads.AvatarConfig(size=64, dim_shape=4, person_2=True,
                                  same_bases=True, eg3d=small_config())
    p2 = heads.init_avatar_rgb(jax.random.PRNGKey(2), cfg_same)
    assert "bases" not in p2["subspace_2"]
    l3 = heads.get_latent(p2, w, cfg_same, person_2=True)
    assert np.isfinite(np.asarray(l3)).all()


def test_pti_bases_init(tmp_path):
    for i in range(3):
        d = tmp_path / f"dir{i}"
        d.mkdir()
        np.save(d / "0.npy",
                np.full((18, 512), float(i), dtype=np.float32))
    bases = subspace.load_pti_bases(str(tmp_path), dim_shape=3,
                                    num_ws=14, dim=512)
    assert bases.shape == (3, 14 * 512)
    np.testing.assert_allclose(np.asarray(bases[1]), 1.0)
    p = subspace.init_subspace(jax.random.PRNGKey(0), 3, 14, 512,
                               init_bases=bases)
    np.testing.assert_allclose(np.asarray(p["bases"]), np.asarray(bases))


def test_encoder_whole_and_pose2latent():
    p = enc.init_encoder_whole(jax.random.PRNGKey(0), 64, dim_shape=8,
                               out_pose=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    w, h, pose = enc.encoder_whole_apply(p, x)
    assert w.shape == (2, 8) and h.shape == (2, 512) \
        and pose.shape == (2, 25)

    p2l = enc.init_pose2latent(jax.random.PRNGKey(2), latent_warp=32)
    lat = enc.pose2latent_apply(p2l, pose)
    assert lat.shape == (2, 32)


def test_recon_losses():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((2, 16)))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    assert float(losses.perceptual_loss(a, a)) < 1e-5
    b = -a
    assert float(losses.perceptual_loss(a, b)) > 1.9

    imgA = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
    mask = jnp.ones((1, 8, 8, 1))
    assert float(losses.photo_loss(imgA, imgA, mask)) < 1e-2
    assert float(losses.photo_loss(imgA, imgA * 0, mask)) > 0.1

    lm = jnp.asarray(rng.uniform(0, 224, (2, 68, 2)), jnp.float32)
    assert float(losses.landmark_loss(lm, lm)) == 0.0
    assert float(losses.landmark_loss(lm, lm + 1.0)) > 0

    coeffs = {"id": jnp.ones((2, 80)), "exp": jnp.ones((2, 64)),
              "tex": jnp.ones((2, 80))}
    assert float(losses.reg_loss(coeffs)) == pytest.approx(
        (80 + 64 + 80), rel=1e-5)

    tex = jnp.asarray(rng.uniform(0, 1, (1, 40, 3)), jnp.float32)
    skin = jnp.ones((40,))
    assert float(losses.reflectance_loss(tex * 0 + 0.5, skin)) < 1e-8
    assert float(losses.reflectance_loss(tex, skin)) > 0

    g = jnp.asarray(rng.standard_normal((2, 27)), jnp.float32)
    assert float(losses.gamma_loss(jnp.tile(g[:, :9], (1, 3)))) < 1e-8


def test_throughput_logger(caplog):
    logger = init_logging(0)
    tl = ThroughputLogger(freq=2, total_steps=10, batch_size=4,
                          logger=logger)
    with caplog.at_level(logging.INFO, logger="hfa_gp_tpu"):
        for i in range(7):
            tl(i, loss=1.0)
    assert any("samples/sec" in r.message for r in caplog.records)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0


def test_pytree_io_roundtrip(tmp_path):
    tree = {"a": {"b": np.arange(6).reshape(2, 3).astype(np.float32)},
            "c": np.ones(4)}
    path = str(tmp_path / "t.npz")
    pytree_io.save_npz(tree, path)
    back = pytree_io.load_npz(path)
    np.testing.assert_allclose(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_allclose(back["c"], tree["c"])


def test_checkpoint_roundtrip(tmp_path):
    from hfa_gp_tpu.train import checkpoint as ckpt
    from hfa_gp_tpu.train.state import init_state, make_optimizer
    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    tx = make_optimizer()
    state = init_state(params, tx)
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    path = ckpt.save(state, str(tmp_path / "ck"), step=7)
    assert path.endswith("000007")
    assert ckpt.latest_step(str(tmp_path / "ck")) == 7
    restored = ckpt.restore(path, init_state(params, tx))
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.asarray(params["w"]))
    assert int(restored.step) == 7
