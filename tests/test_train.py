"""Trainer tests: LPIPS behavior, loss descent, the freeze schedule, the
audio phases, and data-parallel equivalence on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models import lpips as lpips_mod
from hfa_gp_tpu.models.avatar import heads
from hfa_gp_tpu.parallel import mesh as mesh_mod
from hfa_gp_tpu.train import audio as audio_train
from hfa_gp_tpu.train import rgb as rgb_train
from hfa_gp_tpu.train import t3dmm as t3dmm_train
from hfa_gp_tpu.train.state import init_state, make_optimizer
from tests.test_eg3d import small_config


@pytest.fixture(scope="module")
def cfg():
    return heads.AvatarConfig(size=64, dim_shape=8, eg3d=small_config())


@pytest.fixture(scope="module")
def lpips_params():
    return lpips_mod.init_lpips(jax.random.PRNGKey(99))


def test_lpips_zero_on_identical(lpips_params):
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3),
                             minval=-1, maxval=1)
    d = lpips_mod.lpips_distance(lpips_params, img, img)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    img2 = jnp.roll(img, 7, axis=1)
    d2 = lpips_mod.lpips_distance(lpips_params, img, img2)
    assert (np.asarray(d2) > 1e-5).all()


def _batch(cfg, key, b=2):
    k1, k2 = jax.random.split(key)
    real = jax.random.uniform(k1, (b, cfg.size, cfg.size, 3),
                              minval=-1, maxval=1)
    label = camera.flip_yz_label(
        camera.sample_camera_label(None, n=b, mode=None))
    return real, label


def test_rgb_train_step_descends_and_freezes(cfg, lpips_params):
    params = heads.init_avatar_rgb(jax.random.PRNGKey(1), cfg)
    tx = make_optimizer(1e-3)
    state = init_state(params, tx)
    step = rgb_train.make_train_step(cfg, tx, tune_iter=3, donate=False)
    real, label = _batch(cfg, jax.random.PRNGKey(2))

    gen_before = jax.tree_util.tree_leaves(
        state.params["generator"])[0].copy()
    losses = []
    for _ in range(5):
        state, metrics = step(state, lpips_params, real, label)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    # generator froze for steps 0,1,2 then unfroze: params changed by now
    gen_after = jax.tree_util.tree_leaves(state.params["generator"])[0]
    assert float(jnp.abs(gen_after - gen_before).max()) > 0

    # rebuild and verify the generator is untouched while frozen
    state2 = init_state(heads.init_avatar_rgb(jax.random.PRNGKey(1), cfg),
                        tx)
    g0 = jax.tree_util.tree_leaves(state2.params["generator"])[0].copy()
    state2, _ = step(state2, lpips_params, real, label)
    g1 = jax.tree_util.tree_leaves(state2.params["generator"])[0]
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-7)


def test_3dmm_train_step_runs(cfg, lpips_params):
    params = heads.init_avatar_3dmm(jax.random.PRNGKey(3), cfg)
    tx = make_optimizer()
    state = init_state(params, tx)
    step = t3dmm_train.make_train_step(cfg, tx, tune_iter=100, donate=False)
    real, label = _batch(cfg, jax.random.PRNGKey(4))
    coeffs = jax.random.normal(jax.random.PRNGKey(5), (2, cfg.params_len))
    state, metrics = step(state, lpips_params, real, label, coeffs)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["l2_loss_3dmm"]) == 0.0


def test_audio_train_phases(cfg, lpips_params):
    params = audio_train.init_audio_params(jax.random.PRNGKey(6), cfg)
    tx = audio_train.make_audio_optimizer()
    state = init_state(params, tx)
    real, label = _batch(cfg, jax.random.PRNGKey(7))

    # phase 1: no smoothing — AudAttNet must not move
    step1 = audio_train.make_train_step(cfg, tx, tune_iter=100,
                                        smooth=False, donate=False)
    win1 = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 29))
    att0 = state.params["audattnet"]["att_fc"]["weight"].copy()
    state, m1 = step1(state, lpips_params, real, label, win1)
    np.testing.assert_allclose(
        np.asarray(state.params["audattnet"]["att_fc"]["weight"]),
        np.asarray(att0), atol=1e-7)
    assert np.isfinite(float(m1["loss"]))

    # phase switch: the AudAtt Adam restarts with a zero count, like the
    # reference's never-yet-stepped optimizer_AudAtt
    counts_before = [int(c) for c in jax.tree_util.tree_leaves(
        state.opt_state.inner_states["audattnet"])
        if getattr(c, "dtype", None) == jnp.int32]
    assert any(c > 0 for c in counts_before)
    reset = audio_train.reset_audattnet_opt(state.opt_state, tx,
                                            state.params)
    counts_after = [int(c) for c in jax.tree_util.tree_leaves(
        reset.inner_states["audattnet"])
        if getattr(c, "dtype", None) == jnp.int32]
    assert all(c == 0 for c in counts_after)
    state = state._replace(opt_state=reset)

    # phase 2: smoothing window — AudAttNet trains
    step2 = audio_train.make_train_step(cfg, tx, tune_iter=100,
                                        smooth=True, donate=False)
    win2 = jax.random.normal(jax.random.PRNGKey(9),
                             (2, cfg.smo_size, 16, 29))
    state, m2 = step2(state, lpips_params, real, label, win2)
    assert float(jnp.abs(state.params["audattnet"]["att_fc"]["weight"]
                         - att0).max()) > 0
    assert np.isfinite(float(m2["loss"]))


def test_data_parallel_step_matches_single_device(cfg, lpips_params):
    """The same batch, replicated vs sharded over the 8-device data axis,
    must produce identical updates — this is the gradient-allreduce
    correctness the reference's RGB path lost (SURVEY.md §2.1)."""
    assert len(jax.devices()) == 8
    params = heads.init_avatar_rgb(jax.random.PRNGKey(10), cfg)
    tx = make_optimizer(1e-3)
    step = rgb_train.make_train_step(cfg, tx, tune_iter=10**6, donate=False)
    real, label = _batch(cfg, jax.random.PRNGKey(11), b=8)

    state_a = init_state(params, tx)
    state_a, metrics_a = step(state_a, lpips_params, real, label)

    mesh = mesh_mod.make_mesh(n_data=8)
    state_b = init_state(mesh_mod.replicate(mesh, params), tx)
    state_b = state_b._replace(
        opt_state=mesh_mod.replicate(mesh, state_b.opt_state))
    real_s, label_s = mesh_mod.shard_batch(mesh, (real, label))
    lp_s = mesh_mod.replicate(mesh, lpips_params)
    state_b, metrics_b = step(state_b, lp_s, real_s, label_s)

    np.testing.assert_allclose(float(metrics_a["loss"]),
                               float(metrics_b["loss"]), rtol=1e-5)
    la = jax.tree_util.tree_leaves(state_a.params["encoder"])[0]
    lb = jax.tree_util.tree_leaves(state_b.params["encoder"])[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4,
                               atol=1e-6)


def test_sample_bases_batched(cfg):
    params = heads.init_avatar_rgb(jax.random.PRNGKey(12), cfg)
    imgs = rgb_train.sample_bases(params, cfg, weight_value=10.0)
    assert imgs.shape[0] == cfg.dim_shape
    assert np.isfinite(np.asarray(imgs)).all()
