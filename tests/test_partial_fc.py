"""PartialFC (class-sharded margin softmax) correctness on the 8-device
mesh: loss and gradients must match a dense single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfa_gp_tpu.parallel import mesh as mesh_mod
from hfa_gp_tpu.parallel.partial_fc import (PartialFC, arcface_margin,
                                            combined_margin)


def dense_margin_ce(weight, embeddings, labels, s=64.0, m2=0.5):
    """Single-device reference: normalized logits, arcface margin on the
    target column, softmax CE."""
    ne = embeddings / jnp.linalg.norm(embeddings, axis=1, keepdims=True)
    nw = weight / jnp.linalg.norm(weight, axis=1, keepdims=True)
    logits = jnp.clip(ne @ nw.T, -1, 1)
    rows = jnp.arange(labels.shape[0])
    tgt = logits[rows, labels]
    logits = logits.at[rows, labels].set(arcface_margin(tgt, m2))
    logits = logits * s
    logp = jax.nn.log_softmax(logits, axis=1)
    return -jnp.mean(logp[rows, labels])


@pytest.fixture(scope="module")
def mesh():
    return mesh_mod.make_mesh(n_data=4, n_model=2)


def test_partial_fc_matches_dense(mesh):
    num_classes, dim, b = 64, 16, 8
    rng = np.random.default_rng(0)
    w = rng.standard_normal((num_classes, dim)).astype(np.float32)
    emb = rng.standard_normal((b, dim)).astype(np.float32)
    labels = rng.integers(0, num_classes, b).astype(np.int32)

    pfc = PartialFC(mesh, num_classes, dim)
    w_sharded = jax.device_put(jnp.asarray(w), pfc.weight_sharding())
    emb_s, lab_s = mesh_mod.shard_batch(mesh, (jnp.asarray(emb),
                                               jnp.asarray(labels)))
    loss = pfc.loss(w_sharded, emb_s, lab_s)
    want = dense_margin_ce(jnp.asarray(w), jnp.asarray(emb),
                           jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


def test_partial_fc_grads_match_dense(mesh):
    num_classes, dim, b = 32, 8, 8
    rng = np.random.default_rng(1)
    w = rng.standard_normal((num_classes, dim)).astype(np.float32)
    emb = rng.standard_normal((b, dim)).astype(np.float32)
    labels = rng.integers(0, num_classes, b).astype(np.int32)

    pfc = PartialFC(mesh, num_classes, dim)
    w_sharded = jax.device_put(jnp.asarray(w), pfc.weight_sharding())
    emb_s, lab_s = mesh_mod.shard_batch(mesh, (jnp.asarray(emb),
                                               jnp.asarray(labels)))

    gw, ge = jax.grad(lambda W, E: pfc.loss(W, E, lab_s),
                      argnums=(0, 1))(w_sharded, emb_s)
    gw_d, ge_d = jax.grad(dense_margin_ce, argnums=(0, 1))(
        jnp.asarray(w), jnp.asarray(emb), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(ge_d),
                               rtol=1e-4, atol=1e-6)


def test_blockwise_ce_matches_dense(mesh):
    """ce_block_rows streaming path == dense softmax (loss AND grads) —
    the custom-VJP blockwise CE must be numerically interchangeable
    with the direct (B, rows)-logits path."""
    num_classes, dim, b = 64, 16, 8
    rng = np.random.default_rng(7)
    w = rng.standard_normal((num_classes, dim)).astype(np.float32)
    emb = rng.standard_normal((b, dim)).astype(np.float32)
    labels = rng.integers(0, num_classes, b).astype(np.int32)

    pfc = PartialFC(mesh, num_classes, dim, ce_block_rows=8)
    assert pfc.ce_block_rows == 8
    w_sharded = jax.device_put(jnp.asarray(w), pfc.weight_sharding())
    emb_s, lab_s = mesh_mod.shard_batch(mesh, (jnp.asarray(emb),
                                               jnp.asarray(labels)))

    loss, (gw, ge) = jax.value_and_grad(
        lambda W, E: pfc.loss(W, E, lab_s), argnums=(0, 1))(
        w_sharded, emb_s)
    want, (gw_d, ge_d) = jax.value_and_grad(
        dense_margin_ce, argnums=(0, 1))(
        jnp.asarray(w), jnp.asarray(emb), jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(ge_d),
                               rtol=1e-4, atol=1e-6)


def test_blockwise_ce_no_positive_rows(mesh):
    """label −1 rows (no positive anywhere) flow through the blockwise
    path: finite loss, zero target-term contribution."""
    num_classes, dim, b = 64, 16, 8
    rng = np.random.default_rng(8)
    w = rng.standard_normal((num_classes, dim)).astype(np.float32)
    emb = rng.standard_normal((b, dim)).astype(np.float32)
    labels = rng.integers(0, num_classes, b).astype(np.int32)
    labels[1] = -1
    labels[5] = -1

    blk = PartialFC(mesh, num_classes, dim, ce_block_rows=8)
    ref = PartialFC(mesh, num_classes, dim, ce_block_rows=None)
    w_s = jax.device_put(jnp.asarray(w), blk.weight_sharding())
    emb_s, lab_s = mesh_mod.shard_batch(mesh, (jnp.asarray(emb),
                                               jnp.asarray(labels)))
    lb = float(blk.loss(w_s, emb_s, lab_s))
    lr = float(ref.loss(w_s, emb_s, lab_s))
    assert np.isfinite(lb)
    np.testing.assert_allclose(lb, lr, rtol=1e-5)


def test_pick_ce_block_auto():
    from hfa_gp_tpu.parallel.partial_fc import _pick_ce_block
    assert _pick_ce_block(1_000_000) == 125_000
    assert _pick_ce_block(64) is None             # small → direct
    assert _pick_ce_block(2 ** 20) == 2 ** 17
    # too prime to split: falls back to direct
    assert _pick_ce_block(1_000_003) is None


def test_partial_fc_sampled_runs_and_descends(mesh):
    """sample_rate<1: loss is finite and a GD step on the sampled loss
    reduces it (positives always kept)."""
    num_classes, dim, b = 64, 16, 8
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((num_classes, dim)),
                    dtype=jnp.float32)
    emb = jnp.asarray(rng.standard_normal((b, dim)), dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(0, num_classes, b), dtype=jnp.int32)

    pfc = PartialFC(mesh, num_classes, dim, sample_rate=0.5)
    w_s = jax.device_put(w, pfc.weight_sharding())
    emb_s, lab_s = mesh_mod.shard_batch(mesh, (emb, labels))
    key = jax.random.PRNGKey(3)

    loss_fn = lambda W, E: pfc.loss(W, E, lab_s, sample_key=key)
    l0 = float(loss_fn(w_s, emb_s))
    assert np.isfinite(l0)
    gw, ge = jax.grad(loss_fn, argnums=(0, 1))(w_s, emb_s)
    l1 = float(loss_fn(w_s - 0.1 * gw, emb_s - 0.1 * ge))
    assert l1 < l0


def test_partial_fc_sampled_keeps_class0_positive(mesh):
    """The positive-priority scatter must be a MAX: a batch mixing a real
    class-0 positive with no-positive rows (label outside this shard →
    local label −1, which aliases index 0 in the scatter) must still
    always sample class 0, i.e. row 0 of the weight gets a gradient for
    every sampling key (VERDICT r2 §weak-3a)."""
    num_classes, dim, b = 64, 8, 8
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((num_classes, dim)),
                    dtype=jnp.float32)
    emb = jnp.asarray(rng.standard_normal((b, dim)), dtype=jnp.float32)
    # one class-0 positive; everything else lands on the OTHER shard
    # (classes >= 32 for n_model=2), making local_lab = -1 rows here
    labels = np.full(b, num_classes - 1, np.int32)
    labels[3] = 0
    labels = jnp.asarray(labels)

    pfc = PartialFC(mesh, num_classes, dim, sample_rate=0.25)
    w_s = jax.device_put(w, pfc.weight_sharding())
    emb_s, lab_s = mesh_mod.shard_batch(mesh, (emb, labels))

    for seed in range(8):
        key = jax.random.PRNGKey(seed)
        gw = jax.grad(lambda W: pfc.loss(W, emb_s, lab_s,
                                         sample_key=key))(w_s)
        # class 0 sampled → its center receives the positive's gradient
        assert float(jnp.sum(jnp.abs(gw[0]))) > 0.0, seed


def test_sparse_path_matches_internal_sampling(mesh):
    """The row-sparse path (sample_indices → take_rows → loss_sampled)
    must reproduce loss()'s internal sampling EXACTLY for the same key,
    and the (num_sample, d) sub-gradient scattered back must equal the
    full-table gradient — the memory-bounded formulation is a pure
    refactor of the math (reference partial_fc.py:96-136)."""
    num_classes, dim, b = 64, 16, 8
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.standard_normal((num_classes, dim)),
                    dtype=jnp.float32)
    emb = jnp.asarray(rng.standard_normal((b, dim)), dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(0, num_classes, b),
                         dtype=jnp.int32)

    pfc = PartialFC(mesh, num_classes, dim, sample_rate=0.5)
    w_s = jax.device_put(w, pfc.weight_sharding())
    emb_s, lab_s = mesh_mod.shard_batch(mesh, (emb, labels))
    key = jax.random.PRNGKey(5)

    index = pfc.sample_indices(lab_s, key)
    w_sub = pfc.take_rows(w_s, index)
    loss_sparse = pfc.loss_sampled(w_sub, emb_s, lab_s, index)
    loss_dense = pfc.loss(w_s, emb_s, lab_s, sample_key=key)
    np.testing.assert_allclose(float(loss_sparse), float(loss_dense),
                               rtol=1e-6)

    g_full = jax.grad(lambda W: pfc.loss(W, emb_s, lab_s,
                                         sample_key=key))(w_s)
    g_sub = jax.grad(lambda ws: pfc.loss_sampled(ws, emb_s, lab_s,
                                                 index))(w_sub)
    scattered = pfc.put_rows(jnp.zeros_like(w_s), index, g_sub)
    np.testing.assert_allclose(np.asarray(scattered),
                               np.asarray(g_full), rtol=1e-5,
                               atol=1e-7)


def test_take_put_rows_roundtrip(mesh):
    num_classes, dim = 32, 8
    rng = np.random.default_rng(13)
    w = jnp.asarray(rng.standard_normal((num_classes, dim)),
                    dtype=jnp.float32)
    pfc = PartialFC(mesh, num_classes, dim, sample_rate=0.5)
    w_s = jax.device_put(w, pfc.weight_sharding())
    labels = jnp.asarray(rng.integers(0, num_classes, 8), jnp.int32)
    _, lab_s = mesh_mod.shard_batch(
        mesh, (jnp.zeros((8, dim)), labels))
    index = pfc.sample_indices(lab_s, jax.random.PRNGKey(0))
    rows = pfc.take_rows(w_s, index)
    back = pfc.put_rows(w_s, index, 2.0 * rows)
    rows2 = pfc.take_rows(back, index)
    np.testing.assert_allclose(np.asarray(rows2),
                               2.0 * np.asarray(rows), rtol=1e-6)


def test_fc_decay_masked_to_sampled_rows():
    """train.arcface's FC optimizer decays only rows with nonzero grads
    (the functional analog of the reference's sampled-sub-weight step,
    partial_fc.py:96-136)."""
    from hfa_gp_tpu.train.arcface import make_optimizers
    _, fc_tx = make_optimizers(total_steps=10, lr=0.1, warmup_steps=0,
                               weight_decay=0.5)
    w = jnp.ones((4, 3), jnp.float32)
    # -0.7 (not -wd*w = -0.5, which would cancel the decay term exactly)
    g = jnp.zeros((4, 3), jnp.float32).at[1].set(0.25).at[3].set(-0.7)
    state = fc_tx.init(w)
    upd, _ = fc_tx.update(g, state, w)
    w1 = w + upd  # optax updates are additive
    # unsampled rows: no grad, no decay → unchanged
    np.testing.assert_allclose(np.asarray(w1[0]), 1.0)
    np.testing.assert_allclose(np.asarray(w1[2]), 1.0)
    # sampled rows move by -lr * (g + wd * w)
    np.testing.assert_allclose(np.asarray(w1[1]),
                               1.0 - 0.1 * (0.25 + 0.5), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w1[3]),
                               1.0 - 0.1 * (-0.7 + 0.5), rtol=1e-6)


def test_combined_margin_modes():
    t = jnp.asarray([0.9, 0.0, -0.5])
    np.testing.assert_allclose(
        np.asarray(combined_margin(t, 1.0, 0.0, 0.4)),
        np.asarray(t) - 0.4, atol=1e-6)
    arc = np.asarray(combined_margin(t, 1.0, 0.5, 0.0))
    np.testing.assert_allclose(arc, np.cos(np.arccos(np.asarray(t)) + 0.5),
                               atol=1e-6)


def test_combined_margin_reference_fallback_and_finite_grads():
    """m1=1 branch mirrors arcface_torch/losses.py:42-51 exactly: the
    explicit t·cos m − √(1−t²)·sin m product with the easy_margin=False
    LINEAR fallback past θ+m > π; and gradients stay finite at the
    saturated cosines a bf16 matmul's [-1,1] clip can produce."""
    import math
    m = 0.5
    theta_lim = math.cos(math.pi - m)
    # fallback branch (t below the θ+m > π limit): t - sin(π-m)·m
    t = jnp.float32(theta_lim - 0.05)
    got = float(combined_margin(t, 1.0, m, 0.0))
    np.testing.assert_allclose(got, float(t) - math.sin(math.pi - m) * m,
                               atol=1e-6)
    # main branch parity with cos(θ+m)
    t = jnp.float32(0.3)
    np.testing.assert_allclose(
        float(combined_margin(t, 1.0, m, 0.0)),
        math.cos(math.acos(0.3) + m), atol=1e-6)
    # finite gradients at t = ±1 (arccos'/±1 = ∓inf would NaN the step)
    g = jax.grad(lambda x: combined_margin(x, 1.0, m, 0.0))
    assert np.isfinite(float(g(jnp.float32(1.0))))
    assert np.isfinite(float(g(jnp.float32(-1.0))))
    g2 = jax.grad(lambda x: combined_margin(x, 0.9, 0.4, 0.0))
    assert np.isfinite(float(g2(jnp.float32(1.0))))


def test_sampling_keeps_all_positives_past_num_sample(mesh):
    """More distinct positives on a shard than num_sample: the sampled
    index set must still contain every positive (the reference's
    overflow fallback keeps positives only, partial_fc.py:96-136 —
    we keep them all AND fill remaining slots with negatives)."""
    num_classes, dim, b = 64, 8, 16
    # sample_rate 0.125 → num_sample = 4 per 32-class shard, but up to
    # 16 distinct positives can land on one shard
    pfc = PartialFC(mesh, num_classes, dim, sample_rate=0.125)
    assert pfc.num_sample < b
    rng = np.random.default_rng(7)
    # all 16 labels distinct and all on shard 0 ([0, 32))
    labels = rng.choice(32, size=b, replace=False).astype(np.int32)
    emb = rng.standard_normal((b, dim)).astype(np.float32)
    emb_s, lab_s = mesh_mod.shard_batch(mesh, (jnp.asarray(emb),
                                               jnp.asarray(labels)))
    index = pfc.sample_indices(lab_s, jax.random.PRNGKey(3))
    idx = np.asarray(index).reshape(mesh.shape["model"], -1)
    # shard 0 must hold every positive local column
    assert set(labels.tolist()) <= set(idx[0].tolist())
    # and the loss sees every row as valid: matches the dense loss'
    # order of magnitude rather than dropping rows (smoke: finite)
    w_s = pfc.init(jax.random.PRNGKey(0))
    w_sub = pfc.take_rows(w_s, index)
    loss = pfc.loss_sampled(w_sub, emb_s, lab_s, index)
    assert np.isfinite(float(loss))


def test_flash_ce_kernel_matches_dense_stats():
    """parallel/pallas_ce.flash_ce_stats (interpret mode) == dense
    clipped-cosine statistics — values AND grads, incl. label −1 rows
    and a multi-tile grid with different fwd/bwd tiles."""
    from hfa_gp_tpu.parallel.pallas_ce import flash_ce_stats

    rng = np.random.default_rng(11)
    b, dim, c, s = 128, 128, 96, 64.0
    ne = rng.standard_normal((b, dim)).astype(np.float32)
    ne /= np.linalg.norm(ne, axis=1, keepdims=True)
    w = rng.standard_normal((c, dim)).astype(np.float32)
    lab = rng.integers(-1, c, b).astype(np.int32)

    def dense(ne_, w_):
        nw = w_ / jnp.linalg.norm(w_, axis=1, keepdims=True)
        logit = jnp.clip(ne_ @ nw.T, -1, 1)
        tgt = jnp.where(lab >= 0,
                        logit[jnp.arange(b), jnp.maximum(lab, 0)], 0.0)
        # target column EXCLUDED, matching the kernel's contract (the
        # caller re-adds the margined term — the exclusion is what
        # keeps denom ≥ target-term exact on hardware)
        e = jnp.exp(logit * s - s)
        e = jnp.where(jnp.arange(c)[None, :] == lab[:, None], 0.0, e)
        return jnp.sum(e, axis=1), tgt

    def scalarize(fn):
        def g(ne_, w_):
            se, tgt = fn(ne_, w_)
            return jnp.sum(jnp.log(se) * jnp.cos(tgt))
        return g

    flash = lambda ne_, w_: flash_ce_stats(ne_, w_, jnp.asarray(lab),
                                           s, None, 32, 16, True)
    se_p, tgt_p = flash(jnp.asarray(ne), jnp.asarray(w))
    se_d, tgt_d = dense(jnp.asarray(ne), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(se_p), np.asarray(se_d),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tgt_p), np.asarray(tgt_d),
                               rtol=1e-5, atol=1e-6)
    gp = jax.grad(scalarize(flash), argnums=(0, 1))(
        jnp.asarray(ne), jnp.asarray(w))
    gd = jax.grad(scalarize(dense), argnums=(0, 1))(
        jnp.asarray(ne), jnp.asarray(w))
    # atol 1e-4: per-tile fp32 accumulation vs the dense one-shot matmul
    # reorders sums, and s=64 amplifies exp-path rounding ~s·e
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gd[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gd[1]),
                               rtol=1e-4, atol=1e-4)


def test_flash_ce_loss_matches_dense(mesh):
    """PartialFC(ce_pallas=True) end to end on the sharded mesh ==
    dense margin softmax (loss AND grads) — the Pallas flash-CE path is
    numerically interchangeable with the XLA paths."""
    num_classes, dim, b = 512, 128, 128
    rng = np.random.default_rng(13)
    w = rng.standard_normal((num_classes, dim)).astype(np.float32)
    emb = rng.standard_normal((b, dim)).astype(np.float32)
    labels = rng.integers(0, num_classes, b).astype(np.int32)

    pfc = PartialFC(mesh, num_classes, dim, ce_pallas=True,
                    pallas_interpret=True)
    w_sharded = jax.device_put(jnp.asarray(w), pfc.weight_sharding())
    emb_s, lab_s = mesh_mod.shard_batch(mesh, (jnp.asarray(emb),
                                               jnp.asarray(labels)))
    loss, (gw, ge) = jax.value_and_grad(
        lambda W, E: pfc.loss(W, E, lab_s), argnums=(0, 1))(
        w_sharded, emb_s)
    want, (gw_d, ge_d) = jax.value_and_grad(
        dense_margin_ce, argnums=(0, 1))(
        jnp.asarray(w), jnp.asarray(emb), jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(ge_d),
                               rtol=1e-4, atol=1e-6)
