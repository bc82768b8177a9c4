"""arcface family tests: backbones, scheduler, verification eval, and the
hybrid DP×MP train step on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfa_gp_tpu.models.arcface import (init_iresnet, init_mobilefacenet,
                                       iresnet_apply, mobilefacenet_apply)
from hfa_gp_tpu.models.arcface.scheduler import poly_scheduler
from hfa_gp_tpu.models.arcface.verification import kfold_verification
from hfa_gp_tpu.parallel import mesh as mesh_mod
from hfa_gp_tpu.parallel.partial_fc import PartialFC
from hfa_gp_tpu.train import arcface as arc


def test_iresnet18_shapes_and_modes():
    p, st = init_iresnet(jax.random.PRNGKey(0), "iresnet18")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 112, 112, 3))
    emb = iresnet_apply(p, st, x, "iresnet18")
    assert emb.shape == (2, 512)
    emb2, new_st = iresnet_apply(p, st, x, "iresnet18", train=True)
    assert emb2.shape == (2, 512)
    # running stats moved toward batch stats
    s0 = st["stem_bn"]["mean"]
    s1 = new_st["stem_bn"]["mean"]
    assert float(jnp.abs(s1 - s0).max()) > 0


def test_mobilefacenet_shapes():
    p, st = init_mobilefacenet(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 112, 112, 3))
    emb = mobilefacenet_apply(p, st, x)
    assert emb.shape == (2, 512)
    assert np.isfinite(np.asarray(emb)).all()


def test_mbf_large_shapes():
    from hfa_gp_tpu.models.arcface import MBF_CONFIGS
    assert MBF_CONFIGS["mbf_large"] == ((2, 8, 12, 4), 4)
    p, st = init_mobilefacenet(jax.random.PRNGKey(2), name="mbf_large")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 112, 112, 3))
    emb = mobilefacenet_apply(p, st, x, name="mbf_large")
    assert emb.shape == (1, 512)
    assert np.isfinite(np.asarray(emb)).all()


def test_registry_aliases_and_dispatch():
    from hfa_gp_tpu.models.arcface import (backbone_apply, canonical_name,
                                           init_backbone)
    assert canonical_name("r50") == "iresnet50"
    assert canonical_name("r2060") == "iresnet2060"
    p, st = init_backbone(jax.random.PRNGKey(0), "r18")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 112, 112, 3))
    emb = backbone_apply("r18", p, st, x)
    assert emb.shape == (2, 512)
    with pytest.raises(ValueError):
        init_backbone(jax.random.PRNGKey(0), "nope")


def test_iresnet_scan_path_matches_loop(monkeypatch):
    """The remat'd lax.scan over stacked deep-stage blocks (the
    iresnet2060 path) must equal the unrolled python loop."""
    from hfa_gp_tpu.models.arcface import iresnet as ir
    p, st = init_iresnet(jax.random.PRNGKey(0), "iresnet34")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 112, 112, 3))
    ref = iresnet_apply(p, st, x, "iresnet34")
    monkeypatch.setattr(ir, "_SCAN_THRESHOLD", 2)
    scanned = iresnet_apply(p, st, x, "iresnet34")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(scanned),
                               rtol=2e-4, atol=2e-4)
    # train mode: per-block new stats come back under the right keys
    emb, new_st = iresnet_apply(p, st, x, "iresnet34", train=True)
    assert "s2_b4" in new_st and new_st["s2_b4"]["bn1"]["mean"].shape \
        == st["s2_b4"]["bn1"]["mean"].shape


def test_poly_scheduler():
    s = poly_scheduler(0.1, total_steps=100, warmup_steps=10)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 0.05, rtol=1e-5)
    np.testing.assert_allclose(float(s(10)), 0.1, rtol=1e-5)
    assert float(s(55)) == pytest.approx(0.1 * 0.25, rel=1e-4)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-6)


def test_kfold_verification_separates():
    rng = np.random.default_rng(0)
    n, d = 200, 32
    base = rng.standard_normal((n, d))
    same = base + 0.05 * rng.standard_normal((n, d))
    diff = rng.standard_normal((n, d))
    emb1 = np.concatenate([base, base])
    emb2 = np.concatenate([same, diff])
    issame = np.concatenate([np.ones(n, bool), np.zeros(n, bool)])
    acc, std, thr = kfold_verification(emb1, emb2, issame)
    assert acc > 0.95


def test_evaluate_kfold_pca_and_roc(tmp_path):
    from hfa_gp_tpu.models.arcface.verification import (evaluate_kfold,
                                                        save_roc_plot)
    rng = np.random.default_rng(0)
    n, d = 200, 64
    base = rng.standard_normal((n, d))
    emb1 = np.concatenate([base, base])
    emb2 = np.concatenate([base + 0.05 * rng.standard_normal((n, d)),
                           rng.standard_normal((n, d))])
    issame = np.concatenate([np.ones(n, bool), np.zeros(n, bool)])
    r = evaluate_kfold(emb1, emb2, issame)
    assert r["accuracy"] > 0.95
    # ROC monotone: tpr non-decreasing along threshold sweep
    assert (np.diff(r["tpr"]) >= -1e-9).all()
    assert 0.0 <= r["val"] <= 1.0
    # PCA path: projecting to 16 dims still separates this easy set
    r_pca = evaluate_kfold(emb1, emb2, issame, pca=16)
    assert r_pca["accuracy"] > 0.9
    out = tmp_path / "roc.png"
    wrote = save_roc_plot(str(out), r["fpr"], r["tpr"])
    assert wrote == out.exists()


def test_arcface_train_step_hybrid_mesh():
    mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
    pfc = PartialFC(mesh, num_classes=64, embedding_dim=512)
    tx, fc_tx = arc.make_optimizers(total_steps=10, lr=0.01)
    step = arc.make_train_step(pfc, tx, fc_tx, "iresnet18",
                               dtype=jnp.float32, donate=False)
    rng = np.random.default_rng(1)
    with jax.sharding.set_mesh(mesh):
        state = arc.init_state(jax.random.PRNGKey(0), pfc, tx, fc_tx,
                               "iresnet18")
        state = state._replace(
            backbone=mesh_mod.replicate(mesh, state.backbone),
            batch_stats=mesh_mod.replicate(mesh, state.batch_stats),
            opt_state=mesh_mod.replicate(mesh, state.opt_state))
        imgs = rng.standard_normal((8, 112, 112, 3)).astype(np.float32)
        labs = rng.integers(0, 64, 8).astype(np.int32)
        imgs_s, labs_s = mesh_mod.shard_batch(mesh, (imgs, labs))
        losses = []
        for i in range(3):
            state, m = step(state, imgs_s, labs_s, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_arcface_sparse_step_matches_dense_sampled():
    """sample_rate<1: the row-sparse train step (sub-weight grad +
    row-gathered momentum) must produce the SAME first-step fc_weight
    and loss as the dense formulation (full-table grad, decay masked to
    sampled rows) — they are the same math; the sparse one just never
    materializes the table-sized gradient."""
    mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
    tx, fc_tx = arc.make_optimizers(total_steps=10, lr=0.05)
    pfc = PartialFC(mesh, num_classes=64, embedding_dim=512,
                    sample_rate=0.5)
    assert pfc.sample_rate < 1.0
    step_sparse = arc.make_train_step(pfc, tx, fc_tx, "iresnet18",
                                      dtype=jnp.float32, donate=False)
    # dense reference: same pfc but routed through the dense branch by
    # passing the raw optax chain (not FCOptimizer)
    step_dense = arc.make_train_step(pfc, tx, fc_tx.tx, "iresnet18",
                                     dtype=jnp.float32, donate=False)

    rng = np.random.default_rng(3)
    imgs = rng.standard_normal((8, 112, 112, 3)).astype(np.float32)
    labs = rng.integers(0, 64, 8).astype(np.int32)
    with jax.sharding.set_mesh(mesh):
        state = arc.init_state(jax.random.PRNGKey(0), pfc, tx, fc_tx,
                               "iresnet18")
        state = state._replace(
            backbone=mesh_mod.replicate(mesh, state.backbone),
            batch_stats=mesh_mod.replicate(mesh, state.batch_stats),
            opt_state=mesh_mod.replicate(mesh, state.opt_state))
        assert isinstance(state.fc_opt_state, dict)  # sparse momentum
        state_d = state._replace(fc_opt_state=fc_tx.tx.init(
            state.fc_weight))
        imgs_s, labs_s = mesh_mod.shard_batch(mesh, (imgs, labs))

        key = jax.random.PRNGKey(9)
        s1, m1 = step_sparse(state, imgs_s, labs_s, key)
        d1, m2 = step_dense(state_d, imgs_s, labs_s, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.fc_weight),
                               np.asarray(d1.fc_weight), rtol=1e-5,
                               atol=1e-7)
    # unsampled rows kept frozen momentum (zeros) and unchanged weights
    moved = np.abs(np.asarray(s1.fc_weight)
                   - np.asarray(state.fc_weight)).sum(axis=1)
    assert (moved > 0).sum() <= 2 * pfc.num_sample


def test_iresnet_bf16_matches_fp32():
    """dtype=bf16 must keep BN stats/affine as fp32 islands and run the
    convs in bf16 (the torch-AMP recipe) — embeddings stay close to the
    fp32 reference and the returned batch_stats stay fp32."""
    p, st = init_iresnet(jax.random.PRNGKey(0), "iresnet18")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 112, 112, 3))
    _, st_ref = iresnet_apply(p, st, x, "iresnet18", train=True,
                              dtype=jnp.float32)
    got_t, st_new = iresnet_apply(p, st, x, "iresnet18", train=True,
                                  dtype=jnp.bfloat16)
    assert got_t.dtype == jnp.float32
    assert np.isfinite(np.asarray(got_t)).all()
    assert st_new["stem_bn"]["mean"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(st_new["stem_bn"]["mean"]),
                               np.asarray(st_ref["stem_bn"]["mean"]),
                               atol=1e-2, rtol=0)
    # numeric comparison on the inference path: train-mode embeddings
    # end in a batch-2 BN that normalizes every dim to ±1 and amplifies
    # bf16 noise into sign flips where the two samples nearly tie
    ref = iresnet_apply(p, st, x, "iresnet18", dtype=jnp.float32)
    got = iresnet_apply(p, st, x, "iresnet18", dtype=jnp.bfloat16)
    scale = float(jnp.abs(ref).mean())
    assert float(jnp.abs(got - ref).max()) < 0.1 * max(scale, 1.0)


def test_partial_fc_bf16_matmul_close_to_fp32():
    """matmul_dtype=bf16 (the reference's AMP analog for the cosine
    logits) must agree with the fp32 loss to bf16 tolerance."""
    mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((8, 64)).astype(np.float32)
    labs = rng.integers(0, 32, 8).astype(np.int32)
    with jax.sharding.set_mesh(mesh):
        ref = PartialFC(mesh, 32, 64).loss(
            PartialFC(mesh, 32, 64).init(jax.random.PRNGKey(0)),
            emb, labs)
        pfc = PartialFC(mesh, 32, 64, matmul_dtype=jnp.bfloat16)
        got = pfc.loss(pfc.init(jax.random.PRNGKey(0)), emb, labs)
    np.testing.assert_allclose(float(got), float(ref), atol=0.3, rtol=0.05)
