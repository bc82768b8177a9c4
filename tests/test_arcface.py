"""arcface family tests: backbones, scheduler, verification eval, and the
hybrid DP×MP train step on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
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


def test_clip_grad_norm_engages():
    """Backbone grads are clipped to global-norm 5.0 before the
    optimizer (arcface_torch/train.py:157-166): a huge gradient must
    produce the same update as the same gradient pre-scaled to norm 5,
    and a small gradient must pass through unclipped."""
    tx, _ = arc.make_optimizers(total_steps=100, lr=0.1,
                                clip_grad_norm=5.0)
    params = {"w": jnp.ones((4, 4))}
    opt = tx.init(params)
    big = {"w": jnp.full((4, 4), 1000.0)}
    norm = float(optax.global_norm(big))
    pre_scaled = {"w": big["w"] * (5.0 / norm)}
    upd_big, _ = tx.update(big, opt, params)
    upd_ref, _ = tx.update(pre_scaled, opt, params)
    np.testing.assert_allclose(np.asarray(upd_big["w"]),
                               np.asarray(upd_ref["w"]), rtol=1e-6)
    small = {"w": jnp.full((4, 4), 1e-3)}
    tx_noclip, _ = arc.make_optimizers(total_steps=100, lr=0.1,
                                       clip_grad_norm=None)
    upd_s, _ = tx.update(small, opt, params)
    upd_s_ref, _ = tx_noclip.update(small, tx_noclip.init(params), params)
    np.testing.assert_allclose(np.asarray(upd_s["w"]),
                               np.asarray(upd_s_ref["w"]), rtol=1e-6)


def test_arcface_adamw_sparse_descends():
    """The PartialFCAdamW-equivalent head (optimizer='adamw',
    sample_rate<1): row-sparse AdamW must descend, keep exp_avg/exp_avg_sq
    buffers for unsampled rows untouched, and leave unsampled weights
    frozen (reference partial_fc.py:239-349)."""
    mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
    pfc = PartialFC(mesh, num_classes=64, embedding_dim=512,
                    sample_rate=0.25)
    tx, fc_tx = arc.make_optimizers(total_steps=10, lr=1e-3,
                                    optimizer="adamw", weight_decay=0.1)
    assert fc_tx.kind == "adamw"
    step = arc.make_train_step(pfc, tx, fc_tx, "iresnet18",
                               dtype=jnp.float32, donate=False)
    rng = np.random.default_rng(5)
    with jax.sharding.set_mesh(mesh):
        state = arc.init_state(jax.random.PRNGKey(0), pfc, tx, fc_tx,
                               "iresnet18")
        assert set(state.fc_opt_state) == {"m", "v", "count"}
        state = state._replace(
            backbone=mesh_mod.replicate(mesh, state.backbone),
            batch_stats=mesh_mod.replicate(mesh, state.batch_stats),
            opt_state=mesh_mod.replicate(mesh, state.opt_state))
        w0 = np.asarray(state.fc_weight)
        imgs = rng.standard_normal((8, 112, 112, 3)).astype(np.float32)
        labs = rng.integers(0, 64, 8).astype(np.int32)
        imgs_s, labs_s = mesh_mod.shard_batch(mesh, (imgs, labs))
        losses = []
        for i in range(3):
            state, m = step(state, imgs_s, labs_s, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # rows with zero exp_avg never received a gradient — their weights
    # must be exactly the init values (no decoupled decay leaks to them)
    m_rows = np.abs(np.asarray(state.fc_opt_state["m"])).sum(axis=1)
    w1 = np.asarray(state.fc_weight)
    untouched = m_rows == 0
    assert untouched.any()
    np.testing.assert_array_equal(w1[untouched], w0[untouched])


def _write_tiny_bin(path, n=8, size=112, seed=0):
    """LFW-style .bin fixture: pickled (jpeg_bytes_list, issame_list)."""
    import io
    import pickle

    from PIL import Image
    rng = np.random.default_rng(seed)
    bins, issame = [], []
    for i in range(n):
        a = rng.integers(0, 255, (size, size, 3), np.uint8)
        b = (a if i % 2 == 0
             else rng.integers(0, 255, (size, size, 3), np.uint8))
        for img in (a, b):
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG")
            bins.append(buf.getvalue())
        issame.append(i % 2 == 0)
    with open(path, "wb") as f:
        pickle.dump((bins, issame), f)
    return path


def test_train_arcface_cli_val_bin_non_iresnet(tmp_path):
    """--val_bin must evaluate through the backbone registry: a non-
    iresnet backbone (mbf) used to crash because the in-training
    verification hardcoded iresnet_apply (VERDICT r3 weak #6)."""
    from hfa_gp_tpu.cli import train_arcface

    bin_path = _write_tiny_bin(str(tmp_path / "val.bin"))
    args = train_arcface.build_argparser().parse_args([
        "--network", "mbf", "--num_classes", "8", "--batch_size", "8",
        "--num_steps", "2", "--warmup_steps", "0", "--verbose", "2",
        "--fp32", "--val_bin", bin_path,
    ])
    sps = train_arcface.main(args)
    assert sps > 0


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
