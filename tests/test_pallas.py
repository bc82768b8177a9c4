"""Pallas kernel parity tests (interpret mode on CPU) + IJB eval tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfa_gp_tpu.core.pallas.raymarch import pallas_ray_march
from hfa_gp_tpu.models.eg3d import renderer as rnd


def test_pallas_ray_march_matches_xla():
    rng = np.random.default_rng(0)
    b, r, n, c = 2, 37, 16, 32          # r deliberately non-multiple of tile
    colors = rng.standard_normal((b, r, n, c)).astype(np.float32)
    densities = rng.standard_normal((b, r, n, 1)).astype(np.float32)
    depths = np.sort(rng.uniform(2.25, 3.3, (b, r, n, 1))
                     .astype(np.float32), axis=2)
    cfg = rnd.RenderConfig()
    want_rgb, want_depth, want_w = rnd.ray_march(
        jnp.asarray(colors), jnp.asarray(densities), jnp.asarray(depths),
        cfg)
    got_rgb, got_depth, got_w = pallas_ray_march(
        jnp.asarray(colors), jnp.asarray(densities), jnp.asarray(depths),
        interpret=True)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(want_rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_depth),
                               np.asarray(want_depth), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               rtol=1e-4, atol=1e-5)


def test_ijb_protocol():
    from hfa_gp_tpu.models.arcface import ijb
    rng = np.random.default_rng(1)
    n_id, per_id, d = 10, 6, 32
    ident = rng.standard_normal((n_id, d))
    embs, tids, mids = [], [], []
    for i in range(n_id):
        for j in range(per_id):
            embs.append(ident[i] + 0.1 * rng.standard_normal(d))
            tids.append(i)
            mids.append(j // 2)
    embs = np.asarray(embs, np.float32)
    tids = np.asarray(tids)
    mids = np.asarray(mids)
    templates, uniq = ijb.pool_templates(embs, tids, mids)
    assert templates.shape == (n_id, d)
    np.testing.assert_allclose(np.linalg.norm(templates, axis=1), 1.0,
                               rtol=1e-5)

    # verification: same-id pairs vs different-id pairs
    pairs, labels = [], []
    for i in range(n_id):
        pairs.append([i, i])
        labels.append(1)
        pairs.append([i, (i + 1) % n_id])
        labels.append(0)
    scores = ijb.verification_scores(templates, uniq,
                                     np.asarray(pairs))
    labels = np.asarray(labels)
    assert scores[labels == 1].min() > scores[labels == 0].max()
    tar = ijb.tar_at_far(scores, labels, far_targets=(1e-1,))
    assert tar[1e-1] == 1.0

    ranks = ijb.rank_k_identification(templates, templates,
                                      uniq, uniq)
    assert ranks[1] == 1.0
