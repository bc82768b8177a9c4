"""Torch-free parity regression against committed golden fixtures.

tests/golden/seams.npz holds the torch-side outputs of every SURVEY
§7.3 seam, captured by tools/capture_golden.py from the clean-room
torch compositions (see tests/test_eg3d.py for the live torch
cross-checks). These tests re-run the JAX side only, so seam parity
stays locked in environments without torch — and any refactor that
shifts numerics fails here even if the live torch test would have
shifted with it.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfa_gp_tpu.models.eg3d import renderer as rnd

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "seams.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/capture_golden.py to create fixtures")
    return np.load(GOLDEN)


def _unflatten(g, prefix):
    out = {}
    for k in g.files:
        if not k.startswith(prefix):
            continue
        node = out
        parts = k[len(prefix):].split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = g[k]
    return out


def test_golden_block(golden):
    from hfa_gp_tpu.models.eg3d import networks as nets
    p = _unflatten(golden, "block.p.")
    got_x, got_img = nets.block_apply(
        jax.tree_util.tree_map(jnp.asarray, p),
        jnp.asarray(golden["block.x"]), jnp.asarray(golden["block.img"]),
        jnp.asarray(golden["block.ws"]), fir=[1, 3, 3, 1],
        conv_clamp=256.0, up=True)
    np.testing.assert_allclose(np.asarray(got_x), golden["block.want_x"],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_img),
                               golden["block.want_img"],
                               rtol=2e-3, atol=2e-4)


def test_golden_grid_sample(golden):
    got = rnd.grid_sample_2d(jnp.asarray(golden["gs.img"]),
                             jnp.asarray(golden["gs.grid"]))
    np.testing.assert_allclose(np.asarray(got), golden["gs.want"],
                               rtol=1e-5, atol=1e-5)


def test_golden_ray_march(golden):
    cfg = rnd.RenderConfig()
    rgb, depth, w = rnd.ray_march(jnp.asarray(golden["rm.colors"]),
                                  jnp.asarray(golden["rm.densities"]),
                                  jnp.asarray(golden["rm.depths"]), cfg)
    np.testing.assert_allclose(np.asarray(rgb), golden["rm.want_rgb"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth),
                               golden["rm.want_depth"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), golden["rm.want_w"],
                               rtol=1e-4, atol=1e-5)


def test_golden_sample_pdf(golden):
    got = rnd.sample_pdf(jnp.asarray(golden["pdf.bins"]),
                         jnp.asarray(golden["pdf.weights"]),
                         int(golden["pdf.n_imp"]), rng=None)
    np.testing.assert_allclose(np.asarray(got), golden["pdf.want"],
                               rtol=1e-4, atol=1e-5)


def test_golden_bilinear_resize(golden):
    from hfa_gp_tpu.models.eg3d.networks import _bilinear_resize
    x = jnp.asarray(golden["rs.x"])
    for size, aa in ((32, True), (32, False), (64, True)):
        got = _bilinear_resize(x, size, aa)
        np.testing.assert_allclose(
            np.asarray(got), golden[f"rs.want_{size}_{int(aa)}"],
            rtol=1e-4, atol=1e-4)
