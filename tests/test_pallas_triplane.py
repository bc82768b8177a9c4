"""Parity tests for the windowed MXU tri-plane sampler
(core/pallas/triplane.py) against the XLA grid_sample path.

Runs the kernel in Pallas interpret mode on the CPU test mesh; the TPU
compile + speed measurement lives in tools/bench_triplane.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfa_gp_tpu.core.pallas import triplane as tp
from hfa_gp_tpu.models.eg3d import renderer as rnd


def _ray_grid_coords(key, res, n_depth, spread=0.25, b=1):
    """Synthetic but geometry-shaped coordinates: a tile-coherent bundle
    of rays through the unit box (so block footprints are small, like
    the real camera geometry)."""
    korg, kdir = jax.random.split(key)
    origin = jnp.array([0.0, 0.0, -2.7]) + \
        0.05 * jax.random.normal(korg, (b, 1, 3))
    i = (jnp.arange(res) + 0.5) / res - 0.5
    yy, xx = jnp.meshgrid(i, i, indexing="ij")
    dirs = jnp.stack([xx * spread, yy * spread, jnp.ones_like(xx)], -1)
    dirs = dirs.reshape(1, -1, 3) / jnp.linalg.norm(
        dirs.reshape(1, -1, 3), axis=-1, keepdims=True)
    depths = jnp.linspace(2.25, 3.3, n_depth)
    pts = origin[:, :, None, :] + \
        depths[None, None, :, None] * dirs[:, :, None, :]
    return pts.reshape(b, -1, 3)  # (B, res²·N, 3) ordered (ray, depth)


@pytest.mark.parametrize("tile,dw,slab", [(8, 4, 48), (16, 4, 48),
                                          (8, 4, (40, 48))])
def test_windowed_sampler_matches_grid_sample(tile, dw, slab):
    res, n_depth, hw, c = 32, 8, 64, 32
    b = 2
    key = jax.random.PRNGKey(0)
    kp, kc = jax.random.split(key)
    planes = jax.random.normal(kp, (b, 3, hw, hw, c), jnp.float32)
    coords = _ray_grid_coords(kc, res, n_depth, b=b)

    ref = rnd.sample_from_planes(planes, coords, box_warp=1.0)

    plan, _, _, overflow = tp.plan_blocks(
        coords, rnd._PLANE_INV, 1.0, res=res, n_depth=n_depth,
        plane_hw=hw, tile=tile, depth_window=dw, slab=slab)
    assert not bool(jnp.any(overflow)), "footprints must fit the slab"

    got = tp.sample_from_planes_windowed(
        planes, coords, 1.0, rnd._PLANE_INV, res=res, n_depth=n_depth,
        tile=tile, depth_window=dw, slab=slab, interpret=True)

    # bf16 matmul: tolerance set by the 8-bit weight mantissa
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=4e-2, rtol=0)
    # and the values are not trivially zero
    assert float(jnp.mean(jnp.abs(ref))) > 0.1


def test_windowed_sampler_zero_padding_semantics():
    """Points whose bilinear corners fall outside the plane must read
    zeros for those corners (grid_sample padding_mode='zeros')."""
    res, n_depth, hw, c = 8, 4, 64, 32
    key = jax.random.PRNGKey(1)
    planes = jax.random.normal(key, (1, 3, hw, hw, c), jnp.float32)
    # rays that exit the box: scale coords to ±1.3 of the box
    coords = _ray_grid_coords(jax.random.PRNGKey(2), res, n_depth)
    coords = coords * 1.4
    ref = rnd.sample_from_planes(planes, coords, box_warp=1.0)
    got = tp.sample_from_planes_windowed(
        planes, coords, 1.0, rnd._PLANE_INV, res=res, n_depth=n_depth,
        tile=4, depth_window=2, slab=48, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=4e-2, rtol=0)


def test_windowed_sampler_y_edge_rows():
    """Deterministic probes of the shifted-view scheme's y edges:
    py in [-1, 0) (in-plane corner is row 0 via the CLAMPED anchor
    quad), py in [hw-1, hw) (row hw-1 via the anchor quad, row hw via
    the zero pad quad), and quad-straddling rows (py in [3, 4))."""
    hw, c = 64, 32
    res, n_depth = 4, 2
    planes = jax.random.normal(jax.random.PRNGKey(11),
                               (1, 3, hw, hw, c), jnp.float32)
    # build world points whose xy-plane texel coords hit chosen py rows:
    # texel = (x_world + 1) * hw/2 - 0.5  (box_warp=2 → coords pass
    # through unchanged)
    pys = np.array([-0.75, -0.25, 0.3, 3.5, 3.99, 4.01,
                    hw - 1.5, hw - 1.01, hw - 0.5, hw - 0.25,
                    2.0, 17.25, hw / 2, -1.5, float(hw), 30.0],
                   np.float32).reshape(res, res)
    pxs = np.linspace(5.0, hw - 6.0, res * res,
                      dtype=np.float32).reshape(res, res) + 0.37
    to_world = lambda t: (t + 0.5) * 2.0 / hw - 1.0
    pts = np.zeros((1, res, res, n_depth, 3), np.float32)
    for d in range(n_depth):
        pts[0, :, :, d, 0] = to_world(pxs + 0.1 * d)
        pts[0, :, :, d, 1] = to_world(pys + 0.2 * d)
        pts[0, :, :, d, 2] = 0.0
    coords = jnp.asarray(pts.reshape(1, -1, 3))

    ref = rnd.sample_from_planes(planes, coords, box_warp=2.0)
    got = tp.sample_from_planes_windowed(
        planes, coords, 2.0, rnd._PLANE_INV, res=res, n_depth=n_depth,
        tile=4, depth_window=2, slab=(64, 64), dtype=jnp.float32,
        interpret=True)
    # fp32 dots: exact to float tolerance, including every edge row
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert float(jnp.mean(jnp.abs(ref))) > 0.05


def test_plan_blocks_overflow_flag():
    """Blocks with a footprint wider than the slab are flagged."""
    res, n_depth, hw = 4, 2, 256
    # random (incoherent) points spread across the whole plane
    coords = jax.random.uniform(jax.random.PRNGKey(3),
                                (1, res * res * n_depth, 3),
                                minval=-0.5, maxval=0.5)
    _, _, _, overflow = tp.plan_blocks(
        coords, rnd._PLANE_INV, 1.0, res=res, n_depth=n_depth,
        plane_hw=hw, tile=4, depth_window=2, slab=16)
    assert bool(jnp.any(overflow))


def test_bwd_vmem_matches_hbm():
    """The full-plane-VMEM-accumulator backward must equal the HBM RMW
    fallback (identical per-block products, identical block order →
    identical fp32 accumulation)."""
    res, n_depth, hw, c = 16, 8, 64, 32
    b = 2
    kp, kc = jax.random.split(jax.random.PRNGKey(6))
    planes = jax.random.normal(kp, (b, 3, hw, hw, c), jnp.float32)
    coords = _ray_grid_coords(kc, res, n_depth, b=b)
    plan, txy, origins, _ = tp.plan_blocks(
        coords, rnd._PLANE_INV, 1.0, res=res, n_depth=n_depth,
        plane_hw=hw, tile=4, depth_window=4, slab=(32, 32))
    pq = tp.quad_pack_planes(planes.astype(jnp.bfloat16))
    g = jax.random.normal(jax.random.PRNGKey(7),
                          (plan.n_blocks, c, plan.points), jnp.float32)
    # dispatch preconditions for the fast path hold on this geometry
    assert (plan.n_blocks // (b * 3)) % 8 == 0
    gv = tp._sample_blocked_bwd_vmem(plan, txy, origins, g, pq.shape,
                                     group=8, interpret=True)
    gh = tp._sample_blocked_bwd_hbm(plan, txy, origins, g, pq.shape,
                                    group=8, interpret=True)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gh),
                               atol=1e-5, rtol=1e-5)
    assert float(jnp.mean(jnp.abs(gv))) > 0.0


def test_windowed_sampler_grad_matches_xla():
    """The custom-VJP backward (full-plane VMEM accumulator kernel on
    this geometry — see _sample_blocked_bwd dispatch) must produce the
    same d/d(planes) as autodiff through the XLA grid_sample path."""
    res, n_depth, hw, c = 16, 8, 64, 32
    b = 1
    kp, kc = jax.random.split(jax.random.PRNGKey(4))
    planes = jax.random.normal(kp, (b, 3, hw, hw, c), jnp.float32)
    coords = _ray_grid_coords(kc, res, n_depth, b=b)
    cot = jax.random.normal(jax.random.PRNGKey(5),
                            (b, 3, res * res * n_depth, c))

    def loss_ref(p):
        return jnp.sum(rnd.sample_from_planes(p, coords, 1.0) * cot)

    def loss_win(p):
        f = tp.sample_from_planes_windowed(
            p, coords, 1.0, rnd._PLANE_INV, res=res, n_depth=n_depth,
            tile=4, depth_window=4, slab=(32, 32), interpret=True)
        return jnp.sum(f * cot)

    g_ref = np.asarray(jax.grad(loss_ref)(planes))
    g_win = np.asarray(jax.grad(loss_win)(planes))
    # bf16 weights in fwd AND bwd matmuls + bf16 grad cast: per-element
    # error accumulates ~sqrt(contributors)·2^-8 of the local magnitude,
    # so judge relative to the gradient scale
    scale = np.abs(g_ref).max()
    rel_fro = np.linalg.norm(g_win - g_ref) / np.linalg.norm(g_ref)
    assert rel_fro < 0.01, rel_fro
    assert np.abs(g_win - g_ref).max() < 0.05 * scale
    corr = np.corrcoef(g_win.ravel(), g_ref.ravel())[0, 1]
    assert corr > 0.999, corr


def test_windowed_sampler_fp32_narrow_slab():
    """The X_ALIGN=8 fp32 variant: fp32 planes admit 8-texel-aligned
    slab origins, so effective_slab shrinks Sx by 8 at identical
    guaranteed coverage — and with fp32 weights/dots the kernel must
    now match the XLA fp32 path to float tolerance, fwd AND grad."""
    res, n_depth, hw, c = 16, 8, 64, 32
    b = 1
    kp, kc = jax.random.split(jax.random.PRNGKey(8))
    planes = jax.random.normal(kp, (b, 3, hw, hw, c), jnp.float32)
    coords = _ray_grid_coords(kc, res, n_depth, b=b)
    xal = tp.x_align_for(jnp.float32)
    assert xal == 8
    assert tp.effective_slab((32, 32), xal) == (32, 24)
    # exactness requires an overflow-free slab on this geometry (the
    # production envelope for the narrow slab is measured in
    # tools/overflow_envelope.py)
    slab = (48, 40)

    plan, _, _, overflow = tp.plan_blocks(
        coords, rnd._PLANE_INV, 1.0, res=res, n_depth=n_depth,
        plane_hw=hw, tile=4, depth_window=4, slab=slab, x_align=xal)
    assert not bool(jnp.any(overflow))

    ref = rnd.sample_from_planes(planes, coords, box_warp=1.0)
    got = tp.sample_from_planes_windowed(
        planes, coords, 1.0, rnd._PLANE_INV, res=res, n_depth=n_depth,
        tile=4, depth_window=4, slab=slab, dtype=jnp.float32,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    cot = jax.random.normal(jax.random.PRNGKey(9),
                            (b, 3, res * res * n_depth, c))

    def loss_ref(p):
        return jnp.sum(rnd.sample_from_planes(p, coords, 1.0) * cot)

    def loss_win(p):
        f = tp.sample_from_planes_windowed(
            p, coords, 1.0, rnd._PLANE_INV, res=res, n_depth=n_depth,
            tile=4, depth_window=4, slab=slab, dtype=jnp.float32,
            interpret=True)
        return jnp.sum(f * cot)

    g_ref = np.asarray(jax.grad(loss_ref)(planes))
    g_win = np.asarray(jax.grad(loss_win)(planes))
    np.testing.assert_allclose(g_win, g_ref, atol=2e-4, rtol=1e-4)
