"""EG3D generator tests: grid-sample parity vs torch, ray-march parity vs a
clean-room torch implementation of the MipRayMarcher2 math, and end-to-end
synthesis shape/jit/determinism checks on a small config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models.eg3d import networks as nets
from hfa_gp_tpu.models.eg3d import renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import (EG3DConfig, init_generator,
                                              mapping, synthesis)


def small_config():
    return EG3DConfig(
        mapping=nets.MappingConfig(num_layers=2),
        backbone=nets.BackboneConfig(img_resolution=32, channel_base=2048,
                                     channel_max=128),
        sr=nets.SRConfig(input_resolution=16, output_resolution=64,
                         in_channels=32, block_channels=(32, 16)),
        render=rnd.RenderConfig(depth_resolution=8,
                                depth_resolution_importance=8,
                                neural_rendering_resolution=16),
    )


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 7, 9, 4)).astype(np.float32)
    # include far out-of-bounds coords to exercise zeros padding
    grid = (rng.standard_normal((2, 33, 2)) * 0.9).astype(np.float32)
    grid[0, :3] = 3.0
    got = rnd.grid_sample_2d(jnp.asarray(img), jnp.asarray(grid))
    want = TF.grid_sample(
        torch.from_numpy(img.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid).unsqueeze(1),       # (B, 1, M, 2)
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).squeeze(2).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_sample_from_planes_shapes_and_plane_projection():
    rng = np.random.default_rng(1)
    planes = jnp.asarray(rng.standard_normal((2, 3, 8, 8, 5)),
                         dtype=jnp.float32)
    coords = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 11, 3)),
                         dtype=jnp.float32)
    feats = rnd.sample_from_planes(planes, coords, box_warp=1.0)
    assert feats.shape == (2, 3, 11, 5)
    # uv projection: plane 0 spans (x, y); a point moved along z must not
    # change its plane-0 features
    c2 = coords.at[:, :, 2].add(0.1)
    f2 = rnd.sample_from_planes(planes, c2, box_warp=1.0)
    np.testing.assert_allclose(np.asarray(feats[:, 0]),
                               np.asarray(f2[:, 0]), atol=1e-6)


def torch_ray_march(colors, densities, depths):
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2
    densities_mid = TF.softplus(densities_mid - 1)
    density_delta = densities_mid * deltas
    alpha = 1 - torch.exp(-density_delta)
    alpha_shifted = torch.cat(
        [torch.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], -2)
    weights = alpha * torch.cumprod(alpha_shifted, -2)[:, :, :-1]
    composite_rgb = torch.sum(weights * colors_mid, -2)
    weight_total = weights.sum(2)
    composite_depth = torch.sum(weights * depths_mid, -2) / weight_total
    composite_depth = torch.nan_to_num(composite_depth, float("inf"))
    composite_depth = torch.clamp(composite_depth, torch.min(depths),
                                  torch.max(depths))
    composite_rgb = composite_rgb * 2 - 1
    return composite_rgb, composite_depth, weights


def test_ray_march_matches_reference_math():
    rng = np.random.default_rng(2)
    b, r, n = 2, 5, 9
    colors = rng.standard_normal((b, r, n, 4)).astype(np.float32)
    densities = rng.standard_normal((b, r, n, 1)).astype(np.float32)
    depths = np.sort(rng.uniform(2.25, 3.3, (b, r, n, 1)).astype(np.float32),
                     axis=2)
    cfg = rnd.RenderConfig()
    got_rgb, got_depth, got_w = rnd.ray_march(
        jnp.asarray(colors), jnp.asarray(densities), jnp.asarray(depths),
        cfg)
    want_rgb, want_depth, want_w = torch_ray_march(
        torch.from_numpy(colors), torch.from_numpy(densities),
        torch.from_numpy(depths))
    np.testing.assert_allclose(np.asarray(got_rgb), want_rgb.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_depth), want_depth.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(),
                               rtol=1e-4, atol=1e-5)


def torch_sample_pdf(bins, weights, n_importance, u, eps=1e-5):
    weights = weights + eps
    pdf = weights / torch.sum(weights, -1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[:, :1]), cdf], -1)
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp_min(inds - 1, 0)
    above = torch.clamp_max(inds, weights.shape[1])
    inds_sampled = torch.stack([below, above], -1).view(u.shape[0], -1)
    cdf_g = torch.gather(cdf, 1, inds_sampled).view(*u.shape, 2)
    bins_g = torch.gather(bins, 1, inds_sampled).view(*u.shape, 2)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom[denom < eps] = 1
    return bins_g[..., 0] + (u - cdf_g[..., 0]) / denom \
        * (bins_g[..., 1] - bins_g[..., 0])


def test_sample_pdf_matches_reference_math():
    rng = np.random.default_rng(3)
    n_rays, n_bins, n_imp = 6, 7, 12
    bins = np.sort(rng.uniform(2.0, 3.0, (n_rays, n_bins)), axis=1) \
        .astype(np.float32)
    weights = rng.uniform(0.0, 1.0, (n_rays, n_bins - 2)).astype(np.float32)
    # deterministic u (shared by both implementations)
    u = np.broadcast_to(np.linspace(0, 1, n_imp, dtype=np.float32),
                        (n_rays, n_imp)).copy()
    got = rnd.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n_imp,
                         rng=None)
    want = torch_sample_pdf(torch.from_numpy(bins),
                            torch.from_numpy(weights), n_imp,
                            torch.from_numpy(u))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_unify_samples_sorted():
    rng = np.random.default_rng(4)
    d1 = jnp.asarray(np.sort(rng.uniform(0, 1, (1, 2, 5, 1)), axis=2),
                     dtype=jnp.float32)
    d2 = jnp.asarray(np.sort(rng.uniform(0, 1, (1, 2, 4, 1)), axis=2),
                     dtype=jnp.float32)
    c1 = d1 * 10
    c2 = d2 * 10
    s1, s2 = d1 + 1, d2 + 1
    d, c, s = rnd.unify_samples(d1, c1, s1, d2, c2, s2)
    dd = np.asarray(d)[..., 0]
    assert np.all(np.diff(dd, axis=-1) >= 0)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d) * 10, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), np.asarray(d) + 1, atol=1e-6)


@pytest.fixture(scope="module")
def gen():
    cfg = small_config()
    params = init_generator(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_mapping_shapes(gen):
    cfg, params = gen
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    c = jnp.zeros((2, 25))
    ws = mapping(params, cfg, z, c)
    assert ws.shape == (2, cfg.num_ws, 512)


def test_synthesis_shapes_jit_and_determinism(gen):
    cfg, params = gen
    b = 2
    ws = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.num_ws, 512))
    label = camera.flip_yz_label(
        camera.sample_camera_label(None, n=b, mode=None))

    fn = jax.jit(lambda p, w, c: synthesis(p, cfg, w, c))
    out = fn(params, ws, label)
    assert out["image"].shape == (b, 64, 64, 3)
    assert out["image_raw"].shape == (b, 16, 16, 3)
    assert out["image_depth"].shape == (b, 16, 16, 1)
    assert np.isfinite(np.asarray(out["image"])).all()
    # deterministic (const noise, no render rng)
    out2 = fn(params, ws, label)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(out2["image"]), atol=1e-6)
    # depths live inside the frustum
    d = np.asarray(out["image_depth"])
    assert d.min() >= cfg.render.ray_start - 1e-4
    assert d.max() <= cfg.render.ray_end + 1e-4


def test_synthesis_camera_sensitivity(gen):
    """Moving the camera must change the image (rays actually consumed)."""
    cfg, params = gen
    ws = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.num_ws, 512))
    lab1 = camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None))
    lab2 = camera.flip_yz_label(camera.sample_camera_label(
        None, n=1, mode=None, horizontal_mean=0.35 * np.pi))
    img1 = synthesis(params, cfg, ws, lab1)["image_raw"]
    img2 = synthesis(params, cfg, ws, lab2)["image_raw"]
    assert float(jnp.abs(img1 - img2).max()) > 1e-4


def test_synthesis_grad_flows(gen):
    cfg, params = gen
    ws = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.num_ws, 512))
    label = camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None))

    def loss(w):
        return jnp.mean(synthesis(params, cfg, w, label)["image"] ** 2)

    g = jax.grad(loss)(ws)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_synthesis_ray_chunk_parity(gen):
    """Chunked-ray rendering (lax.map) must match the whole-image path."""
    import dataclasses
    cfg, params = gen
    ws = jax.random.normal(jax.random.PRNGKey(9), (1, cfg.num_ws, 512))
    label = camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None))
    full = synthesis(params, cfg, ws, label)["image"]
    cfg_c = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, ray_chunk=64))
    chunked = synthesis(params, cfg_c, ws, label)["image"]
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-5)


@pytest.mark.parametrize("n_data,n_model", [(1, 8), (4, 2)])
def test_synthesis_ray_shard_parity(gen, n_data, n_model):
    """SP analog: rays sharded over the mesh 'model' axis
    (RenderConfig.ray_shard_axis) must render identically to the
    unsharded single-device path (SURVEY §2.5 SP row)."""
    import dataclasses

    from hfa_gp_tpu.parallel import mesh as mesh_mod

    cfg, params = gen
    b = max(n_data, 2)
    ws = jax.random.normal(jax.random.PRNGKey(9), (b, cfg.num_ws, 512))
    label = camera.flip_yz_label(
        camera.sample_camera_label(None, n=b, mode=None))
    ref = synthesis(params, cfg, ws, label)["image"]

    mesh = mesh_mod.make_mesh(n_data=n_data, n_model=n_model)
    cfg_s = dataclasses.replace(
        cfg, render=dataclasses.replace(
            cfg.render, ray_shard_axis=mesh_mod.MODEL_AXIS))
    with jax.sharding.set_mesh(mesh):
        p = mesh_mod.replicate(mesh, params)
        ws_s, label_s = mesh_mod.shard_batch(mesh, (ws, label)) \
            if n_data > 1 else (mesh_mod.replicate(mesh, ws),
                                mesh_mod.replicate(mesh, label))
        out = jax.jit(lambda p, w, l: synthesis(p, cfg_s, w, l)["image"])(
            p, ws_s, label_s)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5)


def test_upsample2d_matches_reference():
    """upsample2d (the SR/skip-path 2x) vs the torch upfirdn reference:
    up=2, gain=factor², pad ((k+f-1)//2, (k-f)//2)."""
    from tests.test_ops import nchw, to_nhwc, torch_upfirdn2d
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    k = __import__("hfa_gp_tpu.core.ops", fromlist=["ops"]) \
        .make_fir_kernel([1, 3, 3, 1])
    from hfa_gp_tpu.core import ops
    got = ops.upsample2d(jnp.asarray(x), k)
    want = torch_upfirdn2d(nchw(x), torch.from_numpy(k * 4.0),
                           up=2, pad=(2, 1))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-5,
                               atol=1e-5)


def test_channel_major_img_chain_parity():
    """The SR head's channel-major img chain (upsample2d_cm + torgb_apply_cm,
    the r5 layout fix for minor-dim-3 NHWC padding) is float-exact vs the
    NHWC formulation, including non-symmetric taps (kernel-flip path)."""
    from hfa_gp_tpu.core import ops
    from hfa_gp_tpu.models.eg3d import networks as nets

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 17, 17, 3)).astype(np.float32))
    for taps in ((1, 3, 3, 1), (1.0, 2.0, 4.0, 1.0)):
        ref = ops.upsample2d(x, ops.make_fir_kernel(taps))
        got = jnp.transpose(
            ops.upsample2d_cm(jnp.transpose(x, (0, 3, 1, 2)), taps),
            (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)

    p = nets._init_torgb(jax.random.PRNGKey(0), 32, 3, 64)
    xx = jnp.asarray(rng.standard_normal((2, 16, 16, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    a = nets.torgb_apply(p, xx, w, conv_clamp=256.0)
    b = jnp.transpose(nets.torgb_apply_cm(p, xx, w, conv_clamp=256.0),
                      (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_mapping_truncation(gen):
    """Truncation lerps toward w_avg (networks_stylegan2 mapping
    semantics): psi=0 → w_avg, psi=0.5 → midpoint."""
    from hfa_gp_tpu.models.eg3d.generator import mapping
    cfg, params = gen
    params = dict(params)
    params["mapping"] = dict(params["mapping"])
    params["mapping"]["w_avg"] = jnp.linspace(-1.0, 1.0, 512)
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 512))
    c = camera.flip_yz_label(camera.sample_camera_label(None, n=2,
                                                        mode=None))
    w1 = mapping(params, cfg, z, c, truncation_psi=1.0)
    w0 = mapping(params, cfg, z, c, truncation_psi=0.0)
    wh = mapping(params, cfg, z, c, truncation_psi=0.5)
    np.testing.assert_allclose(
        np.asarray(w0), np.broadcast_to(
            np.linspace(-1, 1, 512, dtype=np.float32),
            (2, cfg.num_ws, 512)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(wh),
                               0.5 * (np.asarray(w0) + np.asarray(w1)),
                               atol=1e-5)


def make_block_case(seed: int = 11):
    """Pinned inputs/params for the synthesis-block seam (shared by the
    in-env torch cross-check and tools/capture_golden.py)."""
    from hfa_gp_tpu.models.eg3d import networks as nets

    rng_np = np.random.default_rng(seed)
    b, h, cin, cout, w_dim, img_ch = 2, 8, 6, 5, 16, 3
    p = jax.tree_util.tree_map(
        np.asarray,
        nets.init_block(jax.random.PRNGKey(0), cin, cout, w_dim, 2 * h,
                        img_ch, is_first=False))
    # non-trivial noise + biases so every term is exercised
    p["conv0"]["noise_strength"] = np.float32(0.7)
    p["conv0"]["noise_const"] = rng_np.standard_normal(
        (2 * h, 2 * h)).astype(np.float32)
    p["conv1"]["noise_strength"] = np.float32(-0.3)
    p["conv1"]["noise_const"] = rng_np.standard_normal(
        (2 * h, 2 * h)).astype(np.float32)
    p["conv0"]["bias"] = rng_np.standard_normal(cout).astype(np.float32)
    p["conv1"]["bias"] = rng_np.standard_normal(cout).astype(np.float32)
    p["torgb"]["bias"] = rng_np.standard_normal(img_ch).astype(np.float32)

    x = rng_np.standard_normal((b, h, h, cin)).astype(np.float32)
    img = rng_np.standard_normal((b, h, h, img_ch)).astype(np.float32)
    ws = rng_np.standard_normal((b, 3, w_dim)).astype(np.float32)
    return p, x, img, ws


def torch_block_reference(p, x, img, ws, fir=(1, 3, 3, 1),
                          clamp=256.0):
    """Clean-room torch SynthesisBlock (conv0 up=2 → conv1 → torgb with
    1/sqrt(cin) weight-gain → FIR-upsampled skip add) — the SURVEY
    §7.3 risk seam. Returns (trunk, rgb) as numpy NHWC."""
    import math

    from tests.test_ops import (nchw, to_nhwc, torch_modulated_conv2d,
                                torch_upfirdn2d)
    from hfa_gp_tpu.core import ops

    b, _, _, cin = x.shape
    cout = p["conv0"]["weight"].shape[-1]
    k = ops.make_fir_kernel(list(fir))

    def affine(a, wv):
        return torch.from_numpy(wv) @ torch.from_numpy(a["weight"]).T \
            / math.sqrt(a["weight"].shape[1]) + torch.from_numpy(a["bias"])

    def lrelu_bias(t, bias, gain=math.sqrt(2.0)):
        t = t + torch.from_numpy(bias).view(1, -1, 1, 1)
        t = torch.nn.functional.leaky_relu(t, 0.2) * gain
        return torch.clamp(t, -clamp, clamp)

    # conv0: modulated conv up=2 (per-sample weights, conv_transpose+FIR)
    s0 = affine(p["conv0"]["affine"], ws[:, 0])
    w0 = torch.from_numpy(p["conv0"]["weight"].transpose(3, 2, 0, 1))
    wmod = w0[None] * s0.reshape(b, 1, cin, 1, 1)
    d = (wmod.square().sum(dim=[2, 3, 4]) + 1e-8).rsqrt()
    ys = []
    for bi in range(b):
        wt = torch.flip(wmod[bi], [2, 3]).permute(1, 0, 2, 3)
        ys.append(torch.nn.functional.conv_transpose2d(
            nchw(x)[bi:bi + 1], wt, stride=2))
    t = torch.cat(ys, 0)
    t = torch_upfirdn2d(t, torch.from_numpy(k * 4.0), pad=(1, 1))
    t = t * d.reshape(b, cout, 1, 1)
    t = t + torch.from_numpy(p["conv0"]["noise_const"]) \
        * float(p["conv0"]["noise_strength"])
    t = lrelu_bias(t, p["conv0"]["bias"])

    # conv1: modulated conv up=1
    s1 = affine(p["conv1"]["affine"], ws[:, 1])
    t = torch_modulated_conv2d(
        t, torch.from_numpy(p["conv1"]["weight"].transpose(3, 2, 0, 1)),
        s1)
    t = t + torch.from_numpy(p["conv1"]["noise_const"]) \
        * float(p["conv1"]["noise_strength"])
    t = lrelu_bias(t, p["conv1"]["bias"])

    # torgb: 1x1 non-demodulated, styles scaled by 1/sqrt(cout_of_trunk)
    s2 = affine(p["torgb"]["affine"], ws[:, 2]) / math.sqrt(cout)
    y = torch_modulated_conv2d(
        t, torch.from_numpy(p["torgb"]["weight"].transpose(3, 2, 0, 1)),
        s2, demodulate=False)
    y = torch.clamp(y + torch.from_numpy(p["torgb"]["bias"]).view(
        1, -1, 1, 1), -clamp, clamp)

    # skip: FIR-upsample previous rgb, add
    skip = torch_upfirdn2d(nchw(img), torch.from_numpy(k * 4.0),
                           up=2, pad=(2, 1))
    want_img = skip + y
    return to_nhwc(t), to_nhwc(want_img)


def test_synthesis_block_matches_torch():
    from hfa_gp_tpu.models.eg3d import networks as nets

    clamp = 256.0
    fir = [1, 3, 3, 1]
    p, x, img, ws = make_block_case()

    got_x, got_img = nets.block_apply(
        jax.tree_util.tree_map(jnp.asarray, p), jnp.asarray(x),
        jnp.asarray(img), jnp.asarray(ws), fir=fir, conv_clamp=clamp,
        up=True)
    want_x, want_img = torch_block_reference(p, x, img, ws, fir, clamp)

    np.testing.assert_allclose(np.asarray(got_x), want_x, rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_img), want_img,
                               rtol=2e-3, atol=2e-4)


def test_bilinear_resize_matches_torch_interpolate():
    """SR input resize vs torch F.interpolate(mode='bilinear',
    align_corners=False[, antialias]) — the reference SR head's resize
    (torch.nn.functional.interpolate in superresolution.py)."""
    from tests.test_ops import nchw, to_nhwc
    from hfa_gp_tpu.models.eg3d.networks import _bilinear_resize
    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    for size, aa in ((32, True), (32, False), (64, True)):
        got = _bilinear_resize(jnp.asarray(x), size, aa)
        want = torch.nn.functional.interpolate(
            nchw(x), size=(size, size), mode="bilinear",
            align_corners=False, antialias=aa)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want),
                                   rtol=1e-4, atol=1e-4)


def test_synthesis_windowed_sampler_parity(gen):
    """The Pallas windowed MXU sampler (use_pallas_sampler) must match
    the XLA row-gather render to bf16 tolerance (interpret mode here;
    the TPU speed run lives in tools/bench_triplane.py)."""
    import dataclasses
    cfg, params = gen
    ws = jax.random.normal(jax.random.PRNGKey(11), (1, cfg.num_ws, 512))
    label = camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None))
    ref = synthesis(params, cfg, ws, label)
    cfg_p = dataclasses.replace(
        cfg, render=dataclasses.replace(
            cfg.render, use_pallas_sampler=True, pallas_interpret=True,
            sampler_tile=4, sampler_depth_window=4,
            sampler_slab=(32, 32), sampler_slab_fine=(32, 32),
            # pin the reference sample placement: this test isolates
            # KERNEL parity (stratified placement has its own test)
            sampler_fine="pallas", sampler_group=8))
    got = synthesis(params, cfg_p, ws, label)
    np.testing.assert_allclose(np.asarray(got["image_raw"]),
                               np.asarray(ref["image_raw"]), atol=4e-2)
    np.testing.assert_allclose(np.asarray(got["image"]),
                               np.asarray(ref["image"]), atol=6e-2)


def test_unify_samples_rank_merge_matches_sort():
    """The sorted-inputs rank merge must equal the lax.sort merge,
    including stable tie handling."""
    key = jax.random.PRNGKey(5)
    b, r, n1, n2, c = 2, 7, 9, 11, 4
    d1 = jnp.sort(jax.random.randint(key, (b, r, n1, 1), 0, 12)
                  .astype(jnp.float32), axis=2)
    d2 = jnp.sort(jax.random.randint(jax.random.PRNGKey(6),
                                     (b, r, n2, 1), 0, 12)
                  .astype(jnp.float32), axis=2)
    c1 = jax.random.normal(key, (b, r, n1, c))
    c2 = jax.random.normal(key, (b, r, n2, c))
    s1 = jax.random.normal(key, (b, r, n1, 1))
    s2 = jax.random.normal(key, (b, r, n2, 1))
    want = rnd.unify_samples(d1, c1, s1, d2, c2, s2)
    got = rnd.unify_samples(d1, c1, s1, d2, c2, s2, sorted_inputs=True)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-6)


def test_unify_samples_rank_merge_grads_match_sort():
    """_apply_ranks carries a custom VJP (the backward re-enters the
    forward one-hot einsum with the INVERSE permutation — XLA's native
    transposed-batched-matmul path was ~16x slower, r3
    tools/probe_render_bwd2.py); its gradients must equal the lax.sort
    path's."""
    rng = np.random.default_rng(3)
    b, r, n1, n2, c = 2, 5, 6, 7, 3
    d1 = jnp.asarray(np.sort(rng.uniform(0, 1, (b, r, n1, 1)), axis=2),
                     jnp.float32)
    d2 = jnp.asarray(np.sort(rng.uniform(0, 1, (b, r, n2, 1)), axis=2),
                     jnp.float32)
    c1 = jnp.asarray(rng.standard_normal((b, r, n1, c)), jnp.float32)
    c2 = jnp.asarray(rng.standard_normal((b, r, n2, c)), jnp.float32)
    s1 = jnp.asarray(rng.standard_normal((b, r, n1, 1)), jnp.float32)
    s2 = jnp.asarray(rng.standard_normal((b, r, n2, 1)), jnp.float32)

    def loss(sorted_, c1_, s1_, c2_, s2_):
        dd, cc, ss = rnd.unify_samples(d1, c1_, s1_, d2, c2_, s2_,
                                       sorted_inputs=sorted_)
        return jnp.sum(jnp.sin(cc) * jnp.cos(ss) + dd[..., :1] * cc)

    gs = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3))(
        c1, s1, c2, s2)
    gu = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3))(
        c1, s1, c2, s2)
    for a, bb in zip(gs, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-6)


def test_sample_importance_sorted_with_rng():
    """sample_importance must return per-ray SORTED depths even with
    iid-uniform u (it sorts the sample set — sample_pdf is monotone, so
    this equals sorting u) — the property that lets unify_samples take
    the rank-merge path unconditionally."""
    key = jax.random.PRNGKey(0)
    b, r, n = 2, 32, 48
    z = rnd.sample_stratified(jnp.zeros((b, r, 3)), 2.25, 3.3, n,
                              rng=jax.random.PRNGKey(1))
    w = jax.random.uniform(key, (b, r, n - 1, 1))
    fine = rnd.sample_importance(z, w, 48, rng=jax.random.PRNGKey(2))
    f = np.asarray(fine)[..., 0]
    assert (np.diff(f, axis=-1) >= 0).all()
    # coarse stratified jitter is sorted too (each sample in its bin)
    zc = np.asarray(z)[..., 0]
    assert (np.diff(zc, axis=-1) > 0).all()


def test_windowed_stratified_importance_in_window():
    """sample_importance_windowed must place every fine sample inside
    its static depth window, for sharp, bimodal, and uniform densities
    (this is the property that keeps the Pallas fine-pass footprints
    coarse-tight and the bilinear exact)."""
    key = jax.random.PRNGKey(0)
    b, r, n = 2, 64, 48
    z = rnd.sample_stratified(jnp.zeros((b, r, 3)), 2.25, 3.3, n)
    nw, np_per = 12, 4
    edges = np.linspace(2.25, 3.3, nw + 1)
    for name, w in {
        "sharp": jnp.exp(-((z[..., :-1, :] - 2.7) ** 2) / (2 * 0.02 ** 2)),
        "bimodal": (jnp.exp(-((z[..., :-1, :] - 2.4) ** 2) / 8e-4)
                    + jnp.exp(-((z[..., :-1, :] - 3.2) ** 2) / 8e-4)),
        "uniform": jnp.ones_like(z[..., :-1, :]),
        "random": jax.random.uniform(key, z[..., :-1, :].shape),
    }.items():
        fine = rnd.sample_importance_windowed(z, w, nw, np_per, 2.25, 3.3)
        f = np.asarray(fine).reshape(b, r, nw, np_per)
        for wi in range(nw):
            lo, hi = edges[wi] - 1e-4, edges[wi + 1] + 1e-4
            assert (f[:, :, wi] >= lo).all() and (f[:, :, wi] <= hi).all(), \
                (name, wi, f[:, :, wi].min(), f[:, :, wi].max())
        # monotone per ray (the rank merge relies on it)
        flat = np.asarray(fine)[..., 0]
        assert (np.diff(flat, axis=-1) >= -1e-5).all(), name
    # distribution sanity: with a sharp bump most samples concentrate
    # near it (within-window quantiles still follow the CDF)
    w = jnp.exp(-((z[..., :-1, :] - 2.7) ** 2) / (2 * 0.05 ** 2))
    fine = np.asarray(rnd.sample_importance_windowed(z, w, nw, np_per,
                                                     2.25, 3.3))
    near = (np.abs(fine - 2.7) < 0.15).mean()
    assert near > 0.25, near


def test_synthesis_stratified_close_to_reference_placement():
    """The stratified fine placement renders the same field with a
    different quadrature — images must stay close to the
    reference-placement render."""
    import dataclasses
    cfg = small_config()
    params = init_generator(jax.random.PRNGKey(0), cfg)
    ws = jax.random.normal(jax.random.PRNGKey(12), (1, cfg.num_ws, 512))
    label = camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None))
    ref = synthesis(params, cfg, ws, label)["image_raw"]
    cfg_s = dataclasses.replace(
        cfg, render=dataclasses.replace(
            cfg.render, use_pallas_sampler=True, pallas_interpret=True,
            sampler_tile=4, sampler_depth_window=4,
            sampler_slab=(32, 32), sampler_slab_fine=(32, 32),
            sampler_fine="stratified", sampler_group=8))
    got = synthesis(params, cfg_s, ws, label)["image_raw"]
    err = float(jnp.mean(jnp.abs(got - ref)))
    psnr = -10 * np.log10(float(jnp.mean((got - ref) ** 2)) / 4 + 1e-12)
    assert psnr > 28.0, (psnr, err)


def test_synthesis_grad_flows_through_windowed_sampler(gen):
    """Training through the Pallas sampler: grads must reach ws (via the
    backbone → planes path) with the custom-VJP scatter backward."""
    import dataclasses
    cfg, params = gen
    cfg_p = dataclasses.replace(
        cfg, render=dataclasses.replace(
            cfg.render, use_pallas_sampler=True, pallas_interpret=True,
            sampler_tile=4, sampler_depth_window=4,
            sampler_slab=(32, 32), sampler_slab_fine=(32, 32),
            sampler_group=8))
    ws = jax.random.normal(jax.random.PRNGKey(13), (1, cfg.num_ws, 512))
    label = camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None))

    def loss(w):
        return jnp.mean(synthesis(params, cfg_p, w, label)["image"] ** 2)

    g = jax.grad(loss)(ws)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
    # and it should agree with the XLA-path gradient direction
    g_ref = jax.grad(
        lambda w: jnp.mean(synthesis(params, cfg, w, label)["image"] ** 2)
    )(ws)
    ga, gb = np.asarray(g).ravel(), np.asarray(g_ref).ravel()
    corr = np.corrcoef(ga, gb)[0, 1]
    assert corr > 0.95, corr


def test_synthesis_windowed_sampler_dp_sharded_batch(gen):
    """Batch-DP synthesis through the windowed sampler under a sharded
    mesh (the reenact CLI's pod layout). Interpret mode validates
    tracing/shapes under sharding; real-pod custom-call partitioning is
    exercised by the driver's multichip artifacts."""
    import dataclasses

    from hfa_gp_tpu.parallel import mesh as mesh_mod
    cfg, params = gen
    cfg_p = dataclasses.replace(
        cfg, render=dataclasses.replace(
            cfg.render, use_pallas_sampler=True, pallas_interpret=True,
            sampler_tile=4, sampler_depth_window=4,
            sampler_slab=(32, 32), sampler_slab_fine=(32, 32),
            sampler_group=8))
    ws = jax.random.normal(jax.random.PRNGKey(14), (8, cfg.num_ws, 512))
    label = jnp.tile(camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None)), (8, 1))
    mesh = mesh_mod.make_mesh(n_data=8, n_model=1)
    fn = jax.jit(lambda p, w, c: synthesis(p, cfg_p, w, c)["image_raw"])
    with jax.sharding.set_mesh(mesh):
        p = mesh_mod.replicate(mesh, params)
        ws_s, label_s = mesh_mod.shard_batch(
            mesh, (np.asarray(ws), np.asarray(label)))
        out = fn(p, ws_s, label_s)
    assert out.shape == (8, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_synthesis_windowed_sampler_shard_map_dp_parity(gen):
    """data_shard_axis: the windowed render wrapped in shard_map over
    the data axis (the pod-scale DP path, renderer._render_windowed_dp)
    must reproduce the unsharded windowed render exactly — each shard
    runs the same kernel on its batch slice, no cross-batch math."""
    import dataclasses

    from hfa_gp_tpu.parallel import mesh as mesh_mod
    cfg, params = gen
    base = dataclasses.replace(
        cfg.render, use_pallas_sampler=True, pallas_interpret=True,
        sampler_tile=4, sampler_depth_window=4,
        sampler_slab=(32, 32), sampler_slab_fine=(32, 32),
        sampler_group=8)
    cfg_single = dataclasses.replace(cfg, render=base)
    cfg_dp = dataclasses.replace(cfg, render=dataclasses.replace(
        base, data_shard_axis=mesh_mod.DATA_AXIS))
    b = 4
    ws = jax.random.normal(jax.random.PRNGKey(15), (b, cfg.num_ws, 512))
    label = jnp.tile(camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None)), (b, 1))
    want = synthesis(params, cfg_single, ws, label)["image_raw"]

    mesh = mesh_mod.make_mesh(n_data=4, n_model=1)
    fn = jax.jit(lambda p, w, c: synthesis(p, cfg_dp, w, c)["image_raw"])
    with jax.sharding.set_mesh(mesh):
        p = mesh_mod.replicate(mesh, params)
        ws_s, label_s = mesh_mod.shard_batch(
            mesh, (np.asarray(ws), np.asarray(label)))
        out = fn(p, ws_s, label_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-4)


def test_windowed_sampler_shard_map_dp_grads(gen):
    """Training-path check for the shard_map DP wrapper: grads flow and
    match the unsharded windowed-path grads."""
    import dataclasses

    from hfa_gp_tpu.parallel import mesh as mesh_mod
    cfg, params = gen
    base = dataclasses.replace(
        cfg.render, use_pallas_sampler=True, pallas_interpret=True,
        sampler_tile=4, sampler_depth_window=4,
        sampler_slab=(32, 32), sampler_slab_fine=(32, 32),
        sampler_group=8)
    cfg_single = dataclasses.replace(cfg, render=base)
    cfg_dp = dataclasses.replace(cfg, render=dataclasses.replace(
        base, data_shard_axis=mesh_mod.DATA_AXIS))
    b = 4
    ws = jax.random.normal(jax.random.PRNGKey(16), (b, cfg.num_ws, 512))
    label = jnp.tile(camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None)), (b, 1))

    def loss(cfg_, w, c):
        return jnp.mean(synthesis(params, cfg_, w, c)["image"] ** 2)

    g_want = jax.grad(lambda w, c: loss(cfg_single, w, c))(ws, label)
    mesh = mesh_mod.make_mesh(n_data=4, n_model=1)
    with jax.sharding.set_mesh(mesh):
        ws_s, label_s = mesh_mod.shard_batch(
            mesh, (np.asarray(ws), np.asarray(label)))
        g = jax.jit(jax.grad(lambda w, c: loss(cfg_dp, w, c)))(ws_s,
                                                              label_s)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_want),
                               atol=3e-6, rtol=2e-3)
