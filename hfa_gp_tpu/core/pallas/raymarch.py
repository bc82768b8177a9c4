"""Pallas TPU kernel: fused mip ray-march compositing.

One VMEM-resident pass over the sample axis per ray tile: midpoint
averaging, softplus density clamp, alpha, sequential transmittance,
weighted color/depth accumulation — the MipRayMarcher2 chain
(models/eg3d/renderer.ray_march) without materializing any of the
(B, R, N-1, ·) intermediates in HBM.

Layout: everything is 2-D with RAYS ON THE LANE AXIS (last dim, tiles of
128) — colors staged (N·C, R) so step k slices a (C, T) row-block; all
per-ray scalars are (1, T) rows. Parity with the XLA path is tested in
tests/test_pallas.py (interpret mode); the renderer selects this kernel
via RenderConfig.use_pallas_marcher (inference path — the backward runs
through the XLA formulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 128


def _march_kernel(colors_ref, densities_ref, deltas_ref, depthsmid_ref,
                  rgb_ref, depth_ref, wsum_ref, weights_ref):
    """Per-tile refs (T = TILE_R rays on the lane axis):
      colors_ref    (N*C, T)   sample-major color rows
      densities_ref (N, T)
      deltas_ref    (N-1, T)
      depthsmid_ref (N-1, T)
    Outputs:
      rgb_ref (C, T); depth_ref (1, T); wsum_ref (1, T);
      weights_ref (N-1, T)
    """
    n_mid = deltas_ref.shape[0]
    c = rgb_ref.shape[0]
    t = rgb_ref.shape[1]

    def body(k, carry):
        trans, rgb_acc, depth_acc, w_acc = carry
        c0 = colors_ref[pl.ds(k * c, c), :]
        c1 = colors_ref[pl.ds((k + 1) * c, c), :]
        cm = (c0 + c1) * 0.5                       # (C, T)
        dm = (densities_ref[pl.ds(k, 1), :]
              + densities_ref[pl.ds(k + 1, 1), :]) * 0.5
        dm = jax.nn.softplus(dm - 1.0)             # (1, T)
        alpha = 1.0 - jnp.exp(-dm * deltas_ref[pl.ds(k, 1), :])
        w = alpha * trans                          # (1, T)
        weights_ref[pl.ds(k, 1), :] = w
        rgb_acc = rgb_acc + w * cm
        depth_acc = depth_acc + w * depthsmid_ref[pl.ds(k, 1), :]
        w_acc = w_acc + w
        trans = trans * (1.0 - alpha + 1e-10)
        return trans, rgb_acc, depth_acc, w_acc

    init = (jnp.ones((1, t), jnp.float32),
            jnp.zeros((c, t), jnp.float32),
            jnp.zeros((1, t), jnp.float32),
            jnp.zeros((1, t), jnp.float32))
    _, rgb, depth, wsum = jax.lax.fori_loop(0, n_mid, body, init)
    rgb_ref[:] = rgb * 2.0 - 1.0                   # scale to (-1, 1)
    depth_ref[:] = depth / jnp.maximum(wsum, 1e-10)
    wsum_ref[:] = wsum


def pallas_ray_march(colors: jax.Array, densities: jax.Array,
                     depths: jax.Array, *, white_back: bool = False,
                     interpret: bool = False):
    """(B, R, N, C), (B, R, N, 1), (B, R, N, 1) → same contract as
    renderer.ray_march: (rgb (B,R,C), depth (B,R,1), weights
    (B,R,N-1,1))."""
    assert not white_back, "white_back handled by the XLA path"
    b, r, n, c = colors.shape
    total = b * r
    pad = (-total) % TILE_R
    rt = total + pad
    n_tiles = rt // TILE_R

    def pad_rays(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0) \
            if pad else x

    # (N*C, RT): sample-major rows, rays on lanes
    colors_s = jnp.transpose(
        pad_rays(colors.astype(jnp.float32).reshape(total, n * c)), (1, 0))
    dens_s = jnp.transpose(
        pad_rays(densities.astype(jnp.float32).reshape(total, n)), (1, 0))
    depths_flat = depths.reshape(total, n)
    if pad:
        # padded rays get an increasing depth ramp to keep math finite
        ramp = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n), (pad, n))
        depths_flat = jnp.concatenate([depths_flat, ramp], axis=0)
    deltas_s = jnp.transpose(depths_flat[:, 1:] - depths_flat[:, :-1],
                             (1, 0))
    mids_s = jnp.transpose(
        (depths_flat[:, 1:] + depths_flat[:, :-1]) * 0.5, (1, 0))

    rgb, depth, wsum, weights = pl.pallas_call(
        _march_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n * c, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n - 1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n - 1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((c, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n - 1, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, rt), jnp.float32),
            jax.ShapeDtypeStruct((1, rt), jnp.float32),
            jax.ShapeDtypeStruct((1, rt), jnp.float32),
            jax.ShapeDtypeStruct((n - 1, rt), jnp.float32),
        ],
        interpret=interpret,
    )(colors_s, dens_s, deltas_s, mids_s)

    rgb = jnp.transpose(rgb[:, :total], (1, 0)).reshape(b, r, c)
    depth = jnp.transpose(depth[:, :total], (1, 0)).reshape(b, r, 1)
    depth = jnp.clip(depth, jnp.min(depths), jnp.max(depths))
    weights = jnp.transpose(weights[:, :total], (1, 0)) \
        .reshape(b, r, n - 1, 1)
    return rgb, depth, weights
