"""Footprint analysis for the windowed tri-plane sampler (numpy only).

For candidate (ray-tile T×T, depth-window Dw) block shapes, measures the
uv bounding-box extent (in texels of the 256² plane) that each block's
bilinear lookups touch, over representative FFHQ camera poses
(radius 2.7, focal 4.2647, depth 2.25→3.3, box_warp=1 — the
ffhqrebalanced512-128 rendering_kwargs). This sizes the VMEM slab for
the Pallas 4-hot MXU sampler: the slab must cover the block's worst-case
footprint (plus the +1 bilinear apron).
"""
import sys

import numpy as np

RES = 128            # neural rendering resolution
PLANE = 256          # tri-plane resolution
RAY_START, RAY_END = 2.25, 3.3
N_COARSE = 48
FOCAL = 4.2647
RADIUS = 2.7

PLANE_AXES = np.array([
    [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
    [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
    [[0, 0, 1], [1, 0, 0], [0, 1, 0]],
], dtype=np.float64)
PLANE_INV = np.linalg.inv(PLANE_AXES)


def cam2world(yaw, pitch):
    # camera on sphere of RADIUS looking at origin, OpenCV convention
    # (matches create_cam2world_matrix + flip composition closely enough
    # for footprint purposes).
    h = np.pi / 2 + yaw
    v = np.pi / 2 + pitch
    origin = RADIUS * np.array([np.sin(v) * np.cos(h),
                                np.cos(v),
                                np.sin(v) * np.sin(h)])
    f = -origin / np.linalg.norm(origin)         # forward: at the origin
    up = np.array([0.0, 1.0, 0.0])
    left = np.cross(up, f); left /= np.linalg.norm(left)
    up2 = np.cross(f, left)
    rot = np.stack((-left, up2, -f), axis=-1)
    # OpenGL→OpenCV flip: negate y/z columns
    rot[:, 1] *= -1; rot[:, 2] *= -1
    m = np.eye(4); m[:3, :3] = rot; m[:3, 3] = origin
    return m


def rays(m):
    i = (np.arange(RES) + 0.5) / RES
    yy, xx = np.meshgrid(i, i, indexing="ij")
    x = (xx - 0.5) / FOCAL
    y = (yy - 0.5) / FOCAL
    d = np.stack([x, y, np.ones_like(x)], -1).reshape(-1, 3)
    d = d @ m[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(m[:3, 3], d.shape)
    return o, d


def texel_uv(o, d, depths):
    # (R,3),(R,3),(N,) -> (3, R, N, 2) texel coords per plane
    pts = o[:, None, :] + depths[None, :, None] * d[:, None, :]  # (R,N,3)
    pts = 2.0 * pts  # box_warp=1 → coords*2/box_warp
    uv = np.einsum("rnj,pjk->prnk", pts, PLANE_INV)[..., :2]
    # grid_sample texel mapping: x=(u+1)*W/2-0.5
    return (uv + 1.0) * (PLANE / 2.0) - 0.5


def analyze(T, DW, tex):
    # tex: (3, R, N, 2); blocks over (tile, depth window); returns
    # (extent_y, extent_x) per block per plane, only counting in-bounds
    # influence (clip to [-1, PLANE]: out-of-range contributes zeros).
    n3, R, N, _ = tex.shape
    t = np.clip(tex, -2, PLANE + 1)
    t = t.reshape(3, RES // T, T, RES // T, T, N // DW, DW, 2)
    mx = t.max(axis=(2, 4, 6))
    mn = t.min(axis=(2, 4, 6))
    ext = np.ceil(mx) - np.floor(mn) + 1.0   # +1 bilinear apron
    return ext.reshape(-1, 2)


def main():
    depths = np.linspace(RAY_START, RAY_END, N_COARSE)
    poses = [(0, 0), (0.35, 0), (-0.35, 0), (0, 0.25), (0.5, 0.3),
             (-0.6, -0.2)]
    all_tex = []
    for yaw, pitch in poses:
        o, d = rays(cam2world(yaw, pitch))
        all_tex.append(texel_uv(o, d, depths))
    for T in (8, 16, 32):
        for DW in (2, 4, 6, 8, 12, 16, 48):
            exts = np.concatenate(
                [analyze(T, DW, t) for t in all_tex], axis=0)
            area = exts[:, 0] * exts[:, 1]
            print(f"tile {T:2d}x{T:<2d} depthwin {DW:2d}: "
                  f"ext_y p50/p95/max {np.percentile(exts[:,0],50):5.0f}/"
                  f"{np.percentile(exts[:,0],95):5.0f}/{exts[:,0].max():5.0f}  "
                  f"ext_x p50/p95/max {np.percentile(exts[:,1],50):5.0f}/"
                  f"{np.percentile(exts[:,1],95):5.0f}/{exts[:,1].max():5.0f}  "
                  f"area p95 {np.percentile(area,95):7.0f}")


if __name__ == "__main__":
    main()
