"""Capture golden-activation fixtures from the clean-room torch seams
(VERDICT r2 #3a).

The in-env torch cross-checks (tests/test_eg3d.py, tests/test_ops.py)
prove each SURVEY §7.3 seam at test time. This tool freezes their
torch-side outputs into `tests/golden/seams.npz` so the same parity is
regression-locked WITHOUT torch at test time (tests/test_golden.py):
if a future refactor shifts any seam, the fixture diff catches it even
in a torch-less environment.

Usage: python tools/capture_golden.py          # rewrites tests/golden/
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")   # pure torch+geometry

    import torch
    import torch.nn.functional as TF

    from tests.test_eg3d import (make_block_case, torch_block_reference,
                                 torch_ray_march, torch_sample_pdf)
    from tests.test_ops import nchw

    out = {}

    # --- synthesis block (modconv up=2 + FIR skip), seed-pinned
    p, x, img, ws = make_block_case(seed=11)
    want_x, want_img = torch_block_reference(p, x, img, ws)
    flat = {}

    def flatten(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                flatten(v, f"{prefix}{k}.")
            else:
                flat[f"{prefix}{k}"] = np.asarray(v)

    flatten(p, "block.p.")
    out.update(flat)
    out.update({"block.x": x, "block.img": img, "block.ws": ws,
                "block.want_x": want_x, "block.want_img": want_img})

    # --- grid_sample semantics (zeros padding, align_corners=False)
    rng = np.random.default_rng(0)
    gs_img = rng.standard_normal((2, 7, 9, 4)).astype(np.float32)
    grid = (rng.standard_normal((2, 33, 2)) * 0.9).astype(np.float32)
    grid[0, :3] = 3.0
    want = TF.grid_sample(
        torch.from_numpy(gs_img.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid).unsqueeze(1),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).squeeze(2).permute(0, 2, 1)
    out.update({"gs.img": gs_img, "gs.grid": grid,
                "gs.want": want.numpy()})

    # --- ray march (MipRayMarcher2 math)
    rng = np.random.default_rng(2)
    b, r, n = 2, 5, 9
    colors = rng.standard_normal((b, r, n, 4)).astype(np.float32)
    densities = rng.standard_normal((b, r, n, 1)).astype(np.float32)
    depths = np.sort(
        rng.uniform(2.25, 3.3, (b, r, n, 1)).astype(np.float32), axis=2)
    wr, wd, ww = torch_ray_march(torch.from_numpy(colors),
                                 torch.from_numpy(densities),
                                 torch.from_numpy(depths))
    out.update({"rm.colors": colors, "rm.densities": densities,
                "rm.depths": depths, "rm.want_rgb": wr.numpy(),
                "rm.want_depth": wd.numpy(), "rm.want_w": ww.numpy()})

    # --- sample_pdf (inverse-CDF importance sampling)
    rng = np.random.default_rng(3)
    n_rays, n_bins, n_imp = 6, 7, 12
    bins = np.sort(rng.uniform(2.0, 3.0, (n_rays, n_bins)),
                   axis=1).astype(np.float32)
    weights = rng.uniform(0.0, 1.0,
                          (n_rays, n_bins - 2)).astype(np.float32)
    u = np.broadcast_to(np.linspace(0, 1, n_imp, dtype=np.float32),
                        (n_rays, n_imp)).copy()
    want = torch_sample_pdf(torch.from_numpy(bins),
                            torch.from_numpy(weights), n_imp,
                            torch.from_numpy(u))
    out.update({"pdf.bins": bins, "pdf.weights": weights,
                "pdf.n_imp": np.int64(n_imp), "pdf.want": want.numpy()})

    # --- bilinear resize (SR head input resize), with/without antialias
    rng = np.random.default_rng(13)
    rs_x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    out["rs.x"] = rs_x
    for size, aa in ((32, True), (32, False), (64, True)):
        want = torch.nn.functional.interpolate(
            nchw(rs_x), size=(size, size), mode="bilinear",
            align_corners=False, antialias=aa)
        out[f"rs.want_{size}_{int(aa)}"] = \
            want.numpy().transpose(0, 2, 3, 1)

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "seams.npz")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} ({len(out)} arrays, "
          f"{os.path.getsize(dst) / 1e3:.0f} kB)")


if __name__ == "__main__":
    main()
