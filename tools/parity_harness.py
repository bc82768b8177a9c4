"""Golden-activation parity harness (SURVEY.md §7.2/§7.3 item 1).

Usage (on a machine that has the reference + pickle + CUDA or CPU torch):

  1. Capture reference activations:
       python tools/parity_harness.py capture ffhqrebalanced512-128.pkl \
           golden.npz
     Runs the torch EG3D pickle on fixed inputs (ws = PRNG(0) via our
     generator's convention, the canonical front camera label) and stores
     {planes, feature_image, rgb_raw, image} tensors.

  2. Compare against this framework:
       python tools/parity_harness.py compare golden.npz eg3d.npz
     Loads the converted weights (tools/convert_pickle.py output), runs
     our synthesis on the same inputs, reports per-stage max-abs / PSNR.

Stage-by-stage outputs localize any mismatch (modulated-conv demod rules,
FIR alignment, grid_sample semantics, sampling details — SURVEY.md §7.3).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def _fixed_inputs():
    import jax
    import jax.numpy as jnp

    from hfa_gp_tpu.core import camera
    ws = np.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                      (1, 14, 512), jnp.float32))
    label = np.asarray(camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None)))
    return ws, label


def capture(pkl_path: str, out_path: str) -> None:
    import torch
    ws_np, label_np = _fixed_inputs()
    # load via the stub unpickler is NOT possible for execution; running
    # the pickle requires NVIDIA's dnnlib/legacy on the path.
    sys.path.insert(0, "eg3d/eg3d")  # user-provided EG3D checkout
    import dnnlib  # noqa: F401
    import legacy
    with open(pkl_path, "rb") as f:
        G = legacy.load_network_pkl(f)["G_ema"].eval()
    ws = torch.from_numpy(ws_np)
    c = torch.from_numpy(label_np)
    with torch.no_grad():
        planes = G.backbone.synthesis(ws, noise_mode="const")
        out = G.synthesis(ws, c, noise_mode="const")
    np.savez(out_path,
             ws=ws_np, label=label_np,
             planes=planes.numpy(),
             image=out["image"].numpy(),
             image_raw=out["image_raw"].numpy())
    print(f"wrote {out_path}")


def compare(golden_path: str, weights_npz: str,
            cfg=None) -> dict[str, float]:
    """Returns {stage: psnr_db}; also prints a per-stage report. `cfg`
    defaults to the flagship EG3DConfig (the real pickle's geometry);
    tests pass a small config to dry-run the whole procedure in-env."""
    import jax.numpy as jnp

    from hfa_gp_tpu.models.eg3d import networks as nets
    from hfa_gp_tpu.models.eg3d.generator import EG3DConfig, synthesis
    from hfa_gp_tpu.utils import pytree_io

    golden = np.load(golden_path)
    params = pytree_io.load_npz(weights_npz)
    if cfg is None:
        cfg = EG3DConfig()
    ws = jnp.asarray(golden["ws"])
    label = jnp.asarray(golden["label"])
    psnrs: dict[str, float] = {}

    def report(name, got_nhwc, want_nchw):
        got = np.asarray(got_nhwc).transpose(0, 3, 1, 2)
        want = np.asarray(want_nchw)
        diff = np.abs(got - want)
        mse = float(np.mean((got - want) ** 2))
        psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
        psnrs[name] = psnr
        print(f"{name:14s} max|Δ|={diff.max():.5f} "
              f"mean|Δ|={diff.mean():.6f} psnr={psnr:.2f} dB")

    planes = nets.backbone_apply(params["backbone"], cfg.backbone, ws,
                                 noise_mode="const")
    report("planes", planes, golden["planes"])
    out = synthesis(params, cfg, ws, label, noise_mode="const")
    report("image_raw", out["image_raw"], golden["image_raw"])
    report("image", out["image"], golden["image"])
    return psnrs


if __name__ == "__main__":
    if sys.argv[1] == "capture":
        capture(sys.argv[2], sys.argv[3])
    else:
        compare(sys.argv[2], sys.argv[3])
