"""Convert a reference HFA-GP avatar checkpoint (.pt) to hfa_gp_tpu npz.

The reference saves `{"gen": state_dict, "g_optim": ..., "args": ...}`
(code/trainer_rgb.py:143-151; trainer_3dmm.py:114-122 uses "w_optim";
trainer_audio.py:192-204 adds "AudNet"/"AudAttNet"). This tool maps the
module names onto the hfa_gp_tpu params pytree so BASELINE config 1
(render from a converted reference checkpoint) is runnable:

  RGB   head (HeadNeRF_final, headnerf.py:44):  encoder.* → encoder,
        bases/delta[/bases_2/delta_2] → subspace[_2], generator.* → EG3D
        (reuses tools/convert_pickle.convert_generator).
  3DMM  head (HeadNeRF_3DMM, headnerf.py:162):  weights_3dmm.fc.i →
        weights_mlp.fc{i}.
  Audio head (HeadNeRF_Audio + AudNet/AudAttNet state dicts):
        encoder_conv.{0,2,4,6} → audnet.conv0..3 (Conv1d OIW→WIO),
        encoder_fc1.{0,2} → fc0/fc1; attentionConvNet.{0,2,4,6,8} →
        audattnet.conv0..4, attentionNet.0 → att_fc.

The optimizer state ("g_optim"/"w_optim") is not mapped — resuming
training from a reference checkpoint restarts the optimizer (documented
behavior; rendering/eval need only "gen"). "args" is dumped alongside as
JSON for provenance.

Usage:
  python tools/convert_avatar.py --ckpt 025000.pt --head rgb \
      --out avatar.npz
Layout transforms are roundtrip-tested against a synthetically saved
torch checkpoint in tests/test_convert.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hfa_gp_tpu.utils import pytree_io  # noqa: E402
from tools.convert_pickle import convert_generator  # noqa: E402


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float32)


def _conv2d_hwio(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 1, 0))


def _sub_sd(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def convert_linear_stack(sd: dict, prefix: str) -> dict:
    """nn.Sequential of EqualLinear → {"fc{i}": {weight, bias}}."""
    out: dict[str, Any] = {}
    i = 0
    while f"{prefix}{i}.weight" in sd:
        out[f"fc{i}"] = {"weight": _np(sd[f"{prefix}{i}.weight"]),
                         "bias": _np(sd[f"{prefix}{i}.bias"])}
        i += 1
    if not out:
        raise KeyError(f"no linear stack at {prefix!r}")
    return out


def convert_encoder(sd: dict) -> dict:
    """Encoder (encoder3d.py:242-298) state dict → encoder pytree.

    ConvLayer is an nn.Sequential: non-downsample = [EqualConv2d,
    FusedLeakyReLU] (indices 0/1), downsample = [Blur, EqualConv2d,
    FusedLeakyReLU] (1/2); Blur's 'kernel' buffer is a constant we
    regenerate, so it is skipped."""
    p: dict[str, Any] = {"net_app": {}}
    app = p["net_app"]
    # stem: convs.0 = ConvLayer(3, C, 1)
    app["stem"] = {"weight": _conv2d_hwio(sd["net_app.convs.0.0.weight"]),
                   "act_bias": _np(sd["net_app.convs.0.1.bias"]).reshape(-1)}
    # ResBlocks: convs.1..N-1
    i = 0
    while f"net_app.convs.{i + 1}.conv1.0.weight" in sd:
        b = f"net_app.convs.{i + 1}"
        app[f"res{i}"] = {
            "conv1": {"weight": _conv2d_hwio(sd[f"{b}.conv1.0.weight"]),
                      "act_bias": _np(sd[f"{b}.conv1.1.bias"]).reshape(-1)},
            "conv2": {"weight": _conv2d_hwio(sd[f"{b}.conv2.1.weight"]),
                      "act_bias": _np(sd[f"{b}.conv2.2.bias"]).reshape(-1)},
            "skip": {"weight": _conv2d_hwio(sd[f"{b}.skip.1.weight"])},
        }
        i += 1
    # final: convs.N = EqualConv2d(in, w_dim, 4, bias=False)
    app["final"] = {"weight": _conv2d_hwio(
        sd[f"net_app.convs.{i + 1}.weight"])}
    p["fc"] = convert_linear_stack(sd, "fc.")
    if "pose.0.weight" in sd:
        p["pose"] = convert_linear_stack(sd, "pose.")
    return p


def convert_audnet(sd: dict) -> dict:
    """AudioNet (headnerf.py:319-349) → audnet pytree (Conv1d OIW→WIO)."""
    out: dict[str, Any] = {}
    for j, idx in enumerate((0, 2, 4, 6)):
        out[f"conv{j}"] = {
            "weight": np.transpose(_np(sd[f"encoder_conv.{idx}.weight"]),
                                   (2, 1, 0)),
            "bias": _np(sd[f"encoder_conv.{idx}.bias"])}
    for j, idx in enumerate((0, 2)):
        out[f"fc{j}"] = {"weight": _np(sd[f"encoder_fc1.{idx}.weight"]),
                         "bias": _np(sd[f"encoder_fc1.{idx}.bias"])}
    return out


def convert_audattnet(sd: dict) -> dict:
    """AudioAttNet (headnerf.py:284-314) → audattnet pytree."""
    out: dict[str, Any] = {}
    for j, idx in enumerate((0, 2, 4, 6, 8)):
        out[f"conv{j}"] = {
            "weight": np.transpose(
                _np(sd[f"attentionConvNet.{idx}.weight"]), (2, 1, 0)),
            "bias": _np(sd[f"attentionConvNet.{idx}.bias"])}
    out["att_fc"] = {"weight": _np(sd["attentionNet.0.weight"]),
                     "bias": _np(sd["attentionNet.0.bias"])}
    return out


def convert_avatar_checkpoint(ckpt: dict, head: str) -> dict:
    """{"gen": sd, ...} → hfa_gp_tpu avatar params pytree."""
    sd = {k: np.asarray(v) for k, v in ckpt["gen"].items()}
    params: dict[str, Any] = {
        "subspace": {"bases": _np(sd["bases"]).reshape(
            sd["bases"].shape[0], -1),
            "delta": _np(sd["delta"]).reshape(-1)},
        "generator": convert_generator(_sub_sd(sd, "generator.")),
    }
    if "bases_2" in sd or "delta_2" in sd:
        sub2 = {}
        if "bases_2" in sd:
            sub2["bases"] = _np(sd["bases_2"]).reshape(
                sd["bases_2"].shape[0], -1)
        sub2["delta"] = _np(sd["delta_2"]).reshape(-1)
        params["subspace_2"] = sub2

    has_enc = any(k.startswith("encoder.") for k in sd)
    has_mlp = any(k.startswith("weights_3dmm.") for k in sd)
    if head == "rgb" and not has_enc:
        raise SystemExit("checkpoint has no encoder.* keys — this is a "
                         "3DMM/audio checkpoint; use --head 3dmm or audio")
    if head in ("3dmm", "audio") and not has_mlp:
        raise SystemExit("checkpoint has no weights_3dmm.* keys — this is "
                         "an RGB checkpoint; use --head rgb")
    if head == "rgb":
        params["encoder"] = convert_encoder(_sub_sd(sd, "encoder."))
        tree = params
    elif head == "3dmm":
        params["weights_mlp"] = convert_linear_stack(
            _sub_sd(sd, "weights_3dmm."), "fc.")
        tree = params
    elif head == "audio":
        params["weights_mlp"] = convert_linear_stack(
            _sub_sd(sd, "weights_3dmm."), "fc.")
        tree = {"model": params,
                "audnet": convert_audnet(
                    {k: np.asarray(v) for k, v in ckpt["AudNet"].items()}),
                "audattnet": convert_audattnet(
                    {k: np.asarray(v)
                     for k, v in ckpt["AudAttNet"].items()})}
    else:
        raise ValueError(f"head must be rgb/3dmm/audio, got {head!r}")
    return tree


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference .pt checkpoint")
    ap.add_argument("--head", choices=("rgb", "3dmm", "audio"),
                    default="rgb")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch
    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    ckpt = {k: ({kk: vv.numpy() if hasattr(vv, "numpy") else vv
                 for kk, vv in v.items()} if isinstance(v, dict) else v)
            for k, v in ckpt.items()}
    tree = convert_avatar_checkpoint(ckpt, args.head)
    pytree_io.save_npz(tree, args.out)
    if "args" in ckpt:
        meta = {k: repr(v) for k, v in vars(ckpt["args"]).items()} \
            if hasattr(ckpt["args"], "__dict__") else repr(ckpt["args"])
        with open(args.out + ".args.json", "w") as f:
            json.dump(meta, f, indent=2)
    import jax
    n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
    print(f"wrote {args.out} ({n:,} parameters, head={args.head})")


if __name__ == "__main__":
    main()
