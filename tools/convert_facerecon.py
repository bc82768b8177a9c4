"""Converter: Deep3DFaceRecon epoch-20 checkpoint → facerecon npz.

Usage:
    python tools/convert_facerecon.py epoch_20.pth facerecon.npz

Input: the torch checkpoint consumed by the reference's FaceReconModel
(eg3d-pose-detection/models/facerecon_model.py, `net_recon` state dict —
torchvision-style resnet50 under `backbone.` + seven conv1x1 coefficient
heads under `final_layers.`). Output: the params pytree of
hfa_gp_tpu.preprocess.facerecon (NHWC/HWIO).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

_LAYERS = (3, 4, 6, 3)


def _hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _bn(sd: dict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"]}


def convert(sd: dict) -> dict:
    """Flat torch state dict (numpy values) → facerecon params tree."""
    # accept either raw net_recon dicts or wrapped checkpoints
    for wrap in ("net_recon", "state_dict", "model"):
        if wrap in sd and isinstance(sd[wrap], dict):
            sd = sd[wrap]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    def pick(name):
        for cand in (name, f"backbone.{name}"):
            if cand in sd:
                return cand
        raise KeyError(name)

    tree: dict = {
        "stem_conv": _hwio(sd[pick("conv1.weight")]),
        "stem_bn": _bn(sd, pick("bn1.weight").rsplit(".", 1)[0]),
    }
    for stage, blocks in enumerate(_LAYERS):
        for i in range(blocks):
            pre = pick(f"layer{stage + 1}.{i}.conv1.weight") \
                .rsplit(".conv1.weight", 1)[0]
            blk = {
                "conv1": _hwio(sd[f"{pre}.conv1.weight"]),
                "bn1": _bn(sd, f"{pre}.bn1"),
                "conv2": _hwio(sd[f"{pre}.conv2.weight"]),
                "bn2": _bn(sd, f"{pre}.bn2"),
                "conv3": _hwio(sd[f"{pre}.conv3.weight"]),
                "bn3": _bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_conv"] = _hwio(sd[f"{pre}.downsample.0.weight"])
                blk["down_bn"] = _bn(sd, f"{pre}.downsample.1")
            tree[f"s{stage}_b{i}"] = blk
    for i in range(7):
        pre = pick(f"final_layers.{i}.weight").rsplit(".weight", 1)[0]
        tree[f"head{i}"] = {"weight": _hwio(sd[f"{pre}.weight"]),
                            "bias": sd[f"{pre}.bias"]}
    return tree


def main(src: str, out_path: str) -> None:
    import torch

    from hfa_gp_tpu.utils import pytree_io
    raw = torch.load(src, map_location="cpu")
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in (raw.items() if isinstance(raw, dict) else raw)}

    def to_np(d):
        return {k: to_np(v) if isinstance(v, dict)
                else (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
                for k, v in d.items()}

    tree = convert(to_np(sd) if isinstance(sd, dict) else sd)
    pytree_io.save_npz(tree, out_path)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
