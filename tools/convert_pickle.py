"""One-time converter: EG3D torch pickle → hfa_gp_tpu npz pytree.

Usage:
    python tools/convert_pickle.py ffhqrebalanced512-128.pkl out.npz

The reference loads this pickle via NVIDIA's `legacy`/`dnnlib`
(reference code/networks/headnerf.py:31-38). Those repos are NOT required
here: NVIDIA's `torch_utils.persistence` pickles each network as
`_reconstruct_persistent_obj(meta)` where `meta['state']` carries the
plain state dict. We stub every dnnlib/torch_utils class with a dict
capture, harvest `G_ema`'s tensors, and emit the npz that
cli/common.load_generator_weights consumes.

Layout / dtype transforms (torch NCHW → JAX NHWC):
  * conv weights  OIHW → HWIO
  * up-conv (conv0 of upsampling blocks): additionally flipped spatially —
    our up path is zero-stuff+correlation, i.e. conv_transpose with a
    spatially flipped kernel.
  * const input   (C, H, W) → (H, W, C)
  * linear / affine weights keep torch (out, in) layout.

Runs on CPU torch only (weight extraction, no CUDA ops executed).
"""

from __future__ import annotations

import io
import pickle
import re
import sys
import types
from typing import Any

import numpy as np


class _Captured(dict):
    """Stand-in for any persisted NVIDIA object: keeps the pickled state."""

    def __init__(self, *a, **kw):
        super().__init__()

    def __setstate__(self, state):
        self.update(state if isinstance(state, dict) else {"state": state})


def _reconstruct_persistent_obj(meta) -> _Captured:
    obj = _Captured()
    obj.update(meta if isinstance(meta, dict) else {"meta": meta})
    return obj


class _StubUnpickler(pickle.Unpickler):
    _OURS = re.compile(r"^(dnnlib|torch_utils|training|legacy)")

    def find_class(self, module: str, name: str):
        if self._OURS.match(module):
            if name == "_reconstruct_persistent_obj":
                return _reconstruct_persistent_obj
            return _Captured
        return super().find_class(module, name)


def load_pickle_states(path: str) -> dict[str, Any]:
    import torch  # noqa: F401  (registers tensor reconstructors)
    with open(path, "rb") as f:
        data = _StubUnpickler(f).load()
    return data


def _state_dict(obj) -> dict[str, np.ndarray]:
    """Extract a flat name→ndarray dict from a captured persistent obj."""
    import torch
    out = {}

    def walk(node, prefix=""):
        if isinstance(node, torch.Tensor):
            out[prefix.rstrip(".")] = node.detach().cpu().numpy()
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}{k}.")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}{i}.")

    walk(obj)
    # persistence state dicts nest under 'state'; strip that prefix
    cleaned = {}
    for k, v in out.items():
        k = re.sub(r"^(state\.)+", "", k)
        cleaned[k] = v
    return cleaned


def _conv_hwio(w: np.ndarray, flip: bool = False) -> np.ndarray:
    w = w.transpose(2, 3, 1, 0)          # OIHW → HWIO
    if flip:
        w = w[::-1, ::-1]
    return np.ascontiguousarray(w)


def convert_generator(sd: dict[str, np.ndarray]) -> dict:
    """torch G_ema state dict → hfa_gp_tpu EG3D params pytree."""
    tree: dict[str, Any] = {"mapping": {}, "backbone": {}, "decoder": {},
                            "superresolution": {}}

    def put(dst: dict, path: list[str], val: np.ndarray):
        for p in path[:-1]:
            dst = dst.setdefault(p, {})
        dst[path[-1]] = val

    def convert_block(src_prefix: str, dst: dict, *, up: bool):
        for conv in ("conv0", "conv1"):
            if f"{src_prefix}.{conv}.weight" not in sd:
                continue
            flip = up and conv == "conv0"
            put(dst, [conv, "weight"],
                _conv_hwio(sd[f"{src_prefix}.{conv}.weight"], flip=flip))
            put(dst, [conv, "bias"], sd[f"{src_prefix}.{conv}.bias"])
            put(dst, [conv, "affine", "weight"],
                sd[f"{src_prefix}.{conv}.affine.weight"])
            put(dst, [conv, "affine", "bias"],
                sd[f"{src_prefix}.{conv}.affine.bias"])
            ns = f"{src_prefix}.{conv}.noise_strength"
            if ns in sd:
                put(dst, [conv, "noise_strength"], sd[ns])
                put(dst, [conv, "noise_const"],
                    sd[f"{src_prefix}.{conv}.noise_const"])
        if f"{src_prefix}.const" in sd:
            dst["const"] = np.ascontiguousarray(
                sd[f"{src_prefix}.const"].transpose(1, 2, 0))
        t = f"{src_prefix}.torgb"
        if f"{t}.weight" in sd:
            put(dst, ["torgb", "weight"], _conv_hwio(sd[f"{t}.weight"]))
            put(dst, ["torgb", "bias"], sd[f"{t}.bias"])
            put(dst, ["torgb", "affine", "weight"],
                sd[f"{t}.affine.weight"])
            put(dst, ["torgb", "affine", "bias"], sd[f"{t}.affine.bias"])

    # mapping
    for k, v in sd.items():
        m = re.fullmatch(r"backbone\.mapping\.(fc\d+)\.(weight|bias)", k)
        if m:
            put(tree["mapping"], [m.group(1), m.group(2)], v)
    if "backbone.mapping.embed.weight" in sd:
        tree["mapping"]["embed"] = {
            "weight": sd["backbone.mapping.embed.weight"],
            "bias": sd["backbone.mapping.embed.bias"]}
    if "backbone.mapping.w_avg" in sd:
        tree["mapping"]["w_avg"] = sd["backbone.mapping.w_avg"]

    # synthesis blocks
    resolutions = sorted({int(m.group(1)) for k in sd
                          for m in [re.match(
                              r"backbone\.synthesis\.b(\d+)\.", k)] if m})
    for res in resolutions:
        dst = tree["backbone"].setdefault(f"b{res}", {})
        convert_block(f"backbone.synthesis.b{res}", dst, up=(res != 4))

    # OSG decoder (net.0 / net.2 around the softplus)
    tree["decoder"]["fc0"] = {"weight": sd["decoder.net.0.weight"],
                              "bias": sd["decoder.net.0.bias"]}
    tree["decoder"]["fc1"] = {"weight": sd["decoder.net.2.weight"],
                              "bias": sd["decoder.net.2.bias"]}

    # superresolution blocks
    for blk in ("block0", "block1"):
        dst = tree["superresolution"].setdefault(blk, {})
        convert_block(f"superresolution.{blk}", dst, up=True)
    return tree


def main(pkl_path: str, out_path: str) -> None:
    sys.path.insert(0, ".")
    from hfa_gp_tpu.utils import pytree_io

    data = load_pickle_states(pkl_path)
    g_ema = data.get("G_ema", data)
    sd = _state_dict(g_ema)
    print(f"extracted {len(sd)} tensors")
    tree = convert_generator(sd)
    pytree_io.save_npz(tree, out_path)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
