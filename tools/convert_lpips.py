"""Converter: torch LPIPS(alex) weights → hfa_gp_tpu npz pytree.

Usage:
    python tools/convert_lpips.py <lpips_state_dict.pt|auto> out.npz

With 'auto', tries to build the state dict from an installed `lpips`
package (requires its downloaded weights). Input layout (lpips package):
    net.slice{1..5}.<idx>.weight/bias   — AlexNet convs (OIHW)
    lin{0..4}.model.1.weight            — (1, C, 1, 1) heads
Output matches models/lpips.init_lpips: conv{i} (HWIO) + lin{i} (C,).
"""

from __future__ import annotations

import sys

import numpy as np


def convert(sd: dict) -> dict:
    import torch
    tree: dict = {}
    convs = {}
    lins = {}
    for k, v in sd.items():
        v = v.detach().cpu().numpy() if isinstance(v, torch.Tensor) \
            else np.asarray(v)
        if ".features." in k or ".slice" in k:
            convs[k] = v
        elif k.startswith("lin"):
            lins[k] = v
    # AlexNet conv layers appear in order; sort by the numeric indices
    conv_ws = sorted((k for k in convs if k.endswith("weight")),
                     key=lambda k: [int(t) for t in
                                    __import__("re").findall(r"\d+", k)])
    for i, wk in enumerate(conv_ws):
        bk = wk[:-6] + "bias"
        tree[f"conv{i}"] = {
            "weight": np.ascontiguousarray(
                convs[wk].transpose(2, 3, 1, 0)),
            "bias": convs[bk]}
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in lins:
                tree[f"lin{i}"] = {"weight": lins[cand].reshape(-1)}
                break
    assert all(f"conv{i}" in tree and f"lin{i}" in tree for i in range(5)), \
        sorted(tree)
    return tree


def main(src: str, out_path: str) -> None:
    import torch
    sys.path.insert(0, ".")
    from hfa_gp_tpu.utils import pytree_io
    if src == "auto":
        import lpips
        sd = lpips.LPIPS(net="alex").state_dict()
    else:
        sd = torch.load(src, map_location="cpu")
    tree = convert(sd)
    pytree_io.save_npz(tree, out_path)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
