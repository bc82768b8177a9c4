"""Convert pretrained MTCNN cascade weights to the hfa_gp_tpu npz layout.

The reference pipeline detects faces with the pip `mtcnn` package
(eg3d-pose-detection/batch_mtcnn.py:4,9). This tool converts the two
widely-mirrored pretrained-weight distributions of the same original
Matlab/Caffe model into the pytree consumed by
`hfa_gp_tpu.preprocess.mtcnn`:

1. **facenet-pytorch layout** (pnet.pt / rnet.pt / onet.pt state dicts,
   keys like `conv1.weight`, `prelu1.weight`, `dense5_1.weight`):
       python tools/convert_mtcnn.py --pnet pnet.pt --rnet rnet.pt \
           --onet onet.pt --out mtcnn.npz
   This mapping is exact: tests/test_convert.py checks our JAX cascade
   against a clean-room torch implementation of the facenet-pytorch
   architecture on random weights (NCHW→HWIO conv transpose, the
   permute(0,3,2,1)-before-flatten FC ordering, PReLU slopes).

2. **David Sandberg TF layout** (det1.npy / det2.npy / det3.npy,
   dict-of-layers with 'weights'/'biases'/'alpha'):
       python tools/convert_mtcnn.py --det_dir path/with/det1..3.npy \
           --out mtcnn.npz [--no-transpose]
   Sandberg's runtime feeds TRANSPOSED images (detect_face.py's
   `np.transpose(img, (1,0,2))` Matlab legacy); `--transpose` (default)
   bakes that protocol into the weights — H/W-transposed conv kernels,
   FC spatial reordering, swapped reg pairs and landmark halves — so the
   converted net runs on normally-oriented images. The baking identity
   is tested on random weights (tests/test_convert.py).

Validation against a real face image requires the weight assets, which
are not in this environment — the mapping is proven at net level
(format 1) and identity level (format 2) instead.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hfa_gp_tpu.utils import pytree_io  # noqa: E402


def _conv_from_torch(w: np.ndarray, b: np.ndarray,
                     alpha: np.ndarray | None) -> dict:
    """torch Conv2d (out,in,kh,kw) → HWIO."""
    p = {"weight": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
         "bias": b.astype(np.float32)}
    if alpha is not None:
        p["prelu"] = alpha.reshape(-1).astype(np.float32)
    return p


def _fc_from_torch(w: np.ndarray, b: np.ndarray, spatial: tuple[int, int],
                   channels: int, alpha: np.ndarray | None = None) -> dict:
    """torch Linear whose input was flattened from a (N, W, H, C) permute
    (facenet-pytorch's x.permute(0,3,2,1) before .view — the Matlab
    flatten order) → our (H, W, C) flatten order."""
    out_dim = w.shape[0]
    wd, ht = spatial
    w4 = w.reshape(out_dim, wd, ht, channels)
    w4 = np.transpose(w4, (0, 2, 1, 3))          # (out, H, W, C)
    p = {"weight": w4.reshape(out_dim, -1).astype(np.float32),
         "bias": b.astype(np.float32)}
    if alpha is not None:
        p["prelu"] = alpha.reshape(-1).astype(np.float32)
    return p


def _fc_plain(w: np.ndarray, b: np.ndarray) -> dict:
    return {"weight": w.astype(np.float32), "bias": b.astype(np.float32)}


def convert_facenet_pytorch(pnet_sd: dict, rnet_sd: dict,
                            onet_sd: dict) -> dict:
    """facenet-pytorch state dicts → hfa_gp_tpu mtcnn params."""
    g = {k: np.asarray(v) for k, v in pnet_sd.items()}
    pnet = {
        "c1": _conv_from_torch(g["conv1.weight"], g["conv1.bias"],
                               g["prelu1.weight"]),
        "c2": _conv_from_torch(g["conv2.weight"], g["conv2.bias"],
                               g["prelu2.weight"]),
        "c3": _conv_from_torch(g["conv3.weight"], g["conv3.bias"],
                               g["prelu3.weight"]),
        "prob": {"weight": np.transpose(g["conv4_1.weight"],
                                        (2, 3, 1, 0)).astype(np.float32),
                 "bias": g["conv4_1.bias"].astype(np.float32)},
        "reg": {"weight": np.transpose(g["conv4_2.weight"],
                                       (2, 3, 1, 0)).astype(np.float32),
                "bias": g["conv4_2.bias"].astype(np.float32)},
    }
    g = {k: np.asarray(v) for k, v in rnet_sd.items()}
    rnet = {
        "c1": _conv_from_torch(g["conv1.weight"], g["conv1.bias"],
                               g["prelu1.weight"]),
        "c2": _conv_from_torch(g["conv2.weight"], g["conv2.bias"],
                               g["prelu2.weight"]),
        "c3": _conv_from_torch(g["conv3.weight"], g["conv3.bias"],
                               g["prelu3.weight"]),
        "fc": _fc_from_torch(g["dense4.weight"], g["dense4.bias"],
                             (3, 3), 64, g["prelu4.weight"]),
        "prob": _fc_plain(g["dense5_1.weight"], g["dense5_1.bias"]),
        "reg": _fc_plain(g["dense5_2.weight"], g["dense5_2.bias"]),
    }
    g = {k: np.asarray(v) for k, v in onet_sd.items()}
    onet = {
        "c1": _conv_from_torch(g["conv1.weight"], g["conv1.bias"],
                               g["prelu1.weight"]),
        "c2": _conv_from_torch(g["conv2.weight"], g["conv2.bias"],
                               g["prelu2.weight"]),
        "c3": _conv_from_torch(g["conv3.weight"], g["conv3.bias"],
                               g["prelu3.weight"]),
        "c4": _conv_from_torch(g["conv4.weight"], g["conv4.bias"],
                               g["prelu4.weight"]),
        "fc": _fc_from_torch(g["dense5.weight"], g["dense5.bias"],
                             (3, 3), 128, g["prelu5.weight"]),
        "prob": _fc_plain(g["dense6_1.weight"], g["dense6_1.bias"]),
        "reg": _fc_plain(g["dense6_2.weight"], g["dense6_2.bias"]),
        "lmk": _fc_plain(g["dense6_3.weight"], g["dense6_3.bias"]),
    }
    return {"pnet": pnet, "rnet": rnet, "onet": onet}


# ---------------------------------------------------------------------------
# Transposed-protocol baking (Sandberg det*.npy)
# ---------------------------------------------------------------------------


def _swap_reg(p: dict) -> dict:
    """(dx1,dy1,dx2,dy2) ↔ (dy1,dx1,dy2,dx2) on the last weight axis
    (conv head: out channels; fc head: out rows)."""
    perm = np.array([1, 0, 3, 2])
    w = p["weight"]
    if w.ndim == 4:                                   # conv head (HWIO)
        return {"weight": w[..., perm], "bias": p["bias"][perm]}
    return {"weight": w[perm], "bias": p["bias"][perm]}


def _swap_lmk(p: dict) -> dict:
    """Matlab layout (5×x then 5×y) → swap halves when x/y transpose."""
    perm = np.concatenate([np.arange(5, 10), np.arange(5)])
    return {"weight": p["weight"][perm], "bias": p["bias"][perm]}


def _t_conv(p: dict) -> dict:
    out = dict(p)
    out["weight"] = np.transpose(p["weight"], (1, 0, 2, 3))   # swap H/W
    return out


def _t_fc(p: dict, spatial: tuple[int, int], channels: int) -> dict:
    h, w = spatial
    out = dict(p)
    w4 = p["weight"].reshape(-1, h, w, channels)
    out["weight"] = np.transpose(w4, (0, 2, 1, 3)).reshape(
        p["weight"].shape)
    return out


def bake_transpose(params: dict) -> dict:
    """Make net(x) on normal images equal the original net on transposed
    images (with outputs mapped back): transpose every conv kernel's H/W,
    swap the FC flatten's spatial order, swap reg pairs and landmark
    halves. Identity-tested in tests/test_convert.py."""
    pn, rn, on = params["pnet"], params["rnet"], params["onet"]
    pnet = {"c1": _t_conv(pn["c1"]), "c2": _t_conv(pn["c2"]),
            "c3": _t_conv(pn["c3"]),
            "prob": {"weight": np.transpose(pn["prob"]["weight"],
                                            (1, 0, 2, 3)),
                     "bias": pn["prob"]["bias"]},
            "reg": _swap_reg({"weight": np.transpose(
                pn["reg"]["weight"], (1, 0, 2, 3)),
                "bias": pn["reg"]["bias"]})}
    rnet = {"c1": _t_conv(rn["c1"]), "c2": _t_conv(rn["c2"]),
            "c3": _t_conv(rn["c3"]),
            "fc": _t_fc(rn["fc"], (3, 3), 64),
            "prob": rn["prob"], "reg": _swap_reg(rn["reg"])}
    onet = {"c1": _t_conv(on["c1"]), "c2": _t_conv(on["c2"]),
            "c3": _t_conv(on["c3"]), "c4": _t_conv(on["c4"]),
            "fc": _t_fc(on["fc"], (3, 3), 128),
            "prob": on["prob"], "reg": _swap_reg(on["reg"]),
            "lmk": _swap_lmk(on["lmk"])}
    return {"pnet": pnet, "rnet": rnet, "onet": onet}


def convert_sandberg(det_dir: str, transpose: bool = True) -> dict:
    """det1/det2/det3.npy (TF, dict layer → {'weights','biases','alpha'})
    → hfa_gp_tpu params. TF conv kernels are already HWIO; fc matrices
    are (in, out)."""
    def load(name):
        d = np.load(os.path.join(det_dir, name),
                    allow_pickle=True, encoding="latin1").item()
        # layer names vary in case across mirrors (PReLU1 vs prelu1)
        return {k.lower(): {kk: np.asarray(vv) for kk, vv in v.items()}
                for k, v in d.items()}

    def conv(d, cname, pname=None):
        p = {"weight": d[cname]["weights"].astype(np.float32),
             "bias": d[cname]["biases"].astype(np.float32)}
        if pname is not None:
            p["prelu"] = d[pname]["alpha"].reshape(-1).astype(np.float32)
        return p

    def fc(d, cname, pname=None):
        p = {"weight": d[cname]["weights"].T.astype(np.float32),
             "bias": d[cname]["biases"].astype(np.float32)}
        if pname is not None:
            p["prelu"] = d[pname]["alpha"].reshape(-1).astype(np.float32)
        return p

    d1, d2, d3 = load("det1.npy"), load("det2.npy"), load("det3.npy")
    params = {
        "pnet": {"c1": conv(d1, "conv1", "prelu1"),
                 "c2": conv(d1, "conv2", "prelu2"),
                 "c3": conv(d1, "conv3", "prelu3"),
                 "prob": {"weight": d1["conv4-1"]["weights"].astype(
                     np.float32), "bias": d1["conv4-1"]["biases"].astype(
                     np.float32)},
                 "reg": {"weight": d1["conv4-2"]["weights"].astype(
                     np.float32), "bias": d1["conv4-2"]["biases"].astype(
                     np.float32)}},
        "rnet": {"c1": conv(d2, "conv1", "prelu1"),
                 "c2": conv(d2, "conv2", "prelu2"),
                 "c3": conv(d2, "conv3", "prelu3"),
                 "fc": fc(d2, "conv4", "prelu4"),
                 "prob": fc(d2, "conv5-1"),
                 "reg": fc(d2, "conv5-2")},
        "onet": {"c1": conv(d3, "conv1", "prelu1"),
                 "c2": conv(d3, "conv2", "prelu2"),
                 "c3": conv(d3, "conv3", "prelu3"),
                 "c4": conv(d3, "conv4", "prelu4"),
                 "fc": fc(d3, "conv5", "prelu5"),
                 "prob": fc(d3, "conv6-1"),
                 "reg": fc(d3, "conv6-2"),
                 "lmk": fc(d3, "conv6-3")},
    }
    return bake_transpose(params) if transpose else params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pnet"), ap.add_argument("--rnet")
    ap.add_argument("--onet")
    ap.add_argument("--det_dir", help="directory with det1/2/3.npy")
    ap.add_argument("--no-transpose", dest="transpose",
                    action="store_false", default=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    if args.det_dir:
        params = convert_sandberg(args.det_dir, args.transpose)
    elif args.pnet and args.rnet and args.onet:
        import torch
        sds = [torch.load(p, map_location="cpu", weights_only=True)
               for p in (args.pnet, args.rnet, args.onet)]
        sds = [{k: v.numpy() for k, v in sd.items()} for sd in sds]
        params = convert_facenet_pytorch(*sds)
    else:
        ap.error("need --det_dir or all of --pnet/--rnet/--onet")

    pytree_io.save_npz(params, args.out)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {args.out} ({n:,} parameters)")


if __name__ == "__main__":
    main()
