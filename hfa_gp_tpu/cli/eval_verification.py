"""Face-verification evaluation CLI.

Covers the reference's offline/in-training eval surface
(arcface_torch/eval/verification.py + CallBackVerification): loads an
LFW-style .bin pair set (pickled (jpeg_bytes_list, issame_list) — read
with plain pickle + PIL, no mxnet needed), embeds with a chosen backbone
checkpoint, and reports K-fold accuracy / best threshold. `--synthetic`
runs the protocol end-to-end without data (two noisy views per id).
"""

from __future__ import annotations

import argparse
import io
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..models.arcface import registry
from ..models.arcface.verification import evaluate_pairs
from ..utils import pytree_io


def load_bin(path: str, size: int = 112):
    """LFW-style .bin → (images1, images2, issame). Images are float32
    NHWC in [-1, 1]."""
    from PIL import Image
    with open(path, "rb") as f:
        try:
            bins, issame = pickle.load(f)
        except UnicodeDecodeError:
            f.seek(0)
            bins, issame = pickle.load(f, encoding="bytes")
    imgs = []
    for b in bins:
        data = bytes(b) if not isinstance(b, bytes) else b
        img = Image.open(io.BytesIO(data)).convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        imgs.append((np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5)
    imgs = np.stack(imgs)
    return imgs[0::2], imgs[1::2], np.asarray(issame, bool)


def synthetic_pairs(n: int = 128, size: int = 112, seed: int = 0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, size, size, 3)).astype(np.float32)
    same = base + 0.05 * rng.standard_normal(base.shape).astype(np.float32)
    diff = rng.standard_normal(base.shape).astype(np.float32)
    img1 = np.concatenate([base, base])
    img2 = np.concatenate([same, diff])
    issame = np.concatenate([np.ones(n, bool), np.zeros(n, bool)])
    return img1, img2, issame


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--network", type=str, default="iresnet50")
    p.add_argument("--weights", type=str, default=None,
                   help="npz params (pytree_io) for the backbone")
    p.add_argument("--bin", type=str, default=None,
                   help="LFW-style .bin pair file")
    p.add_argument("--synthetic", action="store_true", default=False)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--pca", type=int, default=0,
                   help="per-fold PCA dims (reference verification.py:76)")
    p.add_argument("--roc_out", type=str, default=None,
                   help="write an ROC curve plot (png) here")
    return p


def main(args) -> tuple[float, float, float]:
    if args.weights:
        tree = pytree_io.load_npz(args.weights)
        params, stats = tree["params"], tree["batch_stats"]
    else:
        print(f"WARNING: no --weights given — evaluating {args.network} "
              "with RANDOM weights (protocol smoke test only)")
        params, stats = registry.init_backbone(jax.random.PRNGKey(0),
                                               args.network)
    embed = jax.jit(lambda x: registry.backbone_apply(
        args.network, params, stats, jnp.asarray(x)))

    if args.bin:
        img1, img2, issame = load_bin(args.bin)
    elif args.synthetic:
        img1, img2, issame = synthetic_pairs()
    else:
        raise SystemExit("need --bin or --synthetic")

    acc, std, thr = evaluate_pairs(embed, img1, img2, issame,
                                   batch_size=args.batch_size,
                                   pca=args.pca, roc_out=args.roc_out)
    print(f"accuracy {acc:.4f} ± {std:.4f} (threshold {thr:.3f}, "
          f"{len(issame)} pairs, {args.network}"
          + (f", pca {args.pca}" if args.pca else "") + ")")
    return acc, std, thr


if __name__ == "__main__":
    main(build_argparser().parse_args())
