"""IJB-B / IJB-C template-based evaluation CLI.

Rebuilds the reference's `arcface_torch/eval_ijbc.py` (483 LoC) as a
runnable protocol evaluator around `models/arcface/ijb.py`:

  * meta inputs are the insightface layout under `--image_path`
    (eval_ijbc.py:320-360): `meta/{target}_face_tid_mid.txt`
    (name tid mid), `meta/{target}_template_pair_label.txt`
    (tid1 tid2 label), `meta/{target}_name_5pts_score.txt`
    (name, 10 landmark floats, faceness score), images in `loose_crop/`;
  * per-image 5-point ArcFace alignment (the reference's skimage
    SimilarityTransform + cv2.warpAffine, eval_ijbc.py:64-100) runs as
    ONE jitted batch program on device: umeyama solve → bilinear
    `warp_affine` → normalize → backbone, with the horizontal-flip test
    fused into the same batch (images are padded host-side onto a fixed
    canvas so every batch is a static shape);
  * flip-test "add" mode, norm-score and detector-score switches
    (eval_ijbc.py:47-49,388-410 TestMode N1/D1/F2 defaults);
  * media→template pooling + cosine pair scores + TAR@FAR readout
    (image2template_feature / verification / the ROC table at the foot
    of eval_ijbc.py);
  * optional 1:N closed-set identification when
    `meta/{target}_1N_gallery.txt` + `meta/{target}_1N_probe.txt`
    (lines: `template_id subject_id`) are present.

Outputs `{result_dir}/{job}_scores.npy` + `{job}_metrics.json` and
prints the TAR@FAR table.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.arcface import ijb, registry
from ..preprocess.warp import ARCFACE_5PTS, umeyama_similarity, warp_affine
from ..utils import pytree_io


def read_meta(image_path: str, target: str):
    """The three meta files → (names, tids, mids), (pairs, labels),
    (names2, landmarks (N,5,2), faceness (N,))."""
    meta = os.path.join(image_path, "meta")
    tl = target.lower()
    tm = np.loadtxt(os.path.join(meta, f"{tl}_face_tid_mid.txt"),
                    dtype=str, ndmin=2)
    names, tids, mids = (tm[:, 0], tm[:, 1].astype(np.int64),
                         tm[:, 2].astype(np.int64))
    pr = np.loadtxt(os.path.join(meta, f"{tl}_template_pair_label.txt"),
                    dtype=np.int64, ndmin=2)
    pairs, labels = pr[:, :2], pr[:, 2]
    ln = np.loadtxt(os.path.join(meta, f"{tl}_name_5pts_score.txt"),
                    dtype=str, ndmin=2)
    lm = ln[:, 1:11].astype(np.float32).reshape(-1, 5, 2)
    faceness = ln[:, 11].astype(np.float32)
    return (names, tids, mids), (pairs, labels), (ln[:, 0], lm, faceness)


def _load_canvas(path: str, canvas: int):
    """Image → uint8 (canvas, canvas, 3) top-left placement + the
    scale applied (landmarks must be multiplied by it)."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = 1.0
    if max(w, h) > canvas:
        scale = canvas / max(w, h)
        img = img.resize((max(int(w * scale), 1), max(int(h * scale), 1)),
                         Image.BILINEAR)
        w, h = img.size
    out = np.zeros((canvas, canvas, 3), np.uint8)
    out[:h, :w] = np.asarray(img, np.uint8)
    return out, scale


def make_embedder(network: str, params, stats, flip: bool):
    """One jitted program: (B,canvas,canvas,3) uint8 + (B,5,2) raster
    landmarks → (B, 2D) [embedding ‖ flipped-embedding]. The alignment
    matrix maps source→112² (umeyama on raw raster coords — IJB
    landmarks are already y-down, unlike estimate_norm's recon
    convention)."""
    dst = jnp.asarray(ARCFACE_5PTS)

    @jax.jit
    def run(imgs_u8, lm5):
        m = umeyama_similarity(lm5, jnp.broadcast_to(
            dst, lm5.shape[:-2] + (5, 2)))
        x = warp_affine(imgs_u8.astype(jnp.float32), m, 112)
        x = (x / 255.0 - 0.5) / 0.5
        e = registry.backbone_apply(network, params, stats, x,
                                    train=False)
        if flip:
            ef = registry.backbone_apply(network, params, stats,
                                         jnp.flip(x, axis=2), train=False)
        else:
            ef = jnp.zeros_like(e)
        return jnp.concatenate([e, ef], axis=-1)

    return run


def extract_features(args, names, lms, faceness) -> np.ndarray:
    """eval_ijbc.py get_image_feature: every listed crop → 2D-dim
    feature (embedding ‖ flip embedding), batched on device."""
    if args.weights:
        tree = pytree_io.load_npz(args.weights)
        params, stats = tree["params"], tree["batch_stats"]
    else:
        print(f"WARNING: no --weights — {args.network} runs with RANDOM "
              "weights (protocol smoke test only)")
        params, stats = registry.init_backbone(jax.random.PRNGKey(0),
                                               args.network)
    run = make_embedder(args.network, params, stats, not args.no_flip)

    n = len(names)
    feats = None
    img_dir = os.path.join(args.image_path, "loose_crop")
    for start in range(0, n, args.batch_size):
        idx = range(start, min(start + args.batch_size, n))
        imgs, lm = [], []
        for i in idx:
            arr, scale = _load_canvas(os.path.join(img_dir, names[i]),
                                      args.canvas)
            imgs.append(arr)
            lm.append(lms[i] * scale)
        pad = args.batch_size - len(imgs)      # static batch for jit
        if pad:
            imgs += [imgs[-1]] * pad
            lm += [lm[-1]] * pad
        out = np.asarray(run(jnp.asarray(np.stack(imgs)),
                             jnp.asarray(np.stack(lm), jnp.float32)))
        if feats is None:
            feats = np.empty((n, out.shape[1]), np.float32)
        feats[start:start + len(idx)] = out[:len(idx)]
        if (start // args.batch_size) % 50 == 0:
            print(f"embedded {start + len(idx)}/{n}", flush=True)

    d = feats.shape[1] // 2
    if args.no_flip:
        feats = feats[:, :d]
    else:
        feats = feats[:, :d] + feats[:, d:]          # F2 "add" mode
    if not args.no_norm_score:
        pass                                          # N1: keep norms
    else:
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=1, keepdims=True), 1e-10)
    if not args.no_detector_score:                    # D1
        feats = feats * faceness[:, None]
    return feats


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="IJB-B/C evaluation")
    p.add_argument("--image_path", type=str, required=True,
                   help="root with meta/ and loose_crop/")
    p.add_argument("--target", type=str, default="IJBC",
                   choices=["IJBC", "IJBB"])
    p.add_argument("--network", type=str, default="iresnet50")
    p.add_argument("--weights", type=str, default=None,
                   help="npz params (pytree_io) for the backbone")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--canvas", type=int, default=256,
                   help="static host-side canvas the loose crops are "
                        "padded onto before the on-device align+embed")
    p.add_argument("--result_dir", type=str, default=None)
    p.add_argument("--job", type=str, default="hfa_gp_tpu")
    p.add_argument("--no_flip", action="store_true",
                   help="disable the horizontal-flip test (F2 off)")
    p.add_argument("--no_norm_score", action="store_true",
                   help="unit-normalize features (N1 off)")
    p.add_argument("--no_detector_score", action="store_true",
                   help="don't weight by faceness (D1 off)")
    return p


def main(args) -> dict:
    (names_t, tids, mids), (pairs, labels), (names_l, lms, faceness) = \
        read_meta(args.image_path, args.target)
    # tid/mid list and landmark list enumerate the same crops in the
    # same order (insightface guarantee); trust order, verify length
    assert len(names_t) == len(names_l), "meta file length mismatch"

    feats = extract_features(args, names_l, lms, faceness)

    templates, uniq = ijb.pool_templates(feats, tids, mids)
    scores = ijb.verification_scores(templates, uniq, pairs)
    tar = ijb.tar_at_far(scores, labels)

    print(f"{args.target} 1:1 verification ({args.job}, "
          f"{len(scores)} pairs)")
    print("  " + " | ".join(f"1e{int(np.log10(f)):+d}"
                            for f in sorted(tar)))
    print("  " + " | ".join(f"{100 * tar[f]:6.2f}" for f in sorted(tar)))

    metrics = {"tar_at_far": {f"{f:.0e}": v for f, v in tar.items()}}

    meta = os.path.join(args.image_path, "meta")
    tl = args.target.lower()
    gal_p = os.path.join(meta, f"{tl}_1N_gallery.txt")
    prb_p = os.path.join(meta, f"{tl}_1N_probe.txt")
    if os.path.exists(gal_p) and os.path.exists(prb_p):
        row = {int(t): i for i, t in enumerate(uniq)}
        gal = np.loadtxt(gal_p, dtype=np.int64, ndmin=2)
        prb = np.loadtxt(prb_p, dtype=np.int64, ndmin=2)
        g = templates[[row[int(t)] for t in gal[:, 0]]]
        p = templates[[row[int(t)] for t in prb[:, 0]]]
        ranks = ijb.rank_k_identification(p, g, prb[:, 1], gal[:, 1])
        print("  1:N rank-k: " + "  ".join(
            f"R{k}={100 * v:.2f}" for k, v in ranks.items()))
        metrics["rank_k"] = {str(k): v for k, v in ranks.items()}

    if args.result_dir:
        os.makedirs(args.result_dir, exist_ok=True)
        np.save(os.path.join(args.result_dir,
                             f"{args.job}_scores.npy"), scores)
        with open(os.path.join(args.result_dir,
                               f"{args.job}_metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics


if __name__ == "__main__":
    main(build_argparser().parse_args())
