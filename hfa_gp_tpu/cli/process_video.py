"""Preprocessing CLI (reference eg3d-pose-detection/process_test_video.py).

One in-process batched pipeline instead of the reference's six
`os.system("python3.6 ...")` subprocesses. Weight npz files for MTCNN /
the face-recon net come from tools/convert_* converters; without them the
pipeline runs with random weights (structure/contract testing only).
"""

from __future__ import annotations

import argparse
import sys

import jax

from ..preprocess import pipeline
from ..utils import pytree_io


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--in_root", type=str, required=True,
                   help="directory of frames")
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--mtcnn_weights", type=str, default=None)
    p.add_argument("--recon_weights", type=str, default=None)
    p.add_argument("--use_existing_detections", action="store_true",
                   default=False,
                   help="skip MTCNN; read {in_root}/detections/*.txt")
    p.add_argument("--smooth_sigma", type=float, default=2.0)
    p.add_argument("--batch_size", type=int, default=16)
    return p


def main(args) -> None:
    cfg = pipeline.PipelineConfig(smooth_sigma=args.smooth_sigma,
                                  batch_size=args.batch_size)
    mtcnn_params = (pytree_io.load_npz(args.mtcnn_weights)
                    if args.mtcnn_weights else None)
    recon_params = (pytree_io.load_npz(args.recon_weights)
                    if args.recon_weights else None)
    if mtcnn_params is None and not args.use_existing_detections:
        print("=" * 70 + "\nWARNING: no --mtcnn_weights — face detection "
              "runs with RANDOM weights.\nDetections/crops will be garbage "
              "on real video. Convert pretrained\nweights with "
              "tools/convert_mtcnn.py first.\n" + "=" * 70,
              file=sys.stderr)
    if recon_params is None:
        print("=" * 70 + "\nWARNING: no --recon_weights — the 3D face "
              "reconstruction net runs with\nRANDOM weights; extracted "
              "poses will be garbage on real video. Convert\nthe "
              "Deep3DFaceRecon epoch-20 checkpoint with "
              "tools/convert_facerecon.py.\n" + "=" * 70, file=sys.stderr)
    landmarks = None
    if args.use_existing_detections:
        import os
        landmarks = pipeline.load_detections(
            os.path.join(args.in_root, "detections"))
        landmarks = pipeline.smooth_landmarks(landmarks, cfg)
    out = pipeline.process_video(args.in_root, args.out_dir, cfg,
                                 mtcnn_params, recon_params, landmarks)
    print(f"==> wrote {out}")


if __name__ == "__main__":
    main(build_argparser().parse_args())
