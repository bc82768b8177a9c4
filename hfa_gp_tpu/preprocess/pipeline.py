"""End-to-end preprocessing pipeline.

Replaces the reference's 6-subprocess chain
(eg3d-pose-detection/process_test_video.py:17-65) with ONE in-process,
batched program:

  1. MTCNN detection        (batch_mtcnn.py)      → 5-pt landmarks
  2. temporal smoothing     (smooth.py, σ=2)
  3. 3DMM regression        (test.py + FaceReconModel) → 257 coeffs
  4. EG3D cropping          (crop_images.py)      → 512² crops
  5. pose → extrinsics      (3dface2idr.py)       → cameras.json
  6. label packing          (camera2label.py)     → test.json

The per-frame neural stages (MTCNN / ResNet-50) run as jitted batches;
the PIL resampling stages stay host-side for bit-parity with the
reference's crops.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from . import align as align_mod
from . import facerecon as recon_mod
from . import mtcnn as mtcnn_mod
from . import pose as pose_mod
from .bfm import split_coeff
from .smoothing import smooth_landmark_sequence

# Standard 5-point 3D landmarks of the BFM similarity transform (the
# `lm3d_std` recorded into cropping_params.json by the reference,
# test.py:70-87 / util.load_mats.load_lm3d). Users with BFM assets can
# override via PipelineConfig.lm3d_std.
DEFAULT_LM3D_STD = np.array([
    [-0.31148657, 0.09036078, 0.13377953],
    [0.30979887, 0.08972035, 0.13179526],
    [0.0032535, -0.24617933, 0.55244243],
    [-0.25216928, -0.5813392, 0.22405732],
    [0.2484662, -0.5812824, 0.22235769],
], dtype=np.float32)


@dataclass
class PipelineConfig:
    min_face_size: int = 20
    smooth_sigma: float = 2.0
    rescale_recon: float = align_mod.RESCALE_FACTOR_RECON   # 466.285
    rescale_crop: float = align_mod.RESCALE_FACTOR_CROP     # 300
    center_crop_size: int = align_mod.CENTER_CROP_SIZE      # 700
    output_size: int = align_mod.OUTPUT_SIZE                # 512
    batch_size: int = 16
    lm3d_std: np.ndarray = None

    def __post_init__(self):
        if self.lm3d_std is None:
            self.lm3d_std = DEFAULT_LM3D_STD


def detect_landmarks(mtcnn_params, frame_paths: list[str],
                     cfg: PipelineConfig,
                     out_dir: str | None = None) -> dict[str, np.ndarray]:
    """Stage 1: per-frame 5-point landmarks (+ optional detections/*.txt
    output matching batch_mtcnn.py:72-79)."""
    lms = {}
    for path in frame_paths:
        img = np.asarray(Image.open(path).convert("RGB"))
        results = mtcnn_mod.detect_faces(mtcnn_params, img,
                                         cfg.min_face_size)
        best = mtcnn_mod.select_face(results)
        if best is None:
            continue
        kp = best["keypoints"]
        lms[os.path.basename(path)] = np.array(
            [kp["left_eye"], kp["right_eye"], kp["nose"],
             kp["mouth_left"], kp["mouth_right"]], np.float32)
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            stem = os.path.basename(path).rsplit(".", 1)[0]
            mtcnn_mod.write_detection(best,
                                      os.path.join(out_dir,
                                                   stem + ".txt"))
    return lms


def smooth_landmarks(lms: dict[str, np.ndarray],
                     cfg: PipelineConfig) -> dict[str, np.ndarray]:
    """Stage 2 (smooth.py:40)."""
    keys = sorted(lms)
    seq = np.stack([lms[k] for k in keys])
    sm = smooth_landmark_sequence(seq, cfg.smooth_sigma)
    return {k: sm[i] for i, k in enumerate(keys)}


def regress_coeffs(recon_params, frame_paths: list[str],
                   lms: dict[str, np.ndarray], cfg: PipelineConfig
                   ) -> dict[str, np.ndarray]:
    """Stage 3: align at 466.285 → 224² → ResNet-50 → 257 coeffs,
    batched (test.py:91-105)."""
    recon_jit = jax.jit(lambda p, x: recon_mod.facerecon_apply(p, x))
    names, batch224 = [], []
    coeffs: dict[str, np.ndarray] = {}

    def flush():
        if not batch224:
            return
        x = jnp.asarray(np.stack(batch224))
        out = np.asarray(recon_jit(recon_params, x))
        for n, c in zip(names, out):
            coeffs[n] = c
        names.clear()
        batch224.clear()

    for path in frame_paths:
        name = os.path.basename(path)
        if name not in lms:
            continue
        img = Image.open(path).convert("RGB")
        lm = align_mod.flip_landmarks_y(lms[name], img.size[1])
        _, img224, _, _ = align_mod.align_img(
            img, lm, cfg.lm3d_std, rescale_factor=cfg.rescale_recon)
        batch224.append(np.asarray(img224, np.float32) / 255.0)
        names.append(name)
        if len(batch224) >= cfg.batch_size:
            flush()
    flush()
    return coeffs


def crop_frames(frame_paths: list[str], lms: dict[str, np.ndarray],
                cfg: PipelineConfig, out_dir: str) -> list[str]:
    """Stage 4: re-align at rescale 300 → 1024² → center 700² → 512²
    (crop_images.py:108-131)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for path in frame_paths:
        name = os.path.basename(path)
        if name not in lms:
            continue
        img = Image.open(path).convert("RGB")
        lm = align_mod.flip_landmarks_y(lms[name], img.size[1])
        _, _, _, img1024 = align_mod.align_img(
            img, lm, cfg.lm3d_std, rescale_factor=cfg.rescale_crop)
        out = align_mod.crop_final(img1024, cfg.center_crop_size,
                                   cfg.output_size)
        dst = os.path.join(out_dir, name)
        out.save(dst)
        written.append(dst)
    return written


def make_labels(coeffs: dict[str, np.ndarray], out_dir: str) -> None:
    """Stages 5+6: coeffs → cameras.json → test.json."""
    names = sorted(coeffs)
    angles = np.stack([split_coeff(coeffs[n][None])["angle"][0]
                       for n in names])
    trans = np.stack([split_coeff(coeffs[n][None])["trans"][0]
                      for n in names])
    poses = np.asarray(pose_mod.pose_from_coeffs(jnp.asarray(angles),
                                                 jnp.asarray(trans)))
    labels = np.asarray(pose_mod.labels_from_coeffs(jnp.asarray(angles),
                                                    jnp.asarray(trans)))
    png_names = [n.rsplit(".", 1)[0] + ".png" for n in names]
    pose_mod.write_cameras_json(png_names,
                                poses.reshape(len(names), 16),
                                angles, os.path.join(out_dir,
                                                     "cameras.json"))
    pose_mod.write_label_json(png_names, labels,
                              os.path.join(out_dir, "test.json"))


def process_video(in_dir: str, out_dir: str | None = None,
                  cfg: PipelineConfig | None = None,
                  mtcnn_params=None, recon_params=None,
                  landmarks: dict[str, np.ndarray] | None = None) -> str:
    """Full chain over a directory of frames. Returns the
    cropped_images dir. `landmarks` short-circuits stages 1-2 (useful
    when detections/*.txt already exist)."""
    cfg = cfg or PipelineConfig()
    frames = sorted(os.path.join(in_dir, f) for f in os.listdir(in_dir)
                    if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if not frames:
        raise FileNotFoundError(f"no frames in {in_dir}")
    out_dir = out_dir or os.path.join(in_dir, "cropped_images")

    if landmarks is None:
        if mtcnn_params is None:
            mtcnn_params = mtcnn_mod.init_mtcnn(jax.random.PRNGKey(0))
        landmarks = detect_landmarks(
            mtcnn_params, frames, cfg,
            out_dir=os.path.join(in_dir, "detections"))
        if not landmarks:
            raise RuntimeError("no faces detected")
        landmarks = smooth_landmarks(landmarks, cfg)

    if recon_params is None:
        recon_params = recon_mod.init_facerecon(jax.random.PRNGKey(1))
    coeffs = regress_coeffs(recon_params, frames, landmarks, cfg)
    crop_frames(frames, landmarks, cfg, out_dir)
    make_labels(coeffs, out_dir)
    return out_dir


def load_detections(detection_dir: str) -> dict[str, np.ndarray]:
    """Read detections/*.txt written by stage 1 (or the reference)."""
    out = {}
    for f in sorted(os.listdir(detection_dir)):
        if not f.endswith(".txt"):
            continue
        lm = np.loadtxt(os.path.join(detection_dir, f)).astype(np.float32)
        for suffix in (".png", ".jpg"):
            out[f[:-4] + suffix] = lm
    return out
