"""Temporal landmark smoothing (reference smooth.py:28-47): gaussian σ=2
along the frame axis over the per-frame 5-point landmark files."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..core.ops import minibatch_gaussian_filter1d


def smooth_landmark_sequence(lms: np.ndarray, sigma: float = 2.0
                             ) -> np.ndarray:
    """(T, 5, 2) [or (T, K)] landmark sequence → smoothed, scipy-reflect
    boundary parity."""
    return np.asarray(minibatch_gaussian_filter1d(jnp.asarray(
        lms.astype(np.float32)), sigma))


def smooth_detection_dir(detection_dir: str, sigma: float = 2.0) -> int:
    """In-place smoothing of `detections/*.txt` (smooth.py:44-47).
    Returns number of files rewritten."""
    files = sorted(f for f in os.listdir(detection_dir)
                   if f.endswith(".txt"))
    if not files:
        return 0
    lms = np.stack([np.loadtxt(os.path.join(detection_dir, f))
                    .astype(np.float32) for f in files])
    sm = smooth_landmark_sequence(lms, sigma)
    for f, lm in zip(files, sm):
        np.savetxt(os.path.join(detection_dir, f), lm)
    return len(files)
