"""Observability: scalar/image logging + image IO.

The reference logs scalars and sample images to TensorBoard
(code/train_rgb.py:30-50,128-150). Here: TensorBoard when available
(torch's SummaryWriter ships in the image), always mirrored to a JSONL
file so headless runs keep machine-readable metrics."""

from __future__ import annotations

import json
import os
import time

import numpy as np
from PIL import Image


def save_image(img, path: str, *, normalize: bool = True,
               value_range: tuple[float, float] = (-1.0, 1.0)) -> None:
    """(H, W, 3) or (B, H, W, 3) float array → png (grid over batch rows).

    Parity: torchvision save_image(normalize=True, range=(-1,1)) as used
    by the reenactment CLIs (run_recon_video_rgb.py:233)."""
    arr = np.asarray(img, dtype=np.float32)
    if arr.ndim == 4:
        arr = np.concatenate(list(arr), axis=0)   # vertical strip
    if normalize:
        lo, hi = value_range
        arr = (arr.clip(lo, hi) - lo) / (hi - lo)
    arr = (arr * 255.0 + 0.5).clip(0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr, "RGB").save(path)


def display_image(img, path: str) -> None:
    """min-max normalized display image (train_rgb.py:30-35)."""
    arr = np.asarray(img, dtype=np.float32)
    if arr.ndim == 4:
        arr = np.concatenate(list(arr), axis=0)
    arr = arr.clip(-1, 1)
    arr = (arr - arr.min()) / max(arr.max() - arr.min(), 1e-8)
    arr = (arr * 255.0 + 0.5).clip(0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr, "RGB").save(path)


class MetricsWriter:
    def __init__(self, log_dir: str, primary: bool = True):
        """primary=False (non-rank-0 processes under multi-host) makes
        every method a no-op — the reference's rank-0 TensorBoard gate
        (train_rgb.py:128-150)."""
        self._primary = primary
        self._jsonl = None
        self._tb = None
        if not primary:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalars(self, step: int, **values: float) -> None:
        if not self._primary:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), int(step))

    def image(self, step: int, tag: str, img) -> None:
        if self._tb is not None:
            arr = np.asarray(img, dtype=np.float32)
            if arr.ndim == 4:
                arr = arr[0]
            arr = ((arr.clip(-1, 1) + 1) / 2).transpose(2, 0, 1)
            self._tb.add_image(tag, arr, int(step))

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
