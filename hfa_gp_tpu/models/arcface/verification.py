"""LFW-style 1:1 face-verification evaluation.

Rebuilds the reference's in-training eval
(arcface_torch/eval/verification.py:179-409 + utils_callbacks.py:14-56):
embed both crops of each pair (plus horizontal flips), K-fold
threshold sweep on L2 distance of normalized embeddings, report mean
accuracy and best threshold.
"""

from __future__ import annotations

import numpy as np


def _accuracy(threshold: float, dist: np.ndarray,
              issame: np.ndarray) -> float:
    pred = dist < threshold
    return float(np.mean(pred == issame))


def kfold_verification(emb1: np.ndarray, emb2: np.ndarray,
                       issame: np.ndarray, n_folds: int = 10,
                       thresholds: np.ndarray | None = None
                       ) -> tuple[float, float, float]:
    """(N,D),(N,D),(N,) → (mean_accuracy, std, best_threshold)."""
    if thresholds is None:
        thresholds = np.arange(0, 4, 0.01)
    e1 = emb1 / np.linalg.norm(emb1, axis=1, keepdims=True)
    e2 = emb2 / np.linalg.norm(emb2, axis=1, keepdims=True)
    dist = np.sum((e1 - e2) ** 2, axis=1)
    n = len(issame)
    idx = np.arange(n)
    folds = np.array_split(idx, n_folds)
    accs = []
    best_ts = []
    for k in range(n_folds):
        test_idx = folds[k]
        train_idx = np.concatenate([folds[j] for j in range(n_folds)
                                    if j != k])
        train_accs = [_accuracy(t, dist[train_idx], issame[train_idx])
                      for t in thresholds]
        best = thresholds[int(np.argmax(train_accs))]
        accs.append(_accuracy(best, dist[test_idx], issame[test_idx]))
        best_ts.append(best)
    return float(np.mean(accs)), float(np.std(accs)), float(
        np.mean(best_ts))


def evaluate_pairs(embed_fn, images1: np.ndarray, images2: np.ndarray,
                   issame: np.ndarray, batch_size: int = 64,
                   use_flip: bool = True):
    """Run `embed_fn` (B,H,W,3)→(B,D) over pairs (with optional
    flip-augmented sum, verification.py convention) and K-fold verify."""
    def embed_all(imgs):
        outs = []
        for i in range(0, len(imgs), batch_size):
            chunk = imgs[i:i + batch_size]
            e = np.asarray(embed_fn(chunk))
            if use_flip:
                e = e + np.asarray(embed_fn(chunk[:, :, ::-1]))
            outs.append(e)
        return np.concatenate(outs)

    return kfold_verification(embed_all(images1), embed_all(images2),
                              issame)
