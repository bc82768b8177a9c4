"""MTCNN face detector (P-Net / R-Net / O-Net cascade), TPU-native.

Replaces the reference's external TensorFlow `mtcnn` package
(eg3d-pose-detection/batch_mtcnn.py:4,9): three tiny convnets over an
image pyramid with NMS between stages, producing a box + 5-point
landmarks per face.

TPU-first formulation: every stage is jitted with STATIC shapes —
P-Net runs ONE batched call over the whole zero-padded pyramid (masked
to receptive-field-complete outputs), and R/O-Net candidate batches are
zero-padded to fixed BUCKETS — so the cascade compiles once per video
geometry + once per bucket, never per frame (the device-visible shapes
are independent of the candidate counts). Box arithmetic between
stages stays in host numpy: each distinct-shape jnp dispatch would
compile a fresh tiny TPU program per candidate count. Weights convert
from the pip package's `mtcnn_weights.npy` via tools/convert_mtcnn.py;
random init keeps the pipeline testable.

The per-frame driver (`detect_faces`) reproduces batch_mtcnn.py:32-79:
confidence gate 0.9 and most-central-face selection.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

THRESHOLDS = (0.6, 0.7, 0.7)
NMS_THRESHOLDS = (0.7, 0.7, 0.7)
SCALE_FACTOR = 0.709
MIN_FACE_SIZE = 20
MAX_CANDIDATES = 256
# static batch capacities for R/O-Net: candidate counts pad up to the
# next bucket so the jitted program is reused across frames
CANDIDATE_BUCKETS = (16, 32, 64, 128, 256)


# ---------------------------------------------------------------------------
# Network definitions
# ---------------------------------------------------------------------------


def _conv_init(key, k, cin, cout):
    bound = 1.0 / math.sqrt(cin * k * k)
    kw, kb = jax.random.split(key)
    return {"weight": jax.random.uniform(kw, (k, k, cin, cout),
                                         jnp.float32, -bound, bound),
            "bias": jax.random.uniform(kb, (cout,), jnp.float32, -bound,
                                       bound),
            "prelu": jnp.full((cout,), 0.25, jnp.float32)}


def _fc_init(key, cin, cout, prelu=False):
    bound = 1.0 / math.sqrt(cin)
    kw, kb = jax.random.split(key)
    p = {"weight": jax.random.uniform(kw, (cout, cin), jnp.float32,
                                      -bound, bound),
         "bias": jax.random.uniform(kb, (cout,), jnp.float32, -bound,
                                    bound)}
    if prelu:
        p["prelu"] = jnp.full((cout,), 0.25, jnp.float32)
    return p


def _conv(p, x, stride=1, padding="VALID"):
    y = jax.lax.conv_general_dilated(
        x, p["weight"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
    return jnp.where(y >= 0, y, p["prelu"] * y)


def _fc(p, x):
    y = x @ p["weight"].T + p["bias"]
    if "prelu" in p:
        y = jnp.where(y >= 0, y, p["prelu"] * y)
    return y


def _maxpool(x, k, s, padding=None):
    """Ceil-mode max pool (torch MTCNN convention): pad the end with -inf
    so the last partial window counts."""
    def pads(n):
        out = -(-(n - k) // s) + 1
        return (0, max((out - 1) * s + k - n, 0))

    _, h, w, _ = x.shape
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), pads(h), pads(w), (0, 0)))


def init_pnet(key) -> Params:
    ks = jax.random.split(key, 5)
    return {"c1": _conv_init(ks[0], 3, 3, 10),
            "c2": _conv_init(ks[1], 3, 10, 16),
            "c3": _conv_init(ks[2], 3, 16, 32),
            "prob": {"weight": jax.random.normal(ks[3], (1, 1, 32, 2))
                     * 0.1, "bias": jnp.zeros((2,))},
            "reg": {"weight": jax.random.normal(ks[4], (1, 1, 32, 4))
                    * 0.1, "bias": jnp.zeros((4,))}}


def pnet_apply(p: Params, x: jax.Array):
    """x (B, H, W, 3) → (prob (B, h, w, 2) softmaxed, reg (B, h, w, 4));
    h = (H-2)//2 - 5 per the conv/pool stack."""
    h = _conv(p["c1"], x)
    h = _maxpool(h, 2, 2)
    h = _conv(p["c2"], h)
    h = _conv(p["c3"], h)

    def head(q):
        return jax.lax.conv_general_dilated(
            h, q["weight"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + q["bias"]

    return jax.nn.softmax(head(p["prob"]), axis=-1), head(p["reg"])


def init_rnet(key) -> Params:
    ks = jax.random.split(key, 6)
    return {"c1": _conv_init(ks[0], 3, 3, 28),
            "c2": _conv_init(ks[1], 3, 28, 48),
            "c3": _conv_init(ks[2], 2, 48, 64),
            "fc": _fc_init(ks[3], 64 * 3 * 3, 128, prelu=True),
            "prob": _fc_init(ks[4], 128, 2),
            "reg": _fc_init(ks[5], 128, 4)}


def rnet_apply(p: Params, x: jax.Array):
    """x (N, 24, 24, 3) → (prob (N,2), reg (N,4))."""
    h = _conv(p["c1"], x)
    h = _maxpool(h, 3, 2, "VALID")
    h = _conv(p["c2"], h)
    h = _maxpool(h, 3, 2, "VALID")
    h = _conv(p["c3"], h)
    h = _fc(p["fc"], h.reshape(h.shape[0], -1))
    return jax.nn.softmax(_fc(p["prob"], h), axis=-1), _fc(p["reg"], h)


def init_onet(key) -> Params:
    ks = jax.random.split(key, 8)
    return {"c1": _conv_init(ks[0], 3, 3, 32),
            "c2": _conv_init(ks[1], 3, 32, 64),
            "c3": _conv_init(ks[2], 3, 64, 64),
            "c4": _conv_init(ks[3], 2, 64, 128),
            "fc": _fc_init(ks[4], 128 * 3 * 3, 256, prelu=True),
            "prob": _fc_init(ks[5], 256, 2),
            "reg": _fc_init(ks[6], 256, 4),
            "lmk": _fc_init(ks[7], 256, 10)}


def onet_apply(p: Params, x: jax.Array):
    """x (N, 48, 48, 3) → (prob (N,2), reg (N,4), landmarks (N,10))."""
    h = _conv(p["c1"], x)
    h = _maxpool(h, 3, 2, "VALID")
    h = _conv(p["c2"], h)
    h = _maxpool(h, 3, 2, "VALID")
    h = _conv(p["c3"], h)
    h = _maxpool(h, 2, 2, "VALID")
    h = _conv(p["c4"], h)
    h = _fc(p["fc"], h.reshape(h.shape[0], -1))
    return (jax.nn.softmax(_fc(p["prob"], h), axis=-1),
            _fc(p["reg"], h), _fc(p["lmk"], h))


def init_mtcnn(key) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {"pnet": init_pnet(k1), "rnet": init_rnet(k2),
            "onet": init_onet(k3)}


# ---------------------------------------------------------------------------
# Static-shape NMS + box utils
# ---------------------------------------------------------------------------


def iou_matrix(boxes: jax.Array, mode: str = "union") -> jax.Array:
    """boxes (K, 4) [x1,y1,x2,y2] → (K, K) IoU ('union') or
    overlap/min-area ('min')."""
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1 + 1, 0) * jnp.maximum(y2 - y1 + 1, 0)
    area = (boxes[:, 2] - boxes[:, 0] + 1) \
        * (boxes[:, 3] - boxes[:, 1] + 1)
    if mode == "union":
        denom = area[:, None] + area[None, :] - inter
    else:
        denom = jnp.minimum(area[:, None], area[None, :])
    return inter / jnp.maximum(denom, 1e-10)


def nms_mask(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
             threshold: float, mode: str = "union") -> jax.Array:
    """Mask-based greedy NMS with static K. Returns the kept mask."""
    k = boxes.shape[0]
    iou = iou_matrix(boxes, mode)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))

    def body(i, state):
        kept, alive = state
        idx = order[i]
        take = alive[idx] & valid[idx]
        kept = kept.at[idx].set(take)
        suppress = (iou[idx] > threshold) & take
        alive = alive & ~suppress
        alive = alive.at[idx].set(alive[idx] & ~take)
        return kept, alive

    kept, _ = jax.lax.fori_loop(
        0, k, body, (jnp.zeros(k, bool), jnp.ones(k, bool)))
    return kept


def square_boxes(boxes: jax.Array) -> jax.Array:
    """rerec: expand to squares around the center."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = jnp.maximum(w, h)
    x1 = boxes[:, 0] + w * 0.5 - side * 0.5
    y1 = boxes[:, 1] + h * 0.5 - side * 0.5
    return jnp.stack([x1, y1, x1 + side, y1 + side], axis=1)


def apply_regression(boxes: jax.Array, reg: jax.Array) -> jax.Array:
    w = (boxes[:, 2] - boxes[:, 0] + 1)[:, None]
    h = (boxes[:, 3] - boxes[:, 1] + 1)[:, None]
    scale = jnp.concatenate([w, h, w, h], axis=1)
    return boxes + reg * scale


# ---------------------------------------------------------------------------
# Host-side pipeline (numpy orchestration around the jitted nets)
# ---------------------------------------------------------------------------

# module-level jits: re-wrapping with jax.jit(...) per call would
# retrace every frame
_pnet_jit = jax.jit(pnet_apply)
_rnet_jit = jax.jit(rnet_apply)
_onet_jit = jax.jit(onet_apply)


def _bucket(n: int) -> int:
    """Smallest static batch bucket holding n candidates. Above the
    largest predefined bucket (max_candidates > CANDIDATE_BUCKETS[-1]),
    round up to the next multiple of it — still a bounded set of traces
    while never returning a bucket smaller than n (a negative pad)."""
    for b in CANDIDATE_BUCKETS:
        if n <= b:
            return b
    top = CANDIDATE_BUCKETS[-1]
    return -(-n // top) * top


def _pad_rows(x: np.ndarray, rows: int) -> np.ndarray:
    if x.shape[0] == rows:
        return x
    return np.concatenate(
        [x, np.zeros((rows - x.shape[0],) + x.shape[1:], x.dtype)])


def _apply_regression_np(boxes: np.ndarray, reg: np.ndarray) -> np.ndarray:
    w = (boxes[:, 2] - boxes[:, 0] + 1)[:, None]
    h = (boxes[:, 3] - boxes[:, 1] + 1)[:, None]
    return boxes + reg * np.concatenate([w, h, w, h], axis=1)


def _square_boxes_np(boxes: np.ndarray) -> np.ndarray:
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    x1 = boxes[:, 0] + w * 0.5 - side * 0.5
    y1 = boxes[:, 1] + h * 0.5 - side * 0.5
    return np.stack([x1, y1, x1 + side, y1 + side], axis=1)


def _normalize(img: np.ndarray) -> np.ndarray:
    return (img.astype(np.float32) - 127.5) * (1.0 / 128.0)


def _crop_resize(img: np.ndarray, boxes: np.ndarray, size: int
                 ) -> np.ndarray:
    """Crop (zero-padded) + bilinear resize candidate boxes host-side."""
    from PIL import Image
    h, w = img.shape[:2]
    out = np.zeros((len(boxes), size, size, 3), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(np.int64)):
        bw, bh = x2 - x1 + 1, y2 - y1 + 1
        if bw < 2 or bh < 2:
            continue
        patch = np.zeros((bh, bw, 3), np.uint8)
        sx1, sy1 = max(x1, 0), max(y1, 0)
        sx2, sy2 = min(x2 + 1, w), min(y2 + 1, h)
        if sx2 <= sx1 or sy2 <= sy1:
            continue
        patch[sy1 - y1:sy2 - y1, sx1 - x1:sx2 - x1] = \
            img[sy1:sy2, sx1:sx2]
        out[i] = np.asarray(Image.fromarray(patch).resize(
            (size, size), Image.BILINEAR), np.float32)
    return _normalize(out)


def detect_faces(params: Params, img: np.ndarray,
                 min_face_size: int = MIN_FACE_SIZE,
                 thresholds=THRESHOLDS,
                 max_candidates: int = MAX_CANDIDATES) -> list[dict]:
    """img: (H, W, 3) uint8 RGB → list of {box, confidence, keypoints}.

    Mirrors the pip package's detect_faces output consumed at
    batch_mtcnn.py:53-67."""
    from PIL import Image

    h, w = img.shape[:2]

    # --- stage 1: P-Net, ONE batched call over the zero-padded pyramid.
    # Per-scale outputs are masked to the receptive-field-complete
    # region (2y+12 <= hs), where padded-batch values are exactly the
    # unpadded ones; windows whose 12px field would extend past the
    # image edge are dropped (they only ever saw truncated data).
    m = 12.0 / min_face_size
    min_side = min(h, w) * m
    scales = []
    s = m
    while min_side >= 12:
        scales.append(s)
        s *= SCALE_FACTOR
        min_side *= SCALE_FACTOR
    if not scales:
        return []

    dims = [(int(np.ceil(h * sc)), int(np.ceil(w * sc))) for sc in scales]
    h0, w0 = dims[0]
    pyr = np.zeros((len(scales), h0, w0, 3), np.float32)
    for i, (hs, ws) in enumerate(dims):
        pyr[i, :hs, :ws] = np.asarray(Image.fromarray(img).resize(
            (ws, hs), Image.BILINEAR), np.float32)
    prob_all, reg_all = _pnet_jit(params["pnet"], _normalize(pyr))
    prob_all = np.asarray(prob_all)[:, :, :, 1]
    reg_all = np.asarray(reg_all)

    all_boxes = []
    for i, ((hs, ws), scale) in enumerate(zip(dims, scales)):
        vh, vw = (hs - 12) // 2 + 1, (ws - 12) // 2 + 1
        prob = prob_all[i, :vh, :vw]
        reg = reg_all[i, :vh, :vw]
        ys, xs = np.where(prob > thresholds[0])
        if len(ys) == 0:
            continue
        stride, cell = 2.0, 12.0
        x1 = np.round(stride * xs / scale)
        y1 = np.round(stride * ys / scale)
        x2 = np.round((stride * xs + cell) / scale)
        y2 = np.round((stride * ys + cell) / scale)
        boxes = np.stack([x1, y1, x2, y2], axis=1)
        scores = prob[ys, xs]
        r = reg[ys, xs]
        # per-scale NMS 0.5
        keep = _nms_np(boxes, scores, 0.5)
        all_boxes.append(np.concatenate(
            [boxes[keep], scores[keep, None], r[keep]], axis=1))
    if not all_boxes:
        return []
    cand = np.concatenate(all_boxes)
    keep = _nms_np(cand[:, :4], cand[:, 4], NMS_THRESHOLDS[0])
    cand = cand[keep][:max_candidates]
    boxes = _square_boxes_np(_apply_regression_np(cand[:, :4],
                                                  cand[:, 5:9]))

    # --- stage 2: R-Net (candidate batch padded to a static bucket)
    n = len(boxes)
    crops = _pad_rows(_crop_resize(img, boxes, 24), _bucket(n))
    prob, reg = _rnet_jit(params["rnet"], crops)
    prob = np.asarray(prob)[:n, 1]
    reg = np.asarray(reg)[:n]
    keep = prob > thresholds[1]
    boxes, prob, reg = boxes[keep], prob[keep], reg[keep]
    if len(boxes) == 0:
        return []
    keep = _nms_np(boxes, prob, NMS_THRESHOLDS[1])
    boxes, prob, reg = boxes[keep], prob[keep], reg[keep]
    boxes = _square_boxes_np(_apply_regression_np(boxes, reg))

    # --- stage 3: O-Net (same bucketing)
    n = len(boxes)
    crops = _pad_rows(_crop_resize(img, boxes, 48), _bucket(n))
    prob, reg, lmk = _onet_jit(params["onet"], crops)
    prob = np.asarray(prob)[:n, 1]
    reg = np.asarray(reg)[:n]
    lmk = np.asarray(lmk)[:n]
    keep = prob > thresholds[2]
    boxes, prob, reg, lmk = boxes[keep], prob[keep], reg[keep], lmk[keep]
    if len(boxes) == 0:
        return []
    bw = boxes[:, 2] - boxes[:, 0] + 1
    bh = boxes[:, 3] - boxes[:, 1] + 1
    pts_x = boxes[:, 0:1] + lmk[:, 0:5] * bw[:, None]
    pts_y = boxes[:, 1:2] + lmk[:, 5:10] * bh[:, None]
    boxes = _apply_regression_np(boxes, reg)
    keep = _nms_np(boxes, prob, NMS_THRESHOLDS[2], mode="min")
    result = []
    names = ["left_eye", "right_eye", "nose", "mouth_left", "mouth_right"]
    for i in np.where(keep)[0] if keep.dtype == bool else keep:
        x1, y1, x2, y2 = boxes[i]
        result.append({
            "box": [float(x1), float(y1), float(x2 - x1),
                    float(y2 - y1)],
            "confidence": float(prob[i]),
            "keypoints": {n: (float(pts_x[i, j]), float(pts_y[i, j]))
                          for j, n in enumerate(names)},
        })
    return result


def _nms_np(boxes: np.ndarray, scores: np.ndarray, threshold: float,
            mode: str = "union") -> np.ndarray:
    """Host-side greedy NMS returning kept indices (sorted by score)."""
    if len(boxes) == 0:
        return np.array([], np.int64)
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) \
        * (boxes[:, 3] - boxes[:, 1] + 1)
    for idx in order:
        if not alive[idx]:
            continue
        keep.append(idx)
        x1 = np.maximum(boxes[idx, 0], boxes[:, 0])
        y1 = np.maximum(boxes[idx, 1], boxes[:, 1])
        x2 = np.minimum(boxes[idx, 2], boxes[:, 2])
        y2 = np.minimum(boxes[idx, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1 + 1, 0) * np.maximum(y2 - y1 + 1, 0)
        if mode == "union":
            ov = inter / (areas[idx] + areas - inter)
        else:
            ov = inter / np.minimum(areas[idx], areas)
        alive &= ov <= threshold
    return np.asarray(keep, np.int64)


def select_face(results: list[dict], image_size: tuple[int, int] = (1500,
                                                                    1500),
                confidence: float = 0.9) -> dict | None:
    """Most-central face above the confidence gate
    (batch_mtcnn.py:32-55)."""
    if not results:
        return None
    if len(results) == 1:
        best = results[0]
    else:
        center = np.array([image_size[0] / 2, image_size[1] / 2])
        best, lowest = None, float("inf")
        for r in results:
            pos = np.array(r["box"][:2]) + np.array(r["box"][2:]) / 2
            d = np.linalg.norm(pos - center)
            if d < lowest:
                lowest, best = d, r
    return best if best["confidence"] > confidence else None


def write_detection(result: dict, path: str) -> None:
    """5-point landmark txt (batch_mtcnn.py:73-79)."""
    kp = result["keypoints"]
    with open(path, "w") as f:
        for name in ("left_eye", "right_eye", "nose", "mouth_left",
                     "mouth_right"):
            x, y = kp[name]
            f.write(f"{float(x)} {float(y)}\n")
