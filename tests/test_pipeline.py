"""Preprocessing pipeline tests: MTCNN nets/NMS, facerecon shapes, and the
end-to-end chain on synthetic frames (with provided landmarks — the
random-weight detector is exercised separately for structure)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from hfa_gp_tpu.preprocess import facerecon, mtcnn, pipeline


def test_pnet_rnet_onet_shapes():
    params = mtcnn.init_mtcnn(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    prob, reg = mtcnn.pnet_apply(params["pnet"], x)
    assert prob.shape[-1] == 2 and reg.shape[-1] == 4
    np.testing.assert_allclose(np.asarray(prob).sum(-1), 1.0, atol=1e-5)
    x24 = jax.random.uniform(jax.random.PRNGKey(2), (5, 24, 24, 3))
    prob, reg = mtcnn.rnet_apply(params["rnet"], x24)
    assert prob.shape == (5, 2) and reg.shape == (5, 4)
    x48 = jax.random.uniform(jax.random.PRNGKey(3), (5, 48, 48, 3))
    prob, reg, lmk = mtcnn.onet_apply(params["onet"], x48)
    assert lmk.shape == (5, 10)


def test_nms_mask_suppresses_overlaps():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                        dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.ones(3, bool)
    kept = mtcnn.nms_mask(boxes, scores, valid, 0.5)
    np.testing.assert_array_equal(np.asarray(kept), [True, False, True])
    # numpy variant agrees
    keep = mtcnn._nms_np(np.asarray(boxes), np.asarray(scores), 0.5)
    assert sorted(keep.tolist()) == [0, 2]


def test_square_boxes_and_regression():
    boxes = jnp.asarray([[0.0, 0.0, 10.0, 20.0]])
    sq = np.asarray(mtcnn.square_boxes(boxes))[0]
    assert sq[2] - sq[0] == sq[3] - sq[1] == 20.0
    reg = jnp.asarray([[0.1, 0.1, -0.1, -0.1]])
    out = np.asarray(mtcnn.apply_regression(boxes, reg))[0]
    np.testing.assert_allclose(out, [1.1, 2.1, 8.9, 17.9], atol=1e-5)


def test_select_face_confidence_gate():
    results = [
        {"box": [700, 700, 100, 100], "confidence": 0.95,
         "keypoints": {}},
        {"box": [0, 0, 100, 100], "confidence": 0.99, "keypoints": {}},
    ]
    best = mtcnn.select_face(results)
    assert best["box"][0] == 700            # most central wins
    assert mtcnn.select_face(
        [{"box": [0, 0, 1, 1], "confidence": 0.5, "keypoints": {}}]) \
        is None


def test_facerecon_shapes_and_zero_head_init():
    params = facerecon.init_facerecon(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 224, 224, 3))
    out = facerecon.facerecon_apply(params, x)
    assert out.shape == (2, 257)
    # zero-initialized heads → zero coefficients at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


@pytest.mark.parametrize("n_frames", [3])
def test_pipeline_end_to_end_with_landmarks(tmp_path, n_frames):
    rng = np.random.default_rng(0)
    in_dir = tmp_path / "frames"
    in_dir.mkdir()
    lms = {}
    for i in range(n_frames):
        img = rng.integers(0, 255, (300, 300, 3), dtype=np.uint8)
        name = f"{i}.png"
        Image.fromarray(img).save(in_dir / name)
        lms[name] = np.array([[120, 130], [180, 130], [150, 160],
                              [130, 200], [170, 200]], np.float32) \
            + rng.normal(0, 1, (5, 2)).astype(np.float32)

    cfg = pipeline.PipelineConfig(batch_size=2)
    out = pipeline.process_video(str(in_dir), cfg=cfg, landmarks=lms)

    crops = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(crops) == n_frames
    im = Image.open(os.path.join(out, crops[0]))
    assert im.size == (512, 512)

    labels = json.load(open(os.path.join(out, "test.json")))["labels"]
    assert len(labels) == n_frames
    assert len(labels[0][1]) == 25
    cams = json.load(open(os.path.join(out, "cameras.json")))
    assert len(cams) == n_frames

    # the produced dataset is readable by the data layer
    from hfa_gp_tpu.data import HeadData
    ds = HeadData("any", size=64, ds_path=out)
    img, label = ds[0]
    assert img.shape == (64, 64, 3) and label.shape == (25,)


def test_detector_runs_on_synthetic_image():
    """Random-weight MTCNN: structure only — must not crash and returns a
    (possibly empty) list."""
    params = mtcnn.init_mtcnn(jax.random.PRNGKey(0))
    img = np.random.default_rng(1).integers(
        0, 255, (120, 120, 3), dtype=np.uint8)
    out = mtcnn.detect_faces(params, img)
    assert isinstance(out, list)


def test_detect_faces_no_per_frame_retrace():
    """The cascade's device programs are static-shape: across frames of
    one geometry with VARYING candidate counts, P-Net traces once and
    R/O-Net trace at most once per candidate bucket (the r2 version
    retraced R/O-Net for every distinct post-filter count)."""
    params = mtcnn.init_mtcnn(jax.random.PRNGKey(0))
    p0 = mtcnn._pnet_jit._cache_size()
    r0 = mtcnn._rnet_jit._cache_size()
    o0 = mtcnn._onet_jit._cache_size()
    rng = np.random.default_rng(2)
    for _ in range(6):
        img = rng.integers(0, 255, (160, 144, 3), dtype=np.uint8)
        mtcnn.detect_faces(params, img)
    assert mtcnn._pnet_jit._cache_size() - p0 <= 1
    assert mtcnn._rnet_jit._cache_size() - r0 \
        <= len(mtcnn.CANDIDATE_BUCKETS)
    assert mtcnn._onet_jit._cache_size() - o0 \
        <= len(mtcnn.CANDIDATE_BUCKETS)
