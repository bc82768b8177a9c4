"""Dataset-contract tests on synthetic fixtures."""

import numpy as np
import pytest

from hfa_gp_tpu.data import (BatchIterator, HeadData, HeadData3DMM,
                             HeadDataAudio, HeadDataTest, infinite_batches)
from tests.fixtures import make_avatar_dataset


@pytest.fixture(scope="module")
def rgb_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nerface")
    make_avatar_dataset(str(root))
    return str(root)


@pytest.fixture(scope="module")
def audio_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ad")
    make_avatar_dataset(str(root), person="obama", audio=True)
    return str(root)


def test_head_data(rgb_root):
    ds = HeadData("train", size=32, root=rgb_root, person="person_3")
    assert len(ds) == 6
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and label.shape == (25,)
    assert img.min() >= -1.0 and img.max() <= 1.0
    # raw (unflipped) label: intrinsics block intact
    np.testing.assert_allclose(
        label[16:], [4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1], atol=1e-6)


def test_head_data_test_sorted_and_smoothed(rgb_root):
    ds = HeadDataTest("test", size=32, root=rgb_root, person="person_3",
                      smooth_sigma=3.0)
    names = [f.split("/")[-1] for f in ds.frames]
    assert names == sorted(names)
    # smoothing blends the x-translation ramp across frames
    labs = np.stack([ds.get_label(i) for i in range(len(ds))])
    assert labs.shape == (4, 25)
    raw = HeadDataTest("test", size=32, root=rgb_root, person="person_3")
    raw_labs = np.stack([raw.get_label(i) for i in range(len(raw))])
    assert not np.allclose(labs[:, 3], raw_labs[:, 3])


def test_rotate_labels(rgb_root):
    ds = HeadDataTest("test", size=32, root=rgb_root, person="person_3")
    before = ds.get_label(0).copy()
    ds.rotate_labels(30.0)
    after = ds.get_label(0)
    assert not np.allclose(before[:12], after[:12])
    np.testing.assert_allclose(after[16:], before[16:])  # intrinsics kept


def test_head_data_3dmm(rgb_root):
    ds = HeadData3DMM("train", size=32, root=rgb_root, person="person_3")
    img, label, expr = ds[0]
    assert expr.shape == (76,)


def test_head_data_audio(audio_root):
    ds = HeadDataAudio("train", size=32, root=audio_root, person="obama")
    img, label, aud, img_i = ds[0]
    assert aud.shape == (16, 29)
    win = ds.get_audio_window(0)
    assert win.shape == (8, 16, 29)
    # boundary frame 0: left half of the window zero-padded
    i0 = [i for i in range(len(ds)) if ds.frame_index(i) == 0][0]
    win0 = ds.get_audio_window(i0)
    np.testing.assert_allclose(win0[:4], 0.0)
    assert np.abs(win0[4:]).sum() > 0


def test_batch_iterator(rgb_root):
    ds = HeadData("train", size=32, root=rgb_root, person="person_3")
    it = BatchIterator(ds, batch_size=4, seed=1)
    batches = list(it)
    assert len(batches) == 1           # 6 // 4, drop_last
    imgs, labels = batches[0]
    assert imgs.shape == (4, 32, 32, 3) and labels.shape == (4, 25)
    gen = infinite_batches(it)
    for _ in range(3):
        next(gen)
