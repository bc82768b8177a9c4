"""Native C++ loader tests: compile, decode parity vs PIL, prefetch
stream."""

import os

import numpy as np
import pytest
from PIL import Image

from hfa_gp_tpu.data import native_loader


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(10):
        arr = rng.integers(0, 255, (96, 80, 3), dtype=np.uint8)
        p = str(d / f"{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    # one jpeg too
    arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    jp = str(d / "j.jpg")
    Image.fromarray(arr).save(jp, quality=95)
    paths.append(jp)
    return paths


def test_build_and_decode(png_dir):
    if not native_loader.native_available():
        pytest.skip("no native toolchain")
    out = native_loader.decode_image(png_dir[0], 64)
    assert out is not None and out.shape == (64, 64, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # decode parity with PIL at native resolution (no resize)
    raw = native_loader.decode_image(png_dir[0], 96)
    pil = np.asarray(Image.open(png_dir[0]).convert("RGB")
                     .resize((96, 96), Image.BILINEAR), np.float32)
    pil = pil / 255.0 * 2 - 1
    # same resampler family — allow small tolerance
    assert np.abs(raw - pil).mean() < 0.08

    jout = native_loader.decode_image(png_dir[-1], 32)
    assert jout is not None and np.isfinite(jout).all()


def test_exact_decode_no_resize(png_dir):
    if not native_loader.native_available():
        pytest.skip("no native toolchain")
    # decode at identical W==H==source → values must match PIL exactly
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
    p = os.path.join(os.path.dirname(png_dir[0]), "sq.png")
    Image.fromarray(arr).save(p)
    out = native_loader.decode_image(p, 48)
    want = arr.astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_prefetch_stream(png_dir):
    if not native_loader.native_available():
        pytest.skip("no native toolchain")
    loader = native_loader.NativeImageLoader(png_dir[:10], size=32,
                                             batch_size=4, workers=2,
                                             seed=1)
    seen = []
    for _ in range(5):
        imgs, idx = loader.next()
        assert imgs.shape == (4, 32, 32, 3)
        assert np.isfinite(imgs).all()
        seen.extend(idx.tolist())
    loader.close()
    assert set(seen) <= set(range(10))
    assert len(set(seen)) > 4      # shuffles across epochs
