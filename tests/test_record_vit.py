"""ArrayRecord dataset + ViT backbone tests."""

import io

import jax
import numpy as np
import pytest
from PIL import Image

from hfa_gp_tpu.data.record_dataset import (RecordFaceDataset,
                                            SyntheticFaceDataset,
                                            write_record_dataset)
from hfa_gp_tpu.models.arcface.vit import VIT_CONFIGS, init_vit, vit_apply


def test_record_roundtrip(tmp_path):
    pytest.importorskip("array_record")
    rng = np.random.default_rng(0)
    imgs, labels = [], []
    for i in range(5):
        arr = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        imgs.append(buf.getvalue())
        labels.append(i * 10)
    path = str(tmp_path / "faces.array_record")
    write_record_dataset(path, imgs, labels)

    ds = RecordFaceDataset(path)
    assert len(ds) == 5
    img, lab = ds[3]
    assert img.shape == (112, 112, 3) and lab == 30
    assert img.min() >= -1.0 and img.max() <= 1.0


def test_synthetic_dataset():
    ds = SyntheticFaceDataset(length=100)
    img, lab = ds[0]
    assert img.shape == (112, 112, 3) and lab == 1


@pytest.mark.parametrize("name", ["vit_t"])
def test_vit_backbone(name):
    p = init_vit(jax.random.PRNGKey(0), name)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 112, 112, 3))
    e = vit_apply(p, x, name)
    assert e.shape == (2, 512)
    assert np.isfinite(np.asarray(e)).all()
    # permutation equivariance sanity: shifting input changes embedding
    e2 = vit_apply(p, jax.numpy.roll(x, 5, axis=1), name)
    assert float(jax.numpy.abs(e - e2).max()) > 1e-5
