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
    p, st = init_vit(jax.random.PRNGKey(0), name)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 112, 112, 3))
    e = vit_apply(p, x, name, batch_stats=st)
    assert e.shape == (2, 512)
    assert np.isfinite(np.asarray(e)).all()
    # permutation equivariance sanity: shifting input changes embedding
    e2 = vit_apply(p, jax.numpy.roll(x, 5, axis=1), name,
                   batch_stats=st)
    assert float(jax.numpy.abs(e - e2).max()) > 1e-5


def test_vit_train_mode_mask_and_droppath():
    """Masked train forward (vit_s has mask_ratio 0.1, drop_path 0.1)
    runs with static shapes and returns updated BN stats; the
    dp005_mask0 variant takes the no-masking path."""
    p, st = init_vit(jax.random.PRNGKey(0), "vit_t")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 112, 112, 3))
    e, new_st = vit_apply(p, x, "vit_t", batch_stats=st, train=True,
                          rng=jax.random.PRNGKey(2))
    assert e.shape == (2, 512) and np.isfinite(np.asarray(e)).all()
    assert float(jax.numpy.abs(
        new_st["head0_bn"]["mean"] - st["head0_bn"]["mean"]).max()) > 0
    p2, st2 = init_vit(jax.random.PRNGKey(0), "vit_t_dp005_mask0")
    e2, _ = vit_apply(p2, x, "vit_t_dp005_mask0", batch_stats=st2,
                      train=True, rng=jax.random.PRNGKey(2))
    assert e2.shape == (2, 512)


def test_vit_registry_variants_init():
    for name in VIT_CONFIGS:
        p, st = init_vit(jax.random.PRNGKey(0), name)
        assert "head0" in p and "head0_bn" in st
