"""Converter round-trip test: synthesize a torch-layout EG3D state dict
from our params tree, run tools/convert_pickle.convert_generator on it,
and verify the result is numerically identical to the original params and
runs through synthesis. Validates the key mapping + layout transforms
without needing the actual pickle."""

import numpy as np
import pytest
import torch

import jax

from hfa_gp_tpu.core import camera
from hfa_gp_tpu.models.eg3d.generator import init_generator, synthesis
from tests.test_eg3d import small_config
from tools.convert_pickle import convert_generator, _StubUnpickler


def to_torch_sd(params) -> dict:
    """Inverse of convert_generator's layout transforms."""
    sd = {}

    def conv_oihw(w, flip=False):
        w = np.asarray(w)
        if flip:
            w = w[::-1, ::-1]
        return torch.from_numpy(np.ascontiguousarray(
            w.transpose(3, 2, 0, 1)))

    def put_block(prefix, blk, up):
        for conv in ("conv0", "conv1"):
            if conv not in blk:
                continue
            flip = up and conv == "conv0"
            sd[f"{prefix}.{conv}.weight"] = conv_oihw(blk[conv]["weight"],
                                                      flip)
            sd[f"{prefix}.{conv}.bias"] = torch.from_numpy(
                np.asarray(blk[conv]["bias"]))
            sd[f"{prefix}.{conv}.affine.weight"] = torch.from_numpy(
                np.asarray(blk[conv]["affine"]["weight"]))
            sd[f"{prefix}.{conv}.affine.bias"] = torch.from_numpy(
                np.asarray(blk[conv]["affine"]["bias"]))
            if "noise_strength" in blk[conv]:
                sd[f"{prefix}.{conv}.noise_strength"] = torch.from_numpy(
                    np.asarray(blk[conv]["noise_strength"]))
                sd[f"{prefix}.{conv}.noise_const"] = torch.from_numpy(
                    np.asarray(blk[conv]["noise_const"]))
        if "const" in blk:
            sd[f"{prefix}.const"] = torch.from_numpy(np.ascontiguousarray(
                np.asarray(blk["const"]).transpose(2, 0, 1)))
        sd[f"{prefix}.torgb.weight"] = conv_oihw(blk["torgb"]["weight"])
        sd[f"{prefix}.torgb.bias"] = torch.from_numpy(
            np.asarray(blk["torgb"]["bias"]))
        sd[f"{prefix}.torgb.affine.weight"] = torch.from_numpy(
            np.asarray(blk["torgb"]["affine"]["weight"]))
        sd[f"{prefix}.torgb.affine.bias"] = torch.from_numpy(
            np.asarray(blk["torgb"]["affine"]["bias"]))

    for name, fc in params["mapping"].items():
        if name == "w_avg":
            sd["backbone.mapping.w_avg"] = torch.from_numpy(
                np.asarray(fc))
        else:
            sd[f"backbone.mapping.{name}.weight"] = torch.from_numpy(
                np.asarray(fc["weight"]))
            sd[f"backbone.mapping.{name}.bias"] = torch.from_numpy(
                np.asarray(fc["bias"]))
    for bname, blk in params["backbone"].items():
        put_block(f"backbone.synthesis.{bname}", blk,
                  up=(bname != "b4"))
    sd["decoder.net.0.weight"] = torch.from_numpy(
        np.asarray(params["decoder"]["fc0"]["weight"]))
    sd["decoder.net.0.bias"] = torch.from_numpy(
        np.asarray(params["decoder"]["fc0"]["bias"]))
    sd["decoder.net.2.weight"] = torch.from_numpy(
        np.asarray(params["decoder"]["fc1"]["weight"]))
    sd["decoder.net.2.bias"] = torch.from_numpy(
        np.asarray(params["decoder"]["fc1"]["bias"]))
    for blk in ("block0", "block1"):
        put_block(f"superresolution.{blk}",
                  params["superresolution"][blk], up=True)
    return sd


def tree_allclose(a, b, path=""):
    assert set(a) == set(b), (path, sorted(a), sorted(b))
    for k in a:
        if isinstance(a[k], dict):
            tree_allclose(a[k], b[k], path + "/" + str(k))
        else:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=1e-6, err_msg=path + "/" + k)


def test_convert_roundtrip_and_synthesis():
    cfg = small_config()
    params = init_generator(jax.random.PRNGKey(0), cfg)
    sd = {k: v for k, v in to_torch_sd(params).items()}
    sd_np = {k: v.numpy() for k, v in sd.items()}
    converted = convert_generator(sd_np)
    tree_allclose(params, converted)

    ws = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.num_ws, 512))
    label = camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None))
    out0 = synthesis(params, cfg, ws, label)["image"]
    out1 = synthesis(converted, cfg, ws, label)["image"]
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               atol=1e-6)


def test_stub_unpickler_captures_foreign_classes(tmp_path):
    """Pickles referencing dnnlib/torch_utils classes load without those
    packages installed."""
    import pickle
    import sys
    import types

    class Fake:
        pass

    Fake.__module__ = "dnnlib.util"
    Fake.__qualname__ = "EasyDict"
    # register a throwaway module so pickling the class reference works;
    # the loader side must NOT need it (that's what the stub provides)
    mod = types.ModuleType("dnnlib.util")
    mod.EasyDict = Fake
    sys.modules["dnnlib"] = types.ModuleType("dnnlib")
    sys.modules["dnnlib.util"] = mod
    payload = {"G_ema": Fake()}
    payload["G_ema"].__dict__["x"] = torch.ones(3)
    buf = pickle.dumps(payload)
    del sys.modules["dnnlib.util"], sys.modules["dnnlib"]
    path = tmp_path / "t.pkl"
    path.write_bytes(buf)
    with open(path, "rb") as f:
        data = _StubUnpickler(f).load()
    assert "G_ema" in data
    assert isinstance(data["G_ema"], dict)
    np.testing.assert_allclose(data["G_ema"]["x"].numpy(), 1.0)


def test_convert_facerecon_roundtrip():
    """Synthesize a torch-layout resnet50 state dict from our init tree,
    convert, and verify numerical identity + a working forward."""
    import jax.numpy as jnp

    from hfa_gp_tpu.preprocess import facerecon
    from tools.convert_facerecon import convert

    params = facerecon.init_facerecon(jax.random.PRNGKey(0))

    def oihw(w):
        return np.asarray(w).transpose(3, 2, 0, 1)

    sd = {"conv1.weight": oihw(params["stem_conv"])}
    bn = params["stem_bn"]
    sd.update({"bn1.weight": np.asarray(bn["scale"]),
               "bn1.bias": np.asarray(bn["bias"]),
               "bn1.running_mean": np.asarray(bn["mean"]),
               "bn1.running_var": np.asarray(bn["var"])})
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for i in range(blocks):
            blk = params[f"s{stage}_b{i}"]
            pre = f"layer{stage + 1}.{i}"
            for c in ("conv1", "conv2", "conv3"):
                sd[f"{pre}.{c}.weight"] = oihw(blk[c])
            for b in ("bn1", "bn2", "bn3"):
                sd[f"{pre}.{b}.weight"] = np.asarray(blk[b]["scale"])
                sd[f"{pre}.{b}.bias"] = np.asarray(blk[b]["bias"])
                sd[f"{pre}.{b}.running_mean"] = np.asarray(blk[b]["mean"])
                sd[f"{pre}.{b}.running_var"] = np.asarray(blk[b]["var"])
            if "down_conv" in blk:
                sd[f"{pre}.downsample.0.weight"] = oihw(blk["down_conv"])
                d = blk["down_bn"]
                sd[f"{pre}.downsample.1.weight"] = np.asarray(d["scale"])
                sd[f"{pre}.downsample.1.bias"] = np.asarray(d["bias"])
                sd[f"{pre}.downsample.1.running_mean"] = \
                    np.asarray(d["mean"])
                sd[f"{pre}.downsample.1.running_var"] = np.asarray(d["var"])
    for i in range(7):
        sd[f"final_layers.{i}.weight"] = oihw(params[f"head{i}"]["weight"])
        sd[f"final_layers.{i}.bias"] = np.asarray(params[f"head{i}"]["bias"])

    tree = convert(sd)
    tree_allclose(params, tree)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 224, 224, 3))
    out = facerecon.facerecon_apply(tree, x)
    assert out.shape == (1, 257)
