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


def test_parity_harness_dryrun(tmp_path):
    """The EXACT pickle-day procedure, end-to-end on a synthetic pickle
    (VERDICT r2 #3b):

        python tools/convert_pickle.py <pkl> eg3d.npz
        python tools/parity_harness.py compare golden.npz eg3d.npz

    Synthesizes a pickle from our params (torch state-dict layout),
    converts it through the real CLI entry, captures a golden npz in
    the reference's NCHW layout, and asserts compare() reports ~exact
    PSNR at every stage — so when `ffhqrebalanced512-128.pkl` is
    available only the capture step is new."""
    import pickle

    from tools import convert_pickle, parity_harness

    cfg = small_config()
    params = init_generator(jax.random.PRNGKey(0), cfg)
    sd = to_torch_sd(params)

    pkl = tmp_path / "synthetic.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"G_ema": dict(sd)}, f)
    out_npz = str(tmp_path / "eg3d.npz")
    convert_pickle.main(str(pkl), out_npz)

    # golden capture (what parity_harness.capture does with the torch
    # pickle, here fed by our own synthesis → NCHW)
    ws = np.asarray(jax.random.normal(jax.random.PRNGKey(1),
                                      (1, cfg.num_ws, 512)))
    label = np.asarray(camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None)))
    from hfa_gp_tpu.models.eg3d import networks as nets
    planes = np.asarray(nets.backbone_apply(
        params["backbone"], cfg.backbone, ws, noise_mode="const"))
    out = synthesis(params, cfg, ws, label, noise_mode="const")
    golden = str(tmp_path / "golden.npz")
    np.savez(golden, ws=ws, label=label,
             planes=planes.transpose(0, 3, 1, 2),
             image=np.asarray(out["image"]).transpose(0, 3, 1, 2),
             image_raw=np.asarray(out["image_raw"]).transpose(0, 3, 1, 2))

    psnrs = parity_harness.compare(golden, out_npz, cfg=cfg)
    assert set(psnrs) == {"planes", "image_raw", "image"}
    for stage, db in psnrs.items():
        assert db > 60.0, (stage, db)


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


# ---------------------------------------------------------------------------
# MTCNN converter (tools/convert_mtcnn.py)
# ---------------------------------------------------------------------------


class _TorchPNet(torch.nn.Module):
    """Clean-room facenet-pytorch PNet (models/mtcnn.py architecture)."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 10, 3)
        self.prelu1 = nn.PReLU(10)
        self.pool1 = nn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv2 = nn.Conv2d(10, 16, 3)
        self.prelu2 = nn.PReLU(16)
        self.conv3 = nn.Conv2d(16, 32, 3)
        self.prelu3 = nn.PReLU(32)
        self.conv4_1 = nn.Conv2d(32, 2, 1)
        self.conv4_2 = nn.Conv2d(32, 4, 1)

    def forward(self, x):
        x = self.prelu1(self.conv1(x))
        x = self.pool1(x)
        x = self.prelu2(self.conv2(x))
        x = self.prelu3(self.conv3(x))
        return torch.softmax(self.conv4_1(x), 1), self.conv4_2(x)


class _TorchRNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 28, 3)
        self.prelu1 = nn.PReLU(28)
        self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = nn.Conv2d(28, 48, 3)
        self.prelu2 = nn.PReLU(48)
        self.pool2 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = nn.Conv2d(48, 64, 2)
        self.prelu3 = nn.PReLU(64)
        self.dense4 = nn.Linear(576, 128)
        self.prelu4 = nn.PReLU(128)
        self.dense5_1 = nn.Linear(128, 2)
        self.dense5_2 = nn.Linear(128, 4)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.prelu3(self.conv3(x))
        x = x.permute(0, 3, 2, 1).contiguous()       # Matlab flatten order
        x = self.prelu4(self.dense4(x.view(x.shape[0], -1)))
        return torch.softmax(self.dense5_1(x), 1), self.dense5_2(x)


class _TorchONet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 32, 3)
        self.prelu1 = nn.PReLU(32)
        self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = nn.Conv2d(32, 64, 3)
        self.prelu2 = nn.PReLU(64)
        self.pool2 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = nn.Conv2d(64, 64, 3)
        self.prelu3 = nn.PReLU(64)
        self.pool3 = nn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv4 = nn.Conv2d(64, 128, 2)
        self.prelu4 = nn.PReLU(128)
        self.dense5 = nn.Linear(1152, 256)
        self.prelu5 = nn.PReLU(256)
        self.dense6_1 = nn.Linear(256, 2)
        self.dense6_2 = nn.Linear(256, 4)
        self.dense6_3 = nn.Linear(256, 10)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.pool3(self.prelu3(self.conv3(x)))
        x = self.prelu4(self.conv4(x))
        x = x.permute(0, 3, 2, 1).contiguous()
        x = self.prelu5(self.dense5(x.view(x.shape[0], -1)))
        return (torch.softmax(self.dense6_1(x), 1), self.dense6_2(x),
                self.dense6_3(x))


def test_convert_mtcnn_matches_torch():
    """The facenet-pytorch weight mapping must be numerically exact:
    random torch nets vs our JAX cascade through the converter."""
    from hfa_gp_tpu.preprocess import mtcnn as jm
    from tools.convert_mtcnn import convert_facenet_pytorch

    torch.manual_seed(0)
    tp, tr, to = _TorchPNet().eval(), _TorchRNet().eval(), _TorchONet().eval()
    sds = [{k: v.numpy() for k, v in m.state_dict().items()}
           for m in (tp, tr, to)]
    params = convert_facenet_pytorch(*sds)

    rng = np.random.default_rng(0)
    x_p = rng.standard_normal((1, 37, 51, 3)).astype(np.float32)
    x_r = rng.standard_normal((3, 24, 24, 3)).astype(np.float32)
    x_o = rng.standard_normal((3, 48, 48, 3)).astype(np.float32)

    with torch.no_grad():
        tprob, treg = tp(torch.from_numpy(x_p).permute(0, 3, 1, 2))
        rprob, rreg = tr(torch.from_numpy(x_r).permute(0, 3, 1, 2))
        oprob, oreg, olmk = to(torch.from_numpy(x_o).permute(0, 3, 1, 2))

    jprob, jreg = jm.pnet_apply(params["pnet"], x_p)
    np.testing.assert_allclose(np.asarray(jprob),
                               tprob.permute(0, 2, 3, 1).numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(jreg),
                               treg.permute(0, 2, 3, 1).numpy(), atol=2e-5)

    jprob, jreg = jm.rnet_apply(params["rnet"], x_r)
    np.testing.assert_allclose(np.asarray(jprob), rprob.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jreg), rreg.numpy(), atol=2e-5)

    jprob, jreg, jlmk = jm.onet_apply(params["onet"], x_o)
    np.testing.assert_allclose(np.asarray(jprob), oprob.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jreg), oreg.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jlmk), olmk.numpy(), atol=2e-5)


def test_convert_mtcnn_bake_transpose_identity():
    """bake_transpose must make net(x) equal the original net on the
    transposed image with outputs mapped back (Sandberg det*.npy
    transposed-image protocol)."""
    from hfa_gp_tpu.preprocess import mtcnn as jm
    from tools.convert_mtcnn import bake_transpose

    params = jax.tree_util.tree_map(
        np.asarray, jm.init_mtcnn(jax.random.PRNGKey(0)))
    baked = bake_transpose(params)
    rng = np.random.default_rng(1)

    x = rng.standard_normal((1, 30, 44, 3)).astype(np.float32)
    xt = np.transpose(x, (0, 2, 1, 3))
    prob_b, reg_b = jm.pnet_apply(baked["pnet"], x)
    prob_o, reg_o = jm.pnet_apply(params["pnet"], xt)
    np.testing.assert_allclose(np.asarray(prob_b),
                               np.transpose(np.asarray(prob_o),
                                            (0, 2, 1, 3)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(reg_b),
        np.transpose(np.asarray(reg_o), (0, 2, 1, 3))[..., [1, 0, 3, 2]],
        atol=1e-5)

    x = rng.standard_normal((2, 24, 24, 3)).astype(np.float32)
    xt = np.transpose(x, (0, 2, 1, 3))
    prob_b, reg_b = jm.rnet_apply(baked["rnet"], x)
    prob_o, reg_o = jm.rnet_apply(params["rnet"], xt)
    np.testing.assert_allclose(np.asarray(prob_b), np.asarray(prob_o),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg_b),
                               np.asarray(reg_o)[:, [1, 0, 3, 2]],
                               atol=1e-5)

    x = rng.standard_normal((2, 48, 48, 3)).astype(np.float32)
    xt = np.transpose(x, (0, 2, 1, 3))
    prob_b, reg_b, lmk_b = jm.onet_apply(baked["onet"], x)
    prob_o, reg_o, lmk_o = jm.onet_apply(params["onet"], xt)
    np.testing.assert_allclose(np.asarray(prob_b), np.asarray(prob_o),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg_b),
                               np.asarray(reg_o)[:, [1, 0, 3, 2]],
                               atol=1e-5)
    perm = np.concatenate([np.arange(5, 10), np.arange(5)])
    np.testing.assert_allclose(np.asarray(lmk_b),
                               np.asarray(lmk_o)[:, perm], atol=1e-5)


def test_convert_mtcnn_npz_roundtrip_detects(tmp_path):
    """Converted npz loads through pytree_io and drives detect_faces."""
    from hfa_gp_tpu.preprocess import mtcnn as jm
    from hfa_gp_tpu.utils import pytree_io
    from tools.convert_mtcnn import convert_facenet_pytorch

    torch.manual_seed(1)
    sds = [{k: v.numpy() for k, v in m.state_dict().items()}
           for m in (_TorchPNet(), _TorchRNet(), _TorchONet())]
    params = convert_facenet_pytorch(*sds)
    path = str(tmp_path / "mtcnn.npz")
    pytree_io.save_npz(params, path)
    loaded = pytree_io.load_npz(path)
    img = np.random.default_rng(2).integers(
        0, 255, (120, 96, 3), dtype=np.uint8)
    out = jm.detect_faces(loaded, img)         # random weights: any result
    assert isinstance(out, list)


# ---------------------------------------------------------------------------
# Avatar checkpoint converter (tools/convert_avatar.py)
# ---------------------------------------------------------------------------


def _encoder_to_torch_sd(enc: dict) -> dict:
    """Inverse of convert_avatar.convert_encoder: our encoder pytree →
    reference Encoder state-dict keys (numpy values)."""
    def oihw(w):
        return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))

    sd = {"net_app.convs.0.0.weight": oihw(enc["net_app"]["stem"]["weight"]),
          "net_app.convs.0.1.bias": np.asarray(
              enc["net_app"]["stem"]["act_bias"])}
    i = 0
    while f"res{i}" in enc["net_app"]:
        r = enc["net_app"][f"res{i}"]
        b = f"net_app.convs.{i + 1}"
        sd[f"{b}.conv1.0.weight"] = oihw(r["conv1"]["weight"])
        sd[f"{b}.conv1.1.bias"] = np.asarray(r["conv1"]["act_bias"])
        sd[f"{b}.conv2.0.kernel"] = np.ones((4, 4), np.float32)  # Blur buf
        sd[f"{b}.conv2.1.weight"] = oihw(r["conv2"]["weight"])
        sd[f"{b}.conv2.2.bias"] = np.asarray(r["conv2"]["act_bias"])
        sd[f"{b}.skip.0.kernel"] = np.ones((4, 4), np.float32)
        sd[f"{b}.skip.1.weight"] = oihw(r["skip"]["weight"])
        i += 1
    sd[f"net_app.convs.{i + 1}.weight"] = oihw(
        enc["net_app"]["final"]["weight"])
    for j in range(5):
        if f"fc{j}" in enc["fc"]:
            sd[f"fc.{j}.weight"] = np.asarray(enc["fc"][f"fc{j}"]["weight"])
            sd[f"fc.{j}.bias"] = np.asarray(enc["fc"][f"fc{j}"]["bias"])
    if "pose" in enc:
        for j in range(5):
            sd[f"pose.{j}.weight"] = np.asarray(
                enc["pose"][f"fc{j}"]["weight"])
            sd[f"pose.{j}.bias"] = np.asarray(enc["pose"][f"fc{j}"]["bias"])
    return sd


def test_convert_avatar_rgb_roundtrip():
    """Synthesize a reference-layout RGB checkpoint from our params, run
    the converter, and require exact tree equality + a working forward."""
    from hfa_gp_tpu.models.avatar import heads
    from tools.convert_avatar import convert_avatar_checkpoint

    cfg = heads.AvatarConfig(size=64, dim_shape=8, out_pose=True,
                             eg3d=small_config())
    params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg)

    sd = {}
    for k, v in _encoder_to_torch_sd(params["encoder"]).items():
        sd[f"encoder.{k}"] = v
    sd["bases"] = np.asarray(params["subspace"]["bases"])
    sd["delta"] = np.asarray(params["subspace"]["delta"])
    for k, v in to_torch_sd(params["generator"]).items():
        sd[f"generator.{k}"] = v.numpy()

    tree = convert_avatar_checkpoint({"gen": sd}, "rgb")
    tree_allclose(params, tree)

    # the converted tree drives the full flagship forward
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3),
                             minval=-1, maxval=1)
    label = camera.flip_yz_label(
        camera.sample_camera_label(None, n=1, mode=None))
    w, _pose = heads.rgb_get_weights(tree, cfg, img)
    latent = heads.get_latent(tree, w, cfg)
    out = heads.get_image(tree, cfg, latent, np.asarray(label))
    assert np.isfinite(np.asarray(out)).all()


def test_convert_avatar_audio_roundtrip():
    from hfa_gp_tpu.models.avatar import heads
    from hfa_gp_tpu.train import audio as audio_train
    from tools.convert_avatar import convert_avatar_checkpoint

    cfg = heads.AvatarConfig(size=64, dim_shape=8, eg3d=small_config())
    params = audio_train.init_audio_params(jax.random.PRNGKey(0), cfg)

    sd = {"bases": np.asarray(params["model"]["subspace"]["bases"]),
          "delta": np.asarray(params["model"]["subspace"]["delta"])}
    for j in range(7):
        w = params["model"]["weights_mlp"][f"fc{j}"]
        sd[f"weights_3dmm.fc.{j}.weight"] = np.asarray(w["weight"])
        sd[f"weights_3dmm.fc.{j}.bias"] = np.asarray(w["bias"])
    for k, v in to_torch_sd(params["model"]["generator"]).items():
        sd[f"generator.{k}"] = v.numpy()

    aud_sd = {}
    for j, idx in enumerate((0, 2, 4, 6)):
        c = params["audnet"][f"conv{j}"]
        aud_sd[f"encoder_conv.{idx}.weight"] = np.ascontiguousarray(
            np.asarray(c["weight"]).transpose(2, 1, 0))
        aud_sd[f"encoder_conv.{idx}.bias"] = np.asarray(c["bias"])
    for j, idx in enumerate((0, 2)):
        c = params["audnet"][f"fc{j}"]
        aud_sd[f"encoder_fc1.{idx}.weight"] = np.asarray(c["weight"])
        aud_sd[f"encoder_fc1.{idx}.bias"] = np.asarray(c["bias"])

    att_sd = {}
    for j, idx in enumerate((0, 2, 4, 6, 8)):
        c = params["audattnet"][f"conv{j}"]
        att_sd[f"attentionConvNet.{idx}.weight"] = np.ascontiguousarray(
            np.asarray(c["weight"]).transpose(2, 1, 0))
        att_sd[f"attentionConvNet.{idx}.bias"] = np.asarray(c["bias"])
    att_sd["attentionNet.0.weight"] = np.asarray(
        params["audattnet"]["att_fc"]["weight"])
    att_sd["attentionNet.0.bias"] = np.asarray(
        params["audattnet"]["att_fc"]["bias"])

    tree = convert_avatar_checkpoint(
        {"gen": sd, "AudNet": aud_sd, "AudAttNet": att_sd}, "audio")
    tree_allclose(params, tree)


def test_convert_lpips_roundtrip():
    """Synthesize an `lpips` package layout state dict (net.slice{k}.{j}
    original-index module names, lin{i}.model.1 1x1 heads) from our init
    tree; the converter must reproduce the tree exactly and the distance
    must stay a valid metric (d(x,x)=0)."""
    import jax.numpy as jnp

    from hfa_gp_tpu.models import lpips as lpips_mod
    from tools.convert_lpips import convert

    params = lpips_mod.init_lpips(jax.random.PRNGKey(0))
    slice_keys = ["net.slice1.0", "net.slice2.3", "net.slice3.6",
                  "net.slice4.8", "net.slice5.10"]
    sd = {}
    for i, sk in enumerate(slice_keys):
        w = np.asarray(params[f"conv{i}"]["weight"])
        sd[f"{sk}.weight"] = torch.from_numpy(
            np.ascontiguousarray(w.transpose(3, 2, 0, 1)))
        sd[f"{sk}.bias"] = torch.from_numpy(
            np.asarray(params[f"conv{i}"]["bias"]))
        lw = np.asarray(params[f"lin{i}"]["weight"])
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            lw.reshape(1, -1, 1, 1))
    tree = convert(sd)
    tree_allclose(params, tree)

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    d_same = lpips_mod.lpips_distance(tree, x, x)
    assert float(jnp.abs(d_same).max()) < 1e-6
    y = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    assert float(lpips_mod.lpips_distance(tree, x, y).mean()) > 0
