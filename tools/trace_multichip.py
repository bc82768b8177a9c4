"""Multi-chip scaling evidence on the virtual CPU mesh (VERDICT r1 #10).

A CPU mesh can't prove speed, but it proves the COLLECTIVE SCHEDULE: this
tool compiles the hybrid (data × model) RGB train step and the PartialFC
arcface step on an 8-device mesh, then

  1. censuses the collective ops XLA actually inserted (all-reduce /
     all-gather / reduce-scatter / collective-permute) per program, and
  2. captures a jax.profiler trace of one executed step into
     --trace_dir (TensorBoard-loadable), mirroring the reference's
     docs/speed_benchmark.md methodology.

Self-bootstraps a virtual mesh exactly like __graft_entry__: re-execs in
a child with --xla_force_host_platform_device_count when fewer devices
are visible.
"""
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_DEVICES = 8


def census(label, compiled):
    txt = compiled.as_text()
    counts = {op: len(re.findall(rf"\b{op}", txt))
              for op in ("all-reduce", "all-gather", "reduce-scatter",
                         "collective-permute", "all-to-all")}
    body_ = "  ".join(f"{k}={v}" for k, v in counts.items() if v)
    print(f"{label}: {body_ or '(no collectives!)'}", flush=True)
    return counts


def body():
    import jax
    import numpy as np

    from hfa_gp_tpu.core import camera
    from hfa_gp_tpu.models import lpips as lpips_mod
    from hfa_gp_tpu.models.avatar import heads
    from hfa_gp_tpu.models.eg3d import networks as nets
    from hfa_gp_tpu.models.eg3d import renderer as rnd
    from hfa_gp_tpu.models.eg3d.generator import EG3DConfig
    from hfa_gp_tpu.parallel import mesh as mesh_mod
    from hfa_gp_tpu.train import rgb as rgb_train
    from hfa_gp_tpu.train.state import init_state, make_optimizer

    devices = jax.devices()
    assert len(devices) >= N_DEVICES, len(devices)
    mesh = mesh_mod.make_mesh(n_data=4, n_model=2,
                              devices=devices[:N_DEVICES])

    eg3d_cfg = EG3DConfig(
        backbone=nets.BackboneConfig(img_resolution=32, channel_base=2048,
                                     channel_max=128),
        sr=nets.SRConfig(input_resolution=16, output_resolution=64,
                         in_channels=32, block_channels=(32, 16)),
        render=rnd.RenderConfig(depth_resolution=8,
                                depth_resolution_importance=8,
                                neural_rendering_resolution=16,
                                ray_shard_axis=mesh_mod.MODEL_AXIS))
    cfg = heads.AvatarConfig(size=64, dim_shape=8, eg3d=eg3d_cfg)
    params = heads.init_avatar_rgb(jax.random.PRNGKey(0), cfg)
    lpips_params = lpips_mod.init_lpips(jax.random.PRNGKey(1))
    tx = make_optimizer()
    step = rgb_train.make_train_step(cfg, tx, tune_iter=0, donate=False)

    b = 8
    real = np.random.default_rng(0).uniform(
        -1, 1, (b, cfg.size, cfg.size, 3)).astype(np.float32)
    label = np.asarray(camera.flip_yz_label(
        camera.sample_camera_label(None, n=b, mode=None)))

    trace_dir = os.environ.get("TRACE_DIR", "/tmp/hfa_trace_multichip")

    with jax.sharding.set_mesh(mesh):
        state = init_state(mesh_mod.replicate(mesh, params), tx)
        state = state._replace(
            opt_state=mesh_mod.replicate(mesh, state.opt_state))
        lp = mesh_mod.replicate(mesh, lpips_params)
        real_s, label_s = mesh_mod.shard_batch(mesh, (real, label))

        import jax.numpy as jnp
        lowered = jax.jit(step).lower(state, lp, real_s, label_s)
        census("rgb train step 4x2 (dp x ray-sp)", lowered.compile())

        state2, metrics = jax.jit(step)(state, lp, real_s, label_s)
        with jax.profiler.trace(trace_dir):
            state2, metrics = jax.jit(step)(state2, lp, real_s, label_s)
            jax.block_until_ready(metrics)
        print(f"rgb step loss={float(metrics['loss']):.4f}; trace in "
              f"{trace_dir}", flush=True)

    # PartialFC hybrid step (same structure as
    # tests/test_arcface.py::test_arcface_train_step_hybrid_mesh)
    from hfa_gp_tpu.parallel.partial_fc import PartialFC
    from hfa_gp_tpu.train import arcface as arc

    amesh = mesh_mod.make_mesh(n_data=4, n_model=2,
                               devices=devices[:N_DEVICES])
    pfc = PartialFC(amesh, num_classes=64, embedding_dim=512)
    tx2, fc_tx = arc.make_optimizers(total_steps=10, lr=0.01)
    astep = arc.make_train_step(pfc, tx2, fc_tx, "iresnet18",
                                dtype=jnp.float32, donate=False)
    rng = np.random.default_rng(1)
    with jax.sharding.set_mesh(amesh):
        astate = arc.init_state(jax.random.PRNGKey(0), pfc, tx2, fc_tx,
                                "iresnet18")
        astate = astate._replace(
            backbone=mesh_mod.replicate(amesh, astate.backbone),
            batch_stats=mesh_mod.replicate(amesh, astate.batch_stats),
            opt_state=mesh_mod.replicate(amesh, astate.opt_state))
        imgs = rng.standard_normal((8, 112, 112, 3)).astype(np.float32)
        labs = rng.integers(0, 64, 8).astype(np.int32)
        imgs_s, labs_s = mesh_mod.shard_batch(amesh, (imgs, labs))
        key = jax.random.PRNGKey(0)
        lowered = jax.jit(astep).lower(astate, imgs_s, labs_s, key)
        census("partial_fc step 4x2 (dp x class-mp)", lowered.compile())
        astate, am = jax.jit(astep)(astate, imgs_s, labs_s, key)
        print(f"partial_fc loss={float(am['loss']):.4f}", flush=True)
    print("trace_multichip OK", flush=True)


def main():
    import jax
    if len(jax.devices()) >= N_DEVICES:
        body()
        return
    env = dict(os.environ)   # never overwrite PYTHONPATH (CLAUDE.md)
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "host_platform_device_count" not in f)
    env["XLA_FLAGS"] = \
        f"{flags} --xla_force_host_platform_device_count={N_DEVICES}".strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = ("import sys; sys.path.insert(0, %r)\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from tools import trace_multichip as t\n"
            "t.body()\n" % repo)
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          timeout=1800)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
