"""Self-reconstruction convergence demo — end-to-end quality evidence
without external assets.

Builds a synthetic "subject" the same way the reference's pipeline
consumes a real one: a frozen EG3D generator (random weights — the
in-env stand-in for ffhqrebalanced512-128.pkl, which headnerf.py:31-38
loads) plus a hidden ground-truth subspace (bases*, delta*) and per-frame
weights α*_k produce K posed frames — exactly the (image, 25-dim label)
contract of HeadData. The trainable avatar (fresh encoder + fresh
subspace, SAME frozen generator) is then fit with the real RGB training
step (train/rgb.py = trainer_rgb.py:73-98 parity: encoder → QR subspace
→ synthesis → pooled L2+LPIPS → Adam), and reconstruction PSNR is
reported on train and HELD-OUT frames before/after.

This demonstrates the full fit→reenact loop recovers a subject through
the actual production code path (windowed Pallas sampler fwd+bwd on
TPU), independent of real datasets. PSNR is measured at the encoder/loss
resolution (cfg.size), images in [-1, 1] → PSNR = 10·log10(4 / MSE).

Usage: python tools/fit_selfrecon.py [steps] [batch] [n_frames] [--small]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv or "--small" in sys.argv:
    # tiny smoke config: don't claim (or hang on) the TPU tunnel
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hfa_gp_tpu.core import camera as cam
from hfa_gp_tpu.core import ops
from hfa_gp_tpu.models import lpips as lpips_mod
from hfa_gp_tpu.models.avatar import heads
from hfa_gp_tpu.models.eg3d import networks as nets
from hfa_gp_tpu.models.eg3d import renderer as rnd
from hfa_gp_tpu.models.eg3d.generator import EG3DConfig
from hfa_gp_tpu.train import rgb as rgb_train
from hfa_gp_tpu.train.state import init_state, make_optimizer


def build_cfg(small: bool) -> heads.AvatarConfig:
    if small:  # CPU smoke: tiny generator, XLA sampler
        eg3d = EG3DConfig(
            mapping=nets.MappingConfig(num_layers=2),
            backbone=nets.BackboneConfig(img_resolution=32,
                                         channel_base=2048,
                                         channel_max=128),
            sr=nets.SRConfig(input_resolution=16, output_resolution=64,
                             in_channels=32, block_channels=(32, 16)),
            render=rnd.RenderConfig(depth_resolution=8,
                                    depth_resolution_importance=8,
                                    neural_rendering_resolution=16),
        )
        return heads.AvatarConfig(size=64, dim_shape=8, eg3d=eg3d)
    on_accel = jax.devices()[0].platform in ("tpu", "axon")
    render = rnd.RenderConfig(decoder_dtype=jnp.bfloat16,
                              use_pallas_sampler=True) if on_accel else \
        rnd.RenderConfig(ray_chunk=4096)
    return heads.AvatarConfig(
        eg3d=EG3DConfig(compute_dtype=jnp.bfloat16, render=render))


def psnr(a: jax.Array, b: jax.Array) -> jax.Array:
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return 10.0 * jnp.log10(4.0 / mse)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    small = "--small" in sys.argv
    steps = int(args[0]) if len(args) > 0 else (400 if not small else 30)
    batch = int(args[1]) if len(args) > 1 else (4 if not small else 2)
    n_frames = int(args[2]) if len(args) > 2 else 24
    n_test = max(2, n_frames // 6)

    cfg = build_cfg(small)
    key = jax.random.PRNGKey(0)
    k_gt, k_alpha, k_cam, k_fit, k_lp = jax.random.split(key, 5)

    # --- synthetic subject: hidden subspace + frozen generator -------
    params_gt = heads.init_avatar_rgb(k_gt, cfg)
    alpha_gt = 2.0 * jax.random.normal(
        k_alpha, (n_frames + n_test, cfg.dim_shape))
    labels = cam.sample_camera_label(k_cam, n=n_frames + n_test,
                                     mode="gaussian")

    @jax.jit
    def render_subject(alpha, label):
        latent = heads.get_latent(params_gt, alpha, cfg)
        img = heads.get_image(params_gt, cfg, latent, label,
                              label_convention="opengl")
        return ops.avg_pool_to(img, cfg.size)

    frames = []
    for i in range(0, n_frames + n_test, batch):
        frames.append(np.asarray(
            render_subject(alpha_gt[i:i + batch], labels[i:i + batch]),
            np.float32))
    frames = np.concatenate(frames)[:n_frames + n_test]
    train_imgs, test_imgs = frames[:n_frames], frames[n_frames:]
    train_labs, test_labs = (np.asarray(labels)[:n_frames],
                             np.asarray(labels)[n_frames:])
    print(f"subject: {n_frames} train + {n_test} held-out frames at "
          f"{cfg.size}² (gt range [{frames.min():.2f}, "
          f"{frames.max():.2f}])", flush=True)

    # --- trainable avatar: fresh encoder + subspace, frozen generator
    params = heads.init_avatar_rgb(k_fit, cfg)
    params["generator"] = params_gt["generator"]   # same prior, frozen
    lp = lpips_mod.init_lpips(k_lp)
    tx = make_optimizer(3e-4)
    state = init_state(params, tx)
    step = rgb_train.make_train_step(cfg, tx, tune_iter=10 ** 9,
                                     label_convention="opengl")

    ev = rgb_train.make_eval_step(cfg, label_convention="opengl")

    def eval_psnr(params):
        vals = []
        for imgs, labs in ((train_imgs, train_labs),
                           (test_imgs, test_labs)):
            ps = []
            for i in range(len(imgs)):
                out = ev(params, jnp.asarray(imgs[i:i + 1]),
                         jnp.asarray(labs[i:i + 1]))
                gen = ops.avg_pool_to(out, cfg.size)
                ps.append(float(psnr(gen, jnp.asarray(imgs[i:i + 1]))[0]))
            vals.append(float(np.mean(ps)))
        return vals  # [train_psnr, test_psnr]

    p0 = eval_psnr(state.params)
    print(f"before fit: train PSNR {p0[0]:.2f} dB / held-out {p0[1]:.2f} dB",
          flush=True)

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    loss0 = None
    for it in range(steps):
        idx = rng.integers(0, n_frames, size=batch)
        state, m = step(state, lp, jnp.asarray(train_imgs[idx]),
                        jnp.asarray(train_labs[idx]))
        if it == 0:
            loss0 = float(m["loss"])
            print(f"step 0: loss {loss0:.4f} (l2 {float(m['l2_loss']):.4f})",
                  flush=True)
        elif (it + 1) % max(1, steps // 8) == 0:
            # pipelined: fetch a scalar only at report points
            print(f"step {it + 1}: loss {float(m['loss']):.4f} "
                  f"(l2 {float(m['l2_loss']):.4f}) "
                  f"[{time.perf_counter() - t0:.0f}s]", flush=True)

    p1 = eval_psnr(state.params)
    print(f"after {steps} steps: train PSNR {p1[0]:.2f} dB "
          f"(+{p1[0] - p0[0]:.2f}) / held-out {p1[1]:.2f} dB "
          f"(+{p1[1] - p0[1]:.2f})", flush=True)
    assert p1[0] > p0[0] + 3.0, "training did not materially improve PSNR"
    print("OK", flush=True)


if __name__ == "__main__":
    main()
