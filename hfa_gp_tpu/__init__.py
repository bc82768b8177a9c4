"""hfa_gp_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of HFA-GP ("High-Fidelity Facial Avatar Reconstruction From
Monocular Video With Generative Priors", CVPR 2023).

Layer map (mirrors the reference's de-facto layers, re-designed TPU-first):

  core/       fused XLA/Pallas kernels replacing the reference's CUDA ops
              (bias_act, upfirdn2d, modulated conv, tri-plane sampling,
              ray marching) plus camera/label math.
  models/     the EG3D tri-plane generator, the personalized latent
              subspace + driving encoders (RGB / 3DMM / audio), LPIPS,
              and arcface backbones.
  parallel/   jax.sharding mesh construction, data-parallel training
              utilities, ray-axis sharding, and a PartialFC-equivalent
              class-sharded softmax over the mesh `model` axis.
  train/      functional (optax) trainers for the three driving modes.
  data/       dataset readers matching the reference's on-disk contracts.
  preprocess/ the eg3d-pose-detection pipeline as batched jit programs.
  cli/        train_* / run_recon_video_* entry points.

Reference: /root/reference (bbaaii/HFA-GP); see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
