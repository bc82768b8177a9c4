"""StyleGAN2 networks of the EG3D generator, TPU-native.

The reference reaches these through NVIDIA's persistence-pickled source in
`ffhqrebalanced512-128.pkl` (loaded at reference code/networks/headnerf.py:31-38
and called as `G.synthesis(ws[B,14,512], c[B,25])` at headnerf.py:112).
This is a from-scratch JAX rebuild of the public EG3D architecture
(arXiv 2112.07945; see PAPERS.md): mapping network, tri-plane StyleGAN2
backbone (256², 96 channels), and the hybrid super-resolution head.

Everything is functional: `init_*` builds a params pytree, `*_apply` is a
pure function. Tensors are NHWC; weights are HWIO (converted from the
torch pickle by tools/convert_pickle.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...core import ops

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BackboneConfig:
    """StyleGAN2 backbone producing the 96-channel tri-plane stack."""
    w_dim: int = 512
    img_resolution: int = 256          # tri-plane spatial resolution
    img_channels: int = 96             # 3 planes x 32 features
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: float | None = 256.0
    fir: tuple[int, ...] = (1, 3, 3, 1)
    # per-sample fused-weight modconv (batch_group_count) instead of the
    # x*s / y*d prescale-postscale formulation; see ops.modulated_conv2d
    fused_modconv: bool = False

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def block_resolutions(self) -> tuple[int, ...]:
        n = int(math.log2(self.img_resolution))
        return tuple(2 ** i for i in range(2, n + 1))

    @property
    def num_ws(self) -> int:
        # 1 conv in the 4x4 block, 2 in every other, +1 for the last torgb
        return 1 + 2 * (len(self.block_resolutions) - 1) + 1


@dataclass(frozen=True)
class MappingConfig:
    z_dim: int = 512
    c_dim: int = 25
    w_dim: int = 512
    num_layers: int = 2                # EG3D map_depth
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998


@dataclass(frozen=True)
class SRConfig:
    """SuperresolutionHybrid8XDC: 128² raw neural render → 512² RGB.

    Two up-sampling StyleGAN2 blocks (256² then 512²), each conditioned on
    the last entry of ws; inputs below 128² are bilinearly (antialias)
    resized up first."""
    input_resolution: int = 128
    output_resolution: int = 512
    in_channels: int = 32
    block_channels: tuple[int, int] = (256, 128)
    w_dim: int = 512
    conv_clamp: float | None = 256.0
    antialias: bool = True
    fir: tuple[int, ...] = (1, 3, 3, 1)
    fused_modconv: bool = False


# ---------------------------------------------------------------------------
# Parameter init helpers
# ---------------------------------------------------------------------------


def _init_fc(key, in_dim, out_dim, bias_init=0.0) -> Params:
    return {
        "weight": jax.random.normal(key, (out_dim, in_dim), jnp.float32),
        "bias": jnp.full((out_dim,), bias_init, jnp.float32),
    }


def _init_synth_layer(key, in_ch, out_ch, w_dim, resolution, kernel=3,
                      use_noise=True) -> Params:
    k1, k2 = jax.random.split(key)
    p: Params = {
        "weight": jax.random.normal(k1, (kernel, kernel, in_ch, out_ch),
                                    jnp.float32),
        "bias": jnp.zeros((out_ch,), jnp.float32),
        "affine": _init_fc(k2, w_dim, in_ch, bias_init=1.0),
    }
    if use_noise:
        p["noise_strength"] = jnp.zeros((), jnp.float32)
        p["noise_const"] = jnp.zeros((resolution, resolution), jnp.float32)
    return p


def _init_torgb(key, in_ch, out_ch, w_dim) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "weight": jax.random.normal(k1, (1, 1, in_ch, out_ch), jnp.float32),
        "bias": jnp.zeros((out_ch,), jnp.float32),
        "affine": _init_fc(k2, w_dim, in_ch, bias_init=1.0),
    }


# ---------------------------------------------------------------------------
# Mapping network
# ---------------------------------------------------------------------------


def init_mapping(key, cfg: MappingConfig, num_ws: int) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 1)
    p: Params = {"w_avg": jnp.zeros((cfg.w_dim,), jnp.float32)}
    if cfg.c_dim > 0:
        p["embed"] = _init_fc(keys[-1], cfg.c_dim, cfg.w_dim)
    in_dim = cfg.z_dim + (cfg.w_dim if cfg.c_dim > 0 else 0)
    for i in range(cfg.num_layers):
        p[f"fc{i}"] = _init_fc(keys[i], in_dim, cfg.w_dim)
        in_dim = cfg.w_dim
    return p


def mapping_apply(params: Params, cfg: MappingConfig, num_ws: int,
                  z: jax.Array, c: jax.Array | None,
                  truncation_psi: float = 1.0) -> jax.Array:
    """z[B,512], c[B,25] → ws[B,num_ws,512]."""
    x = ops.normalize_2nd_moment(z)
    if cfg.c_dim > 0:
        assert c is not None
        y = ops.fully_connected(c, **params["embed"])
        y = ops.normalize_2nd_moment(y)
        x = jnp.concatenate([x, y], axis=-1)
    for i in range(cfg.num_layers):
        x = ops.fully_connected(x, **params[f"fc{i}"], activation="lrelu",
                                lr_multiplier=cfg.lr_multiplier)
    if truncation_psi != 1.0:
        x = params["w_avg"] + truncation_psi * (x - params["w_avg"])
    return jnp.tile(x[:, None, :], (1, num_ws, 1))


# ---------------------------------------------------------------------------
# Synthesis layers / blocks
# ---------------------------------------------------------------------------


def synth_layer_apply(p: Params, x: jax.Array, w: jax.Array, *,
                      up: int = 1, fir, conv_clamp,
                      noise_mode: str = "const",
                      rng: jax.Array | None = None,
                      fused_modconv: bool = False) -> jax.Array:
    """StyleGAN2 SynthesisLayer: modconv(+up) → noise → bias+lrelu+clamp."""
    styles = ops.fully_connected(w, **p["affine"])
    y = ops.modulated_conv2d(x, p["weight"], styles, up=up,
                             padding=p["weight"].shape[0] // 2,
                             resample_filter=fir, fused=fused_modconv)
    if "noise_strength" in p and noise_mode != "none":
        if noise_mode == "const":
            noise = p["noise_const"]
        elif noise_mode == "random":
            assert rng is not None, "random noise needs an rng key"
            noise = jax.random.normal(rng, y.shape[1:3], y.dtype)
        else:
            raise ValueError(noise_mode)
        y = y + (noise * p["noise_strength"]).astype(y.dtype)[None, :, :,
                                                              None]
    return ops.bias_act(y, p["bias"], act="lrelu", clamp=conv_clamp)


def torgb_apply(p: Params, x: jax.Array, w: jax.Array, *,
                conv_clamp) -> jax.Array:
    """ToRGBLayer: non-demodulated 1x1 modconv with weight_gain folding."""
    in_ch = p["weight"].shape[2]
    styles = ops.fully_connected(w, **p["affine"])
    styles = styles * (1.0 / math.sqrt(in_ch))  # weight_gain (kernel 1)
    y = ops.modulated_conv2d(x, p["weight"], styles, demodulate=False)
    return ops.bias_act(y, p["bias"], clamp=conv_clamp)


def torgb_apply_cm(p: Params, x: jax.Array, w: jax.Array, *,
                   conv_clamp) -> jax.Array:
    """torgb_apply emitting CHANNEL-MAJOR (B, Cout, H, W).

    Same math as torgb_apply (1x1 non-demodulated modconv), but the style
    scale is folded into a PER-SAMPLE weight (B, Cin, Cout) — tiny — and
    the whole layer is one batched dot_general. Rationale (r5,
    tools/probe_sr_hlo.py): the xs = x·styles prescale on the big feature
    tensor forced AD to save it and XLA to recompute chunks of the
    forward chain in the backward (~11 GB extra HBM traffic at batch 2 —
    the entire SR img-chain gap). With the fold, the backward touches
    only x (already live for the conv path) and (B, Cin, Cout) weights,
    and the output lands channel-major so the 3-channel img chain never
    materializes a minor-dim-3 NHWC tensor."""
    in_ch = p["weight"].shape[2]
    styles = ops.fully_connected(w, **p["affine"])
    styles = styles * (1.0 / math.sqrt(in_ch))  # weight_gain (kernel 1)
    wb = p["weight"][0, 0][None] * styles[:, :, None]  # (B, Cin, Cout)
    wb = wb.astype(x.dtype)
    # (B,Cin,Cout) x (B,H,W,Cin) -> (B, Cout, H, W): batched, contracting
    # Cin, output already channel-major (minor dim W).
    y = jax.lax.dot_general(wb, x, (((1,), (3,)), ((0,), (0,))))
    y = y + p["bias"].astype(y.dtype)[None, :, None, None]
    if conv_clamp is not None:
        y = jnp.clip(y, -conv_clamp, conv_clamp)
    return y


def init_block(key, in_ch, out_ch, w_dim, resolution, img_channels, *,
               is_first: bool, up: bool = True) -> Params:
    ks = jax.random.split(key, 4)
    p: Params = {}
    if is_first:
        p["const"] = jax.random.normal(ks[0], (resolution, resolution,
                                               out_ch), jnp.float32)
    else:
        p["conv0"] = _init_synth_layer(ks[0], in_ch, out_ch, w_dim,
                                       resolution)
    p["conv1"] = _init_synth_layer(ks[1], out_ch, out_ch, w_dim, resolution)
    p["torgb"] = _init_torgb(ks[2], out_ch, img_channels, w_dim)
    return p


def block_apply(p: Params, x: jax.Array | None, img: jax.Array | None,
                ws_block: jax.Array, *, fir, conv_clamp,
                up: bool, noise_mode: str = "const",
                rng: jax.Array | None = None,
                compute_dtype=jnp.float32,
                img_cm: bool = False,
                fused_modconv: bool = False
                ) -> tuple[jax.Array, jax.Array]:
    """One skip-architecture SynthesisBlock.

    ws_block: (B, 3, w_dim) — conv0 (if present), conv1, torgb slots
    (the first block consumes slots 0: conv1 and 1: torgb).

    img_cm=True runs the img skip chain channel-major (B, C_img, H, W) —
    used by the SR head where C_img=3 makes NHWC layouts pathological."""
    rngs = (jax.random.split(rng, 2) if rng is not None else (None, None))
    w_i = 0
    if "const" in p:
        b = ws_block.shape[0]
        x = jnp.tile(p["const"][None], (b, 1, 1, 1)).astype(compute_dtype)
    else:
        x = x.astype(compute_dtype)
        x = synth_layer_apply(p["conv0"], x, ws_block[:, w_i], up=2 if up
                              else 1, fir=fir, conv_clamp=conv_clamp,
                              noise_mode=noise_mode, rng=rngs[0],
                              fused_modconv=fused_modconv)
        w_i += 1
    x = synth_layer_apply(p["conv1"], x, ws_block[:, w_i], fir=fir,
                          conv_clamp=conv_clamp, noise_mode=noise_mode,
                          rng=rngs[1], fused_modconv=fused_modconv)
    w_i += 1
    torgb = torgb_apply_cm if img_cm else torgb_apply
    y = torgb(p["torgb"], x, ws_block[:, w_i], conv_clamp=conv_clamp)
    y = y.astype(jnp.float32)
    if img is not None:
        if up:
            img = (ops.upsample2d_cm(img, fir) if img_cm else
                   ops.upsample2d(img, ops.make_fir_kernel(fir)))
        img = img + y
    else:
        img = y
    return x, img


# ---------------------------------------------------------------------------
# Backbone synthesis network (tri-plane generator trunk)
# ---------------------------------------------------------------------------


def init_backbone(key, cfg: BackboneConfig) -> Params:
    p: Params = {}
    res_list = cfg.block_resolutions
    keys = jax.random.split(key, len(res_list))
    in_ch = 0
    for k, res in zip(keys, res_list):
        out_ch = cfg.channels(res)
        p[f"b{res}"] = init_block(k, in_ch, out_ch, cfg.w_dim, res,
                                  cfg.img_channels, is_first=(res == 4))
        in_ch = out_ch
    return p


def backbone_apply(params: Params, cfg: BackboneConfig, ws: jax.Array, *,
                   noise_mode: str = "const",
                   rng: jax.Array | None = None,
                   compute_dtype=jnp.float32) -> jax.Array:
    """ws (B, num_ws, w_dim) → tri-plane stack (B, 256, 256, 96).

    w assignment follows StyleGAN2: each block consumes `num_conv` new
    w's and its torgb peeks at the next block's first w (the final torgb
    has a dedicated slot)."""
    assert ws.shape[1] == cfg.num_ws, (ws.shape, cfg.num_ws)
    fir = ops.make_fir_kernel(cfg.fir)
    x, img = None, None
    w_idx = 0
    n_blocks = len(cfg.block_resolutions)
    rngs = (jax.random.split(rng, n_blocks) if rng is not None
            else [None] * n_blocks)
    for i, res in enumerate(cfg.block_resolutions):
        is_first = res == 4
        num_conv = 1 if is_first else 2
        ws_block = ws[:, w_idx:w_idx + num_conv + 1]
        if is_first:
            # pad a dummy slot so block_apply's (conv0, conv1, torgb)
            # indexing sees (conv1, torgb) at positions 0,1
            ws_block = jnp.concatenate(
                [ws_block, jnp.zeros_like(ws_block[:, :1])], axis=1)
        x, img = block_apply(params[f"b{res}"], x, img, ws_block,
                             fir=cfg.fir, conv_clamp=cfg.conv_clamp,
                             up=not is_first, noise_mode=noise_mode,
                             rng=rngs[i], compute_dtype=compute_dtype,
                             fused_modconv=cfg.fused_modconv)
        w_idx += num_conv
    return img


# ---------------------------------------------------------------------------
# Super-resolution head (SuperresolutionHybrid8XDC)
# ---------------------------------------------------------------------------


def init_superresolution(key, cfg: SRConfig) -> Params:
    k0, k1 = jax.random.split(key)
    c0, c1 = cfg.block_channels
    mid_res = cfg.output_resolution // 2
    return {
        "block0": init_block(k0, cfg.in_channels, c0, cfg.w_dim, mid_res,
                             3, is_first=False),
        "block1": init_block(k1, c0, c1, cfg.w_dim, cfg.output_resolution,
                             3, is_first=False),
    }


def _bilinear_resize(x: jax.Array, size: int, antialias: bool) -> jax.Array:
    return jax.image.resize(x, (x.shape[0], size, size, x.shape[-1]),
                            method="bilinear", antialias=antialias)


def superresolution_apply(params: Params, cfg: SRConfig, rgb: jax.Array,
                          x: jax.Array, ws: jax.Array, *,
                          noise_mode: str = "none",
                          rng: jax.Array | None = None,
                          compute_dtype=jnp.float32) -> jax.Array:
    """(rgb (B,h,w,3), features (B,h,w,32), ws (B,num_ws,512)) → (B,512,512,3).

    Conditioned on the LAST w repeated 3x, mirroring the reference head."""
    w_last = jnp.tile(ws[:, -1:, :], (1, 3, 1))
    if x.shape[1] < cfg.input_resolution:
        x = _bilinear_resize(x, cfg.input_resolution, cfg.antialias)
        rgb = _bilinear_resize(rgb, cfg.input_resolution, cfg.antialias)
    rngs = (jax.random.split(rng, 2) if rng is not None else (None, None))
    # The 3-channel img chain runs channel-major end to end: one transpose
    # in at 128² (cheap) and one out at 512², instead of padded NHWC
    # materializations at every torgb/upsample/add boundary (r5 probes).
    rgb = jnp.transpose(rgb, (0, 3, 1, 2))
    x, rgb = block_apply(params["block0"], x, rgb, w_last, fir=cfg.fir,
                         conv_clamp=cfg.conv_clamp, up=True,
                         noise_mode=noise_mode, rng=rngs[0],
                         compute_dtype=compute_dtype, img_cm=True,
                         fused_modconv=cfg.fused_modconv)
    x, rgb = block_apply(params["block1"], x, rgb, w_last, fir=cfg.fir,
                         conv_clamp=cfg.conv_clamp, up=True,
                         noise_mode=noise_mode, rng=rngs[1],
                         compute_dtype=compute_dtype, img_cm=True,
                         fused_modconv=cfg.fused_modconv)
    return jnp.transpose(rgb, (0, 2, 3, 1))
