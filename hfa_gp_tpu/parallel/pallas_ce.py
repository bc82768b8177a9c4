"""Flash-style margin-softmax CE statistics as a Pallas TPU kernel.

The streaming (blockwise) CE in partial_fc.py already avoids the
(B, num_local) logit matrix in the *functional* sense — XLA still writes
each block's logits to HBM between the matmul and the exp/sum, and the
custom-VJP backward re-materializes them again, so at 1M ids / batch 512
the measured pfc stage is ~44 ms against a ~10 ms FLOP+table floor
(docs/bench_logs/profile_arcface_b512_r5.log). This kernel fuses
  cosine matmul -> column-norm scale -> clip -> exp -> running row-sum
into one VMEM-resident pass over class tiles, so the (B, k) logits never
leave VMEM; the custom backward re-enters the same tiles and emits the
(tile, d) weight-gradient slices directly. HBM traffic becomes
  fwd:  read table once
  bwd:  read table once, write d(table) once
which is the floor for a weight table that must be consumed and
gradded. Reference semantics: DistCrossEntropy + CombinedMarginLoss
(arcface_torch/partial_fc.py:441-498, losses.py:5-106); the margin is an
O(B) correction applied OUTSIDE the kernel by the caller (same math as
partial_fc._ce_block_stats — see _margin_softmax_ce).

Orientation notes (v5e, CLAUDE.md rules): everything lives (tile, B) —
the class tile on sublanes, the batch on lanes — so every tensor keeps a
>=128 minor dim (B is gated to a multiple of 128), reductions for the
row-sums run over sublanes, and all three matmuls are dot_generals that
contract dim 0/1 without any materialized transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_tile(rows: int, max_tile: int = 1024) -> int | None:
    """Largest divisor of `rows` that is a multiple of 8 and <= max_tile
    (sublane-dim tile of the class axis). None if rows can't tile."""
    best = None
    d = 1
    while d * d <= rows:
        if rows % d == 0:
            for c in (d, rows // d):
                if c % 8 == 0 and c <= max_tile and (best is None
                                                     or c > best):
                    best = c
        d += 1
    return best


def _specs(b: int, dim: int, kt: int, io_all):
    """(labels, ne[, ct_se, ct_tgt]) constant blocks + the w tile."""
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    specs = [const((1, b)), const((b, dim))]
    specs += [const((1, b)) for _ in range(io_all)]
    specs.append(pl.BlockSpec((kt, dim), lambda i: (i, 0),
                              memory_space=pltpu.VMEM))
    return specs


def _tile_logits(w, ne, s, mm_dtype):
    """Shared fwd recompute: (kt, B) clipped cosines + helpers."""
    inv = jax.lax.rsqrt(jnp.sum(w * w, axis=1, keepdims=True))  # (kt,1)
    wmm, nemm = (w, ne) if mm_dtype is None else (
        w.astype(mm_dtype), ne.astype(mm_dtype))
    raw = jax.lax.dot_general(wmm, nemm, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    li = raw * inv                                   # pre-clip cosine
    logit = jnp.clip(li, -1.0, 1.0)
    e = jnp.exp(logit * s - s)
    return inv, wmm, nemm, raw, li, logit, e


def _fwd_kernel(lab_ref, ne_ref, w_ref, se_ref, tgt_ref, *, kt, s,
                mm_dtype):
    i = pl.program_id(0)
    _, _, _, _, _, logit, e = _tile_logits(
        w_ref[:].astype(jnp.float32), ne_ref[:], s, mm_dtype)
    b = ne_ref.shape[0]
    col = lab_ref[:] - i * kt                        # (1, B)
    rows = jax.lax.broadcasted_iota(jnp.int32, (kt, b), 0)
    hit = rows == col
    # the target column is EXCLUDED from the sum-exp: the caller adds
    # the margined term back with ITS exp. Subtracting a host-side
    # exp(s·tgt−s) recompute instead is wrong on hardware — Mosaic's
    # exp/MXU rounding differs from XLA's by ~s·Δcos (measured 1.8%
    # rel), and on memorized rows the residue pushed the denominator
    # below the target term → negative CE loss (r5). Exclusion keeps
    # se ≥ margined-term by construction, with zero cancellation.
    se_c = jnp.sum(jnp.where(hit, 0.0, e), axis=0, keepdims=True)
    tgt_c = jnp.sum(jnp.where(hit, logit, 0.0), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        se_ref[:] = se_c
        tgt_ref[:] = tgt_c

    @pl.when(i > 0)
    def _():
        se_ref[:] = se_ref[:] + se_c
        tgt_ref[:] = tgt_ref[:] + tgt_c


def _bwd_kernel(lab_ref, ne_ref, cts_ref, ctt_ref, w_ref, dw_ref,
                dne_ref, *, kt, s, mm_dtype):
    i = pl.program_id(0)
    w = w_ref[:].astype(jnp.float32)
    inv, wmm, nemm, raw, li, logit, e = _tile_logits(
        w, ne_ref[:], s, mm_dtype)
    b = ne_ref.shape[0]
    col = lab_ref[:] - i * kt
    rows = jax.lax.broadcasted_iota(jnp.int32, (kt, b), 0)
    hit = rows == col
    # d(se)/d(logit) = s·e per non-hit column (the hit is excluded from
    # se); d(tgt)/d(logit) = onehot; clip gates the pre-clip cosine
    # range (ties are measure-zero)
    dl = jnp.where(hit, ctt_ref[:], cts_ref[:] * (s * e))
    dl = jnp.where((li >= -1.0) & (li <= 1.0), dl, 0.0)
    draw = dl * inv                                   # (kt, B)
    dinv = jnp.sum(dl * raw, axis=1, keepdims=True)   # (kt, 1)
    drawmm = draw if mm_dtype is None else draw.astype(mm_dtype)
    # d(w) main term through the matmul (+ the norm-chain term), fp32 out
    dw = jax.lax.dot_general(drawmm, nemm, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dw_ref[:] = (dw - (dinv * inv * inv * inv) * w).astype(dw_ref.dtype)
    dne_c = jax.lax.dot_general(drawmm, wmm, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dne_ref[:] = dne_c

    @pl.when(i > 0)
    def _():
        dne_ref[:] = dne_ref[:] + dne_c


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_ce_stats(norm_emb: jax.Array, w: jax.Array,
                   local_lab: jax.Array, s: float, mm_dtype,
                   tile_fwd: int, tile_bwd: int,
                   interpret: bool = False):
    """se_x[b] = Σ_{j≠local_lab[b]} exp(s·cos_bj − s) (the target
    column is EXCLUDED — the caller adds the margined term with its
    own exp, so `denom ≥ target term` holds by construction; mixing a
    host-side exp(s·tgt−s) recompute into a kernel-side total is wrong
    on hardware, Mosaic's exp/MXU rounding differs from XLA's), and
    tgt_raw[b] = cos at local_lab[b] (0 where local_lab < 0). Cosines
    are clip(±1)'d like the XLA paths. norm_emb (B, d) fp32
    L2-normalized rows, w (C, d) fp32 raw class centers; tile_* must
    divide C. Returns two (B,) fp32 arrays; differentiable wrt
    (norm_emb, w)."""
    return _stats_fwd(norm_emb, w, local_lab, s, mm_dtype, tile_fwd,
                      tile_bwd, interpret)[0]


def _stats_fwd(norm_emb, w, local_lab, s, mm_dtype, tile_fwd, tile_bwd,
               interpret):
    b, dim = norm_emb.shape
    c = w.shape[0]
    lab2 = local_lab.astype(jnp.int32)[None, :]
    kern = functools.partial(_fwd_kernel, kt=tile_fwd, s=float(s),
                             mm_dtype=mm_dtype)
    se, tgt = pl.pallas_call(
        kern,
        grid=(c // tile_fwd,),
        in_specs=_specs(b, dim, tile_fwd, 0),
        out_specs=[pl.BlockSpec((1, b), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, b), jnp.float32)] * 2,
        interpret=interpret,
    )(lab2, norm_emb, w)
    out = (se[0], tgt[0])
    return out, (norm_emb, w, local_lab)


def _stats_bwd(s, mm_dtype, tile_fwd, tile_bwd, interpret, res, cts):
    norm_emb, w, local_lab = res
    ct_se, ct_tgt = cts
    b, dim = norm_emb.shape
    c = w.shape[0]
    lab2 = local_lab.astype(jnp.int32)[None, :]
    kern = functools.partial(_bwd_kernel, kt=tile_bwd, s=float(s),
                             mm_dtype=mm_dtype)
    dw, dne = pl.pallas_call(
        kern,
        grid=(c // tile_bwd,),
        in_specs=_specs(b, dim, tile_bwd, 2),
        out_specs=[
            pl.BlockSpec((tile_bwd, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, dim), w.dtype),
            jax.ShapeDtypeStruct((b, dim), jnp.float32),
        ],
        interpret=interpret,
    )(lab2, norm_emb, ct_se[None, :], ct_tgt[None, :], w)
    d_lab = np.zeros(local_lab.shape, jax.dtypes.float0)
    return dne.astype(norm_emb.dtype), dw, d_lab


flash_ce_stats.defvjp(_stats_fwd, _stats_bwd)
