"""PartialFC — class-sharded (model-parallel) margin-softmax classifier.

TPU-native rebuild of the reference's only tensor-parallel system
(eg3d-pose-detection/models/arcface_torch/partial_fc.py):

  * each 'model'-axis shard owns `num_classes / n_model` class centers
    (partial_fc.py:61-66);
  * embeddings + labels are all-gathered across the mesh
    (partial_fc.py:179-191 / the grad-aware AllGather at :501-531 —
    here `jax.lax.all_gather` inside shard_map, whose transpose is the
    reduce-scatter, so the backward is correct by construction);
  * the softmax over the row-sharded logit matrix uses pmax / psum over
    the 'model' axis (DistCrossEntropy, partial_fc.py:441-498);
  * `sample_rate < 1` keeps positives + random negative centers each step
    (partial_fc.py:96-136). Unsampled rows receive zero gradient (their
    Adam moments decay rather than freeze — the functional analog of the
    reference's optimizer-state surgery).

Margin losses (arcface_torch/losses.py:5-106) are plain functions.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from . import pallas_ce
from .mesh import DATA_AXIS, MODEL_AXIS

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Margin losses (CombinedMarginLoss: m1·θ + m2 margin, −m3 offset)
# ---------------------------------------------------------------------------


def combined_margin(target_logit: jax.Array, m1: float, m2: float,
                    m3: float) -> jax.Array:
    """cos(m1·θ + m2) − m3 applied to the target-class cosine.

    The m1=1 ArcFace branch mirrors the reference exactly
    (arcface_torch/losses.py:42-51): cos(θ+m2) via the explicit
    t·cos m − √(1−t²)·sin m product, with the easy_margin=False LINEAR
    fallback t − sin(π−m2)·m2 once θ+m2 would pass π (plain cos(θ+m2)
    turns back up there — a non-monotone penalty for the hardest
    samples). The √(1−t²) derivative diverges at |t|=1 (the torch
    reference hits the same inf); the ε-clip keeps gradients finite at
    cosines that saturate the [-1,1] clip after a bf16 matmul."""
    if m1 == 1.0 and m2 == 0.0:
        return target_logit - m3
    t = target_logit
    tc = jnp.clip(t, -1.0 + 1e-6, 1.0 - 1e-6)
    if m1 == 1.0:
        sin_theta = jnp.sqrt(1.0 - tc * tc)
        cos_theta_m = t * math.cos(m2) - sin_theta * math.sin(m2)
        fallback = t - math.sin(math.pi - m2) * m2
        return jnp.where(t > math.cos(math.pi - m2),
                         cos_theta_m, fallback) - m3
    theta = jnp.arccos(tc)
    return jnp.cos(m1 * theta + m2) - m3


def arcface_margin(target_logit: jax.Array, m: float = 0.5) -> jax.Array:
    return combined_margin(target_logit, 1.0, m, 0.0)


def cosface_margin(target_logit: jax.Array, m: float = 0.4) -> jax.Array:
    return combined_margin(target_logit, 1.0, 0.0, m)


# ---------------------------------------------------------------------------
# Distributed margin-softmax CE core (shared by loss / loss_sampled)
# ---------------------------------------------------------------------------


def _ce_stats_direct(norm_emb: jax.Array, w_used: jax.Array,
                     local_lab: jax.Array, s: float, m1: float,
                     m2: float, m3: float, mm_dtype):
    """One-shot logits path: materializes the full (B, rows) matrix.
    Returns (local_max [stop-grad], sum_exp relative to local_max,
    tgt_logit margined+scaled)."""
    norm_w = w_used / jnp.linalg.norm(w_used, axis=1, keepdims=True)
    ne = norm_emb
    if mm_dtype is not None:
        ne = ne.astype(mm_dtype)
        norm_w = norm_w.astype(mm_dtype)
    logits = jnp.dot(ne, norm_w.T, preferred_element_type=jnp.float32)
    logits = jnp.clip(logits, -1.0, 1.0)

    b = logits.shape[0]
    rows = jnp.arange(b)
    has_target = local_lab >= 0
    cols = jnp.maximum(local_lab, 0)
    tgt = logits[rows, cols]
    tgt_m = combined_margin(tgt, m1, m2, m3)

    # the max shift is gradient-free in softmax; stop_gradient lets
    # pmax (no diff rule) sit under jax.grad. Max over the RAW scaled
    # matrix, lifted to s·tgt_m for safety (reference margins only
    # lower the target logit, so this is a no-op there).
    local_max = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(logits, axis=1), tgt_m) * s)
    se = jnp.sum(jnp.exp(logits * s - local_max[:, None]), axis=1)
    # margin applied as an O(B) CORRECTION to the row sums instead of
    # scattering into the (B, rows) matrix — a TPU scatter materializes
    # a full extra copy of the logits (measured r4: the .at[].set form
    # held the blockwise CE at ~74 ms/step at batch 512 / 1M ids)
    corr = jnp.exp(tgt_m * s - local_max) - jnp.exp(tgt * s - local_max)
    se = se + jnp.where(has_target, corr, 0.0)
    tgt_logit = jnp.where(has_target, tgt_m * s, 0.0)
    return local_max, se, tgt_logit


def _ce_block_stats(norm_emb: jax.Array, w_blk: jax.Array,
                    col: jax.Array, s: float, m1: float, m2: float,
                    m3: float, mm_dtype):
    """One class-block's CE statistics: sum-exp (shift fixed at s) and
    the margined target logit for rows whose target lands in this block
    (col = local label − block start). Differentiable wrt both args —
    the blockwise custom-VJP backward re-enters this via jax.vjp."""
    # Column norms folded into the LOGIT columns (raw·inv) instead of
    # prescaling the (k, d) rows: the normalized-copy form made the
    # reduction and the normalize two SEQUENTIAL passes over the block
    # (the second depends on the first's result), plus a (k, d)
    # materialization in fwd and again in the bwd recompute; here the
    # norm reduction and the matmul cast are independent single reads
    # and the scale is an O(B·k) output epilogue. Same math — bf16
    # rounding commutes with the per-row scale to O(eps).
    inv = jax.lax.rsqrt(jnp.sum(jnp.square(w_blk), axis=1))
    ne = norm_emb
    wb = w_blk
    if mm_dtype is not None:
        ne = ne.astype(mm_dtype)
        wb = wb.astype(mm_dtype)
    raw = jnp.dot(ne, wb.T, preferred_element_type=jnp.float32)
    logits = jnp.clip(raw * inv[None, :], -1.0, 1.0)
    b, k = logits.shape
    rows = jnp.arange(b)
    in_blk = (col >= 0) & (col < k)
    colc = jnp.clip(col, 0, k - 1)
    tgt = logits[rows, colc]
    tgt_m = combined_margin(tgt, m1, m2, m3)
    # fixed shift s (= the max possible scaled cosine): exp(logit−s) ≤ 1
    # never overflows, and underflow only drops classes whose softmax
    # weight is < e⁻⁸⁷ of the ceiling — below fp32 resolution anyway.
    se = jnp.sum(jnp.exp(logits * s - s), axis=1)
    # margin as an O(B) correction to the row sums, not a (B, k)
    # scatter — see _ce_stats_direct
    corr = jnp.exp(tgt_m * s - s) - jnp.exp(tgt * s - s)
    se = se + jnp.where(in_blk, corr, 0.0)
    tgt_out = jnp.where(in_blk, tgt_m * s, 0.0)
    return se, tgt_out


def _make_blockwise_stats(s: float, m1: float, m2: float, m3: float,
                          mm_dtype, block_rows: int):
    """Streaming (flash-style) CE statistics over class blocks.

    The direct path materializes (B, rows) logits plus a normalized
    copy of the whole center table and lets AD keep table-sized
    residuals — at 1M ids that is several full-table HBM passes per
    step. Here a lax.scan walks `block_rows`-row blocks, keeping only
    running (B,) accumulators; the custom VJP recomputes each block's
    logits and emits the (block, d) weight-gradient slices directly
    into the scan-stacked output buffer, so fwd+bwd together read the
    table twice and write the gradient once — the HBM floor.
    TPU-first replacement for the reference's DistCrossEntropy
    (arcface_torch/partial_fc.py:441-498), which materializes the full
    sharded logit matrix on GPUs."""

    @jax.custom_vjp
    def stats(norm_emb, w_local, local_lab):
        return _fwd(norm_emb, w_local, local_lab)[0]

    def _fwd(norm_emb, w_local, local_lab):
        c = w_local.shape[0]
        nb = c // block_rows
        b = norm_emb.shape[0]

        def body(se, i):
            w_blk = jax.lax.dynamic_slice_in_dim(
                w_local, i * block_rows, block_rows, 0)
            se_c, tgt_c = _ce_block_stats(norm_emb, w_blk,
                                          local_lab - i * block_rows,
                                          s, m1, m2, m3, mm_dtype)
            return se + se_c, tgt_c

        se, tgt_blocks = jax.lax.scan(body, jnp.zeros((b,), jnp.float32),
                                      jnp.arange(nb))
        tgt = jnp.sum(tgt_blocks, axis=0)   # ≤1 block hits per row
        return (se, tgt), (norm_emb, w_local, local_lab)

    def _bwd(res, cts):
        norm_emb, w_local, local_lab = res
        ct_se, ct_tgt = cts
        c = w_local.shape[0]
        nb = c // block_rows

        def body(demb, i):
            w_blk = jax.lax.dynamic_slice_in_dim(
                w_local, i * block_rows, block_rows, 0)

            def blk(ne, wb):
                return _ce_block_stats(ne, wb, local_lab - i * block_rows,
                                       s, m1, m2, m3, mm_dtype)

            _, vjp = jax.vjp(blk, norm_emb, w_blk)
            d_ne, d_wblk = vjp((ct_se, ct_tgt))
            return demb + d_ne, d_wblk

        demb, dw_blocks = jax.lax.scan(
            body, jnp.zeros_like(norm_emb), jnp.arange(nb))
        dw = dw_blocks.reshape(w_local.shape)
        d_lab = np.zeros(local_lab.shape, jax.dtypes.float0)
        return demb, dw, d_lab

    stats.defvjp(_fwd, _bwd)
    return stats


def _margin_softmax_ce(emb: jax.Array, w_used: jax.Array,
                       local_lab: jax.Array, s: float, m1: float,
                       m2: float, m3: float, mm_dtype=None,
                       block_rows: int | None = None,
                       ce_pallas: bool | str = "auto",
                       pallas_interpret: bool = False) -> jax.Array:
    """Inside shard_map: emb (B, d) global batch, w_used (rows, d) this
    shard's class centers (full or sampled), local_lab (B,) column of
    each row's positive in w_used or −1. Margin on the target column,
    then the distributed softmax CE (pmax/psum over the model axis —
    reference DistCrossEntropy, partial_fc.py:441-498). Returns (1,).

    mm_dtype: dtype of the (B, d)×(d, rows) cosine matmul operands
    (fp32 accumulation). bf16 is the reference's AMP-fp16 analog — at
    1M ids the fp32 logits matmul is MXU-bound at 1/4 peak; norms,
    margin and softmax stay fp32 either way.

    block_rows: when set and it divides the shard's row count (>1
    block), CE statistics stream over class blocks (see
    _make_blockwise_stats) instead of materializing (B, rows) logits.

    ce_pallas: True / "auto" route the statistics through the Pallas
    flash-CE kernel (parallel/pallas_ce.py) — the logits never leave
    VMEM, vs the blockwise path whose per-block logits round-trip HBM
    between the matmul and the exp/sum (~3× its floor at 1M ids b512,
    measured r5). "auto" = on when on a TPU backend and the shapes fit
    (B and d multiples of 128, class rows tileable by 8)."""
    norm_emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    rows_total = w_used.shape[0]
    b, dim = norm_emb.shape
    want_pallas = (ce_pallas is True
                   or (ce_pallas == "auto"
                       and jax.default_backend() == "tpu"))
    tile_f = tile_b = None
    if want_pallas and b % 128 == 0 and dim % 128 == 0:
        tile_f = pallas_ce.pick_tile(rows_total, 1024)
        tile_b = pallas_ce.pick_tile(rows_total, 800)
        if (ce_pallas == "auto" and tile_f is not None
                and rows_total // tile_f <= 1):
            tile_f = None   # table small enough that direct is optimal
    if tile_f is not None and tile_b is not None:
        se_x, tgt_raw = pallas_ce.flash_ce_stats(
            norm_emb, w_used, local_lab, float(s), mm_dtype,
            tile_f, tile_b, pallas_interpret)
        has = local_lab >= 0
        tgt_m = combined_margin(tgt_raw, m1, m2, m3)
        # the kernel EXCLUDES the target column from its sum-exp; the
        # margined term is added back here with the SAME exp that
        # produced tgt_logit, so denom ≥ target-term holds by
        # construction. (Subtracting a host-side exp(s·tgt−s) recompute
        # from a kernel-side total is wrong on hardware: Mosaic's
        # exp/MXU rounding differs from XLA's by ~s·Δcos, and on
        # memorized rows the residue drove the denominator below the
        # margined term → negative CE loss, r5.)
        se = se_x + jnp.where(has, jnp.exp(tgt_m * s - s), 0.0)
        tgt_logit = jnp.where(has, tgt_m * s, 0.0)
        local_max = jnp.full((b,), s, jnp.float32)
    elif (block_rows is not None and rows_total % block_rows == 0
            and rows_total // block_rows > 1):
        stats = _make_blockwise_stats(s, m1, m2, m3, mm_dtype, block_rows)
        se, tgt_logit = stats(norm_emb, w_used, local_lab)
        local_max = jnp.full((emb.shape[0],), s, jnp.float32)
    else:
        local_max, se, tgt_logit = _ce_stats_direct(
            norm_emb, w_used, local_lab, s, m1, m2, m3, mm_dtype)

    has_target = local_lab >= 0
    gmax = jax.lax.pmax(local_max, MODEL_AXIS)
    denom = jax.lax.psum(se * jnp.exp(local_max - gmax), MODEL_AXIS)
    # the blockwise path's fixed shift can underflow se to exactly 0 if
    # every cosine on every shard sits below ~1 − 87/s; floor the denom
    # like the reference's clamp_min_(1e-30) so log() stays finite
    denom = jnp.maximum(denom, 1e-30)
    tgt_term = jax.lax.psum(
        jnp.where(has_target, tgt_logit - gmax, 0.0), MODEL_AXIS)
    valid = jax.lax.psum(has_target.astype(jnp.float32), MODEL_AXIS)
    per_sample = (jnp.log(denom) - tgt_term) * jnp.minimum(valid, 1.0)
    n_valid = jnp.maximum(jnp.sum(jnp.minimum(valid, 1.0)), 1.0)
    return (jnp.sum(per_sample) / n_valid)[None]


# ---------------------------------------------------------------------------
# Shared per-shard sampling helpers (used by sample_indices AND loss's
# sampled branch — the priority scatter-MAX and the searchsorted remap
# are subtle enough that two copies WILL diverge)
# ---------------------------------------------------------------------------


def _pick_ce_block(rows: int, pref: int = 131072,
                   min_blk: int = 4096) -> int | None:
    """Largest divisor of `rows` ≤ pref (None if rows are small enough
    to take the direct path, or too prime to split usefully)."""
    if rows <= pref * 2:
        return None
    # enumerate divisors of rows directly from its factorization (O(√rows)
    # + divisor count) instead of counting down from pref (O(pref) probes)
    divs = []
    d = 1
    while d * d <= rows:
        if rows % d == 0:
            divs.extend((d, rows // d))
        d += 1
    cands = [d for d in divs if min_blk <= d <= pref]
    return max(cands) if cands else None


def _shard_local_labels(lab: jax.Array, shard_idx: jax.Array,
                        num_local: int) -> jax.Array:
    """Global labels → this shard's local class column, −1 if not ours."""
    lo = shard_idx * num_local
    return jnp.where((lab >= lo) & (lab < lo + num_local), lab - lo, -1)


def _sample_shard_indices(local_lab: jax.Array, key: jax.Array,
                          shard_idx: jax.Array, num_local: int,
                          num_sample: int) -> jax.Array:
    """Sorted per-shard sampled class indices: every positive (priority
    2.0 via scatter-MAX — a duplicate write to index 0 from no-positive
    rows can never clobber a real class-0 positive) + random negatives
    (partial_fc.py:96-136). The kept count is
    max(num_sample, min(B, num_local)) — B is static at trace time, so
    the shape stays static while guaranteeing capacity for every
    distinct positive; the reference's overflow fallback (index =
    positives only, dropping ALL negatives) is subsumed: we keep all
    positives and still fill the rest with negatives."""
    b = local_lab.shape[0]
    k = min(num_local, max(num_sample, min(b, num_local)))
    perm = jax.random.uniform(jax.random.fold_in(key, shard_idx),
                              (num_local,))
    pos = jnp.where(local_lab >= 0, local_lab, 0)
    perm = perm.at[pos].max(jnp.where(local_lab >= 0, 2.0, -jnp.inf))
    _, index = jax.lax.top_k(perm, k)
    return jnp.sort(index)


def _remap_to_sampled(local_lab: jax.Array, index: jax.Array) -> jax.Array:
    """Local class columns → columns of the sorted sampled index array
    (positives are always sampled; no-positive rows stay −1)."""
    k = index.shape[0]
    remap = jnp.searchsorted(index, jnp.maximum(local_lab, 0))
    hit = (local_lab >= 0) & (index[jnp.clip(remap, 0, k - 1)]
                              == local_lab)
    return jnp.where(hit, remap, -1)


# ---------------------------------------------------------------------------
# PartialFC
# ---------------------------------------------------------------------------


class PartialFC:
    """Class-sharded margin softmax over a (data, model) mesh.

    weight: (num_classes, embedding_dim), sharded on axis 0 over 'model'.
    Embeddings arrive sharded over 'data' (the DP batch); loss comes back
    replicated. Use `loss_and_grads` inside a jitted train step.
    """

    def __init__(self, mesh: Mesh, num_classes: int,
                 embedding_dim: int = 512, *, s: float = 64.0,
                 m1: float = 1.0, m2: float = 0.5, m3: float = 0.0,
                 sample_rate: float = 1.0, matmul_dtype=None,
                 ce_block_rows: int | str | None = "auto",
                 ce_pallas: bool | str = "auto",
                 pallas_interpret: bool = False):
        self.mesh = mesh
        self.n_model = mesh.shape[MODEL_AXIS]
        self.n_data = mesh.shape[DATA_AXIS]
        assert num_classes % self.n_model == 0, \
            "pad num_classes to a multiple of the model axis"
        self.num_classes = num_classes
        self.num_local = num_classes // self.n_model
        self.embedding_dim = embedding_dim
        self.s, self.m1, self.m2, self.m3 = s, m1, m2, m3
        # bf16 cosine matmuls w/ fp32 accumulation = the reference's AMP
        self.matmul_dtype = matmul_dtype
        self.sample_rate = sample_rate
        self.num_sample = max(1, int(sample_rate * self.num_local))
        # streaming-CE block size for the dense (sample_rate==1) path;
        # "auto" picks a divisor of the shard's row count so big tables
        # never materialize (B, rows) logits (see _make_blockwise_stats)
        if ce_block_rows == "auto":
            ce_block_rows = _pick_ce_block(self.num_local)
        self.ce_block_rows = ce_block_rows
        # flash-CE kernel switch ("auto" = TPU backend + shapes fit;
        # the blockwise/direct XLA paths remain the fallback)
        self.ce_pallas = ce_pallas
        self.pallas_interpret = pallas_interpret

    def init(self, key: jax.Array) -> jax.Array:
        """Shard-local init: jit with out_shardings lets the partitioner
        generate each shard on its own device (threefry is partitionable
        in jax>=0.4.26), so the full (num_classes, emb) table is never
        materialized on host — at the reference's 29M-id sweep point
        (docs/speed_benchmark.md:63-77) that would be ~60 GB."""
        sharding = self.weight_sharding()
        shape = (self.num_classes, self.embedding_dim)

        @partial(jax.jit, out_shardings=sharding)
        def _init(k):
            return jax.random.normal(k, shape, jnp.float32) * 0.01

        return _init(key)

    def weight_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(MODEL_AXIS, None))

    # -- sparse sampling (gradients only ever touch sampled rows) -----------

    def sample_indices(self, labels: jax.Array, key: jax.Array
                       ) -> jax.Array:
        """Per-shard sampled class indices: all positives (priority 2)
        + random negatives, each shard's slice SORTED —
        (n_model·num_sample,) int32, sharded P(model). Computed outside
        the loss so the train step can gather the sub-weight first and
        differentiate wrt THAT: jax.grad then materializes only the
        (num_sample, emb) sub-gradient, never the full table — the
        reference's core PartialFC memory property
        (arcface_torch/partial_fc.py:96-136), which is what bounds
        per-chip identity capacity (measured on one 16 GB v5e, r50:
        full-table grads OOM at 2M ids; this path runs 2M at batch 256
        and 3M at batch 128 — at 3M the 300k-row sub-weight/grad/
        momentum working set is ~2.3 GB on top of the 12.3 GB
        table+momentum, so batch-256 activations no longer fit)."""
        num_local, num_sample = self.num_local, self.num_sample

        def shard_fn(lab_local, k):
            lab = jax.lax.all_gather(lab_local, DATA_AXIS, axis=0,
                                     tiled=True)
            shard_idx = jax.lax.axis_index(MODEL_AXIS)
            local_lab = _shard_local_labels(lab, shard_idx, num_local)
            return _sample_shard_indices(local_lab, k, shard_idx,
                                         num_local, num_sample)

        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(DATA_AXIS), P()),
            out_specs=P(MODEL_AXIS), check_vma=False)
        return fn(labels, key)

    def take_rows(self, table: jax.Array, index: jax.Array) -> jax.Array:
        """Shard-local row gather: table (num_classes, d) P(model,·),
        index from sample_indices → (n_model·num_sample, d) P(model,·)."""
        def shard_fn(t_local, idx_local):
            return t_local[idx_local]

        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS)),
            out_specs=P(MODEL_AXIS, None), check_vma=False)
        return fn(table, index)

    def put_rows(self, table: jax.Array, index: jax.Array,
                 rows: jax.Array) -> jax.Array:
        """Shard-local row scatter (indices are unique by construction:
        top_k of distinct priorities), inverse of take_rows."""
        def shard_fn(t_local, idx_local, r_local):
            return t_local.at[idx_local].set(r_local)

        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS),
                      P(MODEL_AXIS, None)),
            out_specs=P(MODEL_AXIS, None), check_vma=False)
        return fn(table, index, rows)

    def loss_sampled(self, w_sub: jax.Array, embeddings: jax.Array,
                     labels: jax.Array, index: jax.Array) -> jax.Array:
        """Margin-softmax CE against a PRE-GATHERED sampled sub-weight
        (take_rows(weight, sample_indices(...))). Differentiable wrt
        w_sub — the only weight gradient that ever exists."""
        num_local, num_sample = self.num_local, self.num_sample
        s, m1, m2, m3 = self.s, self.m1, self.m2, self.m3
        mm_dtype = self.matmul_dtype
        ce_pallas, interp = self.ce_pallas, self.pallas_interpret

        def shard_fn(w_local, emb_local, lab_local, idx_local):
            emb = jax.lax.all_gather(emb_local, DATA_AXIS, axis=0,
                                     tiled=True)
            lab = jax.lax.all_gather(lab_local, DATA_AXIS, axis=0,
                                     tiled=True)
            shard_idx = jax.lax.axis_index(MODEL_AXIS)
            local_lab = _shard_local_labels(lab, shard_idx, num_local)
            local_lab = _remap_to_sampled(local_lab, idx_local)
            return _margin_softmax_ce(emb, w_local, local_lab,
                                      s, m1, m2, m3, mm_dtype,
                                      ce_pallas=ce_pallas,
                                      pallas_interpret=interp)

        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None),
                      P(DATA_AXIS), P(MODEL_AXIS)),
            out_specs=P(), check_vma=False)
        return fn(w_sub, embeddings, labels, index)[0]

    # -- the sharded loss ---------------------------------------------------

    def loss(self, weight: jax.Array, embeddings: jax.Array,
             labels: jax.Array, sample_key: jax.Array | None = None
             ) -> jax.Array:
        """Mean margin-softmax CE. embeddings (B_local…,) sharded over
        'data'; labels int32 (B,), −1 = no positive class."""

        num_local = self.num_local
        num_sample = self.num_sample
        sampled = self.sample_rate < 1.0
        s, m1, m2, m3 = self.s, self.m1, self.m2, self.m3
        mm_dtype = self.matmul_dtype
        block_rows = None if sampled else self.ce_block_rows
        ce_pallas, interp = self.ce_pallas, self.pallas_interpret

        def shard_fn(w_local, emb_local, lab_local, key):
            # all-gather the DP batch so every model shard sees the global
            # batch (partial_fc.py:179-191)
            emb = jax.lax.all_gather(emb_local, DATA_AXIS, axis=0,
                                     tiled=True)
            lab = jax.lax.all_gather(lab_local, DATA_AXIS, axis=0,
                                     tiled=True)
            shard_idx = jax.lax.axis_index(MODEL_AXIS)
            local_lab = _shard_local_labels(lab, shard_idx, num_local)

            if sampled:
                index = _sample_shard_indices(local_lab, key, shard_idx,
                                              num_local, num_sample)
                w_used = w_local[index]
                local_lab = _remap_to_sampled(local_lab, index)
            else:
                w_used = w_local

            return _margin_softmax_ce(emb, w_used, local_lab,
                                      s, m1, m2, m3, mm_dtype,
                                      block_rows=block_rows,
                                      ce_pallas=ce_pallas,
                                      pallas_interpret=interp)

        if sample_key is None:
            if sampled:
                raise ValueError(
                    "PartialFC.loss with sample_rate < 1 needs a fresh "
                    "sample_key every step — a fixed key would train "
                    "against the same negative subset forever")
            sample_key = jax.random.PRNGKey(0)
        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None),
                      P(DATA_AXIS), P()),
            out_specs=P(), check_vma=False)
        return fn(weight, embeddings, labels, sample_key)[0]
