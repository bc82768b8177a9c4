"""Distributed face-recognition trainer: DP backbone × class-sharded
PartialFC head over one (data, model) mesh.

Rebuilds the reference's hybrid-parallel arcface trainer
(arcface_torch/train.py:39-203): SGD(momentum 0.9, wd 5e-4) + poly
scheduler + margin softmax; DDP → batch sharding on 'data' (grad psum via
jit), PartialFC → 'model'-axis class sharding (parallel/partial_fc.py).
bf16 backbone compute is the AMP analog. The SyntheticDataset speed
benchmark (configs/3millions.py, docs/speed_benchmark.md) is
cli/train_arcface.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.arcface import registry
from ..models.arcface.scheduler import poly_scheduler
from ..parallel.partial_fc import PartialFC

Params = dict[str, Any]


class ArcFaceState(NamedTuple):
    backbone: Params
    batch_stats: Params
    fc_weight: jax.Array
    opt_state: Any
    fc_opt_state: Any
    step: jax.Array


def _decay_sampled_rows(weight_decay: float) -> optax.GradientTransformation:
    """Weight decay applied only to class-center ROWS that received a
    gradient this step. With PartialFC sample_rate<1 the unsampled rows
    have exactly-zero grads; the reference's optimizer-state surgery
    means it only ever steps (and so only ever decays) the sampled
    sub-weight (arcface_torch/partial_fc.py:96-136) — decaying all rows
    would shrink rarely-sampled centers over long runs. Must sit BEFORE
    sgd in the chain so the decay term enters momentum like torch SGD's
    weight_decay does."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params):
        def add_decay(g, p):
            row_sampled = (jnp.sum(jnp.abs(g), axis=-1, keepdims=True)
                           > 0).astype(p.dtype)
            return g + weight_decay * p * row_sampled

        return jax.tree.map(add_decay, updates, params), state

    return optax.GradientTransformation(init_fn, update_fn)


class FCOptimizer(NamedTuple):
    """FC-head optimizer: optax-compatible (init/update) for the dense
    path, plus the raw hyperparameters for the ROW-SPARSE step used when
    sample_rate<1 — there the train step gathers optimizer-state rows for
    the sampled classes only, applies torch-SGD/AdamW math, and scatters
    back, so no full-table gradient or optimizer intermediate ever exists
    (reference's optimizer-state surgery, partial_fc.py:96-136 SGD /
    :311-337 PartialFCAdamW — whose bias-correction `step` is the GLOBAL
    step count, shared by all rows, and unsampled rows keep stale
    exp_avg/exp_avg_sq)."""
    tx: optax.GradientTransformation
    sched: Any
    kind: str                     # "sgd" | "adamw"
    momentum: float
    weight_decay: float
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8

    def init(self, params):
        return self.tx.init(params)

    def update(self, updates, state, params=None):
        return self.tx.update(updates, state, params)


def make_optimizers(total_steps: int, *, lr: float = 0.1,
                    warmup_steps: int = 0, momentum: float = 0.9,
                    weight_decay: float = 5e-4, optimizer: str = "sgd",
                    clip_grad_norm: float | None = 5.0):
    """Backbone + FC-head optimizers.

    optimizer="sgd" is the reference's conv-backbone recipe
    (SGD momentum 0.9, wd 5e-4, poly schedule); "adamw" the ViT recipe
    (PartialFCAdamW, arcface_torch/partial_fc.py:239, configs/
    wf42m_pfc03_40epoch_*_vit_*.py: AdamW wd 0.1). clip_grad_norm clips
    BACKBONE gradients by global norm (the head is never clipped),
    matching torch.nn.utils.clip_grad_norm_(backbone.parameters(), 5)
    on both AMP and plain paths (arcface_torch/train.py:157-166)."""
    sched = poly_scheduler(lr, total_steps, warmup_steps)
    clip = (optax.clip_by_global_norm(clip_grad_norm)
            if clip_grad_norm else optax.identity())
    if optimizer == "sgd":
        tx = optax.chain(clip, optax.add_decayed_weights(weight_decay),
                         optax.sgd(sched, momentum=momentum))
        fc_inner = optax.chain(_decay_sampled_rows(weight_decay),
                               optax.sgd(sched, momentum=momentum))
    elif optimizer == "adamw":
        tx = optax.chain(clip, optax.adamw(sched, weight_decay=weight_decay))
        # dense path only (sample_rate==1): every row sees a gradient, so
        # plain decoupled AdamW matches the reference exactly
        fc_inner = optax.adamw(sched, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r} "
                         "(expected 'sgd' or 'adamw')")
    fc_tx = FCOptimizer(tx=fc_inner, sched=sched, kind=optimizer,
                        momentum=momentum, weight_decay=weight_decay)
    return tx, fc_tx


def init_state(key: jax.Array, pfc: PartialFC, tx, fc_tx,
               network: str = "iresnet50") -> ArcFaceState:
    kb, kf = jax.random.split(key)
    backbone, stats = registry.init_backbone(kb, network)
    fc_weight = pfc.init(kf)
    if pfc.sample_rate < 1.0 and isinstance(fc_tx, FCOptimizer):
        # row-sparse optimizer buffers (same sharding as the table):
        # SGD momentum, or AdamW exp_avg/exp_avg_sq (the reference's
        # weight_exp_avg/_sq buffers, partial_fc.py:290-294)
        zeros = jax.jit(jnp.zeros_like,
                        out_shardings=pfc.weight_sharding())
        if fc_tx.kind == "adamw":
            fc_opt_state = {"m": zeros(fc_weight), "v": zeros(fc_weight),
                            "count": jnp.zeros((), jnp.int32)}
        else:
            fc_opt_state = {"mom": zeros(fc_weight),
                            "count": jnp.zeros((), jnp.int32)}
    else:
        fc_opt_state = fc_tx.init(fc_weight)
    return ArcFaceState(
        backbone=backbone, batch_stats=stats, fc_weight=fc_weight,
        opt_state=tx.init(backbone), fc_opt_state=fc_opt_state,
        step=jnp.zeros((), jnp.int32))


def make_train_step(pfc: PartialFC, tx, fc_tx,
                    network: str = "iresnet50",
                    dtype=jnp.bfloat16, donate: bool = True):
    """sample_rate==1: dense fc path (full-table grad + optax).
    sample_rate<1: ROW-SPARSE fc path — differentiate wrt the gathered
    (num_sample, d) sub-weight and step only those rows (+ their
    momentum rows), so peak fc memory is table + momentum + the
    sampled-row working set, never table + momentum + a table-sized
    grad. This is what bounds per-chip identity capacity (one 16 GB
    v5e, r50: full-table grads OOM at 2M ids; this path runs 2M at
    batch 256, 3M at batch 128).
    Reference: arcface_torch/partial_fc.py:96-136."""
    sparse = pfc.sample_rate < 1.0 and isinstance(fc_tx, FCOptimizer)

    def apply_backbone(backbone, batch_stats, images, kbb):
        return registry.backbone_apply(
            network, backbone, batch_stats, images, train=True,
            rng=kbb, dtype=dtype)

    def loss_fn(backbone, fc_weight, batch_stats, images, labels, key):
        kbb, key = jax.random.split(key)
        emb, new_stats = apply_backbone(backbone, batch_stats, images,
                                        kbb)
        loss = pfc.loss(fc_weight, emb, labels, sample_key=key)
        return loss, new_stats

    def loss_fn_sparse(backbone, w_sub, batch_stats, images, labels,
                       index, kbb):
        emb, new_stats = apply_backbone(backbone, batch_stats, images,
                                        kbb)
        loss = pfc.loss_sampled(w_sub, emb, labels, index)
        return loss, new_stats

    def step_fn(state: ArcFaceState, images, labels, key):
        if sparse:
            kbb, ks = jax.random.split(key)
            index = pfc.sample_indices(labels, ks)
            w_sub = pfc.take_rows(state.fc_weight, index)
            (loss, new_stats), (g_bb, g_sub) = jax.value_and_grad(
                loss_fn_sparse, argnums=(0, 1), has_aux=True)(
                state.backbone, w_sub, state.batch_stats, images,
                labels, index, kbb)
        else:
            (loss, new_stats), (g_bb, g_fc) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.backbone, state.fc_weight, state.batch_stats,
                images, labels, key)

        upd, opt_state = tx.update(g_bb, state.opt_state, state.backbone)
        backbone = optax.apply_updates(state.backbone, upd)

        if sparse:
            count = state.fc_opt_state["count"]
            lr = fc_tx.sched(count)
            if fc_tx.kind == "adamw":
                # torch AdamW on the sampled rows only (PartialFCAdamW,
                # partial_fc.py:311-337): decoupled wd, bias correction
                # with the GLOBAL step count (reference `self.step`);
                # unsampled rows keep stale exp_avg/exp_avg_sq.
                m_sub = pfc.take_rows(state.fc_opt_state["m"], index)
                v_sub = pfc.take_rows(state.fc_opt_state["v"], index)
                m_new = fc_tx.b1 * m_sub + (1.0 - fc_tx.b1) * g_sub
                v_new = fc_tx.b2 * v_sub + (1.0 - fc_tx.b2) * g_sub ** 2
                t = (count + 1).astype(jnp.float32)
                m_hat = m_new / (1.0 - fc_tx.b1 ** t)
                v_hat = v_new / (1.0 - fc_tx.b2 ** t)
                w_new = w_sub - lr * (m_hat / (jnp.sqrt(v_hat) + fc_tx.eps)
                                      + fc_tx.weight_decay * w_sub)
                fc_weight = pfc.put_rows(state.fc_weight, index, w_new)
                fc_opt_state = {
                    "m": pfc.put_rows(state.fc_opt_state["m"], index,
                                      m_new),
                    "v": pfc.put_rows(state.fc_opt_state["v"], index,
                                      v_new),
                    "count": count + 1}
            else:
                # torch SGD on the sampled rows only: buf = μ·buf + g
                # + wd·w; w -= lr·buf (decay therefore also touches
                # sampled rows only)
                mom_sub = pfc.take_rows(state.fc_opt_state["mom"], index)
                buf = fc_tx.momentum * mom_sub \
                    + g_sub + fc_tx.weight_decay * w_sub
                fc_weight = pfc.put_rows(state.fc_weight, index,
                                         w_sub - lr * buf)
                mom = pfc.put_rows(state.fc_opt_state["mom"], index, buf)
                fc_opt_state = {"mom": mom, "count": count + 1}
        else:
            fupd, fc_opt_state = fc_tx.update(g_fc, state.fc_opt_state,
                                              state.fc_weight)
            fc_weight = optax.apply_updates(state.fc_weight, fupd)

        new_state = ArcFaceState(backbone, new_stats, fc_weight,
                                 opt_state, fc_opt_state, state.step + 1)
        return new_state, {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
