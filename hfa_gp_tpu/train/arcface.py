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


def make_optimizers(total_steps: int, *, lr: float = 0.1,
                    warmup_steps: int = 0, momentum: float = 0.9,
                    weight_decay: float = 5e-4):
    sched = poly_scheduler(lr, total_steps, warmup_steps)
    tx = optax.chain(optax.add_decayed_weights(weight_decay),
                     optax.sgd(sched, momentum=momentum))
    fc_tx = optax.chain(_decay_sampled_rows(weight_decay),
                        optax.sgd(sched, momentum=momentum))
    return tx, fc_tx


def init_state(key: jax.Array, pfc: PartialFC, tx, fc_tx,
               network: str = "iresnet50") -> ArcFaceState:
    kb, kf = jax.random.split(key)
    backbone, stats = registry.init_backbone(kb, network)
    fc_weight = pfc.init(kf)
    return ArcFaceState(
        backbone=backbone, batch_stats=stats, fc_weight=fc_weight,
        opt_state=tx.init(backbone), fc_opt_state=fc_tx.init(fc_weight),
        step=jnp.zeros((), jnp.int32))


def make_train_step(pfc: PartialFC, tx, fc_tx,
                    network: str = "iresnet50",
                    dtype=jnp.bfloat16, donate: bool = True):
    def loss_fn(backbone, fc_weight, batch_stats, images, labels, key):
        kbb, key = jax.random.split(key)
        emb, new_stats = registry.backbone_apply(
            network, backbone, batch_stats, images, train=True,
            rng=kbb, dtype=dtype)
        loss = pfc.loss(fc_weight, emb, labels, sample_key=key)
        return loss, new_stats

    def step_fn(state: ArcFaceState, images, labels, key):
        (loss, new_stats), (g_bb, g_fc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.backbone, state.fc_weight, state.batch_stats, images,
            labels, key)
        upd, opt_state = tx.update(g_bb, state.opt_state, state.backbone)
        backbone = optax.apply_updates(state.backbone, upd)
        fupd, fc_opt_state = fc_tx.update(g_fc, state.fc_opt_state,
                                          state.fc_weight)
        fc_weight = optax.apply_updates(state.fc_weight, fupd)
        new_state = ArcFaceState(backbone, new_stats, fc_weight,
                                 opt_state, fc_opt_state, state.step + 1)
        return new_state, {"loss": loss}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
