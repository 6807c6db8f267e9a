"""Optimizers, schedules and the multi-task train state.

Reference recipe (train.py:305-349):
  * transformers.AdamW (decoupled weight decay applied to ALL params, incl.
    norms and biases — the reference never builds no-decay groups), eps 1e-6;
  * linear warmup (10% of total steps) then linear decay to zero;
  * global-norm clip 0.8 BEFORE the optimizer step;
  * TWO optimizers over disjoint param trees: the multimodal model (trg_lr,
    weight decay) and the shared Swin (aux_lr, no weight decay).  Target-task
    gradients into Swin are computed then discarded — Swin learns only from the
    aux FER loss while coupling to the target task through the forward pass
    (SURVEY.md §3.2).  `swin_from_target=True` surfaces joint training as an
    explicit deviation.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from facialmmt_tpu.config import OptimConfig


def make_schedule(base_lr: float, total_steps: int, warm_up: float):
    """Linear warmup + linear decay (transformers.get_linear_schedule_with_warmup)."""
    warmup_steps = int(total_steps * warm_up)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        decay = (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1)
        factor = jnp.where(step < warmup_steps, warm, decay)
        return base_lr * jnp.clip(factor, 0.0, 1.0)

    return schedule


def make_optimizer(cfg: OptimConfig, base_lr: float, total_steps: int,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    """clip-by-global-norm -> AdamW, with the reference's hyperparameters."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip),
        optax.adamw(
            learning_rate=make_schedule(base_lr, total_steps, cfg.warm_up),
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=weight_decay),
    )


class MultiTaskState(NamedTuple):
    """Train state for the shared-Swin multi-task setup.

    params holds the FULL pipeline tree {'swin_model': ..., 'multimodal': ...};
    the two optimizer states each cover one branch.  batch_stats carries Swin's
    BatchNorm running statistics.
    """

    params: Any
    batch_stats: Any
    swin_opt_state: Any
    mm_opt_state: Any
    swin_step: jnp.ndarray
    mm_step: jnp.ndarray

    @staticmethod
    def create(params, batch_stats, swin_tx, mm_tx):
        return MultiTaskState(
            params=params, batch_stats=batch_stats,
            swin_opt_state=swin_tx.init(params["swin_model"]),
            mm_opt_state=mm_tx.init(params["multimodal"]),
            swin_step=jnp.zeros((), jnp.int32),
            mm_step=jnp.zeros((), jnp.int32))


class SingleTaskState(NamedTuple):
    """Train state for single-model tasks (unimodal V)."""

    params: Any
    opt_state: Any
    step: jnp.ndarray

    @staticmethod
    def create(params, tx):
        return SingleTaskState(params=params, opt_state=tx.init(params),
                               step=jnp.zeros((), jnp.int32))


def accumulate_grads(grad_fn, params, batches, *, axis_name: Optional[str] = None):
    """Microbatch gradient accumulation via lax.scan (reference grad-accum,
    main.py:58-61).  batches: pytree with a leading microbatch axis."""

    def body(acc, micro):
        loss, grads = grad_fn(params, micro)
        acc_grads, acc_loss = acc
        return (jax.tree.map(jnp.add, acc_grads, grads), acc_loss + loss), None

    zero = jax.tree.map(jnp.zeros_like, params)
    (grads, loss), _ = jax.lax.scan(body, (zero, jnp.zeros(())), batches)
    n = jax.tree.leaves(batches)[0].shape[0]
    return (jax.tree.map(lambda g: g / n, grads), loss / n)
