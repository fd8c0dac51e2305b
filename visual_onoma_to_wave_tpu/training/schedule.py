"""Noam warmup LR schedule with step-wise anneal, as an optax schedule.

Reproduces reference scripts/model/optimizer.py:33-43:
    lr = init_lr * min(step^-0.5, warmup^-1.5 * step) * anneal_rate^{#anneals passed}

Note the reference increments the step counter BEFORE computing the scale
(optimizer.py:45-47), so the schedule sees steps starting at 1 — we add 1.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(
    init_lr: float = 0.001,
    warmup_steps: int = 4000,
    anneal_steps: tuple[int, ...] = (300000, 400000, 500000),
    anneal_rate: float = 0.3,
) -> optax.Schedule:
    anneal = jnp.asarray(anneal_steps, dtype=jnp.float32)

    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + 1.0
        scale = jnp.minimum(step ** -0.5, warmup_steps ** -1.5 * step)
        n_anneals = jnp.sum(step > anneal)
        return init_lr * scale * anneal_rate ** n_anneals

    return schedule


def make_optimizer(
    init_lr: float = 0.001,
    warmup_steps: int = 4000,
    anneal_steps: tuple[int, ...] = (300000, 400000, 500000),
    anneal_rate: float = 0.3,
    betas: tuple[float, float] = (0.9, 0.98),
    eps: float = 1e-9,
    weight_decay: float = 0.0,
    grad_clip: float = 1.0,
    grad_acc_steps: int = 1,
) -> optax.GradientTransformation:
    """Adam + Noam schedule + global-norm clip, matching reference
    ScheduledOptim (optimizer.py:10-24) and the clip at 04_train.py:140."""
    sched = noam_schedule(init_lr, warmup_steps, anneal_steps, anneal_rate)
    if weight_decay > 0:
        opt = optax.adamw(sched, b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=weight_decay)
    else:
        opt = optax.adam(sched, b1=betas[0], b2=betas[1], eps=eps)
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    if grad_acc_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_acc_steps)
    return tx
