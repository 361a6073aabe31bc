"""Optimizer + LR-schedule factories (optax).

Reference: utils/optimizer.py:5-81 (AdamW/SGD with a no-decay group for
1-D params / biases / A_logs / Ds) and utils/lr_scheduler.py:16-181 (timm
cosine with warmup_prefix, linear, multistep, step).

Scheduling note: the reference nominally builds per-step schedulers but calls
``step_update`` once per epoch with an index double-divided by the
accumulation steps (trainer.py:201-206) — so its LR effectively moves on a
coarse, slightly-off grid. Here the schedule is a true per-step optax
schedule; set ``steps_per_epoch=1`` to reproduce epoch-granularity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax


def make_schedule(config, steps_per_epoch: int) -> optax.Schedule:
    t = config.TRAIN
    total = t.EPOCHS * steps_per_epoch
    warmup = t.WARMUP_EPOCHS * steps_per_epoch
    name = t.LR_SCHEDULER.NAME

    if name == "cosine":
        # warmup MIN_LR → BASE_LR, then cosine BASE_LR → MIN_LR over the
        # post-warmup span (timm warmup_prefix=True semantics).
        return optax.join_schedules(
            [
                optax.linear_schedule(t.MIN_LR, t.BASE_LR, max(warmup, 1)),
                optax.cosine_decay_schedule(
                    t.BASE_LR,
                    max(total - warmup, 1),
                    alpha=t.MIN_LR / t.BASE_LR,
                ),
            ],
            [warmup],
        )
    if name == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(t.MIN_LR, t.BASE_LR, max(warmup, 1)),
                optax.linear_schedule(t.BASE_LR, t.MIN_LR, max(total - warmup, 1)),
            ],
            [warmup],
        )
    if name == "multistep":
        boundaries = {
            int(e) * steps_per_epoch: t.LR_SCHEDULER.GAMMA
            for e in t.LR_SCHEDULER.MULTISTEPS
        }
        base = optax.piecewise_constant_schedule(t.BASE_LR, boundaries)
        if warmup:
            return optax.join_schedules(
                [optax.linear_schedule(t.MIN_LR, t.BASE_LR, warmup), base],
                [warmup],
            )
        return base
    if name == "step":
        return optax.exponential_decay(
            t.BASE_LR,
            t.LR_SCHEDULER.DECAY_EPOCHS * steps_per_epoch,
            t.LR_SCHEDULER.DECAY_RATE,
            staircase=True,
        )
    raise ValueError(f"Unknown scheduler: {name}")


def no_decay_mask(params) -> Any:
    """True → apply weight decay. Excludes biases, 1-D params, and the SSM
    A_logs/Ds (reference optimizer.py:53-77 + `_no_weight_decay` tags,
    vmamba.py:1253-1266)."""

    def decide(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if any(n in ("A_logs", "Ds", "dt_projs_bias") for n in names):
            return False
        if names and names[-1] == "bias":
            return False
        return leaf.ndim > 1

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(
    config,
    steps_per_epoch: int,
    params=None,
    schedule: Optional[optax.Schedule] = None,
) -> optax.GradientTransformation:
    """AdamW (default) or SGD with the no-decay mask + grad accumulation
    (reference optimizer.py:5-50 + trainer.py:148-156)."""
    t = config.TRAIN
    # optax.MultiSteps advances the inner schedule once per *effective*
    # (accumulated) step, so the schedule horizon must be counted in
    # effective steps or the decay runs ACCUMULATION_STEPS× too slowly.
    effective_steps = max(1, steps_per_epoch // max(t.ACCUMULATION_STEPS, 1))
    sched = schedule or make_schedule(config, effective_steps)
    name = t.OPTIMIZER.NAME.lower()
    if name == "adamw":
        tx = optax.adamw(
            sched,
            b1=t.OPTIMIZER.BETAS[0],
            b2=t.OPTIMIZER.BETAS[1],
            eps=t.OPTIMIZER.EPS,
            weight_decay=t.WEIGHT_DECAY,
            mask=no_decay_mask if t.WEIGHT_DECAY > 0 else None,
        )
    elif name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(
                t.WEIGHT_DECAY, mask=no_decay_mask if t.WEIGHT_DECAY > 0 else None
            ),
            optax.sgd(sched, momentum=t.OPTIMIZER.MOMENTUM, nesterov=True),
        )
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    if t.ACCUMULATION_STEPS > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=t.ACCUMULATION_STEPS)
    return tx
