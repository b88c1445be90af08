"""LR schedules — step-level cosine/linear/step with warmup.

Mirrors the reference's build_scheduler (mvuld/lr_scheduler.py:13-105): timm
CosineLRScheduler with ``t_in_epochs=False`` (per-STEP updates), LinearLR,
StepLR; plus the linear LR scaling rule applied at startup
(BASE_LR × batch·world/512, mvuld/main.py:486-493).
"""

from __future__ import annotations

from typing import Callable

import optax

from mvuld_tpu.core.registry import SCHEDULERS


def scale_lr(base_lr: float, global_batch: int, denom: int = 512) -> float:
    return base_lr * global_batch / denom


@SCHEDULERS.register("cosine")
def cosine_schedule(base_lr: float, warmup_lr: float, min_lr: float,
                    warmup_steps: int, total_steps: int) -> Callable:
    warmup = optax.linear_schedule(warmup_lr, base_lr, max(warmup_steps, 1))
    cosine = optax.cosine_decay_schedule(
        base_lr, max(total_steps - warmup_steps, 1),
        alpha=min_lr / base_lr if base_lr > 0 else 0.0)
    return optax.join_schedules([warmup, cosine], [warmup_steps])


@SCHEDULERS.register("linear")
def linear_schedule(base_lr: float, warmup_lr: float, min_lr: float,
                    warmup_steps: int, total_steps: int) -> Callable:
    warmup = optax.linear_schedule(warmup_lr, base_lr, max(warmup_steps, 1))
    decay = optax.linear_schedule(base_lr, min_lr,
                                  max(total_steps - warmup_steps, 1))
    return optax.join_schedules([warmup, decay], [warmup_steps])


@SCHEDULERS.register("step")
def step_schedule(base_lr: float, warmup_lr: float, min_lr: float,
                  warmup_steps: int, total_steps: int,
                  decay_steps: int = 0, decay_rate: float = 0.1) -> Callable:
    warmup = optax.linear_schedule(warmup_lr, base_lr, max(warmup_steps, 1))
    step = optax.exponential_decay(base_lr, max(decay_steps, 1), decay_rate,
                                   staircase=True)
    return optax.join_schedules([warmup, step], [warmup_steps])


def build_schedule(cfg, steps_per_epoch: int, global_batch: int) -> Callable:
    """Build the schedule selected by TRAIN.LR_SCHEDULER.NAME with the
    reference's epoch→step conversion and LR scaling."""
    t = cfg.TRAIN
    base = scale_lr(t.BASE_LR, global_batch)
    warmup = scale_lr(t.WARMUP_LR, global_batch)
    minimum = scale_lr(t.MIN_LR, global_batch)
    warmup_steps = t.WARMUP_EPOCHS * steps_per_epoch
    total_steps = t.EPOCHS * steps_per_epoch
    name = t.LR_SCHEDULER.NAME
    kwargs = {}
    if name == "step":
        kwargs = {"decay_steps": t.LR_SCHEDULER.DECAY_EPOCHS * steps_per_epoch,
                  "decay_rate": t.LR_SCHEDULER.DECAY_RATE}
    return SCHEDULERS.get(name)(base, warmup, minimum, warmup_steps,
                                total_steps, **kwargs)
