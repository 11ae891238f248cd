"""LR schedules replicating torch.optim.lr_scheduler semantics used by the
reference (scripts/train_cl.py:153-181), stepped **per training step**
(epoch/train_epoch.py:41-42).

- one_cycle: OneCycleLR(max_lr, total_steps, pct_start=0.3,
  anneal_strategy='cos', cycle_momentum=False). torch's initial_lr =
  max_lr/div_factor (default 25), final lr = initial_lr/final_div_factor
  (default 1e4). The optimizer's own `lr` is overwritten by the schedule.
- exponential: lr * 0.95^step-count-in-epochs? torch ExponentialLR decays
  per scheduler.step() call — the reference calls it per *step*, so
  gamma=0.95 per step.
- step: StepLR(step_size=10, gamma=0.5) — also stepped per training step.
- cosine: CosineAnnealingLR(T_max=total_steps, eta_min).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def one_cycle(max_lr: float, total_steps: int, pct_start: float = 0.3,
              div_factor: float = 25.0, final_div_factor: float = 1e4):
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    # torch OneCycleLR: phase 1 ends at float(pct_start*total_steps) - 1.
    warm = max(1.0, float(pct_start * total_steps) - 1)

    def sched(step):
        step = jnp.minimum(step, total_steps - 1)
        up = initial_lr + (max_lr - initial_lr) * 0.5 * (
            1 - jnp.cos(jnp.pi * jnp.minimum(step / warm, 1.0))
        )
        down_t = (step - warm) / jnp.maximum(total_steps - 1 - warm, 1)
        down = min_lr + (max_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * down_t))
        return jnp.where(step < warm, up, down)

    return sched


def exponential(lr: float, gamma: float = 0.95):
    return lambda step: lr * gamma**step


def step_decay(lr: float, step_size: int = 10, gamma: float = 0.5):
    return lambda step: lr * gamma ** (step // step_size)


def cosine(lr: float, total_steps: int, min_lr: float = 1e-9):
    def sched(step):
        t = jnp.minimum(step, total_steps)
        return min_lr + (lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * t / total_steps))

    return sched


def build_schedule(model_config, total_steps: int):
    """Config-driven schedule (train_cl.py:153-181): default constant 1e-3."""
    lr = 1e-3
    lr_config = getattr(model_config, "lr_config", None)
    if lr_config is not None and hasattr(lr_config, "lr"):
        lr = lr_config.lr

    name = getattr(model_config, "lr_scheduler", None)
    if name is None:
        return optax.constant_schedule(lr)
    if name == "one_cycle":
        max_lr = 1e-3
        if lr_config is not None and hasattr(lr_config, "max_lr"):
            max_lr = lr_config.max_lr
        return one_cycle(max_lr, total_steps)
    if name == "exponential":
        return exponential(lr)
    if name == "step":
        return step_decay(lr)
    if name == "cosine":
        min_lr = 1e-9
        if lr_config is not None and hasattr(lr_config, "min_lr"):
            min_lr = lr_config.min_lr
        return cosine(lr, total_steps, min_lr)
    raise ValueError(f"unknown lr_scheduler: {name}")
