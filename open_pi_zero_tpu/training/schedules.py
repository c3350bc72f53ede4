"""LR schedules as pure optax-compatible functions.

Reference: CosineAnnealingWarmupRestarts (src/utils/optim.py:31-159) — linear
warmup from min_lr to max_lr over `warmup_steps`, then cosine anneal to
min_lr over the rest of the cycle, restarting every `first_cycle_steps` with
max_lr scaled by `gamma` per cycle. The torch class mutates optimizer state;
here it is a pure function of the update count (jit-safe)."""

from __future__ import annotations

import jax.numpy as jnp

from open_pi_zero_tpu.config import LRSchedulerConfig


def cosine_annealing_warmup_restarts(
    max_lr: float,
    first_cycle_steps: int,
    min_lr: float = 1e-8,
    warmup_steps: int = 0,
    cycle_mult: float = 1.0,
    gamma: float = 1.0,
):
    """Returns schedule(count) -> lr. Only cycle_mult == 1.0 is supported
    (all reference configs use 1.0; the growing-cycle branch of the torch
    class is dead code for this model family)."""
    if cycle_mult != 1.0:
        raise NotImplementedError("cycle_mult != 1.0 is not used by any config")
    assert warmup_steps < first_cycle_steps

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        cycle = jnp.floor(count / first_cycle_steps)
        step_in_cycle = count - cycle * first_cycle_steps
        cur_max = max_lr * (gamma**cycle)
        warm = (cur_max - min_lr) * step_in_cycle / max(warmup_steps, 1) + min_lr
        denom = first_cycle_steps - warmup_steps
        cos = min_lr + (cur_max - min_lr) * (
            1.0 + jnp.cos(jnp.pi * (step_in_cycle - warmup_steps) / denom)
        ) / 2.0
        return jnp.where(step_in_cycle < warmup_steps, warm, cos)

    return schedule


def from_config(max_lr: float, cfg: LRSchedulerConfig):
    return cosine_annealing_warmup_restarts(
        max_lr=max_lr,
        first_cycle_steps=cfg.first_cycle_steps,
        min_lr=cfg.min_lr,
        warmup_steps=cfg.warmup_steps,
        cycle_mult=cfg.cycle_mult,
        gamma=cfg.gamma,
    )
