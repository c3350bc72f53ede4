"""Model averaging: EMA / SWA (reference src/agent/model_averaging.py).

The torch version wraps `torch.optim.swa_utils.AveragedModel`; here the
average is a plain params pytree updated functionally:

  EMA: avg <- decay * avg + (1-decay) * params     (every `freq` updates,
       starting at update `start`; initialized to params at `start`)
  SWA: avg <- (avg * n + params) / (n + 1)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from open_pi_zero_tpu.config import TrainingConfig


class AveragingState(NamedTuple):
    avg_params: dict  # same pytree as params
    n_averaged: jax.Array  # int32 scalar


def init_averaging(params: dict) -> AveragingState:
    return AveragingState(
        avg_params=jax.tree.map(jnp.zeros_like, params),
        n_averaged=jnp.zeros((), jnp.int32),
    )


def maybe_update(
    state: AveragingState, params: dict, update_idx, cfg: TrainingConfig
) -> AveragingState:
    """Apply the EMA/SWA rule if this update index is due (jit-safe:
    `update_idx` may be traced). No-op when neither mode is enabled."""
    if not (cfg.use_ema or cfg.use_swa):
        return state
    start = cfg.ema_start if cfg.use_ema else cfg.swa_start
    freq = cfg.ema_freq if cfg.use_ema else cfg.swa_freq
    due = (update_idx >= start) & ((update_idx - start) % freq == 0)

    def blend(avg, p):
        p = p.astype(avg.dtype)
        if cfg.use_ema:
            first = state.n_averaged == 0
            d = jnp.where(first, 0.0, cfg.ema_decay)
            return d * avg + (1.0 - d) * p
        n = state.n_averaged.astype(avg.dtype)
        return (avg * n + p) / (n + 1.0)

    new_avg = jax.tree.map(
        # integer leaves (QLoRA frozen NF4/int8 payloads) are not averaged
        # — blending would promote them to f32 and change the pytree
        lambda avg, p: (
            p
            if not jnp.issubdtype(avg.dtype, jnp.inexact)
            else jnp.where(due, blend(avg, p), avg)
        ),
        state.avg_params,
        params,
    )
    return AveragingState(new_avg, state.n_averaged + due.astype(jnp.int32))


def eval_params(state: Optional[AveragingState], params: dict) -> dict:
    """Average if any snapshots were taken, else the live params
    (reference model_averaging.py:60-72)."""
    if state is None:
        return params
    use_avg = state.n_averaged > 0
    return jax.tree.map(
        lambda a, p: jnp.where(use_avg, a.astype(p.dtype), p), state.avg_params, params
    )
