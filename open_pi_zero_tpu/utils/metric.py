"""Action accuracy metric (reference src/utils/metric.py:6-21): fraction of
(batch*horizon) samples whose action dims are ALL within the threshold."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def get_action_accuracy(
    gt: jax.Array,  # [B, H, A]
    pred: jax.Array,
    thresholds: Sequence[float] = (0.1, 0.2),
) -> jax.Array:
    """Returns [len(thresholds)] accuracies."""
    diff = jnp.abs(gt - pred).reshape(-1, gt.shape[-1])
    accs = [
        jnp.mean(jnp.all(diff < th, axis=1).astype(jnp.float32))
        for th in thresholds
    ]
    return jnp.stack(accs)


def l1_loss(gt: jax.Array, pred: jax.Array) -> jax.Array:
    """Mean absolute error, the reference's validation loss (train.py:437)."""
    return jnp.mean(jnp.abs(gt - pred))
