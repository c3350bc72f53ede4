"""Flow-time embeddings (reference: src/model/vla/modules.py:9-22)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sinusoidal_time_embedding(
    t: jax.Array, dim: int, max_period: float = 10000.0, dtype=None
) -> jax.Array:
    """[B] -> [B, dim]: concat(sin(t*f), cos(t*f)) with log-spaced freqs.

    Matches SinusoidalPosEmb: ``f_i = exp(-i * log(max_period)/(dim/2 - 1))``.
    Computed in fp32 and cast to ``dtype`` (or t.dtype).
    """
    half = dim // 2
    out_dtype = dtype or t.dtype
    tf = t.astype(jnp.float32)
    scale = math.log(max_period) / (half - 1)
    freqs = jnp.exp(-scale * jnp.arange(half, dtype=jnp.float32))  # [half]
    args = tf[:, None] * freqs[None, :]  # [B, half]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    return emb.astype(out_dtype)
