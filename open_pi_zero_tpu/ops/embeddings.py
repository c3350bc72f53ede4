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


def gaussian_fourier_init(
    key: jax.Array, input_dim: int, embed_dim: int = 256, scale: float = 10.0
) -> jax.Array:
    """Random (frozen) projection B ~ N(0, scale^2) for Fourier features
    (reference GaussianFourierFeatureTransform, vla/modules.py:56-75 — an
    unused flow-time-embedding experiment kept for capability parity)."""
    return jax.random.normal(key, (input_dim, embed_dim)) * scale


def gaussian_fourier_features(v: jax.Array, b: jax.Array) -> jax.Array:
    """[..., input_dim] -> [..., 2*embed_dim]: [sin(2πvB), cos(2πvB)]."""
    proj = 2.0 * jnp.pi * jnp.einsum("...i,ie->...e", v, b.astype(v.dtype))
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
