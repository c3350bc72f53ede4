"""Rotary position embeddings, forced to float32 for accuracy.

Matches the reference's Gemma RoPE semantics exactly
(src/model/paligemma/modules.py:24-67 and src/model/utils.py:4-16):
``inv_freq = base^(-2i/dim)``; cos/sin built over the *full* head dim by
concatenating the frequency table with itself; rotate_half splits the head
dim in two contiguous halves. All trig in fp32, cast at the end.

Array layout here is TPU-native ``[B, L, H, D]`` (heads after sequence) so
that the trailing ``D=256`` maps onto two 128-lane registers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rope_cos_sin(
    position_ids: jax.Array,  # [B, L] or [L], integer or float positions
    head_dim: int,
    base: float,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Return (cos, sin) of shape [B, L, D] (or [L, D] if unbatched)."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # [D/2]
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # [..., L, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., L, D]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, L, H, D]; cos/sin: [B, L, D] or [L, D]. fp32 rotate, cast back."""
    if cos.ndim == 2:  # [L, D] -> broadcast batch
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :].astype(jnp.float32)  # [B, L, 1, D]
    sin = sin[:, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)
