"""Normalization ops with the reference's exact precision semantics.

Gemma's RMSNorm does *all* internal math in float32 and multiplies by
``(1 + w)`` before casting back (reference: src/model/paligemma/modules.py:7-21,
citing huggingface/transformers#29402). Replicating these cast points is
what makes bf16 checkpoint outputs transfer (SURVEY.md "hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Gemma RMSNorm: fp32 internals, (x_hat * (1 + w)) cast back to x.dtype.

    weight is zero-initialized (so the norm starts as identity scale).
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    out = normed * (1.0 + weight.astype(jnp.float32))
    return out.astype(x.dtype)


def layer_norm(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Standard LayerNorm (SigLIP tower), fp32 internals."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _rms_only(x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def adaptive_rms_norm(
    x: jax.Array,
    cond: jax.Array,
    gamma_kernel: jax.Array,
    gamma_bias: jax.Array,
    beta_kernel: jax.Array,
    eps: float = 1e-6,
) -> jax.Array:
    """adaLN RMSNorm: norm(x) * sigmoid(cond @ Wg + bg) + cond @ Wb.

    Reference: src/model/vla/modules.py:78-99 (AdaptiveRMSNorm). Unlike the
    Gemma norm there is no (1+w) weight; gamma/beta come from the time
    conditioning vector. cond: [B, Dc]; broadcast over the sequence axis.
    """
    normed = _rms_only(x, eps)
    if cond.ndim == 2:
        cond = cond[:, None, :]
    gamma = jax.nn.sigmoid(
        jnp.einsum("bsc,cd->bsd", cond, gamma_kernel.astype(cond.dtype)) + gamma_bias
    )
    beta = jnp.einsum("bsc,cd->bsd", cond, beta_kernel.astype(cond.dtype))
    return (normed * gamma + beta).astype(x.dtype)


def adaptive_layerscale(
    x: jax.Array,
    cond: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    """adaLN-Zero gate: x * sigmoid(cond @ W + b); W zero-init, b = -2.

    Reference: src/model/vla/modules.py:102-119 (AdaptiveLayerscale).
    """
    if cond.ndim == 2:
        cond = cond[:, None, :]
    gamma = jnp.einsum("bsc,cd->bsd", cond, kernel.astype(cond.dtype)) + bias
    return x * jax.nn.sigmoid(gamma).astype(x.dtype)
