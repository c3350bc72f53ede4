"""Dense layer helpers.

Kernels are stored ``[in, out]`` (JAX convention; the torch checkpoints'
``[out, in]`` layout is transposed by models/convert.py). Matmuls accumulate
in fp32 on the MXU and cast back to the activation dtype, matching torch's
bf16 matmul behavior.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    out = jnp.einsum(
        "...i,io->...o", x, kernel, preferred_element_type=jnp.float32
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def linear_init(key, in_dim: int, out_dim: int, dtype, use_bias: bool = True) -> dict:
    """torch nn.Linear default init: U(+-1/sqrt(fan_in)) for kernel and bias."""
    bound = 1.0 / (in_dim**0.5)
    k1, k2 = jax.random.split(key)
    p = {"kernel": jax.random.uniform(k1, (in_dim, out_dim), dtype, -bound, bound)}
    if use_bias:
        p["bias"] = jax.random.uniform(k2, (out_dim,), dtype, -bound, bound)
    return p
