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


def linear(x: jax.Array, kernel, bias: Optional[jax.Array] = None) -> jax.Array:
    """Dense layer. `kernel` is a plain [in, out] array or a quantized
    dict (ops/quantization.py): {qa, scale} W8A8 — activations are
    dynamically quantized per token and the dot runs native int8 x int8
    on the MXU with a rank-1 fp32 dequant epilogue; {q4, absmax}
    blockwise NF4 (QLoRA frozen base) — dequantized to the activation
    dtype first; {q, scale} weight-only int8."""
    if isinstance(kernel, dict) and "q4" in kernel:
        from open_pi_zero_tpu.ops.quantization import dequantize_kernel_nf4

        out = jnp.einsum(
            "...i,io->...o",
            x,
            dequantize_kernel_nf4(kernel, x.dtype),
            preferred_element_type=jnp.float32,
        )
    elif isinstance(kernel, dict) and "q" in kernel:
        out = jnp.einsum(
            "...i,io->...o",
            x,
            kernel["q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ) * kernel["scale"].astype(jnp.float32)
    elif isinstance(kernel, dict) and "qa" in kernel:
        from open_pi_zero_tpu.ops.quantization import quantize_act_per_token

        xq, sx = quantize_act_per_token(x)
        out = jnp.einsum(
            "...i,io->...o", xq, kernel["qa"], preferred_element_type=jnp.int32
        )
        out = out.astype(jnp.float32) * sx * kernel["scale"].astype(jnp.float32)
    elif isinstance(kernel, dict):
        raise ValueError(
            f"unsupported quantized kernel format {sorted(kernel)} — linear() "
            "handles {q4, absmax} NF4, {q, scale} weight-only int8 and "
            "{qa, scale} W8A8"
        )
    else:
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
