"""Blockwise int8 quantization primitives.

TPU-native replacement for the bitsandbytes CUDA kernels the reference
leans on (SURVEY.md §2.5): symmetric absmax int8 with one fp32 scale per
block of the flattened tensor. Used for 8-bit optimizer states
(training/quantized_adam.py) and int8 weight storage. Pure XLA — the
quantize/dequantize fuse into neighboring elementwise ops; a Pallas fused
dequant-matmul can slot in later without changing this format.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_BLOCK = 2048  # bnb blockwise default


@jax.tree_util.register_pytree_node_class
class QTensor:
    """Quantized tensor: int8 payload [n_blocks, block] + per-block fp32
    absmax scales [n_blocks, 1]. The original shape and the code's power
    are static pytree aux data (NOT traced leaves), so reshape stays
    jit-safe.

    `power` selects the code: 1 = linear symmetric int8; p > 1 = power-law
    code q = 127*(|x|/absmax)^(1/p) (an analytic stand-in for the bnb
    "dynamic" exponent map: near-logarithmic resolution, so tiny optimizer
    moments do not collapse to zero and 1/(sqrt(v)+eps) stays sane)."""

    def __init__(
        self, q: jax.Array, scale: jax.Array, shape: Tuple[int, ...], power: int = 1
    ):
        self.q = q
        self.scale = scale
        self.shape = tuple(shape)
        self.power = power

    def tree_flatten(self):
        return (self.q, self.scale), (self.shape, self.power)

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, power = aux
        return cls(children[0], children[1], shape, power)

    def __repr__(self):
        return f"QTensor(shape={self.shape}, blocks={self.q.shape}, power={self.power})"


def quantize_blockwise(
    x: jax.Array, block: int = DEFAULT_BLOCK, power: int = 1
) -> QTensor:
    shape = x.shape
    flat = x.astype(jnp.float32).reshape(-1)
    n = flat.shape[0]
    pad = (-n) % block
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax)
    frac = jnp.abs(blocks) / scale
    if power != 1:
        frac = frac ** (1.0 / power)
    q = jnp.clip(jnp.round(jnp.sign(blocks) * frac * 127.0), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale, shape=shape, power=power)


def dequantize_blockwise(qt: QTensor) -> jax.Array:
    frac = jnp.abs(qt.q.astype(jnp.float32)) / 127.0
    if qt.power != 1:
        frac = frac**qt.power
    blocks = jnp.sign(qt.q.astype(jnp.float32)) * frac * qt.scale
    flat = blocks.reshape(-1)
    n = 1
    for d in qt.shape:
        n *= d
    return flat[:n].reshape(qt.shape)


def quantize_int8_rowwise(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 for weight matrices [in, out]:
    returns (int8 [in, out], scale [out])."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.where(absmax == 0, 1.0, absmax) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)
