"""Pallas fused int4 dequant-matmul (TPU) — the 4-bit *latency* tier.

The Euler flow loop re-streams the action expert's weights every step
(reference pizero.py:459-481 streams them 10x per action chunk), so chunk
latency is bounded by weight bytes/step. The tiers:

  bf16   2.00 B/param   (baseline)
  int8   1.00 B/param   (XLA weight-only path: convert fuses into the dot)
  int4   0.5625 B/param (this kernel: 2 nibbles/byte + fp32 per-block
                         scales at block 64 along K)

XLA cannot express "dequantize int4 inside the dot's operand read" — a
jnp path materializes the dequantized [K, N] matrix in HBM, which costs
MORE traffic than int8. Only a kernel that unpacks nibbles in VMEM gets
the 4-bit streaming rate. MEASURED CAVEAT (v5e): the unpack does NOT
hide under the DMA in practice — Mosaic cannot shift int8 vectors, the
int32 detour relayouts 4x, and the kernel ends up VPU-bound and slower
than the int8 weight-only XLA path (see int4_kernel_enabled); serving
instead decodes 4-bit to int8 once per call (models/pizero._hoist_4bit).
Kept as the HBM-minimal option and for TPU generations with native i4
vector support.

Layout ("k-packed int4", built by ops.quantization.quantize_kernel_int4k):
  byte[k, n] = (u[k + K/2, n] << 4) | u[k, n]   for k < K/2,  u = q + 8
so low nibbles hold the first K/2 rows and high nibbles the last K/2 —
unpacking is a CONCAT along sublanes, not an interleave (TPU sublane
shuffles are expensive; concat is free relayout). Scales are blocked
along K in original row order: w[k, n] ~= (u[k, n] - 8) * scale[k//B, n].

The matmul itself is bf16 x bf16 -> fp32 on the MXU: int4 values are
exactly representable in bf16, and the dequant multiply happens in VMEM
on the tile just before the dot.

Numerics: int4 blockwise absmax (scale = absmax/7, clip [-8, 7]) has
~2x the weight RMSE of NF4 — use this tier when latency dominates and
the NF4 tier (models/fuse.py bits=4) when quality/memory dominates.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
DEFAULT_BLOCK_K = 64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------- #
# quantize / dequantize (host/XLA side)
# --------------------------------------------------------------------------- #


def quantize_kernel_int4k(w: jax.Array, block: int = DEFAULT_BLOCK_K) -> dict:
    """[..., K, N] float -> {q4k: int8 [..., K//2, N], kscale: f32
    [..., K//block, N]}. Blocks run along K (the contraction dim) so the
    kernel can apply scales without touching the output epilogue; K must
    be even (block shrinks by gcd for odd-block kernels)."""
    *lead, K, N = w.shape
    if K % 2:
        raise ValueError(f"K={K} must be even to pack nibbles")
    block = math.gcd(block, K)
    wf = w.astype(jnp.float32)
    blocks = wf.reshape(*lead, K // block, block, N)
    absmax = jnp.max(jnp.abs(blocks), axis=-2, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax) / 7.0
    q = jnp.clip(jnp.round(blocks / scale), -8, 7).astype(jnp.int32)
    u = (q + 8).reshape(*lead, K, N)
    lo, hi = u[..., : K // 2, :], u[..., K // 2 :, :]
    packed = ((hi << 4) | lo).astype(jnp.int8)
    return {"q4k": packed, "kscale": scale[..., 0, :]}


def dequantize_kernel_int4k(d: dict, dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_kernel_int4k (reference semantics for tests and
    the XLA fallback path)."""
    p = d["q4k"].astype(jnp.int32)
    lo = (p & 15) - 8
    hi = ((p >> 4) & 15) - 8
    u = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)  # [..., K, N]
    *lead, K, N = u.shape
    nb = d["kscale"].shape[-2]
    vals = u.reshape(*lead, nb, K // nb, N) * d["kscale"][..., :, None, :]
    return vals.reshape(*lead, K, N).astype(dtype)


# --------------------------------------------------------------------------- #
# kernel
# --------------------------------------------------------------------------- #


def _kernel(x_ref, p_ref, s_ref, out_ref, *, block_k):
    """One N-tile. x [M, K] bf16; p [K//2, Nt] int8 packed; s [K//B, Nt]
    f32; out [M, Nt] fp32. Whole K resides in VMEM (expert K <= 4096).

    Only the two bit-ops run in int32 (Mosaic cannot legalize shifts on
    int8 vectors — 'arith.shrsi' fails for vector<...xi8>); everything
    downstream is bf16 to keep VPU work and VMEM traffic minimal. Nibble
    values are exact in bf16, and the bias subtract happens BEFORE the
    matmul so there is no large-term cancellation (folding -8 into a
    correction matmul measured ~3% output noise: both terms are ~8x the
    result)."""
    p = p_ref[:].astype(jnp.int32)  # int8 -> int32 (bit ops legalize)
    lo = (p & 15).astype(jnp.bfloat16)
    hi = ((p >> 4) & 15).astype(jnp.bfloat16)  # arith shift + mask: correct
    u = jnp.concatenate([lo, hi], axis=0)  # [K, Nt] bf16
    k, nt = u.shape
    s = s_ref[:].astype(jnp.bfloat16)  # [Kb, Nt]
    w = ((u - 8.0).reshape(k // block_k, block_k, nt) * s[:, None, :]).reshape(k, nt)
    out_ref[:] = jax.lax.dot_general(
        x_ref[:],
        w.astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _int4k_matmul_2d(
    x: jax.Array, d: dict, interpret: bool, n_tile: int = 256
) -> jax.Array:
    """x [M, K] @ int4k dict -> [M, N] in x.dtype."""
    m, k = x.shape
    kh, n = d["q4k"].shape
    nb = d["kscale"].shape[0]
    assert kh * 2 == k, f"packed K/2={kh} vs x K={k}"
    block_k = k // nb

    sub = 16 if x.dtype == jnp.bfloat16 else 8
    m_p = _round_up(m, sub)
    n_p = _round_up(n, n_tile) if n > n_tile else _round_up(n, _LANE)
    n_t = min(n_tile, n_p)
    x_p = jnp.pad(x, ((0, m_p - m), (0, 0)))
    p_p = jnp.pad(d["q4k"], ((0, 0), (0, n_p - n)))
    s_p = jnp.pad(d["kscale"], ((0, 0), (0, n_p - n)))

    out = pl.pallas_call(
        functools.partial(_kernel, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), jnp.float32),
        grid=(n_p // n_t,),
        in_specs=[
            pl.BlockSpec((m_p, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, n_t), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, n_t), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_p, n_t), lambda j: (0, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * k * n_p,
            bytes_accessed=p_p.size + s_p.size * 4 + x_p.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_p, p_p, s_p)
    return out[:m, :n]


# --------------------------------------------------------------------------- #
# dispatch
# --------------------------------------------------------------------------- #

_FORCE = os.environ.get("OPZ_INT4_KERNEL", "auto")  # auto|1|0|interpret


def int4_kernel_enabled() -> bool:
    """Opt-in (OPZ_INT4_KERNEL=1|interpret). Measured on v5e at bridge
    scale: the fused kernel is correct but VPU/relayout-bound — the nibble
    unpack (int8 vectors cannot shift on Mosaic; int32 promotion relayouts
    4x) costs more than the HBM bytes it saves, so serving defaults to the
    decode-once-to-int8 hoist in models/pizero.py (same 4-bit at-rest
    memory, int8 streaming in the Euler loop)."""
    if _FORCE in ("1", "interpret"):
        return True
    return False


def _interpret() -> bool:
    return _FORCE == "interpret" or jax.default_backend() != "tpu"


def int4k_matmul(x: jax.Array, d: dict) -> jax.Array:
    """Batched entry: x [..., K] @ {q4k, kscale} -> [..., N] fp32. Fused
    Pallas kernel on single-device TPU, dequant-then-einsum XLA fallback
    elsewhere. fp32 accumulation either way."""
    *batch, k = x.shape
    if int4_kernel_enabled():
        out = _int4k_matmul_2d(x.reshape(-1, k), d, interpret=_interpret())
        return out.reshape(*batch, -1)
    w = dequantize_kernel_int4k(d, x.dtype)
    return jnp.einsum("...i,io->...o", x, w, preferred_element_type=jnp.float32)
