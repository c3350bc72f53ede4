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


# --------------------------------------------------------------------------- #
# 4-bit blockwise (bnb Linear4bit parity: reference src/model/lora.py:214-360)
# --------------------------------------------------------------------------- #

# QLoRA NF4 code (information-theoretically optimal for N(0,1) weights) and
# bnb FP4 (e2m1) code — both public 16-entry tables from bitsandbytes
# functional.quantize_4bit. Index = the stored nibble.
NF4_CODE = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)
_FP4_MAG = (0.0, 0.0052083334885537624, 0.6666666865348816, 1.0,
            0.3333333432674408, 0.5, 0.16666667163372, 0.25)
FP4_CODE = _FP4_MAG + tuple(-m for m in _FP4_MAG)  # high bit = sign

DEFAULT_BLOCK_4BIT = 64  # bnb Linear4bit default blocksize


def _code_table(quant_type: str) -> jnp.ndarray:
    if quant_type == "nf4":
        return jnp.asarray(NF4_CODE, jnp.float32)
    if quant_type == "fp4":
        return jnp.asarray(FP4_CODE, jnp.float32)
    raise ValueError(f"unknown 4-bit quant_type {quant_type!r}")


@jax.tree_util.register_pytree_node_class
class Q4Tensor:
    """4-bit blockwise tensor: two nibbles packed per uint8 byte
    ([n_blocks, block//2]) + per-block fp32 absmax scales. `quant_type`
    selects the nf4/fp4 codebook; `shape` restores the original layout.
    With `scale_q` set (bnb compress_statistics / "double quantization"),
    the absmax vector is itself stored int8-blockwise."""

    def __init__(self, packed, scale, shape, quant_type="nf4", scale_q=None):
        self.packed = packed
        self.scale = scale  # fp32 [n_blocks, 1], or None when scale_q is set
        self.scale_q = scale_q  # QTensor of the absmax vector, or None
        self.shape = tuple(shape)
        self.quant_type = quant_type

    def tree_flatten(self):
        return (self.packed, self.scale, self.scale_q), (self.shape, self.quant_type)

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, quant_type = aux
        return cls(children[0], children[1], shape, quant_type, children[2])

    def __repr__(self):
        return (
            f"Q4Tensor(shape={self.shape}, blocks={self.packed.shape}, "
            f"type={self.quant_type}, double_quant={self.scale_q is not None})"
        )


def quantize_4bit(
    x: jax.Array,
    block: int = DEFAULT_BLOCK_4BIT,
    quant_type: str = "nf4",
    compress_statistics: bool = False,
) -> Q4Tensor:
    """Nearest-codebook-entry 4-bit quantization with per-block absmax
    scaling (bnb quantize_4bit semantics)."""
    code = _code_table(quant_type)
    shape = x.shape
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.shape[0]) % block
    blocks = jnp.pad(flat, (0, pad)).reshape(-1, block)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax)
    normed = blocks / scale  # [-1, 1]
    # nearest of 16 code values (vectorized argmin; 16x the elements but
    # one-shot at conversion time)
    idx = jnp.argmin(
        jnp.abs(normed[..., None] - code[None, None, :]), axis=-1
    ).astype(jnp.uint8)
    lo, hi = idx[:, 0::2], idx[:, 1::2]
    packed = (hi << 4) | lo
    scale_q = None
    if compress_statistics:
        scale_q = quantize_blockwise(scale.reshape(-1), block=256)
        scale = None
    return Q4Tensor(packed, scale, shape, quant_type, scale_q)


def dequantize_4bit(qt: Q4Tensor) -> jax.Array:
    code = _code_table(qt.quant_type)
    lo = (qt.packed & 0x0F).astype(jnp.int32)
    hi = (qt.packed >> 4).astype(jnp.int32)
    idx = jnp.stack([lo, hi], axis=-1).reshape(qt.packed.shape[0], -1)
    scale = (
        dequantize_blockwise(qt.scale_q).reshape(-1, 1)
        if qt.scale_q is not None
        else qt.scale
    )
    blocks = code[idx] * scale
    n = 1
    for d in qt.shape:
        n *= d
    return blocks.reshape(-1)[:n].reshape(qt.shape)


# On-disk/payload layout version for 4-bit kernel dicts. v1 packed nibble
# PAIRS ((idx[2i+1]<<4)|idx[2i], dequant = lane interleave); v2 packs
# HALVES (low nibbles = first N/2 columns, dequant = lane concat — TPU
# lane interleaves dominated the decode cost). The version is stamped into
# checkpoint metadata (training/checkpoint.py) rather than the payload
# dict: an extra scalar leaf would break lax.scan over stacked [L, ...]
# layer dicts. A v1-era checkpoint restored into v2 code would silently
# dequantize scrambled weights — the metadata check makes it fail loudly.
QUANT_LAYOUT_VERSION = 2


def quantize_kernel_nf4(w: jax.Array, block: int = DEFAULT_BLOCK_4BIT) -> dict:
    """NF4 layout for model kernels: blocks run along the LAST dim so a
    stacked [L, in, out] kernel quantizes to plain-dict leaves with the same
    leading dims ({q4: uint8 [..., in, out//2], absmax: f32 [..., in,
    out//block]}) — lax.scan slices layers and GSPMD shards them like any
    other leaf (unlike a packed-flat Q4Tensor). Equivalent to bnb's
    flattened blocking modulo block ordering. Blocks shrink to the last dim
    for tiny / fused (non-multiple-of-64) kernels."""
    import math

    block = math.gcd(block, w.shape[-1])
    if w.shape[-1] % 2:
        raise ValueError(f"last dim {w.shape[-1]} must be even to pack nibbles")
    lead = w.shape[:-1]
    blocks = w.astype(jnp.float32).reshape(*lead, -1, block)
    absmax = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax)
    normed = blocks / scale
    # nearest NF4 entry via midpoint binning (the table is sorted): 15
    # accumulated comparisons keep peak memory at ~3x the weights, vs 16x
    # for a broadcast argmin (which OOMs a 16 GB chip on the 0.3B expert)
    mids = [(NF4_CODE[i] + NF4_CODE[i + 1]) / 2.0 for i in range(15)]
    idx = jnp.zeros(normed.shape, jnp.uint8)
    for m in mids:
        idx = idx + (normed >= m).astype(jnp.uint8)
    idx = idx.reshape(*lead, -1)
    # halves packing: low nibbles hold columns [0, N/2), high nibbles
    # [N/2, N) — dequant is then a lane CONCAT, not an interleave (TPU
    # lane shuffles dominated the decode cost with pair-packing). Internal
    # layout only: quantize/dequantize are always used as a pair.
    n = idx.shape[-1]
    packed = (idx[..., n // 2 :] << 4) | idx[..., : n // 2]
    return {"q4": packed, "absmax": scale[..., 0]}


def _lut16(idx: jax.Array, table) -> jax.Array:
    """16-entry lookup as a 15-select binary tree over the index bits —
    on TPU this stays on the VPU (a tiny-table gather lowers to a slow
    dynamic-gather loop). Numerically identical to table[idx]."""
    b0 = (idx & 1).astype(bool)
    b1 = (idx & 2).astype(bool)
    b2 = (idx & 4).astype(bool)
    b3 = (idx & 8).astype(bool)
    v = [jnp.where(b0, table[2 * i + 1], table[2 * i]) for i in range(8)]
    v = [jnp.where(b1, v[2 * i + 1], v[2 * i]) for i in range(4)]
    v = [jnp.where(b2, v[2 * i + 1], v[2 * i]) for i in range(2)]
    return jnp.where(b3, v[1], v[0])


def dequantize_kernel_nf4(d: dict, dtype=jnp.float32) -> jax.Array:
    lo = (d["q4"] & 0x0F).astype(jnp.int32)
    hi = (d["q4"] >> 4).astype(jnp.int32)
    idx = jnp.concatenate([lo, hi], axis=-1)  # halves packing (see above)
    g = d["absmax"].shape[-1]
    vals = _lut16(idx, NF4_CODE).reshape(*idx.shape[:-1], g, -1) * d["absmax"][..., None]
    return vals.reshape(idx.shape).astype(dtype)


def quantize_int8_rowwise(
    w: jax.Array, mse_scale: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 for weight matrices [in, out]:
    returns (int8 [in, out], scale [out]).

    mse_scale=True replaces the minimax (absmax) scale with a per-channel
    grid search minimizing the reconstruction MSE (the AWQ/GPTQ-style
    clip-search, data-free): shrinking the scale clips a few tail weights
    but represents the bulk finer. One-off cost at quantize time, zero at
    serving time — same dequant epilogue. Measured drift win is recorded in
    DRIFT_BUDGET.json."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.where(absmax == 0, 1.0, absmax) / 127.0
    if mse_scale:
        fs = jnp.linspace(0.75, 1.0, 11)

        def err_for(f):
            s = scale * f
            q = jnp.clip(jnp.round(w32 / s), -127, 127)
            return jnp.sum(jnp.square(w32 - q * s), axis=0)

        # lax.map (not vmap): one candidate's [in, out] residual live at a
        # time — a broadcast over 11 candidates would 11x the peak memory
        errs = jax.lax.map(err_for, fs)  # [11, out]
        scale = scale * fs[jnp.argmin(errs, axis=0)]
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_act_per_token(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-token symmetric int8 activation quantization for W8A8
    serving: one fp32 scale per row (token), computed on the fly inside the
    jitted step. Returns (int8 [..., K], scale [..., 1]); x ~= q * scale.

    Used with per-output-channel int8 weights so the dequant is a rank-1
    epilogue (row_scale x col_scale) after a NATIVE int8 x int8 MXU matmul
    (the v5e int8 MXU path measures ~1.55x bf16 throughput at M~256 —
    this is a compute-throughput tier, unlike the weight-only int8 tier
    which only saves HBM streaming)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale
