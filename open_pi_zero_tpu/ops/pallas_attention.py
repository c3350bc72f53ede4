"""Pallas-fused MoT attention kernel (TPU).

The hot op of the framework: joint mixture-of-transformers attention with
Gemma tanh soft-capping at 50, an additive block-causal mask, and grouped
queries (reference semantics: src/model/vla/joint_model.py:259-282 — there
it is unfused python: matmul, softcap, mask add, fp32 softmax, matmul).

TPU-first design (NOT a translation):
  - one kernel instance per (batch, kv_head) grid cell; the GQA group axis
    is folded into query *rows*, so QK^T is a single [G*Lq, D]x[D, Lkv]
    MXU matmul instead of G small ones (no materialized repeat_kv);
  - scores never leave VMEM: scale -> tanh softcap -> +mask -> fp32
    softmax -> PV happen in one fused body (the XLA path materializes the
    [B,H,Lq,Lkv] score tensor in HBM between fusions at larger sizes);
  - the whole 281-token sequence fits one block (SURVEY.md §5: no long
    context), so no online-softmax tiling is needed — VMEM use at bridge
    geometry is ~7 MB, under the ~16 MB budget;
  - fully-masked rows stay NaN-free because the mask is additive with a
    *finite* MASK_NEG (matches ops/masks.py and the reference's fill value).

Backward: custom VJP that recomputes through the XLA einsum path
(ops/attention.mot_attention_xla). At 281 tokens the backward score matrix
is tiny, so recompute-from-inputs costs less than saving probs to HBM.

Numerics match the XLA path bit-for-bit up to softmax reassociation:
QK^T accumulated fp32, softcap/mask/softmax fp32, probs cast to the value
dtype before PV, PV accumulated fp32, output cast back to q.dtype.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open_pi_zero_tpu.ops.masks import MASK_NEG

_LANE = 128  # last-dim tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sublane(dtype) -> int:
    return {2: 16, 1: 32}.get(jnp.dtype(dtype).itemsize, 8)


def _kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale, softcap, g, lq):
    """One (batch, kv_head) cell. q_ref [1,1,G*Lq,D]; k/v [1,1,Lkv,D];
    mask [1,Lq,Lkv] additive fp32; out [1,1,G*Lq,D]."""
    q = q_ref[0, 0]  # [R, D], R = G*Lq
    k = k_ref[0, 0]  # [Lkv, D]
    v = v_ref[0, 0]
    lkv = k.shape[0]

    # fp32 inputs: HIGHEST keeps Mosaic from emulating the fp32 matmul with
    # low-pass bf16 products (measured ~5e-3 drift vs XLA on v5e otherwise);
    # bf16 inputs already accumulate fp32 via preferred_element_type
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [R, Lkv] fp32
    s = s * scale
    if softcap is not None:
        s = jnp.tanh(s * (1.0 / softcap)) * softcap
    s = s.reshape(g, lq, lkv) + mask_ref[0][None]  # broadcast mask over groups
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    p = p.reshape(g * lq, lkv).astype(v.dtype)

    o = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    out_ref[0, 0] = o.astype(out_ref.dtype)


def _fused_fwd(
    q: jax.Array,  # [B, Lq, Hq, D]
    k: jax.Array,  # [B, Lkv, Hkv, D]
    v: jax.Array,
    mask: jax.Array,  # [B, 1, Lq, Lkv] additive
    softcap: Optional[float],
    interpret: bool,
) -> jax.Array:
    b, lq, hq, d = q.shape
    _, lkv, hkv, _ = k.shape
    g = hq // hkv
    sub = _sublane(q.dtype)
    lq_p = _round_up(lq, sub)
    lkv_p = _round_up(lkv, _LANE)

    # head-major query rows: [B, Hkv, G, Lq, D] -> [B, Hkv, G*Lq_p, D]
    qh = q.reshape(b, lq, hkv, g, d).transpose(0, 2, 3, 1, 4)
    qh = jnp.pad(qh, ((0, 0), (0, 0), (0, 0), (0, lq_p - lq), (0, 0)))
    qh = qh.reshape(b, hkv, g * lq_p, d)
    kh = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, lkv_p - lkv), (0, 0)))
    vh = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, 0), (0, lkv_p - lkv), (0, 0)))
    m = jnp.pad(
        mask[:, 0].astype(jnp.float32),
        ((0, 0), (0, lq_p - lq), (0, lkv_p - lkv)),
        constant_values=MASK_NEG,
    )

    r = g * lq_p
    kernel = functools.partial(
        _kernel, scale=1.0 / (d**0.5), softcap=softcap, g=g, lq=lq_p
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hkv, r, d), q.dtype),
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, r, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lkv_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lkv_p, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq_p, lkv_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, r, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hkv * r * lkv_p * d * 2,
            bytes_accessed=(qh.size + kh.size + vh.size) * qh.dtype.itemsize
            + m.size * 4
            + b * hkv * r * d * qh.dtype.itemsize,
            transcendentals=b * hkv * r * lkv_p * 2,  # tanh + exp
        ),
        interpret=interpret,
    )(qh, kh, vh, m)

    out = out.reshape(b, hkv, g, lq_p, d)[:, :, :, :lq]  # drop row padding
    return out.transpose(0, 3, 1, 2, 4).reshape(b, lq, hq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def mot_attention_fused(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    softcap: Optional[float] = 50.0,
    interpret: bool = False,
) -> jax.Array:
    """Fused softcapped masked GQA attention. Same contract as
    ops.attention.mot_attention_xla: q [B,Lq,Hq,D], k/v [B,Lkv,Hkv,D],
    additive mask [B,1,Lq,Lkv] -> [B,Lq,Hq,D]."""
    return _fused_fwd(q, k, v, mask, softcap, interpret)


def _vjp_fwd(q, k, v, mask, softcap, interpret):
    return _fused_fwd(q, k, v, mask, softcap, interpret), (q, k, v, mask)


def _vjp_bwd(softcap, interpret, res, grad):
    from open_pi_zero_tpu.ops.attention import mot_attention_xla

    q, k, v, mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: mot_attention_xla(q_, k_, v_, mask, softcap), q, k, v)
    dq, dk, dv = vjp(grad)
    return dq, dk, dv, None


mot_attention_fused.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------- #
# Multi-device: shard_map wrapper
# --------------------------------------------------------------------------- #

_ATTENTION_MESH: Optional[jax.sharding.Mesh] = None


def set_attention_mesh(mesh) -> None:
    """Register the mesh multi-device programs run under so the fused
    kernel can be shard_map-wrapped (pallas_call is opaque to the GSPMD
    partitioner, so without this multi-device pjit falls back to the XLA
    einsum path). Called by the agents / dryrun when they build a mesh;
    pass None to clear."""
    global _ATTENTION_MESH
    _ATTENTION_MESH = mesh


def get_attention_mesh():
    return _ATTENTION_MESH


def shardable_attention(q, k) -> bool:
    """True if (B, Hq, Hkv) divide cleanly over the registered mesh:
    batch over `data`, query heads over `model`, K/V either sharded with
    the same head split (Hkv % tp == 0) or replicated (MQA, Hkv == 1 —
    the MoT trunk) so local GQA grouping stays consistent."""
    mesh = _ATTENTION_MESH
    if mesh is None:
        return False
    from open_pi_zero_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    dp = mesh.shape.get(DATA_AXIS, 1)
    tp = mesh.shape.get(MODEL_AXIS, 1)
    b, _, hq, _ = q.shape
    hkv = k.shape[2]
    if b % dp:
        return False
    return hq % tp == 0 and (hkv % tp == 0 or hkv == 1)


def mot_attention_fused_sharded(q, k, v, mask, softcap=50.0, interpret=False):
    """Fused attention under a multi-device mesh: one pallas_call per
    shard via shard_map — batch split over `data`, query heads over
    `model`, mask replicated on `model`. Attention is embarrassingly
    parallel over (batch, head), so no collectives are needed; jit
    reshards the inputs to these specs and the custom VJP inside each
    shard still recomputes through the XLA path for gradients."""
    from jax.sharding import PartitionSpec as P

    from open_pi_zero_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = _ATTENTION_MESH
    tp = mesh.shape.get(MODEL_AXIS, 1)
    hkv = k.shape[2]
    qs = P(DATA_AXIS, None, MODEL_AXIS, None)
    kvs = qs if (tp > 1 and hkv % tp == 0) else P(DATA_AXIS, None, None, None)
    ms = P(DATA_AXIS, None, None, None)
    f = jax.shard_map(
        functools.partial(
            mot_attention_fused, softcap=softcap, interpret=interpret
        ),
        mesh=mesh,
        in_specs=(qs, kvs, kvs, ms),
        out_specs=qs,
        check_vma=False,
    )
    return f(q, k, v, mask)


# --------------------------------------------------------------------------- #
# Dispatch policy
# --------------------------------------------------------------------------- #

_FORCE = os.environ.get("OPZ_FUSED_ATTENTION", "auto")  # auto|1|0|interpret


def fused_attention_enabled() -> bool:
    if _FORCE == "1" or _FORCE == "interpret":
        return True
    if _FORCE == "0":
        return False
    # auto: TPU; single-chip always, multi-device only with a registered
    # mesh (the shard_map wrapper above — ops/attention.py also checks
    # shardable_attention() per call site)
    if jax.default_backend() != "tpu":
        return False
    return jax.device_count() == 1 or _ATTENTION_MESH is not None


def fused_interpret_mode() -> bool:
    return _FORCE == "interpret" or jax.default_backend() != "tpu"
