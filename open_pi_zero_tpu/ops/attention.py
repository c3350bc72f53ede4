"""Attention ops (XLA einsum path).

``mot_attention`` is the hot op of the whole framework: the joint
mixture-of-transformers attention with Gemma tanh soft-capping at 50 and an
additive block mask (reference: src/model/vla/joint_model.py:259-282). The
Pallas-fused version lives in ops/pallas_attention.py; this XLA path is the
always-correct fallback and the golden oracle the kernel is tested against.

Precision contract (matching the reference):
  - QK^T accumulated in fp32 (preferred_element_type)
  - softcap + mask + softmax in fp32
  - probs cast back to value dtype before PV matmul

Layout: q [B, Lq, Hq, D]; k, v [B, Lkv, Hkv, D]; GQA via reshape —
no materialized repeat_kv (the reference repeats K/V across query heads,
src/model/utils.py:19-31; on TPU we fold the group axis into the einsum).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mot_attention(
    q: jax.Array,  # [B, Lq, Hq, D]
    k: jax.Array,  # [B, Lkv, Hkv, D]
    v: jax.Array,  # [B, Lkv, Hkv, D]
    mask: jax.Array,  # [B, 1, Lq, Lkv] additive (0 / MASK_NEG)
    softcap: Optional[float] = 50.0,
) -> jax.Array:
    """Dispatching entry point: Pallas-fused kernel on TPU (or when forced
    via OPZ_FUSED_ATTENTION=1/interpret) — shard_map-wrapped per device
    when a mesh is registered (parallel.mesh / set_attention_mesh) — and
    the XLA einsum path otherwise."""
    from open_pi_zero_tpu.ops import pallas_attention as pa

    if pa.fused_attention_enabled():
        interpret = pa.fused_interpret_mode()
        if pa.get_attention_mesh() is not None and jax.device_count() > 1:
            if pa.shardable_attention(q, k):
                return pa.mot_attention_fused_sharded(
                    q, k, v, mask, softcap, interpret=interpret
                )
            return mot_attention_xla(q, k, v, mask, softcap)
        return pa.mot_attention_fused(q, k, v, mask, softcap, interpret=interpret)
    return mot_attention_xla(q, k, v, mask, softcap)


def mot_attention_xla(
    q: jax.Array,  # [B, Lq, Hq, D]
    k: jax.Array,  # [B, Lkv, Hkv, D]
    v: jax.Array,  # [B, Lkv, Hkv, D]
    mask: jax.Array,  # [B, 1, Lq, Lkv] additive (0 / MASK_NEG)
    softcap: Optional[float] = 50.0,
) -> jax.Array:
    """Softcapped masked attention with grouped queries. Returns [B, Lq, Hq, D]."""
    b, lq, hq, d = q.shape
    _, lkv, hkv, _ = k.shape
    group = hq // hkv
    qg = q.reshape(b, lq, hkv, group, d)

    # fp32 inputs: HIGHEST stops XLA:TPU from decomposing the fp32 einsum
    # into bf16 multiplies (needed for golden tests). bf16 inputs: DEFAULT —
    # HIGHEST would force a 3-pass multiply, ~3x slower on the MXU for no
    # extra accuracy (accumulation is already fp32 via preferred_element_type).
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    scores = jnp.einsum(
        "bqhgd,bkhd->bhgqk",
        qg,
        k,
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [B, Hkv, G, Lq, Lkv] fp32
    scores = scores * (1.0 / (d**0.5))
    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap
    scores = scores + mask[:, :, None, :, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)

    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd",
        probs,
        v,
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(q.dtype)
    return out.reshape(b, lq, hq, d)


def mha_attention(
    q: jax.Array,  # [B, L, H, D]
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """Plain softmax MHA for the SigLIP tower (no mask, no softcap;
    reference src/model/paligemma/siglip.py:108-166). fp32 softmax."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d**0.5)
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk",
        q,
        k,
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    scores = scores * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        probs,
        v,
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    return out.astype(q.dtype)
