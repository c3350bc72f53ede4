"""Per-expert (mixture) parameters and layer ops.

One "mixture" is a PaliGemma-layout transformer expert: RMSNorm → GQA
attention → RMSNorm → geglu MLP, with optional adaLN(-Zero) time
conditioning and a final RMSNorm (reference: src/model/vla/mixture.py).

TPU-native re-design decisions (vs the reference's nn.ModuleList +
string-dispatched layer_func):
  - all layers of one mixture are stacked on a leading [L] axis so the
    joint trunk can drive them with a single `lax.scan` (one trace, one
    compile, no Python-level layer loop),
  - projections carry no bias (reference `attention_bias=False`) and are
    stored [in, out],
  - activations keep the TPU layout [B, S, H, D] (heads after sequence;
    trailing head_dim 256 = 2×128 lanes).

Param tree for one mixture (L = num layers, D = hidden, I = intermediate,
Hq/Hkv = query/kv heads, Dh = head_dim):
  layers:
    input_norm:  {weight [L, D]}                      (or adaLN: gamma/beta)
    attn: {q [L, D, Hq*Dh], k [L, D, Hkv*Dh], v [L, D, Hkv*Dh], o [L, Hq*Dh, D]}
    post_norm:   {weight [L, D]}                      (or adaLN)
    mlp: {gate [L, D, I], up [L, D, I], down [L, I, D]}
    post_scale / final_scale: {kernel [L, Dc, D], bias [L, D]}  (adaLN-Zero only)
  final_norm: {weight [D]} | adaLN variant | absent (vlm w/o lm head)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from open_pi_zero_tpu.config import JointConfig, MixtureConfig
from open_pi_zero_tpu.ops import lora as lora_lib
from open_pi_zero_tpu.ops.norms import (
    adaptive_layerscale,
    adaptive_rms_norm,
    rms_norm,
)
from open_pi_zero_tpu.ops.rope import apply_rope


def _uniform(key, shape, dtype, fan_in):
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _stacked_kernel(key, L, din, dout, dtype):
    return _uniform(key, (L, din, dout), dtype, din)


def _norm_params(L, D, Dc, adaptive: bool, dtype, key=None):
    """Norm params. Gemma RMSNorm weight zero-init (norm starts as scale 1);
    adaLN norms project the time-cond vector (reference modules.py:78-99)."""
    if not adaptive:
        return {"weight": jnp.zeros((L, D) if L else (D,), dtype)}
    keys = jax.random.split(key, 3)
    shape_k = (L, Dc, D) if L else (Dc, D)
    shape_b = (L, D) if L else (D,)
    return {
        "gamma_kernel": _uniform(keys[0], shape_k, dtype, Dc),
        "gamma_bias": _uniform(keys[1], shape_b, dtype, Dc),
        "beta_kernel": _uniform(keys[2], shape_k, dtype, Dc),
    }


def init_mixture_params(
    key: jax.Array, joint: JointConfig, mix: MixtureConfig, dtype=jnp.float32
) -> dict:
    L = joint.num_hidden_layers
    D, I = mix.hidden_size, mix.intermediate_size
    Dh, Hq, Hkv = joint.head_dim, joint.num_attention_heads, joint.num_key_value_heads
    Dc = joint.time_hidden_size
    adaptive = mix.adaptive_mode is not None
    keys = iter(jax.random.split(key, 24))  # base 9 + lora 7 + final_norm 1, headroom

    layers = {
        "input_norm": _norm_params(L, D, Dc, adaptive, dtype, next(keys)),
        "attn": {
            "q": _stacked_kernel(next(keys), L, D, Hq * Dh, dtype),
            "k": _stacked_kernel(next(keys), L, D, Hkv * Dh, dtype),
            "v": _stacked_kernel(next(keys), L, D, Hkv * Dh, dtype),
            "o": _stacked_kernel(next(keys), L, Hq * Dh, D, dtype),
        },
        "post_norm": _norm_params(L, D, Dc, adaptive, dtype, next(keys)),
        "mlp": {
            "gate": _stacked_kernel(next(keys), L, D, I, dtype),
            "up": _stacked_kernel(next(keys), L, D, I, dtype),
            "down": _stacked_kernel(next(keys), L, I, D, dtype),
        },
    }
    if mix.use_lora:
        # adapters next to every projection kernel (reference applies the
        # LoRA-aware get_layer factory to q/k/v/o and the MLP, lora.py:83-100)
        r = mix.lora.r
        dims = {
            "attn": {"q": (D, Hq * Dh), "k": (D, Hkv * Dh), "v": (D, Hkv * Dh),
                     "o": (Hq * Dh, D)},
            "mlp": {"gate": (D, I), "up": (D, I), "down": (I, D)},
        }
        for group, named in dims.items():
            for n, (din, dout) in named.items():
                layers[group][f"{n}_lora"] = lora_lib.lora_init(
                    next(keys), din, dout, r, dtype, stack=L
                )
    if mix.adaptive_mode == "adaLN-Zero":
        # zero-init kernel, bias -2 (reference modules.py:102-113)
        for name in ("post_scale", "final_scale"):
            layers[name] = {
                "kernel": jnp.zeros((L, Dc, D), dtype),
                "bias": jnp.full((L, D), -2.0, dtype),
            }
    params = {"layers": layers}
    if mix.use_final_norm:
        params["final_norm"] = _norm_params(0, D, Dc, adaptive, dtype, next(keys))
    return params


# --------------------------------------------------------------------------- #
# per-layer ops; `lp` = one layer's param slice (leading L axis indexed away)
# --------------------------------------------------------------------------- #


def norm(
    lp_norm: dict,
    mix: MixtureConfig,
    eps: float,
    x: jax.Array,
    time_cond: Optional[jax.Array],
) -> jax.Array:
    if mix.adaptive_mode is not None:
        return adaptive_rms_norm(
            x, time_cond, lp_norm["gamma_kernel"], lp_norm["gamma_bias"],
            lp_norm["beta_kernel"], eps,
        )
    return rms_norm(x, lp_norm["weight"], eps)


def adaptive_scale(
    lp: dict,
    mix: MixtureConfig,
    stage: str,  # "post_scale" | "final_scale"
    x: jax.Array,
    time_cond: Optional[jax.Array],
) -> jax.Array:
    """adaLN-Zero residual gate; identity otherwise (reference mixture.py:129-142)."""
    if mix.adaptive_mode != "adaLN-Zero":
        return x
    p = lp[stage]
    return adaptive_layerscale(x, time_cond, p["kernel"], p["bias"])


def q_proj(
    lp_attn: dict, joint: JointConfig, x: jax.Array, scaling: float = 1.0
) -> jax.Array:
    b, s, _ = x.shape
    q = lora_lib.proj(lp_attn, "q", x, scaling)
    return q.reshape(b, s, joint.num_attention_heads, joint.head_dim)


def kv_proj(
    lp_attn: dict, joint: JointConfig, x: jax.Array, scaling: float = 1.0
) -> Tuple[jax.Array, jax.Array]:
    b, s, _ = x.shape
    k = lora_lib.proj(lp_attn, "k", x, scaling)
    v = lora_lib.proj(lp_attn, "v", x, scaling)
    shape = (b, s, joint.num_key_value_heads, joint.head_dim)
    return k.reshape(shape), v.reshape(shape)


def qkv_proj(
    lp_attn: dict, joint: JointConfig, x: jax.Array, scaling: float = 1.0
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(q, k, v) — one fused matmul when the serving layout is present
    (models/fuse.py), separate LoRA-aware projections otherwise."""
    if "qkv" in lp_attn:
        b, s, _ = x.shape
        nq = joint.num_attention_heads * joint.head_dim
        nkv = joint.num_key_value_heads * joint.head_dim
        qkv = lora_lib.proj(lp_attn, "qkv", x)
        q = qkv[..., :nq].reshape(b, s, joint.num_attention_heads, joint.head_dim)
        k = qkv[..., nq : nq + nkv].reshape(b, s, joint.num_key_value_heads, joint.head_dim)
        v = qkv[..., nq + nkv :].reshape(b, s, joint.num_key_value_heads, joint.head_dim)
        return q, k, v
    return (q_proj(lp_attn, joint, x, scaling), *kv_proj(lp_attn, joint, x, scaling))


def o_proj(lp_attn: dict, x: jax.Array, scaling: float = 1.0) -> jax.Array:
    """x: [B, S, Hq*Dh] -> [B, S, D]."""
    return lora_lib.proj(lp_attn, "o", x, scaling)


def mlp(lp_mlp: dict, x: jax.Array, scaling: float = 1.0) -> jax.Array:
    """geglu: down(gelu_tanh(gate(x)) * up(x)) — reference paligemma/modules.py:70-95.
    One fused gate+up matmul when the serving layout is present."""
    if "gateup" in lp_mlp:
        gu = lora_lib.proj(lp_mlp, "gateup", x)
        i = gu.shape[-1] // 2
        gate, up = gu[..., :i], gu[..., i:]
    else:
        gate = lora_lib.proj(lp_mlp, "gate", x, scaling)
        up = lora_lib.proj(lp_mlp, "up", x, scaling)
    h = (jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(x.dtype) * up)
    return lora_lib.proj(lp_mlp, "down", h, scaling)


def rope_qk(
    q: jax.Array, k: Optional[jax.Array], cos: jax.Array, sin: jax.Array
) -> Tuple[jax.Array, Optional[jax.Array]]:
    q = apply_rope(q, cos, sin)
    if k is not None:
        k = apply_rope(k, cos, sin)
    return q, k


def final_norm(
    params: dict,
    mix: MixtureConfig,
    eps: float,
    x: jax.Array,
    time_cond: Optional[jax.Array],
) -> jax.Array:
    """Mixture-level final norm (reference mixture.py:68-77). Only present
    when use_final_norm."""
    return norm(params["final_norm"], mix, eps, x, time_cond)
