"""Joint mixture-of-transformers trunk, TPU-native.

Functional re-design of the reference JointModel
(src/model/vla/joint_model.py): each expert ("mixture") has its own
weights; experts interact ONLY through one global softcapped attention per
layer over the concatenated sequence, under a block-causal mask.

Instead of the reference's per-layer Python loop + stateful KVCache lists,
this module exposes four pure forward modes, each a single `lax.scan` over
stacked layer params (static shapes; one compile each):

  joint_forward       training / naive inference: any set of active experts,
                      full-sequence attention, no cache
                      (reference cache_mode="no_append" + empty caches)
  joint_prefill       run vlm+proprio once, emit K/V for all layers as a
                      stacked [L, B, S, Hkv, Dh] HBM buffer
                      (reference: infer_action's first joint_model call)
  joint_action_step   action expert only; K/V = cached prefix + fresh action
                      K/V (reference cache_mode="append_non_active")
  joint_text_*        PaliGemma text generation with a preallocated
                      static-size cache (reference cache_mode="append")

The proprio expert shares the action expert's weights when
`JointConfig.tie_proprio` (reference pizero.py:262-264 replaces the module;
here the sharing is structural: params hold one subtree, `param_key`
routes "proprio" to it).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from open_pi_zero_tpu.config import JointConfig
from open_pi_zero_tpu.models import mixture as mx
from open_pi_zero_tpu.ops.attention import mot_attention
from open_pi_zero_tpu.ops.rope import rope_cos_sin

Array = jax.Array


def param_key(cfg: JointConfig, name: str) -> str:
    return "action" if (name == "proprio" and cfg.tie_proprio) else name


def init_joint_params(key: Array, cfg: JointConfig, dtype=jnp.float32) -> dict:
    names = [n for n in cfg.mixture_names if param_key(cfg, n) == n]
    keys = jax.random.split(key, len(names))
    return {
        "mixtures": {
            n: mx.init_mixture_params(k, cfg, cfg.mixture(n), dtype)
            for n, k in zip(names, keys)
        }
    }


def _mixture_params(params: dict, cfg: JointConfig, name: str) -> dict:
    return params["mixtures"][param_key(cfg, name)]


def _scale_embeds(x: Array, hidden_size: int) -> Array:
    # reference joint_model.py:347-355: embeds *= sqrt(hidden)
    return x * jnp.asarray(hidden_size**0.5, dtype=x.dtype)


def _rope_tables(
    cfg: JointConfig, names, position_ids: Dict[str, Array]
) -> Dict[str, Tuple[Array, Array]]:
    """cos/sin per mixture (positions are layer-invariant, so compute once,
    not per layer like the reference's per-layer GemmaRotaryEmbedding)."""
    return {
        n: rope_cos_sin(position_ids[n], cfg.head_dim, cfg.mixture(n).rope_theta)
        for n in names
    }


def _as_time_conds(time_cond, names) -> Dict[str, Array]:
    """Normalize the time-conditioning argument: None -> {}, a single array
    -> same cond for every mixture (reference training semantics), a dict ->
    per-mixture conds (used by inference: the cached prefix is conditioned
    at t=0 while the action expert sees the live t; the reference's adaptive
    cached path is unexercised/undefined — see pizero.infer_action)."""
    if time_cond is None:
        return {}
    if isinstance(time_cond, dict):
        return time_cond
    return {n: time_cond for n in names}


def _split_lq(x: Array, names, lens) -> Dict[str, Array]:
    out, off = {}, 0
    for n, ln in zip(names, lens):
        out[n] = x[:, off : off + ln]
        off += ln
    return out


def _layer(
    cfg: JointConfig,
    names: Tuple[str, ...],
    lps: Dict[str, dict],  # per-layer param slices per mixture
    hiddens: Dict[str, Array],
    ropes: Dict[str, Tuple[Array, Array]],
    mask: Array,  # [B, 1, sum(Lq), Lkv_total]
    time_conds: Dict[str, Optional[Array]],  # per-mixture adaLN cond
    cached_kv: Optional[Tuple[Array, Array]] = None,  # prefix K/V [B, S, Hkv, Dh]
    collect_kv: bool = False,
):
    """One trunk layer over the active mixtures. Returns (new_hiddens,
    (k_cat, v_cat) of the *active* mixtures if collect_kv)."""
    eps = cfg.rms_norm_eps
    normed, qs, ks, vs = {}, {}, {}, {}
    for n in names:
        mcfg = cfg.mixture(n)
        lp = lps[n]
        h = mx.norm(lp["input_norm"], mcfg, eps, hiddens[n], time_conds.get(n))
        normed[n] = h
        q, k, v = mx.qkv_proj(lp["attn"], cfg, h, mcfg.lora_scaling)
        cos, sin = ropes[n]
        qs[n], ks[n] = mx.rope_qk(q, k, cos, sin)
        vs[n] = v

    k_new = jnp.concatenate([ks[n] for n in names], axis=1)
    v_new = jnp.concatenate([vs[n] for n in names], axis=1)
    if cached_kv is not None:
        k_all = jnp.concatenate([cached_kv[0], k_new], axis=1)
        v_all = jnp.concatenate([cached_kv[1], v_new], axis=1)
    else:
        k_all, v_all = k_new, v_new

    q_all = jnp.concatenate([qs[n] for n in names], axis=1)
    attn = mot_attention(q_all, k_all, v_all, mask, cfg.attn_softclamp)
    b, lq = attn.shape[:2]
    attn = attn.reshape(b, lq, cfg.num_attention_heads * cfg.head_dim)
    attn_per = _split_lq(attn, names, [hiddens[n].shape[1] for n in names])

    out = {}
    for n in names:
        mcfg = cfg.mixture(n)
        lp = lps[n]
        tc = time_conds.get(n)
        o = mx.o_proj(lp["attn"], attn_per[n], mcfg.lora_scaling)
        o = mx.adaptive_scale(lp, mcfg, "post_scale", o, tc)
        x = hiddens[n] + o
        h = mx.norm(lp["post_norm"], mcfg, eps, x, tc)
        h = mx.mlp(lp["mlp"], h, mcfg.lora_scaling)
        h = mx.adaptive_scale(lp, mcfg, "final_scale", h, tc)
        out[n] = x + h
    return out, ((k_new, v_new) if collect_kv else None)


def _layer_params(params: dict, cfg: JointConfig, names) -> Dict[str, dict]:
    """Stacked [L, ...] layer trees per active mixture (for scan xs)."""
    return {n: _mixture_params(params, cfg, n)["layers"] for n in names}


# NOTE: never split stacked layer params into [:-1] / [-1] trees to
# special-case the final layer — slicing a [L, ...] tree materializes a
# near-full copy of the parameters inside the jitted program (~4 GB at
# bridge scale, ~9 ms of HBM traffic per call, measured on v5e). Running
# the last layer uniformly in the scan costs 1/L of the pass (~0.5 ms);
# the reference's post_attn_skip_names "optimization" (joint_model.py:30)
# only ever skipped dead compute, so keeping it uniform is numerically
# identical for every output that is consumed.


def joint_forward(
    params: dict,
    cfg: JointConfig,
    embeds: Dict[str, Array],  # in canonical order, e.g. vlm, proprio, action
    position_ids: Dict[str, Array],
    mask: Array,  # [B, 1, T, T]
    time_cond: Optional[Array] = None,
    final_skip: Tuple[str, ...] = ("vlm", "proprio"),
) -> Dict[str, Array]:
    """Full-sequence forward, no cache (training & naive inference,
    reference joint_model.py:328-383). Returns final-normed hidden states
    for every active mixture not in `final_skip`."""
    names = tuple(embeds.keys())
    time_conds = _as_time_conds(time_cond, names)
    ropes = _rope_tables(cfg, names, position_ids)
    hiddens = {n: _scale_embeds(embeds[n], cfg.mixture(n).hidden_size) for n in names}

    stacked = _layer_params(params, cfg, names)

    def one_layer(carry, lps):
        return _layer(cfg, names, lps, carry, ropes, mask, time_conds)[0]

    if cfg.remat:
        # recompute each layer's activations in the backward pass: training
        # memory drops from O(L) to O(1) layers (jax.checkpoint)
        one_layer = jax.checkpoint(one_layer)

    def body(carry, lps):
        return one_layer(carry, lps), None

    # uniform scan over all L layers: the final layer's o_proj/MLP of the
    # `final_skip` mixtures is dead compute the reference skips
    # (post_attn_skip_names) — cheaper to run than to split the param stack
    hiddens, _ = jax.lax.scan(body, hiddens, stacked)

    out = {}
    for n in names:
        if n in final_skip:
            continue
        mcfg = cfg.mixture(n)
        mp = _mixture_params(params, cfg, n)
        if mcfg.use_final_norm:
            out[n] = mx.final_norm(
                mp, mcfg, cfg.rms_norm_eps, hiddens[n], time_conds.get(n)
            )
        else:
            out[n] = hiddens[n]
    return out


def joint_prefill(
    params: dict,
    cfg: JointConfig,
    embeds: Dict[str, Array],  # {"vlm": [B,I,Dv], "proprio": [B,P,Dp]}
    position_ids: Dict[str, Array],
    mask: Array,  # [B, 1, I+P, I+P]
    time_cond: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Run the prefix mixtures once and return stacked K/V caches
    [L, B, I+P, Hkv, Dh] (reference: infer_action's return_caches=True call,
    pizero.py:439-451).

    Uniform scan over all L layers with collect_kv: the final layer's
    attention/o_proj/MLP outputs are dead (the reference discards them via
    post_attn_skip_names) but running them costs 1/L of the pass — far
    cheaper than splitting the stacked params (see note above)."""
    names = tuple(embeds.keys())
    time_conds = _as_time_conds(time_cond, names)
    ropes = _rope_tables(cfg, names, position_ids)
    hiddens = {n: _scale_embeds(embeds[n], cfg.mixture(n).hidden_size) for n in names}

    stacked = _layer_params(params, cfg, names)

    def body(carry, lps):
        new, kv = _layer(
            cfg, names, lps, carry, ropes, mask, time_conds, collect_kv=True
        )
        return new, kv

    _, (k_all, v_all) = jax.lax.scan(body, hiddens, stacked)
    return k_all, v_all


def joint_action_step(
    params: dict,
    cfg: JointConfig,
    action_embeds: Array,  # [B, A, Da]
    kv_cache: Tuple[Array, Array],  # [L, B, I+P, Hkv, Dh] each
    action_position_ids: Array,
    mask: Array,  # [B, 1, A, T]
    time_cond: Optional[Array] = None,
) -> Array:
    """One denoising step of the action expert against the cached prefix
    (reference cache_mode="append_non_active", joint_model.py:161-240).
    Returns final-normed action hiddens [B, A, Da]."""
    name = "action"
    mcfg = cfg.mixture(name)
    time_conds = _as_time_conds(time_cond, (name,))
    ropes = _rope_tables(cfg, (name,), {name: action_position_ids})
    hidden = _scale_embeds(action_embeds, mcfg.hidden_size)

    stacked = _layer_params(params, cfg, (name,))[name]
    k_cache, v_cache = kv_cache

    def body(carry, xs):
        lp, k_pre, v_pre = xs
        new, _ = _layer(
            cfg, (name,), {name: lp}, {name: carry}, ropes, mask, time_conds,
            cached_kv=(k_pre, v_pre),
        )
        return new[name], None

    hidden, _ = jax.lax.scan(body, hidden, (stacked, k_cache, v_cache))
    mp = _mixture_params(params, cfg, name)
    return mx.final_norm(mp, mcfg, cfg.rms_norm_eps, hidden, time_conds.get(name))


# --------------------------------------------------------------------------- #
# Text generation ("append" cache mode) — vlm mixture only
# --------------------------------------------------------------------------- #


def init_text_cache(
    cfg: JointConfig, batch: int, max_len: int, dtype=jnp.float32
) -> Tuple[Array, Array]:
    shape = (
        cfg.num_hidden_layers,
        batch,
        max_len,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def joint_text_forward(
    params: dict,
    cfg: JointConfig,
    embeds: Array,  # [B, Q, Dv]
    position_ids: Array,  # [B, Q]
    mask: Array,  # [B, 1, Q, T_max] additive
    cache: Tuple[Array, Array],  # static [L, B, T_max, Hkv, Dh]
    offset,  # int or traced scalar: write index into the cache
) -> Tuple[Array, Tuple[Array, Array]]:
    """PaliGemma text path: vlm mixture, full last layer, K/V appended into a
    preallocated static cache at `offset` (reference cache_mode="append";
    the dynamic torch.cat becomes dynamic_update_slice)."""
    name = "vlm"
    mcfg = cfg.mixture(name)
    ropes = _rope_tables(cfg, (name,), {name: position_ids})
    hidden = _scale_embeds(embeds, mcfg.hidden_size)
    eps = cfg.rms_norm_eps

    stacked = _layer_params(params, cfg, (name,))[name]
    k_cache, v_cache = cache
    cos, sin = ropes[name]

    def body(carry, xs):
        hidden = carry
        lp, k_c, v_c = xs
        h = mx.norm(lp["input_norm"], mcfg, eps, hidden, None)
        q, k, v = mx.qkv_proj(lp["attn"], cfg, h, mcfg.lora_scaling)
        q, k = mx.rope_qk(q, k, cos, sin)
        k_c = jax.lax.dynamic_update_slice(k_c, k, (0, offset, 0, 0))
        v_c = jax.lax.dynamic_update_slice(v_c, v, (0, offset, 0, 0))
        attn = mot_attention(q, k_c, v_c, mask, cfg.attn_softclamp)
        b, lq = attn.shape[:2]
        attn = attn.reshape(b, lq, cfg.num_attention_heads * cfg.head_dim)
        x = hidden + mx.o_proj(lp["attn"], attn, mcfg.lora_scaling)
        h = mx.norm(lp["post_norm"], mcfg, eps, x, None)
        hidden = x + mx.mlp(lp["mlp"], h, mcfg.lora_scaling)
        return hidden, (k_c, v_c)

    hidden, (k_cache, v_cache) = jax.lax.scan(body, hidden, (stacked, k_cache, v_cache))
    mp = _mixture_params(params, cfg, name)
    if mcfg.use_final_norm:
        hidden = mx.final_norm(mp, mcfg, eps, hidden, None)
    return hidden, (k_cache, v_cache)
