"""PiZero: the full π0 VLA model, TPU-native.

Re-design of reference src/model/vla/pizero.py. Everything is a pure
function over a params pytree + a static `PiZeroConfig`; the 10-step Euler
integration is a `lax.scan` (compiled once, no Python loop), the VLM/proprio
prefix is prefilled once into a static [L, B, I+P, Hkv, Dh] K/V buffer.

Param tree:
  embed_tokens: [V, Dv]                     (reference pizero.py:61-65; also
                                             the tied lm_head, :106-112)
  siglip: {...}         (models/siglip.py)
  projector: {kernel, bias}
  joint: {mixtures: {vlm, action[, proprio]}}  (models/joint.py)
  action_encoder: {linear_1, linear_2, linear_3}  (3-layer MLP matching the
                                             π0 appendix; modules.py:25-53)
  proprio_encoder: {kernel, bias}
  action_decoder: {kernel, bias}
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from open_pi_zero_tpu.config import PiZeroConfig
from open_pi_zero_tpu.models import joint as joint_lib
from open_pi_zero_tpu.models import siglip as siglip_lib
from open_pi_zero_tpu.ops.embeddings import sinusoidal_time_embedding
from open_pi_zero_tpu.ops.linear import linear, linear_init
from open_pi_zero_tpu.ops.masks import (
    MASK_NEG,
    action_position_ids,
    build_block_causal_mask,
    proprio_position_ids,
    split_prefix_and_action_masks,
    vlm_position_ids,
)

Array = jax.Array


# --------------------------------------------------------------------------- #
# init
# --------------------------------------------------------------------------- #


def init_params(key: Array, cfg: PiZeroConfig, dtype=jnp.float32) -> dict:
    vlm_hidden = cfg.mixture("vlm").hidden_size
    action_hidden = cfg.mixture("action").hidden_size
    proprio_hidden = cfg.mixture("proprio").hidden_size
    keys = iter(jax.random.split(key, 10))

    # torch nn.Embedding default: N(0, 1), padding_idx row zeroed
    embed = jax.random.normal(next(keys), (cfg.vocab_size, vlm_hidden), dtype)
    embed = embed.at[cfg.pad_token_id].set(0.0)

    # pi0 appendix action encoder: time embedding concatenated per token
    # unless adaptive conditioning handles time (reference pizero.py:75-97)
    time_cond = cfg.action_expert_adaptive_mode is None
    enc_in2 = 2 * action_hidden if time_cond else action_hidden
    action_encoder = {
        "linear_1": linear_init(next(keys), cfg.action_dim, action_hidden, dtype),
        "linear_2": linear_init(next(keys), enc_in2, action_hidden, dtype),
        "linear_3": linear_init(next(keys), action_hidden, action_hidden, dtype),
    }
    return {
        "embed_tokens": embed,
        "siglip": siglip_lib.init_params(next(keys), cfg.siglip, dtype),
        "projector": siglip_lib.init_projector_params(next(keys), cfg.siglip, dtype),
        "joint": joint_lib.init_joint_params(next(keys), cfg.joint, dtype),
        "action_encoder": action_encoder,
        "proprio_encoder": linear_init(next(keys), cfg.proprio_dim, proprio_hidden, dtype),
        "action_decoder": linear_init(next(keys), action_hidden, cfg.action_dim, dtype),
    }


# --------------------------------------------------------------------------- #
# encoders
# --------------------------------------------------------------------------- #


def time_embedding(cfg: PiZeroConfig, t: Array, dtype) -> Array:
    """[B] -> [B, W]: sinusoidal flow-time embedding (reference pizero.py:81-97:
    width = action hidden unless adaptive mode uses time_hidden_size)."""
    dim = (
        cfg.time_hidden_size
        if cfg.action_expert_adaptive_mode
        else cfg.mixture("action").hidden_size
    )
    return sinusoidal_time_embedding(t, dim, cfg.time_max_period, dtype)


def encode_action(
    params: dict, cfg: PiZeroConfig, action: Array, time_emb: Optional[Array]
) -> Array:
    """[B, A, act_dim] (+ [B, W] time) -> [B, A, W] (reference modules.py:25-53)."""
    p = params["action_encoder"]
    emb = linear(action, p["linear_1"]["kernel"], p["linear_1"]["bias"])
    if cfg.action_expert_adaptive_mode is None:
        tfull = jnp.broadcast_to(
            time_emb[:, None, :].astype(emb.dtype),
            (emb.shape[0], emb.shape[1], time_emb.shape[-1]),
        )
        emb = jnp.concatenate([tfull, emb], axis=-1)  # time first (reference)
    emb = jax.nn.silu(linear(emb, p["linear_2"]["kernel"], p["linear_2"]["bias"]))
    return linear(emb, p["linear_3"]["kernel"], p["linear_3"]["bias"])


def encode_proprio(params: dict, proprios: Array) -> Array:
    p = params["proprio_encoder"]
    return linear(proprios, p["kernel"], p["bias"])


def decode_action(params: dict, hidden: Array) -> Array:
    p = params["action_decoder"]
    return linear(hidden, p["kernel"], p["bias"])


def embed_image_text(
    params: dict, cfg: PiZeroConfig, input_ids: Array, pixel_values: Array
) -> Array:
    """Merge text embeddings and projected SigLIP features into one
    [B, S, Dv] sequence (reference pizero.py:376-414), fully vectorized:
    the i-th image token slot receives the i-th image feature (gather by
    running count instead of the reference's per-sample index loop);
    padding slots are zero vectors (the reference fills with pad_token_id=0).
    """
    text_embeds = params["embed_tokens"][input_ids]  # [B, S, Dv]
    feats = siglip_lib.forward(params["siglip"], cfg.siglip, pixel_values)
    feats = siglip_lib.project(
        params["projector"], feats, cfg.siglip.lora_scaling
    )  # [B, N, Dv]
    vlm_hidden = cfg.mixture("vlm").hidden_size
    feats = feats / jnp.asarray(vlm_hidden**0.5, feats.dtype)

    image_mask = input_ids == cfg.image_token_index  # [B, S]
    text_mask = (input_ids != cfg.image_token_index) & (input_ids != cfg.pad_token_id)
    slot = jnp.clip(jnp.cumsum(image_mask, axis=1) - 1, 0, feats.shape[1] - 1)
    img_at_slot = jnp.take_along_axis(feats, slot[:, :, None], axis=1)  # [B, S, Dv]

    out = jnp.where(image_mask[:, :, None], img_at_slot, 0.0)
    out = jnp.where(text_mask[:, :, None], text_embeds, out)
    return out.astype(text_embeds.dtype)


# --------------------------------------------------------------------------- #
# masks & positions (jit-safe wrappers around ops/masks.py)
# --------------------------------------------------------------------------- #


def prepare_action_inputs(cfg: PiZeroConfig, attention_mask: Array):
    """attention_mask: [B, S] binary over image+text tokens -> (full_mask,
    prefix_mask, action_mask, pos_ids dict). Reference pizero.py:271-336."""
    cnt = jnp.sum(attention_mask, axis=1)
    full = build_block_causal_mask(
        cnt, cfg.max_image_text_tokens, cfg.num_proprio_tokens, cfg.num_action_tokens
    )
    prefix, action = split_prefix_and_action_masks(
        full, cfg.max_image_text_tokens, cfg.num_proprio_tokens, cfg.num_action_tokens
    )
    positions = {
        "vlm": vlm_position_ids(cfg.max_image_text_tokens),
        "proprio": proprio_position_ids(cfg.num_proprio_tokens),
        "action": action_position_ids(cfg.num_proprio_tokens, cfg.num_action_tokens),
    }
    return full, prefix, action, positions


# --------------------------------------------------------------------------- #
# inference
# --------------------------------------------------------------------------- #


def _requant_int8(w: Array) -> dict:
    """f32 [..., K, N] -> weight-only int8 {q, scale-per-column} (the
    serving format base_matmul streams; adds <0.5% error on top of the
    4-bit code)."""
    absmax = jnp.max(jnp.abs(w), axis=-2)
    scale = jnp.where(absmax == 0, 1.0, absmax) / 127.0
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    d = {"q": q, "scale": scale.astype(jnp.float32)}
    # the barrier forces XLA to MATERIALIZE the decoded copy: without it
    # the fusion/remat pass sinks the 4-bit decode back into every one of
    # the 10 unrolled Euler steps (measured: the "hoisted" NF4 path still
    # cost one full codebook decode per step)
    return dict(zip(d, jax.lax.optimization_barrier(tuple(d.values()))))


def _hoist_4bit(tree):
    """Replace every NF4 leaf-dict {q4, absmax} with a decode-once int8
    copy (no-op for float / int8 / W8A8 trees). The at-rest/checkpoint
    footprint stays 4-bit; inside the call the Euler steps stream int8
    (decoding inside the loop instead was measured at one full decode per
    step — see infer_action). This decode-once path is the only 4-bit
    serving tier: a fused Pallas int4 dequant-matmul was measured
    VPU/relayout-bound on v5e and removed."""
    if isinstance(tree, dict):
        if "q4" in tree and "absmax" in tree:
            from open_pi_zero_tpu.ops.quantization import dequantize_kernel_nf4

            return _requant_int8(dequantize_kernel_nf4(tree))
        return {k: _hoist_4bit(v) for k, v in tree.items()}
    return tree


def infer_action(
    params: dict,
    cfg: PiZeroConfig,
    rng: Array,
    input_ids: Array,  # [B, S] int
    pixel_values: Array,  # [B, H, W, C] normalized
    attention_mask: Array,  # [B, S] binary (image+text valid)
    proprios: Array,  # [B, P, proprio_dim]
    action0: Optional[Array] = None,  # inject initial noise (tests/parity)
    t_start: float = 0.0,  # static: resume the flow from this time
    t_end: float = 1.0,  # static: stop early (tests / chunk caching)
) -> Array:
    """KV-cached action inference: one prefix prefill, then `lax.scan` over
    the Euler steps (reference pizero.py:416-490). Returns [B, A, act_dim].

    `t_start`/`t_end` (static Python floats) integrate a SEGMENT of the
    flow with the same grid as the full run (step count = round(
    num_inference_steps * (t_end - t_start))): resuming from the exact
    mid-trajectory state reproduces the full result bit-for-bit (tested).
    With `action0 = renoise_chunk(prev_chunk, t_start)` this is the
    training-free action-caching/refinement speedup for steady-state
    control loops (fewer velocity evals per chunk); see
    infer_action_refined.
    """
    dtype = pixel_values.dtype
    b = input_ids.shape[0]
    # 4-bit tier (NF4): decode ONCE per call to a weight-only
    # int8 copy, outside the Euler loop. The at-rest/checkpoint footprint
    # stays 4-bit; the steps stream int8 (decoding inline re-ran the
    # codebook decode every Euler step — 88.7 ms; a bf16 hoist without an
    # optimization barrier was sunk back into the steps by XLA — 38 ms;
    # this path lands near the int8 tier's latency).
    params = {**params, "joint": _hoist_4bit(params["joint"])}
    _, prefix_mask, action_mask, pos = prepare_action_inputs(cfg, attention_mask)

    inputs_embeds = embed_image_text(params, cfg, input_ids, pixel_values)
    proprio_embeds = encode_proprio(params, proprios).astype(dtype)

    # adaptive mode: the cached prefix is conditioned at t=0 (the reference's
    # adaptive+cached combination is unexercised; its naive path fills the
    # proprio cache at the first Euler step, i.e. t=0 — we fix that as the
    # definition so cached == naive holds)
    prefix_cond = (
        {"proprio": time_embedding(cfg, jnp.zeros((b,), dtype), dtype)}
        if cfg.action_expert_adaptive_mode
        else None
    )
    kv_cache = joint_lib.joint_prefill(
        params["joint"],
        cfg.joint,
        {"vlm": inputs_embeds, "proprio": proprio_embeds},
        {"vlm": pos["vlm"], "proprio": pos["proprio"]},
        prefix_mask,
        time_cond=prefix_cond,
    )

    if action0 is None:
        action0 = jax.random.normal(
            rng, (b, cfg.horizon_steps, cfg.action_dim), dtype=dtype
        )
    action0 = action0.astype(dtype)
    # segment grid: same delta_t as the full run when (t_end - t_start) is
    # a multiple of 1/num_inference_steps, so resuming from an exact
    # mid-trajectory state is bit-identical to the full integration
    n_steps = max(1, round(cfg.num_inference_steps * (t_end - t_start)))
    delta_t = (t_end - t_start) / n_steps

    def vel_at(action, t):
        t_emb = time_embedding(cfg, t, dtype)
        t_cond = {"action": t_emb} if cfg.action_expert_adaptive_mode else None
        action_embeds = encode_action(
            params, cfg, action, None if cfg.action_expert_adaptive_mode else t_emb
        )
        hidden = joint_lib.joint_action_step(
            params["joint"], cfg.joint, action_embeds, kv_cache,
            pos["action"], action_mask, t_cond,
        )
        return decode_action(params, hidden)

    def euler_step(carry, _):
        action, t = carry
        if cfg.flow_integrator == "midpoint":
            # 2nd-order: evaluate the field at the half step. 2 expert
            # evals/step, O(h^2) integration error — the speed tier knob
            # (midpoint-K tracks the continuous flow like euler-~K^2;
            # measured tradeoff in BENCH_FLOW_STEPS.json).
            half = action + 0.5 * delta_t * vel_at(action, t)
            vel = vel_at(half, t + 0.5 * delta_t)
        else:
            vel = vel_at(action, t)
        return (action + delta_t * vel, t + delta_t), None

    t0 = jnp.full((b,), t_start, dtype)
    # full unroll: lets XLA software-pipeline the expert's weight streaming
    # across Euler steps (measured ~0.9 ms off the 10-step serving chunk on
    # v5e; a scanned loop reloads each layer's weights cold every step)
    (action, _), _ = jax.lax.scan(
        euler_step,
        (action0, t0),
        None,
        length=n_steps,
        unroll=cfg.euler_unroll or n_steps,
    )
    if t_end >= 1.0 and cfg.final_action_clip_value is not None:
        action = jnp.clip(
            action, -cfg.final_action_clip_value, cfg.final_action_clip_value
        )
    return action


def renoise_chunk(
    cfg: PiZeroConfig, rng: Array, prev_chunk: Array, t_start: float
) -> Array:
    """Re-noise a previous action chunk to flow time `t_start` with the
    TRAINING interpolation x_t = (1 - (1 - sig_min) t) x0 + t x1 (`psi_t`
    below / reference pizero.py:597-605): fresh noise x0, the
    cached chunk as x1. Integrating the learned field from (x_t, t_start)
    refines the cached chunk with only (1 - t_start) of the velocity
    evals — the training-free action-caching speedup for steady-state
    control loops (consecutive chunks at ~5 Hz are strongly correlated).
    Real-checkpoint validation (Simpler success at the refined tier) is
    part of the hour-one procedure in scripts/verify_checkpoint.py."""
    x0 = jax.random.normal(rng, prev_chunk.shape, prev_chunk.dtype)
    t = jnp.full((prev_chunk.shape[0],), t_start, prev_chunk.dtype)
    return psi_t(cfg, x0, prev_chunk, t)


def infer_action_refined(
    params: dict,
    cfg: PiZeroConfig,
    rng: Array,
    input_ids: Array,
    pixel_values: Array,
    attention_mask: Array,
    proprios: Array,
    prev_chunk: Array,  # [B, A, act_dim] — the previous control step's chunk
    t_start: float = 0.5,  # static: cache strength (higher = fewer evals)
) -> Array:
    """Training-free action caching + refinement: warm-start the flow from
    the re-noised previous chunk and integrate only [t_start, 1] —
    round(num_inference_steps * (1 - t_start)) velocity evals instead of
    num_inference_steps. Opt-in steady-state serving tier (EvalAgent
    `refine_from_prev`); the first chunk of an episode always runs the
    full flow."""
    noise_rng, rng = jax.random.split(rng)
    action_t = renoise_chunk(cfg, noise_rng, prev_chunk, t_start)
    return infer_action(
        params, cfg, rng, input_ids, pixel_values, attention_mask, proprios,
        action0=action_t, t_start=t_start,
    )


def infer_action_naive(
    params: dict,
    cfg: PiZeroConfig,
    rng: Array,
    input_ids: Array,
    pixel_values: Array,
    attention_mask: Array,
    proprios: Array,
) -> Array:
    """No-cache oracle: recompute the full joint forward each Euler step
    (reference pizero.py:492-557 — its KV cache holds values identical to
    recomputation, so full recompute is semantically equal). Used by tests
    to bound cached-path drift (the allclose oracle the reference keeps in
    comments, eval.py:119-124)."""
    dtype = pixel_values.dtype
    b = input_ids.shape[0]
    full_mask, _, _, pos = prepare_action_inputs(cfg, attention_mask)

    inputs_embeds = embed_image_text(params, cfg, input_ids, pixel_values)
    proprio_embeds = encode_proprio(params, proprios).astype(dtype)

    action0 = jax.random.normal(
        rng, (b, cfg.horizon_steps, cfg.action_dim), dtype=dtype
    )
    delta_t = 1.0 / cfg.num_inference_steps

    t0_emb = time_embedding(cfg, jnp.zeros((b,), dtype), dtype)

    def vel_at(action, t):
        t_emb = time_embedding(cfg, t, dtype)
        # prefix conditioned at t=0 (matches the cached path; see infer_action)
        t_cond = (
            {"proprio": t0_emb, "action": t_emb}
            if cfg.action_expert_adaptive_mode
            else None
        )
        action_embeds = encode_action(
            params, cfg, action, None if cfg.action_expert_adaptive_mode else t_emb
        )
        hidden = joint_lib.joint_forward(
            params["joint"],
            cfg.joint,
            {"vlm": inputs_embeds, "proprio": proprio_embeds, "action": action_embeds},
            pos,
            full_mask,
            time_cond=t_cond,
        )["action"]
        return decode_action(params, hidden)

    def euler_step(carry, _):
        action, t = carry
        if cfg.flow_integrator == "midpoint":
            half = action + 0.5 * delta_t * vel_at(action, t)
            vel = vel_at(half, t + 0.5 * delta_t)
        else:
            vel = vel_at(action, t)
        return (action + delta_t * vel, t + delta_t), None

    t0 = jnp.zeros((b,), dtype)
    (action, _), _ = jax.lax.scan(
        euler_step, (action0, t0), None, length=cfg.num_inference_steps
    )
    if cfg.final_action_clip_value is not None:
        action = jnp.clip(
            action, -cfg.final_action_clip_value, cfg.final_action_clip_value
        )
    return action


# --------------------------------------------------------------------------- #
# flow-matching training loss
# --------------------------------------------------------------------------- #


def psi_t(cfg: PiZeroConfig, x0: Array, x1: Array, t: Array) -> Array:
    """Conditional flow interpolant (reference pizero.py:597-605)."""
    t = t[:, None, None]
    return (1 - (1 - cfg.flow_sig_min) * t) * x0 + t * x1


def flow_matching_loss(
    params: dict,
    cfg: PiZeroConfig,
    rng: Array,
    input_ids: Array,
    pixel_values: Array,
    attention_mask: Array,
    proprios: Array,
    actions: Array,  # [B, A, act_dim] ground truth
    t: Array,  # [B] flow times in (0, 1)
    x0: Optional[Array] = None,  # inject noise (tests/parity); default randn
) -> Array:
    """MSE between predicted velocity and x1 - (1-σmin)·x0
    (reference pizero.py:607-661). No KV cache."""
    dtype = pixel_values.dtype
    full_mask, _, _, pos = prepare_action_inputs(cfg, attention_mask)

    if x0 is None:
        x0 = jax.random.normal(rng, actions.shape, dtype=t.dtype)
    x1 = actions.astype(t.dtype)
    xt = psi_t(cfg, x0, x1, t).astype(dtype)

    inputs_embeds = embed_image_text(params, cfg, input_ids, pixel_values)
    proprio_embeds = encode_proprio(params, proprios).astype(dtype)

    t_emb = time_embedding(cfg, t, dtype)
    t_cond = t_emb if cfg.action_expert_adaptive_mode else None
    action_embeds = encode_action(
        params, cfg, xt, None if cfg.action_expert_adaptive_mode else t_emb
    )
    hidden = joint_lib.joint_forward(
        params["joint"],
        cfg.joint,
        {"vlm": inputs_embeds, "proprio": proprio_embeds, "action": action_embeds},
        pos,
        full_mask,
        time_cond=t_cond,
    )["action"]
    v_psi = decode_action(params, hidden).astype(jnp.float32)
    d_psi = (x1 - (1 - cfg.flow_sig_min) * x0).astype(jnp.float32)
    return jnp.mean(jnp.square(v_psi - d_psi))


# --------------------------------------------------------------------------- #
# text generation (PaliGemma path — parity check #1)
# --------------------------------------------------------------------------- #


def infer_text_logits(
    params: dict,
    cfg: PiZeroConfig,
    input_ids: Array,
    pixel_values: Array,
) -> Array:
    """Single prefill forward returning logits for every position
    [B, S, V] (reference infer_text without cache, pizero.py:559-593).
    PaliGemma's prompt attention is fully bidirectional (mask of zeros)."""
    embeds = embed_image_text(params, cfg, input_ids, pixel_values)
    b, s, _ = embeds.shape
    cache = joint_lib.init_text_cache(cfg.joint, b, s, embeds.dtype)
    mask = jnp.zeros((b, 1, s, s), jnp.float32)
    positions = jnp.arange(1, s + 1, dtype=jnp.int32)[None].repeat(b, 0)
    hidden, _ = joint_lib.joint_text_forward(
        params["joint"], cfg.joint, embeds, positions, mask, cache, 0
    )
    return lm_logits(params, hidden)


def lm_logits(params: dict, hidden: Array) -> Array:
    """Tied lm_head: logits = hidden @ embed_tokens^T (reference :106-112)."""
    out = jnp.einsum(
        "bsd,vd->bsv", hidden, params["embed_tokens"],
        preferred_element_type=jnp.float32,
    )
    return out


def sample_top_p(
    key: Array, logits: Array, temperature: float = 1.0, top_p: float = 1.0
) -> Array:
    """[B, V] logits -> [B] sampled ids, matching the reference sampler
    (run_paligemma.py:63-105: softmax(logits/T), sort descending, drop
    tokens whose EXCLUSIVE cumulative mass exceeds top_p — the top token is
    always kept — renormalize, multinomial). TPU-friendly formulation: the
    kept set is expressed as a per-row logit threshold, so no scatter back
    through the sort permutation is needed."""
    logits = logits.astype(jnp.float32) / temperature
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep = (cum - sorted_probs) <= top_p  # exclusive cumsum; [..., 0] is True
    n_keep = jnp.sum(keep, axis=-1, keepdims=True)
    thresh = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
    filtered = jnp.where(logits >= thresh, logits, MASK_NEG)
    return jax.random.categorical(key, filtered, axis=-1)


def generate_text(
    params: dict,
    cfg: PiZeroConfig,
    input_ids: Array,  # [B, S] unpadded prompt (image tokens + bos + text)
    pixel_values: Array,
    max_new_tokens: Optional[int] = None,
    eos_token_id: int = 1,
    rng: Optional[Array] = None,
    temperature: float = 1.0,
    top_p: float = 1.0,
) -> Array:
    """Text decoding with a static-size cache (reference pizero.py:770-791).
    Greedy by default; pass `rng` for temperature/top-p sampling (the
    reference's do_sample path, run_paligemma.py:39-105 — per-step keys are
    fold_in(rng, step), so a fixed key reproduces the sequence exactly).
    Returns [B, max_new_tokens]; positions after EOS hold the pad id."""
    max_new = max_new_tokens or cfg.max_decode_tokens
    embeds = embed_image_text(params, cfg, input_ids, pixel_values)
    b, s, _ = embeds.shape
    total = s + max_new
    cache = joint_lib.init_text_cache(cfg.joint, b, total, embeds.dtype)

    # prefill: bidirectional over the prompt; cache cols beyond S masked
    cols = jnp.arange(total)
    prefill_mask = jnp.where(cols[None, None, None, :] < s, 0.0, MASK_NEG)
    prefill_mask = jnp.broadcast_to(prefill_mask, (b, 1, s, total)).astype(jnp.float32)
    positions = jnp.arange(1, s + 1, dtype=jnp.int32)[None].repeat(b, 0)
    hidden, cache = joint_lib.joint_text_forward(
        params["joint"], cfg.joint, embeds, positions, prefill_mask, cache, 0
    )

    def pick(logits_1, i):
        """[B, 1, V] -> [B, 1] next token (greedy or top-p sampled)."""
        if rng is None:
            return jnp.argmax(logits_1, axis=-1)
        key = jax.random.fold_in(rng, i)
        return sample_top_p(key, logits_1[:, -1, :], temperature, top_p)[:, None]

    next_tok = pick(lm_logits(params, hidden[:, -1:, :]), 0)  # [B, 1]

    def step(carry, i):
        cache, tok, done = carry
        # jnp.take (not __getitem__): params may be host numpy arrays
        # (checkpoint converters return numpy), which cannot be indexed by
        # a traced token
        emb = jnp.take(jnp.asarray(params["embed_tokens"]), tok, axis=0)  # [B, 1, Dv]
        kv_len = s + i + 1  # slots valid after this step's append
        mask = jnp.where(cols[None, None, None, :] < kv_len, 0.0, MASK_NEG)
        mask = jnp.broadcast_to(mask, (b, 1, 1, total)).astype(jnp.float32)
        pos = jnp.full((b, 1), s + i + 1, jnp.int32)
        hidden, cache = joint_lib.joint_text_forward(
            params["joint"], cfg.joint, emb, pos, mask, cache, s + i
        )
        nxt = pick(lm_logits(params, hidden), i + 1)  # [B, 1]
        out_tok = jnp.where(done, cfg.pad_token_id, tok[:, 0])  # [B]
        done = done | (tok[:, 0] == eos_token_id)
        return (cache, nxt, done), out_tok

    done0 = jnp.zeros((b,), bool)
    (_, _, _), toks = jax.lax.scan(
        step, (cache, next_tok, done0), jnp.arange(max_new)
    )
    return toks.T  # [B, max_new]
