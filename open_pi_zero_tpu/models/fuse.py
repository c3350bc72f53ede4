"""Serving-time projection fusion: concatenate the q/k/v and gate/up
kernels so each attention block issues ONE input matmul instead of three
and each geglu MLP one instead of two.

Why this matters on TPU at batch 1: the trunk's proprio/action experts and
the 27 SigLIP layers run many small matmuls whose cost is dominated by
per-op overhead and weight-streaming setup, not FLOPs — halving the op
count recovers real latency. The canonical (checkpoint) layout keeps
separate kernels; this is a pure tree-to-tree transform applied after
loading (and after `merge_lora` — fusion refuses trees that still carry
adapters or quantized bases, which need their own layouts).

The forward paths (models/mixture.py, models/siglip.py) detect the fused
keys ("qkv", "gateup") and split the single matmul's output; numerics are
identical up to XLA reassociation (concatenating columns of the weight
matrix does not change any dot product).

Tensor parallelism: fuse AFTER deciding the layout — parallel/sharding.py
deliberately has no rule for "qkv"/"gateup" (sharding a concatenated out
dim would misalign the q|k|v segment boundaries with shard boundaries), so
fused trees stay replicated on the model axis. TP serving should keep the
canonical layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def _assert_fusable(d: dict, names):
    for n in names:
        if f"{n}_lora" in d:
            raise ValueError(
                "cannot fuse projections with live LoRA adapters — apply "
                "ops.lora.merge_lora first"
            )
        if isinstance(d.get(n), dict) and ({"q", "qa", "q4"} & set(d.get(n, {}))):
            raise ValueError(
                "cannot fuse quantized bases — fusion is for the "
                "float serving path (fuse first, then quantize)"
            )


def fuse_mixture_layers(layers: dict) -> dict:
    out = dict(layers)
    attn = dict(layers["attn"])
    _assert_fusable(attn, ("q", "k", "v"))
    out["attn"] = {
        "qkv": jnp.concatenate([attn.pop("q"), attn.pop("k"), attn.pop("v")], axis=-1),
        **attn,  # o (+ anything else) unchanged
    }
    mlp = dict(layers["mlp"])
    _assert_fusable(mlp, ("gate", "up"))
    out["mlp"] = {
        "gateup": jnp.concatenate([mlp.pop("gate"), mlp.pop("up")], axis=-1),
        **mlp,  # down unchanged
    }
    return out


def fuse_siglip_layers(layers: dict) -> dict:
    out = dict(layers)
    attn = dict(layers["attn"])
    _assert_fusable(attn, ("q", "k", "v"))
    q, k, v = attn.pop("q"), attn.pop("k"), attn.pop("v")
    out["attn"] = {
        "qkv": {
            "kernel": jnp.concatenate(
                [q["kernel"], k["kernel"], v["kernel"]], axis=-1
            ),
            "bias": jnp.concatenate([q["bias"], k["bias"], v["bias"]], axis=-1),
        },
        **attn,  # o (+ any future keys) preserved
    }
    return out


def prepare_for_serving(
    params: dict,
    quantize_mixtures=(),
    bits: int = 8,
    code: str = "nf4",
    w8a8_mixtures=(),
    w8a8_siglip: bool = False,
    w8a8_keys=None,
    mse_scale: bool = False,
) -> dict:
    """Full serving-layout pipeline: fuse qkv/gate+up, then (optionally)
    quantize. Tiers (reference bnb get_layer factory, lora.py:83-100):

      quantize_mixtures + bits=8        weight-only int8 per channel — the
          streaming tier for the Euler-loop expert (its weights stream 10x
          per chunk)
      quantize_mixtures + bits=4        blockwise NF4 (bnb Linear4bit
          memory tier; infer_action decodes it once per call to int8 —
          the only 4-bit serving path: a fused Pallas int4 kernel was
          measured VPU-bound on v5e and removed)
      w8a8_mixtures / w8a8_siglip       W8A8: dynamic per-token activation
          quantization + native int8 x int8 MXU dots — the compute tier
          for the prefill towers, which run once per chunk and are
          MXU-bound

    Measured on one v5e at bridge scale (B=1, 10 Euler steps,
    scripts/bench_serving.py): bf16 fused 20.0 ms; int8 expert 15.9 ms
    (drift 1.4e-3 L1); + W8A8 vlm+siglip 13.1 ms (drift 2.4e-3 — inside
    the reference's documented bf16 KV-cache drift band of 5e-4–2.5e-3,
    reference README.md:116; the production default); NF4 expert 21.8 ms
    (drift ~1.2e-2 at random init — a memory tier, ~4.5 bits/param).

    LoRA adapters must be merged first (ops.lora.merge_lora); fusion
    refuses adapter-carrying trees.
    """
    from open_pi_zero_tpu.ops import lora as lora_lib

    params = fuse_for_serving(params)
    if quantize_mixtures or w8a8_mixtures:
        joint = dict(params["joint"])
        mixtures = dict(joint["mixtures"])
        # install the (mutable) mixtures dict FIRST, then quantize in
        # place: each float mixture's last reference dies the moment its
        # quantized replacement lands, instead of the whole float tree
        # surviving until the final rebind (a ~2.5 GB HBM difference at
        # bridge scale when loading real checkpoints in EvalAgent)
        joint["mixtures"] = mixtures
        params = {**params, "joint": joint}
        for m in quantize_mixtures:
            if m in mixtures:  # "proprio" is absent when tied to "action"
                mixtures[m] = lora_lib.quantize_base_weights(
                    mixtures[m], bits=bits, code=code, mse_scale=mse_scale
                )
        for m in w8a8_mixtures:
            if m in mixtures:
                mixtures[m] = lora_lib.quantize_base_weights(
                    mixtures[m],
                    keys=w8a8_keys or lora_lib.QUANTIZE_KEYS,
                    w8a8=True,
                    mse_scale=mse_scale,
                )
    if w8a8_siglip:
        sig = dict(params["siglip"])
        # encoder-layer kernels only: patch/position embeddings and the
        # multimodal projector stay float (negligible FLOPs, image-boundary
        # numerics)
        sig["layers"] = lora_lib.quantize_base_weights(
            sig["layers"], keys=("kernel",), w8a8=True, mse_scale=mse_scale
        )
        params = {**params, "siglip": sig}
    return params


def serving_layout_kwargs(cfg) -> dict:
    """Resolve the eval-config serving-tier knobs into the kwargs shared by
    ``prepare_for_serving`` and ``build_serving_params``.

    Single source of truth for the tier selection so EvalAgent (checkpoint
    load), scripts/serve.py (daemon, incl. --random-init) and benches all
    agree on what e.g. ``quantize=true w8a8=true`` means. Knobs (all read
    with the production defaults):

      quantize=true            master switch; false = pure fused bf16
      quantize_mixtures        weight-only tier targets (default: action)
      quantize_bits/code       8=int8 / 4=NF4 for those mixtures
      w8a8=true                W8A8 prefill on the VLM trunk
      w8a8_siglip=false        opt-in min-latency tier (drift moves from
                               mid-band 1.35e-3 to top-edge 2.52e-3 —
                               DRIFT_BUDGET.json)
    """
    if not bool(cfg.get("quantize", True)):
        return {}
    w8a8 = bool(cfg.get("w8a8", True))
    return dict(
        quantize_mixtures=tuple(cfg.get("quantize_mixtures", ("action",))),
        bits=int(cfg.get("quantize_bits", 8)),
        code=str(cfg.get("quantize_code", "nf4")),
        w8a8_mixtures=("vlm",) if w8a8 else (),
        w8a8_siglip=w8a8 and bool(cfg.get("w8a8_siglip", False)),
    )


def build_serving_params(
    key,
    cfg,
    dtype=jnp.bfloat16,
    quantize_mixtures=(),
    bits: int = 8,
    code: str = "nf4",
    w8a8_mixtures=(),
    w8a8_siglip: bool = False,
    w8a8_keys=None,
    mse_scale: bool = False,
    log_memory: bool = False,
) -> dict:
    """Streaming, OOM-proof equivalent of
    ``prepare_for_serving(pizero.init_params(key, cfg, dtype), ...)``.

    The naive sequence materializes the full float tree (~7 GB bf16 at
    bridge scale) and then builds the quantized serving copy BESIDE it —
    a transient ~11 GB+ peak that loses on a 16 GB v5e whenever anything
    else holds HBM (this is exactly what produced the round-2 driver OOM,
    BENCH_r02.json rc=1). This builder instead initializes, fuses, and
    quantizes ONE module at a time, dropping each bf16 intermediate before
    the next module is touched, so peak HBM stays at (final serving tree +
    one bf16 mixture + its fusion transients) ≈ 6.5 GB instead of 11+.

    Key discipline: splits the root key exactly like ``pizero.init_params``
    (and ``joint.init_joint_params`` for the per-mixture keys), so the
    result is bitwise identical to the two-step build — asserted at tiny
    geometry by tests/test_fuse.py.

    Reference parity: the reference loads checkpoints straight into the
    quantized layout too (bnb ``Linear4bit`` quantizes at ``load_state_dict``
    time, one module at a time — src/model/lora.py:83-100); the full-tree
    float detour was never part of its serving path either.
    """
    import gc

    import jax

    from open_pi_zero_tpu.models import joint as joint_lib
    from open_pi_zero_tpu.models import mixture as mx
    from open_pi_zero_tpu.models import siglip as siglip_lib
    from open_pi_zero_tpu.ops import lora as lora_lib
    from open_pi_zero_tpu.ops.linear import linear_init

    def _log(stage):
        if log_memory:
            from open_pi_zero_tpu.utils.monitor import log_device_memory

            try:
                log_device_memory(stage=stage)
            except Exception:
                pass  # memory_stats unsupported on some backends

    keys = list(jax.random.split(key, 10))
    (k_embed, k_ae1, k_ae2, k_ae3, k_sig, k_proj, k_joint, k_prop, k_dec) = keys[:9]

    # ---- joint mixtures, biggest (vlm) first: init -> fuse -> quantize,
    # freeing the bf16/fused intermediates before the next module
    names = [
        n for n in cfg.joint.mixture_names if joint_lib.param_key(cfg.joint, n) == n
    ]
    jkeys = jax.random.split(k_joint, len(names))
    mixtures = {}
    for n, k in zip(names, jkeys):
        p = mx.init_mixture_params(k, cfg.joint, cfg.joint.mixture(n), dtype)
        p = {**p, "layers": fuse_mixture_layers(p["layers"])}
        if n in quantize_mixtures:
            q = lora_lib.quantize_base_weights(
                p, bits=bits, code=code, mse_scale=mse_scale
            )
        elif n in w8a8_mixtures:
            q = lora_lib.quantize_base_weights(
                p, keys=w8a8_keys or lora_lib.QUANTIZE_KEYS, w8a8=True,
                mse_scale=mse_scale,
            )
        else:
            q = p
        mixtures[n] = q
        del p, q
        gc.collect()
        _log(f"mixture {n}")

    # ---- SigLIP tower
    sig = siglip_lib.init_params(k_sig, cfg.siglip, dtype)
    sig = {**sig, "layers": fuse_siglip_layers(sig["layers"])}
    if w8a8_siglip:
        sig = {
            **sig,
            "layers": lora_lib.quantize_base_weights(
                sig["layers"], keys=("kernel",), w8a8=True, mse_scale=mse_scale
            ),
        }
    gc.collect()
    _log("siglip")

    # ---- small float leaves (identical to pizero.init_params)
    vlm_hidden = cfg.mixture("vlm").hidden_size
    action_hidden = cfg.mixture("action").hidden_size
    proprio_hidden = cfg.mixture("proprio").hidden_size
    embed = jax.random.normal(k_embed, (cfg.vocab_size, vlm_hidden), dtype)
    embed = embed.at[cfg.pad_token_id].set(0.0)
    time_cond = cfg.action_expert_adaptive_mode is None
    enc_in2 = 2 * action_hidden if time_cond else action_hidden
    params = {
        "embed_tokens": embed,
        "siglip": sig,
        "projector": siglip_lib.init_projector_params(k_proj, cfg.siglip, dtype),
        "joint": {"mixtures": mixtures},
        "action_encoder": {
            "linear_1": linear_init(k_ae1, cfg.action_dim, action_hidden, dtype),
            "linear_2": linear_init(k_ae2, enc_in2, action_hidden, dtype),
            "linear_3": linear_init(k_ae3, action_hidden, action_hidden, dtype),
        },
        "proprio_encoder": linear_init(k_prop, cfg.proprio_dim, proprio_hidden, dtype),
        "action_decoder": linear_init(k_dec, action_hidden, cfg.action_dim, dtype),
    }
    _log("serving tree complete")
    return params


def fuse_for_serving(params: dict) -> dict:
    """Full PiZero param tree -> fused-serving layout (new tree; the input
    is not mutated)."""
    out = dict(params)
    if "siglip" in out:
        sig = dict(out["siglip"])
        sig["layers"] = fuse_siglip_layers(sig["layers"])
        out["siglip"] = sig
    if "joint" in out:
        joint = dict(out["joint"])  # preserve any sibling keys
        joint["mixtures"] = {
            name: {**m, "layers": fuse_mixture_layers(m["layers"])}
            for name, m in joint["mixtures"].items()
        }
        out["joint"] = joint
    return out
