#!/usr/bin/env python
"""Training-step roofline audit + full-fine-tune memory/step model (one v5e).

The serving path has a per-phase speed-of-light audit
(scripts/bench_roofline.py, 84% of HBM roofline); this is the training
side the round-3 verdict asked for (task 4):

  qlora   achieved TFLOP/s + MFU of the measured QLoRA recipe
          (BENCH_TRAIN.json's 508 ms: good or bad?), plus the dispatch
          gap — chained steps (state-donation serialized) vs a host-sync
          every step. FLOPs are counted analytically from the actual
          param tree per component: matmul kernels only, x tokens x
          (2 fwd + 2 bwd-dx [+2 bwd-dw if trainable] [+2 remat refwd]).
  fullft  the reference's ACTUAL recipe shape — full fine-tune, bf16
          params, blockwise-int8 Adam, remat, no LoRA (reference
          train.py:167-210 trains 2.6B on 40 GB GPUs) — measured at
          reduced trunk depths on the 16 GB chip, with a static-memory
          model (6 bytes/trainable param: bf16 param + bf16 grad + 2x
          int8 moments + block scales) and a linear step-time fit in
          depth, projected to the full 18-layer recipe: minimum chips
          (ZeRO-1 sharded states) + projected step time at the
          reference's global batch 1024.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_roofline.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_BF16_TFLOPS = 197.0  # v5e public ceiling, one chip
HBM_GB = 16.0
HBM_USABLE_GB = 13.5  # leave room for XLA scratch + runtime


# --------------------------------------------------------------------------- #
# analytic FLOP count: matmul kernels x tokens, per component
# --------------------------------------------------------------------------- #

_KERNEL_KEYS = (
    "kernel", "q", "qa", "qkv", "gateup", "gate", "up", "down", "o",
    "k", "v", "fc1", "fc2",
)


def _matmul_elements(tree, path=()) -> int:
    total = 0
    if isinstance(tree, dict):
        for k, v in tree.items():
            total += _matmul_elements(v, path + (k,))
        return total
    last = path[-1] if path else ""
    if hasattr(tree, "ndim") and tree.ndim >= 2 and last in _KERNEL_KEYS:
        return int(np.prod(tree.shape))
    return 0


def train_flops_per_sample(params: dict, cfg, trainable: dict) -> dict:
    """Analytic per-sample training FLOPs, per component.

    factor = 2 (fwd) + 2 (bwd d-input) + 2 if trainable (bwd d-weight)
             + 2 if remat (forward recompute) — all x kernel elements x
    that component's token count. Attention S^2 score/value terms and
    vector work are excluded (<4% at S=281, same policy as the serving
    roofline)."""
    n_img = cfg.siglip.num_image_tokens
    tokens = {
        "siglip": n_img,
        "projector": n_img,
        "vlm": cfg.max_image_text_tokens,
        "proprio": cfg.cond_steps,
        "action": cfg.horizon_steps,
        "encoders": cfg.horizon_steps,
    }
    comps = {
        "siglip": params.get("siglip", {}),
        "projector": params.get("projector", {}),
        "vlm": params["joint"]["mixtures"]["vlm"],
        "proprio": params["joint"]["mixtures"].get("proprio", {}),
        "action": params["joint"]["mixtures"]["action"],
        "encoders": {
            k: params[k]
            for k in ("action_encoder", "proprio_encoder", "action_decoder")
            if k in params
        },
    }
    remat = bool(getattr(cfg.joint, "remat", False))
    out = {}
    for name, sub in comps.items():
        e = _matmul_elements(sub)
        factor = 4 + (2 if trainable.get(name, True) else 0) + (2 if remat else 0)
        out[name] = e * tokens[name] * factor
    out["total"] = sum(out.values())
    return out


# --------------------------------------------------------------------------- #
# shared step-bench harness
# --------------------------------------------------------------------------- #


def _example_batch(cfg, b, dtype):
    import jax.numpy as jnp

    ids = np.zeros((b, cfg.max_image_text_tokens), np.int32)
    ids[:, : cfg.siglip.num_image_tokens] = cfg.image_token_index
    ids[:, cfg.siglip.num_image_tokens] = 2
    ids[:, cfg.siglip.num_image_tokens + 1 : cfg.siglip.num_image_tokens + 8] = 100
    rng = np.random.default_rng(0)
    return {
        "input_ids": jnp.asarray(ids),
        "pixel_values": jnp.asarray(
            rng.normal(size=(b, cfg.siglip.image_size, cfg.siglip.image_size, 3)),
            dtype,
        ),
        "attention_mask": jnp.asarray((ids != 0).astype(np.int32)),
        "proprios": jnp.asarray(rng.normal(size=(b, 1, cfg.proprio_dim)), dtype),
        "actions": jnp.asarray(
            rng.uniform(-1, 1, size=(b, cfg.horizon_steps, cfg.action_dim)),
            jnp.float32,
        ),
    }


def _time_steps(step, state, batch, n, sync_every_step=False):
    """(ms/step, final state). Chained: the donated state serializes the
    steps into one data-dependency chain, one host read at the end (the
    only trustworthy timing under axon — CLAUDE.md). sync_every_step
    additionally blocks on the loss each step: the difference is the
    dispatch gap the chain hides."""
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch)
        if sync_every_step:
            float(metrics["loss"])
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss
    return dt * 1e3 / n, state


def bench_recipe(cfg, tcfg, batch_size, steps, dtype):
    """Build params/state for (cfg, tcfg), run the jitted step; returns
    timing dict or raises on OOM/compile failure."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.ops import lora as lora_lib
    from open_pi_zero_tpu.training import optimizer as opt_lib
    from open_pi_zero_tpu.training.train_step import (
        init_train_state,
        make_jitted_train_step,
    )

    params = pizero.init_params(jax.random.key(0), cfg, dtype=dtype)
    params = lora_lib.quantize_per_model_config(params, cfg)
    n_params = int(sum(x.size for x in jax.tree.leaves(params)))
    tx = opt_lib.build_optimizer(tcfg, params)
    state = init_train_state(params, tx, jax.random.key(1), tcfg)
    del params

    batch = _example_batch(cfg, batch_size, dtype)
    step = make_jitted_train_step(cfg, tcfg, tx)
    t0 = time.time()
    state, metrics = step(state, batch)
    compile_s = time.time() - t0
    loss0 = float(metrics["loss"])
    print(f"  compiled+first step {compile_s:.1f}s loss={loss0:.4f}", flush=True)
    for _ in range(2):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    ms_chain, state = _time_steps(step, state, batch, steps)
    ms_sync, state = _time_steps(step, state, batch, steps, sync_every_step=True)
    return {
        "n_params": n_params,
        "compile_s": round(compile_s, 1),
        "ms_per_step_chained": round(ms_chain, 1),
        "ms_per_step_synced": round(ms_sync, 1),
        "dispatch_gap_ms": round(ms_sync - ms_chain, 1),
        "frames_per_s_per_chip": round(batch_size * 1e3 / ms_chain, 1),
    }


# --------------------------------------------------------------------------- #
# recipes
# --------------------------------------------------------------------------- #


def qlora_cfg():
    from open_pi_zero_tpu.config import (
        LoraConfig, LRSchedulerConfig, PiZeroConfig, TrainingConfig,
        dataclass_replace,
    )

    cfg = PiZeroConfig()
    mixtures = tuple(
        dataclass_replace(
            m, use_lora=(name == "vlm"), use_quantize=(name == "vlm"),
            lora=LoraConfig(r=32),
        )
        for name, m in zip(cfg.joint.mixture_names, cfg.joint.mixtures)
    )
    siglip = dataclass_replace(
        cfg.siglip, use_lora=True, use_quantize=True, lora=LoraConfig(r=32)
    )
    cfg = dataclass_replace(
        cfg, siglip=siglip,
        joint=dataclass_replace(cfg.joint, mixtures=mixtures, remat=True),
    )
    tcfg = TrainingConfig(
        lora=True, quantize_optimizer_states=True, use_ema=False,
        action_lr_scheduler=LRSchedulerConfig(first_cycle_steps=1000, warmup_steps=0),
        vlm_lr_scheduler=LRSchedulerConfig(first_cycle_steps=1000, warmup_steps=0),
    )
    return cfg, tcfg


def fullft_cfg(depth: int):
    """The reference recipe shape at reduced trunk depth: FULL fine-tune
    (no LoRA, no weight quantization), bf16 params, int8 Adam, remat."""
    from open_pi_zero_tpu.config import (
        LRSchedulerConfig, PiZeroConfig, TrainingConfig, dataclass_replace,
    )

    cfg = PiZeroConfig()
    cfg = dataclass_replace(
        cfg, joint=dataclass_replace(
            cfg.joint, num_hidden_layers=depth, remat=True
        ),
    )
    tcfg = TrainingConfig(
        quantize_optimizer_states=True, use_ema=False,
        action_lr_scheduler=LRSchedulerConfig(first_cycle_steps=1000, warmup_steps=0),
        vlm_lr_scheduler=LRSchedulerConfig(first_cycle_steps=1000, warmup_steps=0),
    )
    return cfg, tcfg


def static_bytes_per_param() -> float:
    """Full-FT static HBM per trainable param: bf16 param (2) + bf16 grad
    (2) + int8 mu + int8 nu (2) + fp32 blockwise absmax scales
    (2 * 4/2048)."""
    return 2 + 2 + 2 + 2 * 4 / 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fullft-batch", type=int, default=4)
    ap.add_argument("--depths", type=int, nargs="+", default=[2, 3, 4, 5, 6])
    ap.add_argument("--skip-qlora", action="store_true")
    ap.add_argument("--out", default="BENCH_TRAIN_ROOFLINE.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from open_pi_zero_tpu.models import pizero

    results = {
        "bench": "training-step roofline + full-FT memory/step model (one v5e)",
        "note": "chained steps = donated-state data-dependency chain with one "
                "host read (axon timing rule); dispatch gap = host-sync-every-"
                "step minus chained. FLOPs analytic, matmul kernels only "
                "(attention S^2 terms <4% at S=281, excluded).",
    }

    # ---- phase 1: QLoRA recipe MFU ----
    if not args.skip_qlora:
        print("[qlora] building ...", flush=True)
        cfg, tcfg = qlora_cfg()
        r = bench_recipe(cfg, tcfg, args.batch, args.steps, jnp.bfloat16)
        abstract = jax.eval_shape(
            lambda: pizero.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
        )
        trainable = {"siglip": False, "projector": False, "vlm": False,
                     "proprio": True, "action": True, "encoders": True}
        flops = train_flops_per_sample(abstract, cfg, trainable)
        per_step = flops["total"] * args.batch
        tflops = per_step / (r["ms_per_step_chained"] / 1e3) / 1e12
        results["qlora"] = {
            **r,
            "batch": args.batch,
            "analytic_flops_per_step": per_step,
            "achieved_tflops": round(tflops, 1),
            "mfu_vs_peak_197": round(tflops / PEAK_BF16_TFLOPS, 3),
            "flops_split": {k: v for k, v in flops.items() if k != "total"},
            "note": "frozen towers count fwd+bwd-dx only; NF4 decode cost "
                    "and vector work excluded from FLOPs (MFU is therefore "
                    "slightly understated)",
        }
        print(json.dumps(results["qlora"], indent=1), flush=True)

    # ---- phase 2: full-FT at reduced depths ----
    fullft = {"batch": args.fullft_batch, "depths": {}}
    for depth in args.depths:
        print(f"[fullft] depth {depth} ...", flush=True)
        cfg, tcfg = fullft_cfg(depth)
        try:
            r = bench_recipe(cfg, tcfg, args.fullft_batch, args.steps,
                             jnp.bfloat16)
            static_gb = r["n_params"] * static_bytes_per_param() / 2**30
            fullft["depths"][depth] = {
                **r, "fits": True,
                "static_model_gb": round(static_gb, 2),
            }
        except Exception as e:  # noqa: BLE001 — OOM/compile failure is data
            fullft["depths"][depth] = {
                "fits": False, "error": f"{type(e).__name__}: {str(e)[:300]}"
            }
        print(json.dumps(fullft["depths"][depth], indent=1), flush=True)
        import gc

        gc.collect()  # drop leaked device arrays before the next depth

    # ---- phase 3: memory model + projection to the reference recipe ----
    from open_pi_zero_tpu.config import PiZeroConfig

    full_cfg = PiZeroConfig()  # 18-layer recipe
    abstract_full = jax.eval_shape(
        lambda: pizero.init_params(jax.random.key(0), full_cfg, dtype=jnp.bfloat16)
    )
    n_full = int(sum(int(np.prod(x.shape)) for x in jax.tree.leaves(abstract_full)))
    bpp = static_bytes_per_param()
    static_full_gb = n_full * bpp / 2**30
    # ZeRO-1 shards the optimizer states (4.004 B/param) over n chips;
    # params + grads (4 B/param) stay replicated per chip
    opt_bpp = 2 + 2 * 4 / 2048
    fixed_gb = n_full * 4 / 2**30

    def chips_needed() -> int:
        n = 1
        while fixed_gb + n_full * opt_bpp / 2**30 / n > HBM_USABLE_GB and n < 1024:
            n *= 2
        return n

    fitted = {d: v for d, v in fullft["depths"].items() if v.get("fits")}
    proj = {
        "n_params_full_recipe": n_full,
        "static_bytes_per_param": round(bpp, 4),
        "static_model_gb_one_chip": round(static_full_gb, 2),
        "fits_one_chip": static_full_gb < HBM_USABLE_GB,
        "min_chips_zero1_static": chips_needed(),
    }
    if len(fitted) >= 2:
        ds = sorted(fitted)
        ts = [fitted[d]["ms_per_step_chained"] for d in ds]
        # linear in depth: t = a + b*L (per-chip batch args.fullft_batch)
        b_fit, a_fit = np.polyfit(ds, ts, 1)
        t18 = a_fit + b_fit * full_cfg.joint.num_hidden_layers
        fps_chip = args.fullft_batch * 1e3 / t18
        chips = max(proj["min_chips_zero1_static"], 1)
        # reference recipe: global batch 1024 (reference train.py:134-139)
        accum = int(np.ceil(1024 / (args.fullft_batch * chips)))
        proj.update({
            "steptime_fit_ms": {"intercept": round(a_fit, 1),
                                "per_layer": round(b_fit, 1)},
            "projected_ms_per_step_18L": round(t18, 1),
            "projected_frames_per_s_per_chip": round(fps_chip, 2),
            "reference_recipe_projection": {
                "global_batch": 1024,
                "chips": chips,
                "grad_accum": accum,
                "projected_ms_per_update": round(t18 * accum, 1),
                "note": "DP projection: per-update time = per-step time x "
                        "accum microbatches; cross-chip psum overlap not "
                        "modeled (compute-bound estimate)",
            },
        })
    results["fullft"] = fullft
    results["projection"] = proj
    print(json.dumps(proj, indent=1), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()


def bench_recipe_split(cfg, tcfg, batch_size, steps, dtype):
    """bench_recipe via the split step (training/split_step.py) — for
    recipe points where the fused backward+int8-Adam jit crashes the
    remote compiler (see scripts/probe_depth5.py attribution)."""
    import jax

    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.ops import lora as lora_lib
    from open_pi_zero_tpu.training.split_step import make_split_train_step

    params = pizero.init_params(jax.random.key(0), cfg, dtype=dtype)
    params = lora_lib.quantize_per_model_config(params, cfg)
    n_params = int(sum(x.size for x in jax.tree.leaves(params)))
    init_split, step, _ = make_split_train_step(cfg, tcfg, params)
    del params
    state = init_split(jax.random.key(1))
    batch = _example_batch(cfg, batch_size, dtype)
    t0 = time.time()
    state, metrics = step(state, batch)
    compile_s = time.time() - t0
    loss0 = float(metrics["loss"])
    print(f"  [split] compiled+first step {compile_s:.1f}s loss={loss0:.4f}",
          flush=True)
    for _ in range(2):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    ms_chain, state = _time_steps(step, state, batch, steps)
    return {
        "n_params": n_params,
        "compile_s": round(compile_s, 1),
        "ms_per_step_chained": round(ms_chain, 1),
        "ms_per_step_synced": None,
        "dispatch_gap_ms": None,
        "frames_per_s_per_chip": round(batch_size * 1e3 / ms_chain, 1),
        "step": "split",
    }
