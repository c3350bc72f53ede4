#!/usr/bin/env python
"""Single-chip training-step benchmark at full bridge scale (real v5e).

Measures the jitted train step (fwd + bwd + AdamW + EMA) for the
fine-tune recipes on ONE 16 GB chip and reports steps/s and frames/s —
the missing measured half of the data-pipeline scaling model
(BENCH_DATA.json's cores-per-chip math): the reference fine-tunes on
L40/A100 nodes (reference README.md:137-139); a v5e pod slice replaces
it chip-for-chip only if a chip's appetite is known.

Recipes:
  qlora  NF4-frozen VLM base + LoRA adapters + trained action expert,
         remat, int8 optimizer states — the 16 GB pod recipe
         (tests/test_training.py::test_qlora_zero1_remat_pod_recipe)
  lora   bf16 frozen VLM base + LoRA adapters (no 4-bit decode cost)

Steps serialize through the donated TrainState (step i+1 consumes step
i's state), so a timed loop of N steps is already a data-dependency
chain — one host read at the end forces it (axon timing rules).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_step.py --recipe qlora
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", choices=("qlora", "lora"), default="qlora")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="BENCH_TRAIN.json")
    args = ap.parse_args()

    from open_pi_zero_tpu.config import (
        LoraConfig,
        LRSchedulerConfig,
        PiZeroConfig,
        TrainingConfig,
        dataclass_replace,
    )
    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.ops import lora as lora_lib
    from open_pi_zero_tpu.training import optimizer as opt_lib
    from open_pi_zero_tpu.training.train_step import (
        init_train_state,
        make_jitted_train_step,
    )

    cfg = PiZeroConfig()
    mixtures = tuple(
        dataclass_replace(
            m,
            use_lora=(name == "vlm"),
            use_quantize=(name == "vlm" and args.recipe == "qlora"),
            lora=LoraConfig(r=32),
        )
        for name, m in zip(cfg.joint.mixture_names, cfg.joint.mixtures)
    )
    siglip = dataclass_replace(
        cfg.siglip,
        use_lora=True,
        use_quantize=(args.recipe == "qlora"),
        lora=LoraConfig(r=32),
    )
    cfg = dataclass_replace(
        cfg,
        siglip=siglip,
        joint=dataclass_replace(cfg.joint, mixtures=mixtures, remat=True),
    )

    print("init params (streaming would not help here: the float tree IS "
          "the training state) ...", flush=True)
    dtype = jnp.bfloat16  # bf16 master for frozen towers; contract keeps
    # fp32 norms/rope/softmax cast points inside the forward
    params = pizero.init_params(jax.random.key(0), cfg, dtype=dtype)
    params = lora_lib.quantize_per_model_config(params, cfg)

    tcfg = TrainingConfig(
        lora=True,
        quantize_optimizer_states=True,
        use_ema=False,  # a second 3B average does not fit one chip
        action_lr_scheduler=LRSchedulerConfig(first_cycle_steps=1000, warmup_steps=0),
        vlm_lr_scheduler=LRSchedulerConfig(first_cycle_steps=1000, warmup_steps=0),
    )
    tx = opt_lib.build_optimizer(tcfg, params)
    state = init_train_state(params, tx, jax.random.key(1), tcfg)
    del params

    b = args.batch
    ids = np.zeros((b, cfg.max_image_text_tokens), np.int32)
    ids[:, : cfg.siglip.num_image_tokens] = cfg.image_token_index
    ids[:, cfg.siglip.num_image_tokens] = 2
    ids[:, cfg.siglip.num_image_tokens + 1 : cfg.siglip.num_image_tokens + 8] = 100
    rng = np.random.default_rng(0)
    batch = {
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

    step = make_jitted_train_step(cfg, tcfg, tx)
    print("compiling train step ...", flush=True)
    t0 = time.time()
    state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])
    print(f"compiled+first step in {time.time() - t0:.1f}s, loss={loss0:.4f}",
          flush=True)
    for _ in range(2):  # warmup
        state, metrics = step(state, batch)
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])  # forces the chain
    dt = time.perf_counter() - t0
    ms = dt * 1e3 / args.steps
    fps = args.steps * b / dt
    assert np.isfinite(loss)

    payload = {
        "metric": "train_step_ms_single_chip",
        "recipe": args.recipe,
        "batch": b,
        "value": round(ms, 1),
        "unit": "ms/step",
        "frames_per_s_per_chip": round(fps, 1),
        "loss_finite": True,
        "chips_for_global_batch_1024_at_this_rate": round(1024 / b, 0),
        "note": "one v5e, remat + int8 optimizer states + LoRA r=32 "
                "(vlm+siglip frozen%s); steps serialized by donated state."
                % (" NF4" if args.recipe == "qlora" else " bf16"),
    }
    print(json.dumps(payload))
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
