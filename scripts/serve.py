#!/usr/bin/env python
"""Action-chunk serving daemon: loads a checkpoint in the production
serving layout (W8A8 prefill + int8 action expert), warms every batch
bucket, and serves batched `infer_action` over TCP (newline-delimited
JSON — protocol in open_pi_zero_tpu/serving.py).

  python scripts/serve.py --config configs/eval/bridge.yaml \
      checkpoint_path=/path/to/ckpt [--host 0.0.0.0] [--port 7011] \
      [--batch-sizes 1,4,8,16] [--window-ms 3]

`--random-init` skips the checkpoint and builds serving params with the
streaming OOM-proof builder (fuse.build_serving_params) — for load
testing / protocol work before real weights land.

`refine_from_prev=0.5` (config override) enables the refined steady-state
tier: requests that include a `prev_chunk` field are served by
`infer_action_refined` (half the Euler loop at t=0.5; client-owned state,
omit the field on an episode's first request).

One v5e chip sustains ~147 chunks/s at batch 16 in the default mid-band
layout (158 with the opt-in w8a8_siglip=true min-latency tier,
BENCH_THROUGHPUT.json) — 100+ robot control loops at bridge's 5 Hz
effective rate.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)
log = logging.getLogger("serve")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7011)
    parser.add_argument(
        "--batch-sizes",
        type=lambda s: [int(x) for x in s.split(",")],
        default=[1, 4, 8, 16],
        help="comma-separated bucket sizes, one compile each (e.g. 1,4,8,16)",
    )
    parser.add_argument("--window-ms", type=float, default=3.0)
    parser.add_argument("--max-inflight", type=int, default=1,
                        help="device queue depth: 1 = accumulate the next"
                             " batch for the whole current device run"
                             " (fullest buckets under closed-loop robot"
                             " clients); raise for open-loop streams")
    parser.add_argument(
        "--random-init",
        action="store_true",
        help="serve random weights (streaming builder) — no checkpoint needed",
    )
    parser.add_argument("overrides", nargs="*", help="key=value config overrides")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_pi_zero_tpu.config import load_config, pizero_config_from_dict
    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.serving import BatchingPolicy, serve_forever

    cfg = load_config(args.config, overrides=args.overrides)
    model_cfg = pizero_config_from_dict(cfg)

    dtype = jnp.bfloat16 if bool(cfg.get("use_bf16", True)) else jnp.float32
    if args.random_init:
        # streaming module-at-a-time build (~6.5 GB peak vs 11+ GB for the
        # two-step init->quantize), same tier knobs as the checkpoint path
        from open_pi_zero_tpu.models import fuse

        params = fuse.build_serving_params(
            jax.random.key(int(cfg.get("seed", 42))),
            model_cfg,
            dtype,
            **fuse.serving_layout_kwargs(cfg),
        )
    else:
        # reuse EvalAgent's checkpoint -> merged -> fused/quantized pipeline
        from open_pi_zero_tpu.agents.eval import EvalAgent

        agent = EvalAgent.__new__(EvalAgent)
        agent.cfg = cfg
        agent.model_cfg = model_cfg
        agent.dtype = dtype
        params = agent._load_params()

    rng_holder = {"rng": jax.random.key(int(cfg.get("seed", 42)))}
    jit_infer = jax.jit(
        lambda p, r, i, pv, a, pr: pizero.infer_action(p, model_cfg, r, i, pv, a, pr)
    )

    def _model_args(batch: dict):
        rng_holder["rng"], sub = jax.random.split(rng_holder["rng"])
        return (
            params,
            sub,
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["pixel_values"], dtype),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["proprios"], dtype),
        )

    def infer_fn(batch: dict):
        # lazy jit output: the BatchingPolicy completer materializes it, so
        # the worker can stack+dispatch the next batch while this one runs
        # on the device (in-flight batching)
        return jit_infer(*_model_args(batch))

    # refined steady-state tier: requests carrying prev_chunk warm-start
    # the flow from the re-noised previous chunk (client-owned state; see
    # open_pi_zero_tpu/serving.py). Enabled by refine_from_prev=t in (0,1).
    refine_t = float(cfg.get("refine_from_prev", 0.0))
    refine_fn = None
    if refine_t > 0.0:
        jit_refine = jax.jit(
            lambda p, r, i, pv, a, pr, prev: pizero.infer_action_refined(
                p, model_cfg, r, i, pv, a, pr, prev, t_start=refine_t
            )
        )

        def refine_fn(batch: dict):
            return jit_refine(
                *_model_args(batch), jnp.asarray(batch["prev_chunk"], dtype)
            )

    policy = BatchingPolicy(
        infer_fn, batch_sizes=args.batch_sizes, batch_window_ms=args.window_ms,
        refine_fn=refine_fn, max_inflight=args.max_inflight,
    )

    import __graft_entry__ as graft

    ids, img, am, prop = graft._example_batch(model_cfg)
    policy.warmup(
        {
            "input_ids": ids[0],
            "pixel_values": np.asarray(img[0], np.float32),
            "attention_mask": am[0],
            "proprios": np.asarray(prop[0], np.float32),
        }
    )
    log.info("all batch buckets compiled; accepting traffic")
    serve_forever(args.host, args.port, policy)


if __name__ == "__main__":
    main()
