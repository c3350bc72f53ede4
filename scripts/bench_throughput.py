#!/usr/bin/env python
"""Batched serving throughput (action chunks/s) on one chip.

Beyond the reference's headline (B=1 latency, 75 ms on a 4090 =
~13 chunks/s): at batch B the Euler loop amortizes its weight streaming
B ways and the prefill matmuls move up the MXU roofline, so a single v5e
chip can serve many robots at once. Uses the production serving layout
(bf16 fused + int8 action expert) and bench.py's data-dependency-chain
timing.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_throughput.py \
      [--batches 1 4 8 16]

Prints one JSON line per batch size.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = 20
WARMUP = 5


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8, 16])
    parser.add_argument(
        "--w8a8-expert", action="store_true",
        help="W8A8 on the action expert too (batched Euler is MXU-heavier; "
        "measured 160.3 vs 158.4 chunks/s at B=16 on v5e — within noise, "
        "so the lower-drift weight-only int8 expert stays the default)",
    )
    parser.add_argument(
        "--refined", type=float, default=0.0, metavar="T_START",
        help="steady-state throughput of the refined tier "
        "(pizero.infer_action_refined): each chained call warm-starts from "
        "the previous call's chunk re-noised to t_start — the fleet "
        "steady-state where every robot sends its previous chunk "
        "(serving.py prev_chunk protocol)",
    )
    args = parser.parse_args()

    from open_pi_zero_tpu.config import PiZeroConfig
    from open_pi_zero_tpu.models import fuse, pizero

    import __graft_entry__ as graft

    cfg = PiZeroConfig()
    # round-3 production serving layout (same as entry()/EvalAgent
    # default): W8A8 VLM-trunk prefill + weight-only int8 action expert,
    # SigLIP bf16 (mid-band drift — DRIFT_BUDGET.json). Streaming build
    # keeps peak HBM ~6.5 GB.
    params = fuse.build_serving_params(
        jax.random.key(0), cfg, dtype=jnp.bfloat16,
        quantize_mixtures=() if args.w8a8_expert else ("action",),
        w8a8_mixtures=("vlm", "action") if args.w8a8_expert else ("vlm",),
        w8a8_siglip=False,
    )
    rng = jax.random.key(1)

    for b in args.batches:
        ids, img, am, prop = graft._example_batch(cfg, b=b)
        ids, am = jnp.asarray(ids), jnp.asarray(am)
        img = jnp.asarray(img, jnp.bfloat16)
        prop = jnp.asarray(prop, jnp.bfloat16)

        if args.refined > 0.0:
            # steady-state chain: call k's chunk is call k+1's warm-start, so
            # the chunk itself carries the data dependency that serializes
            # the chain (bench.py discipline — no block_until_ready on axon)
            def chained(params, rng, ids, img, am, prop, prev):
                return pizero.infer_action_refined(
                    params, cfg, rng, ids, img, am, prop, prev,
                    t_start=args.refined,
                )

            jfn = jax.jit(chained)
            prev = jax.jit(pizero.infer_action, static_argnums=1)(
                params, cfg, rng, ids, img, am, prop
            )
            out = jfn(params, rng, ids, img, am, prop, prev)
            _ = np.asarray(out[0, 0, 0])
            for _ in range(WARMUP):
                out = jfn(params, rng, ids, img, am, prop, out)
            _ = np.asarray(out[0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                out = jfn(params, rng, ids, img, am, prop, out)
            _ = np.asarray(out[0, 0, 0])
            x = None
        else:
            def chained(params, rng, ids, img, am, prop):
                out = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
                return prop + (0.0 * out.mean()).astype(prop.dtype), out

            jfn = jax.jit(chained)
            x, out = jfn(params, rng, ids, img, am, prop)
            _ = np.asarray(out[0, 0, 0])
            for _ in range(WARMUP):
                x, out = jfn(params, rng, ids, img, am, x)
            _ = np.asarray(out[0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                x, out = jfn(params, rng, ids, img, am, x)
            _ = np.asarray(out[0, 0, 0])
        ms = (time.perf_counter() - t0) * 1e3 / CHAIN
        print(
            json.dumps(
                {
                    "batch": b,
                    "ms_per_call": round(ms, 3),
                    "chunks_per_s": round(b * 1e3 / ms, 1),
                    "ms_per_chunk": round(ms / b, 3),
                    **({"refined_t": args.refined} if args.refined else {}),
                }
            ),
            flush=True,
        )
        del jfn, x, out
        gc.collect()


if __name__ == "__main__":
    main()
