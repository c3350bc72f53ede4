#!/usr/bin/env python
"""Flow-integrator latency/accuracy sweep (the Euler-step speed knob).

The reference integrates the action flow with 10 fixed Euler steps
(reference pizero.py:416-490, config num_inference_steps=10) — the Euler
loop streams the action expert's weights 10x per chunk, so step count is
a first-order latency lever. This sweep measures, in the PRODUCTION
serving layout (W8A8 VLM prefill + int8 expert, SigLIP bf16):

  euler_10      the parity default (what bench.py reports)
  euler_5/3     fewer 1st-order steps
  midpoint_5/3  2nd-order midpoint (2 expert evals/step, O(h^2)):
                midpoint_5 costs ~euler_10 but integrates far closer to
                the continuous flow; midpoint_3 is the speed tier

Per variant: chain latency (bench.py discipline, medians of REPEATS
chains) + two drifts with fixed rng/noise:
  drift_vs_euler10   deviation from the parity-default policy output
  err_vs_fine        integration error vs a 64-step Euler reference
                     (rolled scan — compile-size bound, latency untimed)

Run on the real chip (detached — several full-unroll compiles):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_flow_steps.py

Prints one JSON line per variant (captured into BENCH_FLOW_STEPS.json).
"""

from __future__ import annotations

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
REPEATS = 5


def main():
    from open_pi_zero_tpu.config import PiZeroConfig, dataclass_replace
    from open_pi_zero_tpu.models import fuse, pizero

    import __graft_entry__ as graft

    cfg = PiZeroConfig()
    ids, img, am, prop = graft._example_batch(cfg)
    ids, am = jnp.asarray(ids), jnp.asarray(am)
    img, prop = jnp.asarray(img, jnp.bfloat16), jnp.asarray(prop, jnp.bfloat16)
    rng = jax.random.key(1)
    noise = jax.random.normal(
        jax.random.key(7), (1, cfg.horizon_steps, cfg.action_dim), jnp.bfloat16
    )

    # ONE param build (streaming), shared by every variant — the layout is
    # fixed to the production default; only the integrator/steps vary.
    params = fuse.build_serving_params(
        jax.random.key(0), cfg, jnp.bfloat16,
        quantize_mixtures=("action",), w8a8_mixtures=("vlm",),
    )

    def chunk_and_times(vcfg, timed=True):
        def chained(params, rng, ids, img, am, prop, noise):
            out = pizero.infer_action(
                params, vcfg, rng, ids, img, am, prop, action0=noise
            )
            return prop + (0.0 * out.mean()).astype(prop.dtype), out

        jfn = jax.jit(chained)
        x, out = jfn(params, rng, ids, img, am, prop, noise)
        chunk = np.asarray(out, np.float32)
        if not timed:
            del jfn
            gc.collect()
            return chunk, None
        for _ in range(WARMUP):
            x, out = jfn(params, rng, ids, img, am, x, noise)
        _ = np.asarray(out[0, 0, 0])
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                x, out = jfn(params, rng, ids, img, am, x, noise)
            _ = np.asarray(out[0, 0, 0])
            times.append((time.perf_counter() - t0) * 1e3 / CHAIN)
        del jfn
        gc.collect()
        return chunk, times

    # fine-step reference: rolled scan (euler_unroll=1) keeps the 64-step
    # graph compilable; its latency is irrelevant
    fine, _ = chunk_and_times(
        dataclass_replace(cfg, num_inference_steps=64, euler_unroll=1),
        timed=False,
    )

    variants = {
        "euler_10": dict(num_inference_steps=10),
        "euler_5": dict(num_inference_steps=5),
        "euler_3": dict(num_inference_steps=3),
        "midpoint_5": dict(num_inference_steps=5, flow_integrator="midpoint"),
        "midpoint_3": dict(num_inference_steps=3, flow_integrator="midpoint"),
    }
    only = sys.argv[1:]  # optional subset: bench_flow_steps.py name...
    base_chunk = None
    for name, kw in variants.items():
        if only and name not in only and name != "euler_10":
            continue
        chunk, times = chunk_and_times(dataclass_replace(cfg, **kw))
        if base_chunk is None:
            base_chunk = chunk
        row = {
            "variant": name,
            "ms_median": round(float(np.median(times)), 3),
            "ms_min": round(float(np.min(times)), 3),
            "ms_max": round(float(np.max(times)), 3),
            "n": len(times),
            "drift_vs_euler10": float(np.mean(np.abs(chunk - base_chunk))),
            "err_vs_fine": float(np.mean(np.abs(chunk - fine))),
        }
        print(json.dumps(row), flush=True)

    # training-free refinement tier (pizero.infer_action_refined): each call
    # warm-starts from the PREVIOUS chunk re-noised to t=0.5 and integrates
    # [0.5, 1] — 5 velocity evals instead of 10. The chain itself is the
    # steady-state control loop (chunk k refined from chunk k-1), so the
    # chained latency is exactly what an episode's non-first steps pay.
    if not only or "refined_t05" in only:
        def chained_refined(params, rng, ids, img, am, prop, prev):
            out = pizero.infer_action_refined(
                params, cfg, rng, ids, img, am, prop, prev, t_start=0.5
            )
            return prop + (0.0 * out.mean()).astype(prop.dtype), out

        jfn = jax.jit(chained_refined)
        prev = jnp.asarray(base_chunk, jnp.bfloat16)
        x, out = jfn(params, rng, ids, img, am, prop, prev)
        refined_once = np.asarray(out, np.float32)  # refined FROM euler_10
        for _ in range(WARMUP):
            x, out = jfn(params, rng, ids, img, am, x, out)
        _ = np.asarray(out[0, 0, 0])
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                x, out = jfn(params, rng, ids, img, am, x, out)
            _ = np.asarray(out[0, 0, 0])
            times.append((time.perf_counter() - t0) * 1e3 / CHAIN)
        print(json.dumps({
            "variant": "refined_t05",
            "ms_median": round(float(np.median(times)), 3),
            "ms_min": round(float(np.min(times)), 3),
            "ms_max": round(float(np.max(times)), 3),
            "n": len(times),
            "drift_vs_euler10": float(np.mean(np.abs(refined_once - base_chunk))),
            "err_vs_fine": float(np.mean(np.abs(refined_once - fine))),
        }), flush=True)


if __name__ == "__main__":
    main()
