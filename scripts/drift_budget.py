#!/usr/bin/env python
"""W8A8/int8 serving-drift error budget at bridge scale (real TPU).

Answers two questions the round-2 verdict raised about the production
serving layout (int8 action expert + W8A8 VLM/SigLIP prefill, chunk drift
2.4-2.5e-3 L1 vs bf16 — the top edge of the reference's 5e-4–2.5e-3
cache-drift band, reference README.md:116):

  1. attribution — which tower/matmul family contributes how much drift
     (one quantized subsystem at a time vs the bf16-fused oracle);
  2. candidates — do MSE-optimal weight scales (quantize_int8_rowwise
     mse_scale) and/or keeping the vlm `down` projection bf16 pull the
     production layout to mid-band, and at what latency.

Per variant it reports mean-L1 drift over --seeds input seeds AND a
bench.py-style chained latency (20 data-dependent calls, one host read),
so drift/latency trade-offs are decided from one artifact.

Writes one JSON object per variant to --out (default DRIFT_BUDGET.json).
Run detached: ~6 distinct program structures to compile over the tunnel.
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


def _inputs(cfg, seed):
    rng = np.random.default_rng(seed)
    ids = np.zeros((1, cfg.max_image_text_tokens), np.int32)
    ids[:, : cfg.siglip.num_image_tokens] = cfg.image_token_index
    ids[:, cfg.siglip.num_image_tokens] = 2
    ids[:, cfg.siglip.num_image_tokens + 1 : cfg.siglip.num_image_tokens + 8] = 100
    am = (ids != cfg.pad_token_id).astype(np.int32)
    img = rng.normal(size=(1, cfg.siglip.image_size, cfg.siglip.image_size, 3))
    prop = rng.normal(size=(1, cfg.cond_steps, cfg.proprio_dim))
    x0 = rng.normal(size=(1, cfg.horizon_steps, cfg.action_dim))
    return (
        jnp.asarray(ids),
        jnp.asarray(img, jnp.bfloat16),
        jnp.asarray(am),
        jnp.asarray(prop, jnp.bfloat16),
        jnp.asarray(x0, jnp.float32),
    )


def _variant(base, lora_lib, *, action_keys=None, vlm_keys=None, siglip=False,
             mse=False):
    """Quantize a subset of the ALREADY-FUSED bf16 tree. Unquantized leaves
    alias the base tree's buffers (no copy)."""
    p = dict(base)
    joint = dict(p["joint"])
    mixtures = dict(joint["mixtures"])
    if action_keys:
        mixtures["action"] = lora_lib.quantize_base_weights(
            mixtures["action"], keys=action_keys, bits=8, mse_scale=mse
        )
    if vlm_keys:
        mixtures["vlm"] = lora_lib.quantize_base_weights(
            mixtures["vlm"], keys=vlm_keys, w8a8=True, mse_scale=mse
        )
    joint["mixtures"] = mixtures
    p["joint"] = joint
    if siglip:
        sig = dict(p["siglip"])
        sig["layers"] = lora_lib.quantize_base_weights(
            sig["layers"], keys=("kernel",), w8a8=True, mse_scale=mse
        )
        p["siglip"] = sig
    return p


def _chain_latency_ms(jfn, params, rng, ids, img, am, prop, x0, n=20):
    """bench.py-style: serialize n calls with a data dependency, one host
    read, subtract the separately measured read overhead."""

    @jax.jit
    def tiny(x):
        return x + 1.0

    z = jnp.zeros((), jnp.float32)
    float(tiny(z))
    reads = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tiny(z))
        reads.append((time.perf_counter() - t0) * 1e3)
    overhead = float(np.median(reads))

    p = prop
    for _ in range(5):  # warmup (fresh-process first calls run 2-3x slow)
        p, out = jfn(params, rng, ids, img, am, p, x0)
    _ = np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        p, out = jfn(params, rng, ids, img, am, p, x0)
    _ = np.asarray(out[0, 0, 0])
    return ((time.perf_counter() - t0) * 1e3 - overhead) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", default="DRIFT_BUDGET.json")
    ap.add_argument("--skip-latency", action="store_true")
    args = ap.parse_args()

    from open_pi_zero_tpu.config import PiZeroConfig
    from open_pi_zero_tpu.models import fuse, pizero
    from open_pi_zero_tpu.ops import lora as lora_lib

    cfg = PiZeroConfig()
    print("building bf16 fused base (streaming)...", flush=True)
    base = fuse.build_serving_params(jax.random.key(0), cfg, jnp.bfloat16)

    def serve(p, rng, ids, img, am, prop, x0):
        out = pizero.infer_action(p, cfg, rng, ids, img, am, prop, action0=x0)
        # chained carry like bench.py so latency timing can't pipeline
        return prop + (0.0 * out.mean()).astype(prop.dtype), out

    rng = jax.random.key(1)
    inputs = [_inputs(cfg, s) for s in range(args.seeds)]

    jfn = jax.jit(serve)
    print("compiling bf16 oracle...", flush=True)
    oracle = []
    for ids, img, am, prop, x0 in inputs:
        _, out = jfn(base, rng, ids, img, am, prop, x0)
        oracle.append(np.asarray(out, np.float32))
    lat_bf16 = (
        None if args.skip_latency
        else _chain_latency_ms(jfn, base, rng, *inputs[0])
    )

    FULL = ("qkv", "o", "gateup", "down")
    NO_DOWN = ("qkv", "o", "gateup")
    variants = {
        # ---- attribution: one subsystem at a time
        "expert_int8": dict(action_keys=FULL),
        "expert_int8_mse": dict(action_keys=FULL, mse=True),
        "expert_int8_no_down": dict(action_keys=NO_DOWN),
        "w8a8_vlm": dict(vlm_keys=FULL),
        "w8a8_vlm_mse": dict(vlm_keys=FULL, mse=True),
        "w8a8_vlm_no_down": dict(vlm_keys=NO_DOWN),
        "w8a8_siglip": dict(siglip=True),
        # ---- candidates: full production layouts
        "production": dict(action_keys=FULL, vlm_keys=FULL, siglip=True),
        "production_no_vlm_down": dict(
            action_keys=FULL, vlm_keys=NO_DOWN, siglip=True
        ),
        "production_no_down": dict(
            action_keys=NO_DOWN, vlm_keys=NO_DOWN, siglip=True
        ),
    }

    results = []
    for name, kw in variants.items():
        print(f"variant {name}...", flush=True)
        p = _variant(base, lora_lib, **kw)
        drifts = []
        t_compile = time.time()
        for (ids, img, am, prop, x0), want in zip(inputs, oracle):
            _, out = jfn(p, rng, ids, img, am, prop, x0)
            drifts.append(float(np.mean(np.abs(np.asarray(out, np.float32) - want))))
        rec = {
            "variant": name,
            "drift_l1_per_seed": [round(d, 6) for d in drifts],
            "drift_l1_mean": round(float(np.mean(drifts)), 6),
            "compile_plus_exec_s": round(time.time() - t_compile, 1),
        }
        if not args.skip_latency:
            rec["latency_ms"] = round(
                _chain_latency_ms(jfn, p, rng, *inputs[0]), 3
            )
        results.append(rec)
        print("  ", json.dumps(rec), flush=True)
        del p
        gc.collect()

    payload = {
        "note": "drift = mean L1 vs bf16-fused chunk, random-init bridge "
                "geometry; reference cache-drift band 5e-4..2.5e-3 "
                "(reference README.md:116). latency = bench.py-style "
                "20-call chain, 1 run.",
        "bf16_latency_ms": None if lat_bf16 is None else round(lat_bf16, 3),
        "seeds": args.seeds,
        "variants": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
