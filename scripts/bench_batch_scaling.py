#!/usr/bin/env python
"""Train-step batch-scaling curve on the real chip (round-4 verdict
task 6): the measured 31.6% MFU at batch 8 sits AT the M~256 matmul
ceiling — this sweep measures whether larger per-chip batch (larger M)
lifts achieved TFLOPs toward the ~159 TFLOP M=2048 peak, and recomputes
the v5e-chips-for-reference-parity estimate from the best measured
point (reference train.py:134-139: global batch 1024 is the recipe).

Updates BENCH_TRAIN_ROOFLINE.json in place: adds `qlora_batch_sweep`,
`fullft_batch_sweep` (depth 4), and `parity_from_best_point`.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_batch_scaling.py
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.bench_train_roofline import (
    PEAK_BF16_TFLOPS,
    bench_recipe,
    bench_recipe_split,
    fullft_cfg,
    qlora_cfg,
    train_flops_per_sample,
)


def sweep(cfg, tcfg, batches, steps, trainable, label):
    import jax
    import jax.numpy as jnp

    from open_pi_zero_tpu.models import pizero

    abstract = jax.eval_shape(
        lambda: pizero.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    )
    flops = train_flops_per_sample(abstract, cfg, trainable)
    out = {}
    for b in batches:
        print(f"[{label}] batch {b} ...", flush=True)
        r = None
        try:
            r = bench_recipe(cfg, tcfg, b, steps, jnp.bfloat16)
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {str(e)[:200]}"
            if "remote_compile" in err:
                # the int8-Adam compiler wall (probe_depth5.py) also
                # triggers at larger batch: retry via the split step
                gc.collect()
                print(f"[{label}] batch {b}: fused compile crashed, "
                      "retrying via split step", flush=True)
                try:
                    r = bench_recipe_split(cfg, tcfg, b, steps, jnp.bfloat16)
                except Exception as e2:  # noqa: BLE001 — OOM is data
                    out[b] = {"fits": False, "fused_error": err,
                              "error": f"{type(e2).__name__}: {str(e2)[:200]}"}
            else:
                out[b] = {"fits": False, "error": err}
        if r is not None:
            per_step = flops["total"] * b
            tflops = per_step / (r["ms_per_step_chained"] / 1e3) / 1e12
            out[b] = {
                "ms_per_step_chained": r["ms_per_step_chained"],
                "frames_per_s_per_chip": r["frames_per_s_per_chip"],
                "compile_s": r["compile_s"],
                "achieved_tflops": round(tflops, 1),
                "mfu_vs_peak_197": round(tflops / PEAK_BF16_TFLOPS, 3),
                **({"step": "split"} if r.get("step") == "split" else {}),
            }
        print(json.dumps(out[b], indent=1), flush=True)
        gc.collect()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qlora-batches", type=int, nargs="+",
                    default=[16, 32, 64])
    ap.add_argument("--fullft-batches", type=int, nargs="+",
                    default=[8, 16, 32])
    ap.add_argument("--fullft-depth", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="BENCH_TRAIN_ROOFLINE.json")
    args = ap.parse_args()

    with open(args.out) as f:
        results = json.load(f)

    # QLoRA recipe at growing per-chip batch (batch 8 already measured in
    # the base artifact)
    cfg, tcfg = qlora_cfg()
    trainable = {"siglip": False, "projector": False, "vlm": False,
                 "proprio": True, "action": True, "encoders": True}
    qs = sweep(cfg, tcfg, args.qlora_batches, args.steps, trainable, "qlora")
    for k, v in results.get("qlora_batch_sweep", {}).items():
        qs.setdefault(int(k), v)
    if "qlora" in results:
        qs[results["qlora"]["batch"]] = {
            k: results["qlora"][k]
            for k in ("ms_per_step_chained", "frames_per_s_per_chip",
                      "compile_s", "achieved_tflops", "mfu_vs_peak_197")
        }
    results["qlora_batch_sweep"] = {str(k): qs[k] for k in sorted(qs)}

    # full-FT (all trainable) at depth 4
    cfg, tcfg = fullft_cfg(args.fullft_depth)
    trainable_all = {k: True for k in trainable}
    fs = sweep(cfg, tcfg, args.fullft_batches, args.steps, trainable_all,
               f"fullft-d{args.fullft_depth}")
    for k, v in (results.get("fullft_batch_sweep", {})
                 .get("batches", {}).items()):
        fs.setdefault(int(k), v)
    base = results.get("fullft", {}).get("depths", {}).get(
        str(args.fullft_depth)
    )
    results["fullft_batch_sweep"] = {
        "depth": args.fullft_depth,
        "batches": {str(k): fs[k] for k in sorted(fs)},
        "note": "base artifact's batch-4 row: "
                + json.dumps(base or {}),
    }

    # parity recompute from the best measured full-FT throughput point:
    # scale the 18L projection's per-frame cost by the measured
    # (frames/s at best batch) / (frames/s at batch 4, depth 4)
    good = {b: v for b, v in fs.items() if "frames_per_s_per_chip" in v}
    if good and base and base.get("fits"):
        best_b = max(good, key=lambda b: good[b]["frames_per_s_per_chip"])
        speedup = (good[best_b]["frames_per_s_per_chip"]
                   / base["frames_per_s_per_chip"])
        proj = results.get("projection", {})
        fps18_b4 = proj.get("projected_frames_per_s_per_chip")
        if fps18_b4:
            fps18_best = fps18_b4 * speedup
            chips = proj.get("min_chips_zero1_static", 8)
            # reference walltime: 1024-batch update in ~1.4 s on 128 H100s
            # is not published; parity target = frames/s of the reference
            # stack (BASELINE.md) — keep the measured-speedup framing
            results["parity_from_best_point"] = {
                "fullft_best_batch": best_b,
                "measured_speedup_vs_batch4": round(speedup, 2),
                "projected_frames_per_s_per_chip_18L_best_batch":
                    round(fps18_best, 2),
                "chips_for_global_batch_1024_one_step":
                    int(np.ceil(1024 / (best_b * 1))),
                "min_chips_zero1_static": chips,
                "note": "18L per-chip frames/s scaled by the measured "
                        "batch-sweep speedup at depth 4; ZeRO-1 static "
                        "floor unchanged",
            }

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"updated {args.out}")


if __name__ == "__main__":
    main()
