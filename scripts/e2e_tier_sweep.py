"""Closed-loop success rate of every serving tier on a trained policy.

Round-2 verdict's open risk: "without real checkpoints, no one knows
whether edge-of-band drift preserves Simpler success". SimplerLite gives
us a trained policy + closed loop, so measure it directly: each serving
tier (bf16 fusion, int8 weight-only expert, W8A8 trunk, full W8A8, NF4,
midpoint integrator, refined warm-start) is applied to the SAME trained
checkpoint through EvalAgent._load_params (the production path) and
scored on the SAME 40 held-out episode layouts.

Caveat (documented in the artifact): a 1.4M-param policy at 56x56 is not
the 3B model — per-tier drift magnitudes differ — but tier-vs-baseline
success deltas on a real closed loop are exactly the evidence class the
reference uses for its own bf16-vs-fp32 tables (README.md:90-114).

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo python scripts/e2e_tier_sweep.py \
      --checkpoint /tmp/opz_big/train/checkpoint/ckpt_8000 \
      --stats /tmp/opz_big/statistics.json --out E2E_TIER_SUCCESS.json
"""

from __future__ import annotations

import argparse
import json
import os

TIERS = {
    # label -> config overrides on top of configs/eval/simpler_lite.yaml
    "fp32_fused": ["quantize=false"],
    "bf16_fused": ["quantize=false", "use_bf16=true"],
    "int8_expert": ["quantize=true", "w8a8=false"],
    "w8a8_default": ["quantize=true", "w8a8=true"],  # production default tier
    "w8a8_full": ["quantize=true", "w8a8=true", "w8a8_siglip=true"],
    "nf4_expert": ["quantize=true", "quantize_bits=4", "w8a8=false"],
    "midpoint3": ["quantize=false", "flow_integrator=midpoint",
                  "num_inference_steps=3"],
    "refined_t05": ["quantize=false", "refine_from_prev=0.5"],
    # control-sensitivity ablations (not serving tiers): how success
    # depends on re-planning frequency and flow integration depth
    "act_steps2": ["quantize=false", "act_steps=2"],
    "act_steps1": ["quantize=false", "act_steps=1"],
    "euler5": ["quantize=false", "num_inference_steps=5"],
    "euler3": ["quantize=false", "num_inference_steps=3"],
    "euler1": ["quantize=false", "num_inference_steps=1"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--stats", required=True)
    ap.add_argument("--n-episodes", type=int, default=40)
    ap.add_argument("--task", default="simpler_lite_reach",
                    help="env.task override — must match the checkpoint's task")
    ap.add_argument("--config", default="configs/eval/simpler_lite.yaml",
                    help="base eval config (use simpler_lite_drawer.yaml for "
                         "the fractal-family drawer task: EDR adapter, "
                         "proprio_dim 8)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--tiers", default=None, help="comma list; default all")
    args = ap.parse_args()

    from open_pi_zero_tpu.agents.eval import EvalAgent
    from open_pi_zero_tpu.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    names = args.tiers.split(",") if args.tiers else list(TIERS)
    for name in names:
        cfg = load_config(
            os.path.join(repo, args.config),
            overrides=[
                f"checkpoint_path={args.checkpoint}",
                f"env.adapter.dataset_statistics_path={args.stats}",
                f"n_eval_episode={args.n_episodes}",
                f"env.task={args.task}",
                *TIERS[name],
            ],
        )
        agent = EvalAgent(cfg)
        out = agent.run()
        results[name] = {
            "success_rate": out["success_rate"],
            "n_episodes": out["n_episodes"],
            "overrides": TIERS[name],
        }
        print(name, out["success_rate"], flush=True)

    payload = {
        "checkpoint": args.checkpoint,
        "task": args.task,
        "note": (
            "closed-loop success per serving tier, same trained SimplerLite "
            "policy, same held-out layouts; tiny-model CPU numbers — tier "
            "deltas, not absolute 3B drift, are the evidence"
        ),
        "tiers": results,
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
