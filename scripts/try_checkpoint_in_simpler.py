#!/usr/bin/env python
"""Quick single-episode Simpler smoke with latency measurement
(reference scripts/try_checkpoint_in_simpler.py: runs one task, prints
per-chunk inference latency excluding the compile-warmup first step,
:111-115,145).

Usage:
  python scripts/try_checkpoint_in_simpler.py --task widowx_carrot_on_plate \
      --checkpoint /path/to/ckpt --config configs/eval/bridge.yaml
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/eval/bridge.yaml")
    parser.add_argument("--task", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--n_episodes", type=int, default=1)
    parser.add_argument("--use_bf16", action="store_true")
    parser.add_argument("--record_video", action="store_true")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    from open_pi_zero_tpu.agents.eval import EvalAgent
    from open_pi_zero_tpu.config import load_config

    overrides = [f"n_eval_episode={args.n_episodes}"]
    if args.task:
        overrides.append(f"env.task={args.task}")
    if args.checkpoint:
        overrides.append(f"checkpoint_path={args.checkpoint}")
    if args.use_bf16:
        overrides.append("use_bf16=true")
    overrides.append(f"record_video={'true' if args.record_video else 'false'}")

    cfg = load_config(args.config, overrides)
    agent = EvalAgent(cfg)
    result = agent.run()
    print(result)
    if result["mean_inference_time_s"] is not None:
        print(f"mean inference latency: {result['mean_inference_time_s'] * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
