#!/usr/bin/env python
"""Launcher (reference scripts/run.py, hydra): loads a YAML experiment
config with `${...}` interpolation + key=value CLI overrides, initializes
multi-host JAX when requested, and dispatches to TrainAgent / EvalAgent.

Usage:
  python scripts/run.py --config configs/train/bridge.yaml [key=value ...]
  python scripts/run.py --config configs/eval/bridge.yaml checkpoint_path=...
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="YAML experiment config")
    parser.add_argument(
        "--mode", choices=["train", "eval"], default=None,
        help="override auto-detection (eval if the config has an env block, else train)",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="call jax.distributed.initialize() (multi-host TPU pods; "
        "replaces the reference's torchrun/NCCL init, scripts/run.py:41-47)",
    )
    parser.add_argument("overrides", nargs="*", help="key=value config overrides")
    args = parser.parse_args()

    if args.distributed:
        import jax

        jax.distributed.initialize()

    from open_pi_zero_tpu.config import load_config

    cfg = load_config(args.config, args.overrides)

    logging.basicConfig(
        level=logging.DEBUG if cfg.get("debug") else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    log = logging.getLogger("run")

    mode = args.mode or cfg.get("mode")
    if mode is None:
        mode = "eval" if cfg.get("env") is not None else "train"
    log.info("mode=%s config=%s", mode, args.config)

    if mode == "train":
        from open_pi_zero_tpu.agents.train import TrainAgent

        agent = TrainAgent(cfg)
        agent.run()
    else:
        from open_pi_zero_tpu.agents.eval import EvalAgent

        agent = EvalAgent(cfg)
        result = agent.run()
        log.info("result: %s", result)


if __name__ == "__main__":
    main()
