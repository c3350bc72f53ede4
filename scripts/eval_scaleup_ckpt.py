"""Closed-loop eval of a demo_closed_loop checkpoint WITHOUT retraining.

Fallback harness for the scale-up study (round-3 verdict task 7): when a
long training run is cut short, any `ckpt_N/params` export (the EMA-blended
eval params `training/checkpoint.py:save_checkpoint` writes alongside the
state) can be evaluated through the exact same `run_eval` path
`scripts/demo_closed_loop.py` uses, so partial-budget results are
comparable to the full-run artifacts in E2E_CLOSED_LOOP.json.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/eval_scaleup_ckpt.py --workdir /tmp/opz_scaleup \
      --ckpt ckpt_1200 --hidden 256 --layers 6 --heads 8 --kv-heads 1 \
      --head-dim 32 --n-eval-episodes 40 [--control]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from demo_closed_loop import model_geometry, run_eval

from open_pi_zero_tpu.envs import warm_tokenizer
from open_pi_zero_tpu.processing import FakeTokenizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/opz_scaleup")
    ap.add_argument("--ckpt", required=True, help="ckpt_N dir name under workdir/train/checkpoint")
    ap.add_argument("--task", default="reach",
                    choices=["reach", "pick_place", "drawer"])
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=1)
    # same default as demo_closed_loop.py (0 -> max(16, hidden//4)) so
    # geometry defaults stay in sync between train and eval scripts; the
    # scale-up recipe passes --head-dim 32 explicitly
    ap.add_argument("--head-dim", type=int, default=0)
    ap.add_argument("--proprio-dim", type=int, default=0,
                    help="0 = infer from task family (8 for drawer/fractal, "
                         "7 for bridge); pass 8 explicitly for a bridge task "
                         "inside a cross-family checkpoint")
    ap.add_argument("--drawer-target", default=None,
                    choices=["top", "middle", "bottom"])
    ap.add_argument("--n-eval-episodes", type=int, default=40)
    ap.add_argument("--eval-seed", type=int, default=1000)
    ap.add_argument("--control", action="store_true",
                    help="also run the random-init control eval")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    from ml_collections import ConfigDict

    from open_pi_zero_tpu.config import pizero_config_from_dict
    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.training import checkpoint as ckpt_lib

    # mirror demo_closed_loop.py's per-task selection (round-4 ADVICE.md):
    # fractal-family tasks use 8-dim POS_QUAT proprio + the EDR
    # sticky-gripper adapter; bridge tasks inside a cross-family checkpoint
    # pad 7-dim proprio to the model's 8 (pass --proprio-dim 8 for those)
    proprio_dim = args.proprio_dim or (8 if args.task == "drawer" else 7)
    geometry = model_geometry(args.hidden, args.layers,
                              proprio_dim=proprio_dim,
                              heads=args.heads, kv_heads=args.kv_heads,
                              head_dim=args.head_dim)
    cfg = pizero_config_from_dict(ConfigDict(geometry))
    abstract = jax.eval_shape(lambda k: pizero.init_params(k, cfg), jax.random.key(0))
    ckpt_path = os.path.join(args.workdir, "train", "checkpoint", args.ckpt)
    params = ckpt_lib.restore_params(ckpt_path, abstract)
    # per-task statistics: demo_closed_loop writes statistics.json for the
    # mix's first dataset and statistics_<task>.json for the rest
    stats_path = os.path.join(args.workdir, f"statistics_{args.task}.json")
    if not os.path.exists(stats_path):
        stats_path = os.path.join(args.workdir, "statistics.json")
    adapter_name = "edr" if args.task == "drawer" else "bridge"
    pad_to = args.proprio_dim if (args.proprio_dim and args.task != "drawer"
                                  and args.proprio_dim != 7) else None
    env_task = (f"drawer_{args.drawer_target}"
                if args.task == "drawer" and args.drawer_target else None)

    def fresh_tokenizer():
        tok = FakeTokenizer(image_token_id=500)
        warm_tokenizer(tok)
        return tok

    result = {"ckpt": args.ckpt, "task": args.task,
              "n_eval_episodes": args.n_eval_episodes}
    result["trained"] = run_eval(
        geometry, params, stats_path, fresh_tokenizer(),
        args.n_eval_episodes, args.eval_seed, task=args.task,
        adapter_name=adapter_name, pad_proprio_to=pad_to, env_task=env_task)
    print("trained:", result["trained"])
    if args.control:
        rand = pizero.init_params(jax.random.key(123), cfg)
        result["control"] = run_eval(
            geometry, rand, stats_path, fresh_tokenizer(),
            args.n_eval_episodes, args.eval_seed, task=args.task,
            adapter_name=adapter_name, pad_proprio_to=pad_to, env_task=env_task)
        print("control:", result["control"])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
