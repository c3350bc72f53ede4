#!/usr/bin/env python
"""SimplerEnv installation smoke (TPU-repo equivalent of the reference's
scripts/tests/simpler.py:1-81): lists available tasks, runs one
random-policy episode, and prints the obs/action spaces — the boundary
the env adapters (open_pi_zero_tpu/agents/env_adapter.py) consume.

SimplerEnv / ManiSkill2 are external C++-backed simulators and are NOT
bundled with this framework (same as the reference); this script reports
a clear error when they are absent.

  python scripts/check_simpler.py [--task widowx_carrot_on_plate] [--steps 20]
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default="widowx_carrot_on_plate")
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()

    try:
        import simpler_env
        from simpler_env.utils.env.observation_utils import (
            get_image_from_maniskill2_obs_dict,
        )
    except ImportError as e:
        sys.exit(
            f"simpler_env is not installed ({e}).\n"
            "Install SimplerEnv + ManiSkill2 per its upstream instructions, "
            "then re-run. The rest of this framework (training, serving, "
            "adapters) does not depend on it."
        )

    print("available tasks:")
    for t in simpler_env.ENVIRONMENTS:
        print(" ", t)

    env = simpler_env.make(args.task)
    obs, reset_info = env.reset(seed=0)
    instruction = env.get_language_instruction()
    print(f"\ntask: {args.task!r}  instruction: {instruction!r}")
    print("reset info:", {k: type(v).__name__ for k, v in reset_info.items()})
    img = get_image_from_maniskill2_obs_dict(env, obs)
    print("image:", img.shape, img.dtype)
    print("action space:", env.action_space)

    done = truncated = False
    step = 0
    while not (done or truncated) and step < args.steps:
        action = env.action_space.sample()
        obs, reward, done, truncated, info = env.step(action)
        step += 1
    print(f"random policy ran {step} steps; success={info.get('success')}")


if __name__ == "__main__":
    main()
