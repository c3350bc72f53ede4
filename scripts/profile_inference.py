#!/usr/bin/env python
"""Capture a jax.profiler trace of the serving path (SURVEY.md §5: the
reference only has wall-clock decorators; on TPU a real trace shows the
per-op timeline in TensorBoard/xprof).

Usage:
  python scripts/profile_inference.py --out /tmp/opz_trace [--steps 5] [--fp32]
  tensorboard --logdir /tmp/opz_trace
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/opz_trace")
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--no_fuse", action="store_true",
                        help="profile the canonical (unfused) layout")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from open_pi_zero_tpu.config import PiZeroConfig
    from open_pi_zero_tpu.models import fuse, pizero
    from open_pi_zero_tpu.utils.monitor import annotate, profile_trace

    import __graft_entry__ as graft

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    cfg = PiZeroConfig()
    params = pizero.init_params(jax.random.key(0), cfg, dtype=dtype)
    if not args.no_fuse:
        params = fuse.fuse_for_serving(params)

    # same input construction and arg-passing shape as the serving entry
    # (closed-over arrays would be baked into the executable as constants
    # and could be folded — tracing a different program than production)
    ids, img, am, prop = graft._example_batch(cfg)
    ids, am = jnp.asarray(ids), jnp.asarray(am)
    img, prop = jnp.asarray(img, dtype), jnp.asarray(prop, dtype)

    f = jax.jit(
        lambda p, r, ids, img, am, prop: pizero.infer_action(
            p, cfg, r, ids, img, am, prop
        )
    )
    out = f(params, jax.random.key(0), ids, img, am, prop)
    jax.block_until_ready(out)  # compile outside trace

    with profile_trace(args.out):
        for i in range(args.steps):
            with annotate(f"infer_action_{i}"):
                out = f(params, jax.random.key(i), ids, img, am, prop)
        jax.block_until_ready(out)
    print(f"trace written to {args.out} — view with tensorboard/xprof")


if __name__ == "__main__":
    main()
