#!/usr/bin/env python
"""Report the at-rest parameter memory of every serving tier at bridge
scale — computed from abstract shapes (jax.eval_shape), no device or
weights needed.

  python scripts/model_memory.py [--tiny]

The reference's figures for comparison: 13.6 GB fp32 / 6.7 GB bf16 peak
inference VRAM on the 4090 (reference README.md:76-79); the bnb 4-bit
tier exists precisely to fit consumer GPUs (reference lora.py:214-360).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from open_pi_zero_tpu.config import PiZeroConfig, tiny_pizero_config
    from open_pi_zero_tpu.models import fuse, pizero

    cfg = tiny_pizero_config() if args.tiny else PiZeroConfig()

    def tree_bytes(tree) -> int:
        return sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
        )

    tiers = {
        "bf16 fused": dict(),
        "int8 expert (latency default)": dict(quantize_mixtures=("action",)),
        "int8 expert + W8A8 prefill (production)": dict(
            quantize_mixtures=("action",), w8a8_mixtures=("vlm",), w8a8_siglip=True
        ),
        "int8 whole trunk + W8A8": dict(
            quantize_mixtures=("vlm", "action"),
            w8a8_mixtures=(),
            w8a8_siglip=True,
        ),
        "NF4 whole trunk (memory tier)": dict(
            quantize_mixtures=("vlm", "action"), bits=4
        ),
    }

    def build(kwargs):
        params = pizero.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
        return fuse.prepare_for_serving(params, **kwargs)

    for name, kwargs in tiers.items():
        shapes = jax.eval_shape(lambda: build(kwargs))
        b = tree_bytes(shapes)
        if b >= 0.1 * 2**30:
            print(f"{name:42s} {b / 2**30:8.2f} GiB")
        else:
            print(f"{name:42s} {b / 2**20:8.2f} MiB")


if __name__ == "__main__":
    main()
