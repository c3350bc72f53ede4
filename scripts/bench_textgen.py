#!/usr/bin/env python
"""Text-generation latency: PaliGemma-style greedy decoding through the
shared trunk (prefill 260 prompt tokens + N new tokens, static cache —
reference pizero.py:559-593,770-791; the reference publishes no number
for this path).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_textgen.py
Prints one JSON line (chain-timed like bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = 10
WARMUP = 5
MAX_NEW = 20


def main():
    from open_pi_zero_tpu.config import PiZeroConfig, dataclass_replace
    from open_pi_zero_tpu.models import fuse, pizero

    layout = sys.argv[1] if len(sys.argv) > 1 else "bf16"  # bf16|int8
    cfg = dataclass_replace(PiZeroConfig(), max_decode_tokens=MAX_NEW)
    params = pizero.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    if layout == "int8":
        # decode streams the whole vlm trunk per token -> weight-only int8
        # halves the bytes (embed/lm_head stays bf16: tied + used as a
        # gather table)
        params = fuse.prepare_for_serving(params, quantize_mixtures=("vlm",))

    n_img = cfg.siglip.num_image_tokens
    ids = np.full((1, n_img + 4), 100, np.int32)
    ids[:, :n_img] = cfg.image_token_index
    ids[:, n_img] = 2  # <bos>
    ids = jnp.asarray(ids)
    img = jnp.zeros((1, cfg.siglip.image_size, cfg.siglip.image_size, 3), jnp.bfloat16)

    # eos_token_id=-1: never emitted, so every call decodes all MAX_NEW
    # tokens (random weights would otherwise stop at arbitrary points)
    def chained(params, ids_, img_):
        toks = pizero.generate_text(params, cfg, ids_, img_, eos_token_id=-1)
        return img_ + (0.0 * toks.sum()).astype(img_.dtype), toks

    jfn = jax.jit(chained)
    x, toks = jfn(params, ids, img)
    _ = np.asarray(toks[0, 0])
    for _ in range(WARMUP):
        x, toks = jfn(params, ids, x)
    _ = np.asarray(toks[0, 0])
    t0 = time.perf_counter()
    for _ in range(CHAIN):
        x, toks = jfn(params, ids, x)
    _ = np.asarray(toks[0, 0])
    total_ms = (time.perf_counter() - t0) * 1e3 / CHAIN

    print(
        json.dumps(
            {
                "metric": "text_generation_latency",
                "layout": layout,
                "value": round(total_ms, 3),
                "unit": "ms",
                "prompt_tokens": int(ids.shape[1]),
                "new_tokens": MAX_NEW,
                "ms_per_token": round(total_ms / MAX_NEW, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
