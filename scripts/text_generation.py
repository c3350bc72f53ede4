#!/usr/bin/env python
"""PaliGemma text-generation smoke — parity check #1 (reference
`python -m src.model.vla.pizero --text_only --load_pretrained_weights`,
pizero.py:688-796 and README.md:38-40): caption a real image with
pretrained weights, greedy decoding.

Usage:
  python scripts/text_generation.py --pretrained ~/.cache/paligemma/paligemma-3b-pt-224 \
      --image /path/to/img.jpg --prompt "this image shows " --max_new_tokens 20 [--bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pretrained", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--prompt", default="this image shows ")
    parser.add_argument("--max_new_tokens", type=int, default=20)
    parser.add_argument("--bf16", action="store_true")
    # sampling (reference run_paligemma.py defaults: T=0.8, top_p=0.9)
    parser.add_argument("--do_sample", action="store_true")
    parser.add_argument("--temperature", type=float, default=0.8)
    parser.add_argument("--top_p", type=float, default=0.9)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from open_pi_zero_tpu.config import PiZeroConfig, dataclass_replace
    from open_pi_zero_tpu.models import convert, pizero
    from open_pi_zero_tpu.processing import PaliGemmaProcessor, load_paligemma_tokenizer

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = PiZeroConfig(use_lm_head=True)
    # text path needs the vlm final norm (reference pizero.py:712-714)
    mixtures = tuple(
        dataclass_replace(m, use_final_norm=True) if i == 0 else m
        for i, m in enumerate(cfg.joint.mixtures)
    )
    cfg = dataclass_replace(cfg, joint=dataclass_replace(cfg.joint, mixtures=mixtures))

    tensors = convert.load_safetensors_dir(os.path.expanduser(args.pretrained))
    params = convert.convert_paligemma(tensors, cfg)
    params = convert.to_dtype(params, dtype)

    tok = load_paligemma_tokenizer(os.path.expanduser(args.pretrained))
    proc = PaliGemmaProcessor(
        tok, num_image_tokens=cfg.siglip.num_image_tokens,
        image_size=cfg.siglip.image_size,
    )
    inputs = proc([args.prompt], [Image.open(args.image).convert("RGB")])

    sample_kw = (
        dict(
            rng=jax.random.key(args.seed),
            temperature=args.temperature,
            top_p=args.top_p,
        )
        if args.do_sample
        else {}
    )
    gen = jax.jit(
        lambda p, ids, pix: pizero.generate_text(
            p, cfg, ids, pix, max_new_tokens=args.max_new_tokens, **sample_kw
        )
    )
    ids = jnp.asarray(inputs["input_ids"])
    pix = jnp.asarray(inputs["pixel_values"], dtype)
    t0 = time.time()
    toks = gen(params, ids, pix)
    toks.block_until_ready()
    print(f"[compile+decode {time.time() - t0:.1f}s]")
    t0 = time.time()
    toks = jax.device_get(gen(params, ids, pix))
    print(f"[decode {time.time() - t0:.2f}s]")
    text = tok.decode([t for t in toks[0].tolist() if t not in (0, 1)])
    print("prompt:", args.prompt)
    print("generated:", text)


if __name__ == "__main__":
    main()
