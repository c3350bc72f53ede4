#!/usr/bin/env python
"""Download the PaliGemma base checkpoint + tokenizer this framework
loads from (TPU-repo equivalent of the reference's scripts/download.py,
which pulls google/paligemma-3b-mix-224 via transformers).

The converters (open_pi_zero_tpu/models/convert.py) read a local HF
checkout: `*.safetensors` + `config.json` + tokenizer files. This script
snapshots it once; pass --mix for the mix-224 variant used by the
text-generation smoke, default is the pt-224 pretraining base the VLA
trains from (reference config/train/bridge.yaml).

  python scripts/download_paligemma.py [--dest ~/.cache/paligemma] [--mix]

Requires network access and a HuggingFace token with access to the gated
google/paligemma repos (`huggingface-cli login`).
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dest", type=str, default="~/.cache/paligemma")
    parser.add_argument(
        "--mix", action="store_true",
        help="download paligemma-3b-mix-224 (instruction-tuned) instead of pt-224",
    )
    args = parser.parse_args()

    model_id = "google/paligemma-3b-mix-224" if args.mix else "google/paligemma-3b-pt-224"
    dest = os.path.expanduser(os.path.join(args.dest, model_id.split("/")[-1]))

    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        raise SystemExit(
            "huggingface_hub is required: pip install huggingface_hub"
        )

    path = snapshot_download(
        model_id,
        local_dir=dest,
        allow_patterns=["*.safetensors", "*.json", "*.model"],
    )
    print(f"downloaded {model_id} -> {path}")
    print(
        "use it via:\n"
        f"  python scripts/text_generation.py --pretrained {path} ...\n"
        f"  python scripts/run.py --config configs/train/bridge.yaml "
        f"pretrained_model_path={path}"
    )


if __name__ == "__main__":
    main()
