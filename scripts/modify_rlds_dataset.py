#!/usr/bin/env python
"""Offline RLDS resize/re-encode CLI (reference
scripts/data/modify_rlds_dataset.py + slurm/modify_rlds.sh: shrink OXE
datasets to 224x224 once so training never decodes full-size images).

Usage:
  python scripts/modify_rlds_dataset.py --src /data/bridge_dataset \
      --dst /data/resize_224/bridge_dataset --size 224 224 --workers 16
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True, help="source RLDS dataset dir")
    parser.add_argument("--dst", required=True, help="destination dir")
    parser.add_argument("--size", type=int, nargs=2, default=(224, 224))
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--splits", nargs="*", default=None)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")

    from open_pi_zero_tpu.data.preprocess import resize_rlds_dataset

    resize_rlds_dataset(
        args.src, args.dst, tuple(args.size), splits=args.splits,
        num_workers=args.workers,
    )


if __name__ == "__main__":
    main()
