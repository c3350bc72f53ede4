#!/usr/bin/env python
"""Data-pipeline smoke: iterate the full interleaved mix, print batch
shapes / action & proprio ranges, dump sample frames, and time throughput
(TPU-repo equivalent of the reference's scripts/data/check_bridge.py and
check_fractal.py — e.g. check_bridge.py:15-40).

  python scripts/check_data.py --mix bridge [--data_path $VLA_DATA_DIR/resize_224]
      [--n_batches 5] [--batch_size 32] [--skip_norm] [--dump_dir /tmp/frames]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--data_path",
        type=str,
        default=os.path.join(os.environ.get("VLA_DATA_DIR", "."), "resize_224"),
    )
    parser.add_argument("--mix", type=str, default="bridge")
    parser.add_argument("--camera_views", nargs="*", default=("primary",))
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--n_batches", type=int, default=5)
    parser.add_argument("--skip_norm", action="store_true",
                        help="use raw actions and proprio")
    parser.add_argument("--dump_dir", type=str, default="",
                        help="write the first batch's frames as PNGs here")
    args = parser.parse_args()

    from open_pi_zero_tpu.data.oxe import make_oxe_dataset_kwargs_and_weights
    from open_pi_zero_tpu.data.pipeline import (
        make_interleaved_dataset,
        numpy_iterator,
    )

    kwargs_list, weights = make_oxe_dataset_kwargs_and_weights(
        args.mix,
        args.data_path,
        load_proprio=True,
        load_camera_views=tuple(args.camera_views),
    )
    if args.skip_norm:
        for kw in kwargs_list:
            kw["action_proprio_normalization_type"] = None
    ds = make_interleaved_dataset(
        kwargs_list,
        weights,
        train=True,
        shuffle_buffer_size=1000,
        batch_size=args.batch_size,
        traj_transform_kwargs=dict(window_size=1, action_horizon=4),
        frame_transform_kwargs=dict(resize_size={"primary": (224, 224)}),
    )

    it = numpy_iterator(ds)
    t0 = time.time()
    for i in range(args.n_batches):
        batch = next(it)
        obs = batch["observation"]
        img = obs["image_primary"]
        act = batch["action"]
        if i == 0:
            print("keys:", sorted(batch.keys()), "/ obs:", sorted(obs.keys()))
            print(f"image {img.shape} {img.dtype} [{img.min()}, {img.max()}]")
            prop = obs.get("proprio")
            if prop is not None:
                print(f"proprio {prop.shape} [{prop.min():.3f}, {prop.max():.3f}]")
            print(
                f"action {act.shape} [{act.min():.3f}, {act.max():.3f}] "
                f"mean {act.mean(axis=(0, 1, 2))}"
            )
            if args.dump_dir:
                from PIL import Image

                os.makedirs(args.dump_dir, exist_ok=True)
                for j in range(min(8, img.shape[0])):
                    Image.fromarray(np.asarray(img[j, 0])).save(
                        os.path.join(args.dump_dir, f"frame_{j}.png")
                    )
                print(f"dumped frames to {args.dump_dir}")
        else:
            assert img.shape == batch["observation"]["image_primary"].shape
    dt = time.time() - t0
    frames = args.n_batches * args.batch_size
    print(f"{frames} frames in {dt:.1f}s = {frames / dt:.1f} frames/s")


if __name__ == "__main__":
    main()
