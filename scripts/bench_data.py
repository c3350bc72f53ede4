#!/usr/bin/env python
"""Data-pipeline throughput benchmark (reference role:
scripts/data/check_bridge.py's DataLoader timing). Prints frames/sec for
the interleaved pipeline and, when available, raw record-ingest rates for
tf.data vs the native C++ reader.

Usage:
  python scripts/bench_data.py --data_dir $VLA_DATA_DIR/resize_224 --mix bridge \
      [--batch 64 --steps 50]
  python scripts/bench_data.py --synthetic    # no data needed
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _synthetic_dataset(root: str):
    import numpy as np
    import tensorflow as tf

    from open_pi_zero_tpu.data import rlds

    d = os.path.join(root, "bridge_dataset")
    if os.path.exists(os.path.join(d, rlds.FEATURES_FILE)) and os.path.exists(
        os.path.join(d, rlds.INFO_FILE)
    ):
        return root
    rng = np.random.default_rng(0)
    leaves = [
        rlds.LeafSpec("steps/observation/image_0", "uint8", (224, 224, 3), "image", True, "jpeg"),
        rlds.LeafSpec("steps/observation/state", "float32", (7,), "tensor", True),
        rlds.LeafSpec("steps/action", "float32", (7,), "tensor", True),
        rlds.LeafSpec("steps/language_instruction", "string", (), "text", True),
    ]
    eps = []
    for T in [40] * 16:
        imgs = rng.integers(0, 255, size=(T, 224, 224, 3), dtype=np.uint8)
        eps.append({
            "steps": {
                "observation": {
                    "image_0": [tf.io.encode_jpeg(x).numpy() for x in imgs],
                    "state": rng.normal(size=(T, 7)).astype(np.float32),
                },
                "action": rng.uniform(-0.5, 0.5, size=(T, 7)).astype(np.float32),
                "language_instruction": [b"pick up the block"] * T,
            },
        })
    rlds.write_rlds_dataset(d, "bridge_dataset", eps, leaves, shards=4)
    return root


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", default=None)
    parser.add_argument("--mix", default="bridge")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument(
        "--workers-sweep", type=int, nargs="*", default=None,
        help="measure frames/s at each worker count (threads for map/read); "
             "gives the frames/s/core scaling model (VERDICT r2 #10)",
    )
    args = parser.parse_args()

    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")

    from open_pi_zero_tpu.config import ConfigDict
    from open_pi_zero_tpu.agents.dataset import RLDSInterleavedDataset
    from open_pi_zero_tpu.data import native_io, rlds

    if args.synthetic or args.data_dir is None:
        args.data_dir = _synthetic_dataset("/tmp/opz_bench_data")
        args.mix = "bridge"  # the synthetic fixture is bridge-shaped

    def measure_fps(workers: int = 8) -> float:
        cfg = ConfigDict({
            "dataset_mix": args.mix,
            "data_path": args.data_dir,
            "split": "train",
            "window_size": 1,
            "action_horizon": 4,
            "skip_unlabeled": True,
            "load_proprio": True,
            "shuffle_buffer_size": 1000,
            "num_parallel_calls": workers,
            "traj_transform_threads": max(1, workers // 2),
            "traj_read_threads": max(1, workers // 2),
        })
        ds = RLDSInterleavedDataset(cfg, train=True)
        it = ds.iterator(args.batch, shard_per_process=False)
        next(it)  # warm up
        t0 = time.perf_counter()
        for _ in range(args.steps):
            next(it)
        dt = time.perf_counter() - t0
        return args.steps * args.batch / dt

    fps = measure_fps()
    print(f"pipeline: {fps:.0f} frames/s ({args.batch}x{args.steps})")

    sweep = None
    if args.workers_sweep is not None:
        counts = args.workers_sweep or [1, 2, 4]
        sweep = {w: round(measure_fps(w), 1) for w in counts}
        for w, f in sweep.items():
            print(f"workers={w}: {f:.0f} frames/s")

    # raw record ingest: tf.data vs native reader (loop the shard list a few
    # times so the small synthetic fixture gives a stable rate)
    d = os.path.join(args.data_dir, f"{args.mix}_dataset")
    spec = rlds.load_spec(d)
    files = rlds.shard_files(d, spec, "train")
    reps = 8

    t0 = time.perf_counter()
    n = sum(1 for _ in tf.data.TFRecordDataset(files * reps, num_parallel_reads=4))
    tf_rate = n / (time.perf_counter() - t0)
    print(f"tf.data ingest: {tf_rate:.0f} records/s ({n} records)")

    nat_rate = None
    if native_io.native_available():
        t0 = time.perf_counter()
        n2 = sum(1 for _ in native_io.TFRecordReader(files * reps, num_threads=4))
        nat_rate = n2 / (time.perf_counter() - t0)
        print(f"native ingest:  {nat_rate:.0f} records/s ({n2} records, crc-verified)")

    import json

    payload = {
        "metric": "data_pipeline_frames_per_s",
        "value": round(fps, 1),
        "unit": "frames/s",
        "batch": args.batch,
        "tf_ingest_records_per_s": round(tf_rate, 1),
        "native_ingest_records_per_s": round(nat_rate, 1) if nat_rate else None,
        "native_vs_tf": round(nat_rate / tf_rate, 2) if nat_rate else None,
        "synthetic": bool(args.synthetic or args.data_dir.startswith("/tmp")),
    }
    if sweep is not None:
        # scaling model: on this 1-vCPU host every worker count shares one
        # core, so frames/s/core ~= the single-worker rate; a training host
        # must supply global_batch x steps/s frames/s, so cores_needed =
        # global_batch * steps_per_s / frames_per_s_per_core. The reference
        # node RAM appetite (300-400 GB, reference README.md:139) is a
        # separate axis: our reader keeps a 1 GB ram_budget per dataset.
        per_core = sweep[min(sweep)]
        payload["workers_sweep_frames_per_s"] = sweep
        payload["frames_per_s_per_core"] = per_core
        payload["cores_for_global_batch_1024"] = {
            f"{sps} steps/s": int(np.ceil(1024 * sps / per_core))
            for sps in (0.25, 0.5, 1.0, 2.0)
        }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
