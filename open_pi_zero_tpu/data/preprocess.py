"""Offline RLDS preprocessing: one-time resize + JPEG re-encode of every
image observation in a dataset (reference ResizeAndJpegEncode mod +
multithreaded TFDS re-writer, src/data/oxe/preprocess/mod_functions.py:57-100,
multithreaded_adhoc_tfds_builder.py; driven by scripts/modify_rlds_dataset.py).

Re-design: instead of re-building through TFDS's builder machinery with a
multiprocessing Pool, this streams episodes through the self-contained RLDS
reader/writer (data/rlds.py) with a thread pool over images — image decode/
encode releases the GIL (libjpeg via native_io, or TF ops), so threads
saturate the host without pickling episodes across processes."""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np
import tensorflow as tf

from open_pi_zero_tpu.data import native_io, rlds
from open_pi_zero_tpu.data.obs_transforms import resize_image

log = logging.getLogger(__name__)


def _resize_encode(encoded: bytes, size: Tuple[int, int]) -> bytes:
    if not encoded:
        return encoded
    try:
        img = native_io.decode_jpeg(encoded)
    except ValueError:
        img = tf.io.decode_image(encoded, channels=3, expand_animations=False).numpy()
    resized = resize_image(tf.convert_to_tensor(img), size)
    return tf.io.encode_jpeg(resized, quality=95).numpy()


def resize_rlds_dataset(
    src_dir: str,
    dst_dir: str,
    size: Tuple[int, int] = (224, 224),
    splits: Optional[List[str]] = None,
    num_workers: int = 8,
    episodes_per_shard: int = 64,
):
    """Copy an RLDS dataset with every image leaf resized to `size` and
    re-encoded as JPEG. Non-image leaves pass through unchanged."""
    spec = rlds.load_spec(src_dir)
    image_keys = [l.key for l in spec.leaves if l.kind == "image"]
    new_leaves = [
        rlds.LeafSpec(
            l.key, l.dtype, (size[0], size[1], 3) if l.kind == "image" else l.shape,
            l.kind, l.in_steps, "jpeg" if l.kind == "image" else l.encoding_format,
        )
        for l in spec.leaves
    ]

    pool = ThreadPoolExecutor(max_workers=num_workers)
    for split in splits or list(spec.splits):
        ds = rlds.episode_dataset(src_dir, split=split, spec=spec)
        all_eps = []
        for ep in ds.as_numpy_iterator():
            flat = _flatten(ep)
            for key in image_keys:
                imgs = flat[key]
                flat[key] = np.asarray(
                    list(pool.map(lambda e: _resize_encode(e, size), imgs)),
                    dtype=object,
                )
            all_eps.append(_unflatten(flat))
        shards = max(1, len(all_eps) // episodes_per_shard)
        rlds.write_rlds_dataset(
            dst_dir, spec.name, all_eps, new_leaves, split=split, shards=shards
        )
        log.info("split %s: %d episodes -> %s (%d shards)", split, len(all_eps), dst_dir, shards)
    pool.shutdown()


def _flatten(d: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out
