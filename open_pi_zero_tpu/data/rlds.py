"""Self-contained RLDS (TFDS-format) episode reader and writer.

The reference loads RLDS robot datasets through the tensorflow_datasets
builder machinery (src/data/dataset.py:257+ via dlimp's from_rlds). This
module reads the same on-disk format — TFRecord shards + features.json +
dataset_info.json — directly with tf.data, removing the tfds dependency:

  - features.json (TFDS schema JSON) is parsed into a feature spec;
  - each episode is one tf.train.Example whose nested feature keys are
    "/"-joined and whose step-level tensors are flattened
    ([T, *dims] -> T*prod(dims) values in one float/int/bytes list);
  - images stay as encoded bytes (decoded later in frame transforms,
    like the reference's SkipDecoding path, dlimp/dataset.py:127-157).

The writer emits the identical format (used by tests and by the offline
resize/re-encode tool, the reference's modify_rlds_dataset.py equivalent).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import tensorflow as tf

FEATURES_FILE = "features.json"
INFO_FILE = "dataset_info.json"

_DTYPES = {
    "float32": tf.float32,
    "float64": tf.float64,
    "int8": tf.int64,
    "int16": tf.int64,
    "int32": tf.int64,
    "int64": tf.int64,
    "uint8": tf.int64,
    "uint16": tf.int64,
    "uint32": tf.int64,
    "bool": tf.int64,
    "string": tf.string,
}


@dataclass
class LeafSpec:
    key: str  # flattened "/"-joined key
    dtype: str  # original dtype string
    shape: Tuple[int, ...]  # per-step shape (excl. the step axis)
    kind: str  # "tensor" | "image" | "text"
    in_steps: bool = False
    encoding_format: Optional[str] = None  # for images


@dataclass
class DatasetSpec:
    name: str
    leaves: List[LeafSpec] = field(default_factory=list)
    splits: Dict[str, List[int]] = field(default_factory=dict)  # shard lengths

    def num_episodes(self, split: str) -> int:
        return sum(self.splits[split])


# --------------------------------------------------------------------------- #
# features.json parsing (TFDS schema)
# --------------------------------------------------------------------------- #


def _walk_features(node: dict, prefix: str, in_steps: bool, out: List[LeafSpec]):
    cls = node.get("pythonClassName", "")
    if "FeaturesDict" in cls or "featuresDict" in node:
        for name, sub in node["featuresDict"]["features"].items():
            key = f"{prefix}/{name}" if prefix else name
            _walk_features(sub, key, in_steps, out)
    elif "sequence" in node or "Sequence" in cls or "Dataset" in cls:
        inner = node["sequence"]["feature"]
        _walk_features(inner, prefix, True, out)
    elif "image" in node or "Image" in cls:
        img = node.get("image", {})
        dims = [int(d) for d in img.get("shape", {}).get("dimensions", [])]
        out.append(
            LeafSpec(
                key=prefix,
                dtype=img.get("dtype", "uint8"),
                shape=tuple(dims),
                kind="image",
                in_steps=in_steps,
                encoding_format=img.get("encodingFormat", "png"),
            )
        )
    elif "text" in node or "Text" in cls:
        out.append(LeafSpec(prefix, "string", (), "text", in_steps))
    elif "tensor" in node or "Tensor" in cls or "Scalar" in cls:
        t = node.get("tensor", {})
        dims = [int(d) for d in t.get("shape", {}).get("dimensions", [])]
        out.append(LeafSpec(prefix, t.get("dtype", "float32"), tuple(dims), "tensor", in_steps))
    else:
        raise ValueError(f"unsupported feature node at {prefix!r}: {cls}")


def load_spec(data_dir: str) -> DatasetSpec:
    with open(os.path.join(data_dir, FEATURES_FILE)) as f:
        features = json.load(f)
    with open(os.path.join(data_dir, INFO_FILE)) as f:
        info = json.load(f)
    leaves: List[LeafSpec] = []
    _walk_features(features, "", False, leaves)
    splits = {
        s["name"]: [int(n) for n in s["shardLengths"]] for s in info.get("splits", [])
    }
    return DatasetSpec(name=info.get("name", "dataset"), leaves=leaves, splits=splits)


# --------------------------------------------------------------------------- #
# reading
# --------------------------------------------------------------------------- #


def _parse_spec(spec: DatasetSpec):
    out = {}
    for leaf in spec.leaves:
        if leaf.kind in ("image", "text") or leaf.dtype == "string":
            out[leaf.key] = tf.io.VarLenFeature(tf.string)
        elif leaf.dtype in ("float32", "float64"):
            out[leaf.key] = tf.io.VarLenFeature(tf.float32)
        else:
            out[leaf.key] = tf.io.VarLenFeature(tf.int64)
    return out


def _restore_leaf(dense: tf.Tensor, leaf: LeafSpec):
    """[flat] -> [T, *shape] (or [*shape] for non-step leaves)."""
    if leaf.kind == "image" or leaf.dtype == "string":
        return dense  # [T] encoded bytes / strings
    shape = list(leaf.shape)
    if leaf.in_steps:
        shape = [-1] + shape
    x = tf.reshape(dense, shape or [])
    if leaf.dtype == "bool":
        x = tf.cast(x, tf.bool)
    elif leaf.dtype in ("int8", "int16", "int32", "uint8", "uint16", "uint32"):
        x = tf.cast(x, getattr(tf, leaf.dtype, tf.int32))
    return x


def _unflatten(flat: Dict[str, tf.Tensor]) -> dict:
    out: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = val
    return out


_SPLIT_RE = re.compile(r"^(\w+)(?:\[(\d+)?%?:(\d+)?%?\])?$")


def parse_split(split: str, total: int) -> Tuple[str, int, int]:
    """'train' | 'train[:95%]' | 'train[95%:]' | 'train[1:3]' ->
    (name, start, end). Percent bounds are over total episodes (TFDS
    sub-split convention)."""
    m = re.match(r"^(\w+)$", split)
    if m:
        return split, 0, total
    m = re.match(r"^(\w+)\[(\d+%?)?:(\d+%?)?\]$", split)
    if not m:
        raise ValueError(f"cannot parse split spec {split!r}")
    name, a, b = m.group(1), m.group(2), m.group(3)

    def bound(tok, default):
        if tok is None:
            return default
        if tok.endswith("%"):
            return int(total * int(tok[:-1]) / 100)
        return int(tok)

    return name, bound(a, 0), bound(b, total)


def use_native_reader() -> bool:
    """Opt into the C++ TFRecord ingest (OPZ_NATIVE_READER=1). Off by
    default: tf.data's parallel-interleaved reads are already native C++,
    and from_generator serializes ingest through one Python thread — the
    opz_io reader is for TF-less ingest paths and benchmarking, not a
    default win."""
    return os.environ.get("OPZ_NATIVE_READER", "0") == "1"


def shard_files(data_dir: str, spec: DatasetSpec, split_name: str) -> List[str]:
    n = len(spec.splits[split_name])
    return [
        os.path.join(data_dir, f"{spec.name}-{split_name}.tfrecord-{i:05d}-of-{n:05d}")
        for i in range(n)
    ]


def episode_dataset(
    data_dir: str,
    split: str = "train",
    spec: Optional[DatasetSpec] = None,
    shuffle: bool = False,
    num_parallel_reads: int = tf.data.AUTOTUNE,
    seed: Optional[int] = None,
) -> tf.data.Dataset:
    """tf.data.Dataset of nested episode dicts; step-level tensors have a
    leading [T] axis, image/text leaves stay as encoded byte strings."""
    spec = spec or load_spec(data_dir)
    base = split.split("[")[0]
    name, start, end = parse_split(split, spec.num_episodes(base))
    files = shard_files(data_dir, spec, name)
    if use_native_reader():
        # record ingest via the C++ opz_io reader (crc-verified, threaded
        # prefetch) instead of tf.data's TFRecordDataset; the rest of the
        # pipeline stays tf.data
        from open_pi_zero_tpu.data import native_io

        n_threads = 4 if num_parallel_reads == tf.data.AUTOTUNE else max(
            1, int(num_parallel_reads)
        )
        if start or end < spec.num_episodes(name):
            # subrange splits index episodes by stream position: keep the
            # shard order deterministic (single reader thread)
            n_threads = 1

        def gen():
            yield from native_io.TFRecordReader(files, num_threads=n_threads)

        ds = tf.data.Dataset.from_generator(
            gen, output_signature=tf.TensorSpec((), tf.string)
        )
    else:
        if start or end < spec.num_episodes(name):
            # percent subsplits index episodes by stream position: parallel
            # interleave would make split membership depend on reader
            # parallelism (train/val leakage) — force sequential order
            num_parallel_reads = 1
        ds = tf.data.TFRecordDataset(files, num_parallel_reads=num_parallel_reads)
    if start or end < spec.num_episodes(name):
        ds = ds.skip(start).take(end - start)
    if shuffle:
        ds = ds.shuffle(1000, seed=seed)
    parse = _parse_spec(spec)
    leaves = {l.key: l for l in spec.leaves}

    def decode(raw):
        ex = tf.io.parse_single_example(raw, parse)
        flat = {
            k: _restore_leaf(tf.sparse.to_dense(v), leaves[k]) for k, v in ex.items()
        }
        return _unflatten(flat)

    return ds.map(decode, num_parallel_calls=num_parallel_reads)


# --------------------------------------------------------------------------- #
# writing (tests + offline re-encode tool)
# --------------------------------------------------------------------------- #


def _feature_json(leaf: LeafSpec) -> dict:
    if leaf.kind == "image":
        return {
            "pythonClassName": "tensorflow_datasets.core.features.image_feature.Image",
            "image": {
                "shape": {"dimensions": [str(d) for d in leaf.shape]},
                "dtype": leaf.dtype,
                "encodingFormat": leaf.encoding_format or "png",
            },
        }
    if leaf.kind == "text":
        return {
            "pythonClassName": "tensorflow_datasets.core.features.text_feature.Text",
            "text": {},
        }
    return {
        "pythonClassName": "tensorflow_datasets.core.features.tensor_feature.Tensor",
        "tensor": {
            "shape": {"dimensions": [str(d) for d in leaf.shape]},
            "dtype": leaf.dtype,
        },
    }


def _nest_features_json(leaves: List[LeafSpec]) -> dict:
    step_tree: dict = {}
    top_tree: dict = {}
    for leaf in leaves:
        tree = step_tree if leaf.in_steps else top_tree
        parts = leaf.key.split("/")
        # step leaves are stored under "steps/..." flattened keys
        if leaf.in_steps and parts[0] == "steps":
            parts = parts[1:]
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = _feature_json(leaf)

    def to_features_dict(tree: dict) -> dict:
        feats = {}
        for k, v in tree.items():
            if "pythonClassName" in v:
                feats[k] = v
            else:
                feats[k] = to_features_dict(v)
        return {
            "pythonClassName": "tensorflow_datasets.core.features.features_dict.FeaturesDict",
            "featuresDict": {"features": feats},
        }

    root = to_features_dict(top_tree)
    root["featuresDict"]["features"]["steps"] = {
        "pythonClassName": "tensorflow_datasets.core.features.dataset_feature.Dataset",
        "sequence": {"feature": to_features_dict(step_tree)},
    }
    return root


def write_rlds_dataset(
    data_dir: str,
    name: str,
    episodes: List[dict],
    leaves: List[LeafSpec],
    split: str = "train",
    shards: int = 1,
):
    """Write episodes (nested dicts; step leaves have leading [T]) in the
    TFDS RLDS layout this module reads."""
    os.makedirs(data_dir, exist_ok=True)

    def flatten(d: dict, prefix: str = "") -> Dict[str, np.ndarray]:
        out = {}
        for k, v in d.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, key))
            else:
                out[key] = v
        return out

    leaf_map = {l.key: l for l in leaves}

    def to_example(ep: dict) -> tf.train.Example:
        feats = {}
        for key, val in flatten(ep).items():
            leaf = leaf_map[key]
            if leaf.kind in ("image", "text") or leaf.dtype == "string":
                vals = np.atleast_1d(np.asarray(val))
                bl = tf.train.BytesList(
                    value=[v if isinstance(v, bytes) else str(v).encode() for v in vals]
                )
                feats[key] = tf.train.Feature(bytes_list=bl)
            elif leaf.dtype in ("float32", "float64"):
                arr = np.asarray(val, np.float32).reshape(-1)
                feats[key] = tf.train.Feature(
                    float_list=tf.train.FloatList(value=arr)
                )
            else:
                arr = np.asarray(val).astype(np.int64).reshape(-1)
                feats[key] = tf.train.Feature(
                    int64_list=tf.train.Int64List(value=arr)
                )
        return tf.train.Example(features=tf.train.Features(feature=feats))

    per_shard = [len(episodes) // shards] * shards
    for i in range(len(episodes) % shards):
        per_shard[i] += 1
    idx = 0
    for si, n in enumerate(per_shard):
        path = os.path.join(
            data_dir, f"{name}-{split}.tfrecord-{si:05d}-of-{shards:05d}"
        )
        with tf.io.TFRecordWriter(path) as w:
            for ep in episodes[idx : idx + n]:
                w.write(to_example(ep).SerializeToString())
        idx += n

    with open(os.path.join(data_dir, FEATURES_FILE), "w") as f:
        json.dump(_nest_features_json(leaves), f)
    info = {
        "name": name,
        "splits": [{"name": split, "shardLengths": [str(n) for n in per_shard]}],
    }
    info_path = os.path.join(data_dir, INFO_FILE)
    if os.path.exists(info_path):
        with open(info_path) as f:
            old = json.load(f)
        old_splits = [s for s in old.get("splits", []) if s["name"] != split]
        info["splits"] = old_splits + info["splits"]
    with open(info_path, "w") as f:
        json.dump(info, f)
