"""Task-spec augmentation: instruction rephrasing from a precomputed
paraphrase table and random goal-image/language dropout (reference
src/data/utils/task_augmentation.py — Octo extras kept for capability
parity; π0 configs do not enable them).

Difference from the reference: the paraphrase table is loaded from a LOCAL
json/pickle file instead of a huggingface-hub download (hermetic; pass the
file path through config)."""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict

import tensorflow as tf


def to_padding(tensor: tf.Tensor) -> tf.Tensor:
    if tensor.dtype == tf.string:
        return tf.fill(tf.shape(tensor), "")
    return tf.zeros_like(tensor)


def load_paraphrase_table(path: str) -> Dict[str, str]:
    """{original: "alt1.alt2..."} mapping from a local .json or .pkl file."""
    with open(path, "rb") as f:
        if os.path.splitext(path)[1] == ".json":
            return json.load(open(path))
        return pickle.load(f)


class Rephraser:
    def __init__(self, table: Dict[str, str]):
        self.table = dict(table)
        if self.table:
            init = tf.lookup.KeyValueTensorInitializer(
                list(self.table.keys()),
                list(self.table.values()),
                key_dtype=tf.string,
                value_dtype=tf.string,
            )
            self.lookup = tf.lookup.StaticHashTable(init, default_value="")
        else:
            self.lookup = None

    @classmethod
    def from_file(cls, path: str) -> "Rephraser":
        return cls(load_paraphrase_table(path))


def rephrase_instruction(
    traj: dict, rephraser: Rephraser, rephrase_prob: float
) -> dict:
    """With prob `rephrase_prob` swap the instruction for one sampled
    uniformly from 'original.alt1.alt2...' (the table's value appended to
    the original, '.'-separated)."""
    if rephraser.lookup is None or "language_instruction" not in traj.get("task", {}):
        return traj
    original = traj["task"]["language_instruction"]
    non_empty = tf.reduce_all(tf.strings.length(original) > 0)

    def do_rephrase():
        alts = rephraser.lookup.lookup(original[0])
        pool = tf.where(
            tf.strings.length(alts) > 0, original[0] + "." + alts, original[0]
        )
        candidates = tf.strings.split(pool, sep=".")
        idx = tf.random.uniform(
            (tf.shape(original)[0],), 0, tf.shape(candidates)[0], dtype=tf.int32
        )
        sampled = tf.gather(candidates, idx)
        take = tf.random.uniform(()) < rephrase_prob
        return tf.where(take, sampled, original)

    traj["task"]["language_instruction"] = tf.cond(
        non_empty, do_rephrase, lambda: original
    )
    return traj


def delete_task_conditioning(traj: dict, keep_image_prob: float) -> dict:
    """Per step keep EITHER the goal images (prob keep_image_prob) OR the
    language instruction, zero-padding the dropped modality and its pad
    mask. No-op unless both modalities are present."""
    task = traj.get("task", {})
    if "language_instruction" not in task:
        return traj
    image_keys = {
        k for k in task if k.startswith("image_") or k.startswith("depth_")
    }
    if not image_keys:
        return traj

    traj_len = tf.shape(traj["action"])[0]
    keep_images = tf.random.uniform([traj_len]) < keep_image_prob
    keep_images |= ~task["pad_mask_dict"]["language_instruction"]

    for key in image_keys | {"language_instruction"}:
        keep = keep_images if key in image_keys else ~keep_images
        task[key] = tf.where(keep, task[key], to_padding(task[key]))
        task["pad_mask_dict"][key] = tf.where(
            keep,
            task["pad_mask_dict"][key],
            tf.zeros_like(task["pad_mask_dict"][key]),
        )

    if "timestep" in task:
        task["timestep"] = tf.where(keep_images, task["timestep"], traj_len - 1)
    return traj


def delete_and_rephrase(
    traj: dict,
    paraphrases_path: str,
    rephrase_prob: float,
    keep_image_prob: float,
) -> dict:
    traj = rephrase_instruction(traj, Rephraser.from_file(paraphrases_path), rephrase_prob)
    return delete_task_conditioning(traj, keep_image_prob)
