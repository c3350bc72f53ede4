"""Goal relabeling for BC-style training (reference
src/data/utils/goal_relabeling.py — an Octo extra kept for capability
parity; the π0 configs do not enable it)."""

from __future__ import annotations

from typing import Optional

import tensorflow as tf


def tree_merge(*trees: dict) -> dict:
    """Later trees override earlier ones, recursively."""
    merged: dict = {}
    for tree in trees:
        for k, v in tree.items():
            if isinstance(v, dict):
                merged[k] = tree_merge(merged.get(k, {}), v)
            else:
                merged[k] = v
    return merged


def uniform(
    traj: dict, max_goal_distance: Optional[int] = None, seed: Optional[int] = None
) -> dict:
    """For every step i pick a goal index uniformly from [i, traj_len)
    (optionally capped at i + max_goal_distance) and mirror the goal
    observation into `task`."""
    traj_len = tf.shape(tf.nest.flatten(traj["observation"])[0])[0]

    rand = (
        tf.random.stateless_uniform([traj_len], seed=[seed, 0])
        if seed is not None
        else tf.random.uniform([traj_len])
    )
    low = tf.cast(tf.range(traj_len), tf.float32)
    if max_goal_distance is not None:
        high = tf.cast(
            tf.minimum(tf.range(traj_len) + max_goal_distance, traj_len), tf.float32
        )
    else:
        high = tf.cast(traj_len, tf.float32)
    goal_idxs = tf.minimum(tf.cast(rand * (high - low) + low, tf.int32), traj_len - 1)

    goal = tf.nest.map_structure(lambda x: tf.gather(x, goal_idxs), traj["observation"])
    traj["task"] = tree_merge(traj.get("task", {}), goal)
    return traj
