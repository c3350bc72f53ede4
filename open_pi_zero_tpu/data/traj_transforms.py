"""Trajectory-level transforms (reference src/data/traj_transforms.py and
the filter steps of src/data/dataset.py:32-175). All operate on a dict of
tensors with a shared leading [T] axis, inside tf.data graph mode."""

from __future__ import annotations

from typing import Optional

import tensorflow as tf


def add_pad_mask_dict(traj: dict) -> dict:
    """Mark which observation/task entries are padding: strings -> non-empty,
    tensors -> all-True (reference traj_transforms.py:114-138)."""
    traj_len = tf.shape(traj["action"])[0]
    for group in ("observation", "task"):
        if group not in traj:
            continue
        pad_masks = {}
        for key, x in traj[group].items():
            if isinstance(x, dict):
                continue
            if x.dtype == tf.string:
                pad_masks[key] = tf.strings.length(x) != 0
            else:
                pad_masks[key] = tf.ones([traj_len], tf.bool)
        traj[group] = dict(traj[group])
        traj[group]["pad_mask_dict"] = pad_masks
    return traj


def pad_actions_and_proprio(
    traj: dict,
    max_action_dim: Optional[int] = None,
    max_proprio_dim: Optional[int] = None,
) -> dict:
    """Zero-pad the trailing action/proprio dim and record an
    `action_pad_mask` (reference traj_transforms.py:141-165)."""
    traj["action_pad_mask"] = tf.ones_like(traj["action"], tf.bool)
    if max_action_dim is not None:
        dim = traj["action"].shape[-1]
        if dim > max_action_dim:
            raise ValueError(f"action dim {dim} > max_action_dim {max_action_dim}")
        pad = [[0, 0]] * (len(traj["action"].shape) - 1) + [[0, max_action_dim - dim]]
        traj["action"] = tf.pad(traj["action"], pad)
        traj["action_pad_mask"] = tf.pad(traj["action_pad_mask"], pad)
    if max_proprio_dim is not None and "proprio" in traj.get("observation", {}):
        dim = traj["observation"]["proprio"].shape[-1]
        if dim > max_proprio_dim:
            raise ValueError(f"proprio dim {dim} > max_proprio_dim {max_proprio_dim}")
        traj["observation"]["proprio"] = tf.pad(
            traj["observation"]["proprio"], [[0, 0], [0, max_proprio_dim - dim]]
        )
    return traj


def chunk_act_obs(traj: dict, window_size: int = 1, action_horizon: int = 1) -> dict:
    """Chunk observations into [T, window] histories (front edge clamped to
    frame 0) and actions into [T, window, horizon, A] chunks (back edge
    clamped to the final action), with `timestep_pad_mask`,
    `task_completed` and the chunk-aware `action_pad_mask`
    (reference traj_transforms.py:12-102)."""
    traj_len = tf.shape(traj["action"])[0]

    hist = tf.range(traj_len)[:, None] + tf.range(-window_size + 1, 1)  # [T, W]
    timestep_pad_mask = hist >= 0
    hist = tf.maximum(hist, 0)
    traj["observation"] = tf.nest.map_structure(
        lambda x: tf.gather(x, hist), traj["observation"]
    )
    traj["observation"]["timestep_pad_mask"] = timestep_pad_mask

    if len(traj["action"].shape) == 2:
        fut = tf.range(traj_len)[:, None] + tf.range(action_horizon)  # [T, H]
        fut = tf.minimum(fut, traj_len - 1)
        traj["action"] = tf.gather(traj["action"], fut)  # [T, H, A]
    else:
        if traj["action"].shape[1] < action_horizon:
            raise ValueError(
                f"action_horizon {action_horizon} > pre-chunked dim "
                f"{traj['action'].shape[1]}"
            )
        traj["action"] = traj["action"][:, :action_horizon]
    traj["action"] = tf.gather(traj["action"], hist)  # [T, W, H, A]

    if "timestep" in traj.get("task", {}):
        goal = traj["task"]["timestep"]
    else:
        goal = tf.fill([traj_len], traj_len - 1)
    t, w, h = tf.meshgrid(
        tf.range(traj_len), tf.range(window_size), tf.range(action_horizon),
        indexing="ij",
    )
    rel = goal[:, None, None] - (t - (window_size + 1) + w + h)
    traj["observation"]["task_completed"] = rel <= 0

    apm = traj["action_pad_mask"]
    apm = apm[:, None, None, :] if len(apm.shape) == 2 else apm[:, None, :]
    traj["action_pad_mask"] = tf.logical_and(
        apm, tf.logical_not(traj["observation"]["task_completed"])[:, :, :, None]
    )
    return traj


def subsample(traj: dict, subsample_length: int) -> dict:
    """Randomly keep at most `subsample_length` frames
    (reference traj_transforms.py:105-111)."""
    traj_len = tf.shape(traj["action"])[0]

    def sub():
        idx = tf.random.shuffle(tf.range(traj_len))[:subsample_length]
        return tf.nest.map_structure(lambda x: tf.gather(x, idx), traj)

    return tf.cond(traj_len > subsample_length, sub, lambda: traj)


def has_language(traj: dict) -> tf.Tensor:
    """skip_unlabeled predicate (reference dataset.py:92-99)."""
    return tf.math.reduce_any(traj["task"]["language_instruction"] != "")


def within_action_bounds(traj: dict, max_action: float) -> tf.Tensor:
    return tf.math.reduce_all(tf.math.abs(traj["action"]) <= max_action)


def within_proprio_bounds(traj: dict, max_proprio: float) -> tf.Tensor:
    return tf.math.reduce_all(
        tf.math.abs(traj["observation"]["proprio"]) <= max_proprio
    )


def flatten_to_frames(dataset: tf.data.Dataset) -> tf.data.Dataset:
    """traj dataset -> frame dataset (dlimp's flatten semantics)."""
    return dataset.flat_map(tf.data.Dataset.from_tensor_slices)
