"""Interleaved RLDS dataset bound to the exact π0 training transform
configuration (reference src/agent/dataset.py:14-81), feeding numpy batches
to the JAX train loop instead of a torch DataLoader."""

from __future__ import annotations

import logging

import tensorflow as tf

from open_pi_zero_tpu.data.oxe import make_oxe_dataset_kwargs_and_weights
from open_pi_zero_tpu.data.pipeline import make_interleaved_dataset
from open_pi_zero_tpu.utils.monitor import log_execution_time

tf.config.set_visible_devices([], "GPU")
log = logging.getLogger(__name__)

# the π0 recipe's augmentation (reference agent/dataset.py:38-69)
PRIMARY_AUGMENT_KWARGS = dict(
    random_resized_crop=dict(scale=[0.8, 1.0], ratio=[0.9, 1.1]),
    random_brightness=[0.1],
    random_contrast=[0.9, 1.1],
    random_saturation=[0.9, 1.1],
    random_hue=[0.05],
    augment_order=[
        "random_resized_crop",
        "random_brightness",
        "random_contrast",
        "random_saturation",
        "random_hue",
    ],
)
WRIST_AUGMENT_KWARGS = {
    k: v for k, v in PRIMARY_AUGMENT_KWARGS.items() if k != "random_resized_crop"
}
WRIST_AUGMENT_KWARGS["augment_order"] = PRIMARY_AUGMENT_KWARGS["augment_order"][1:]


class RLDSInterleavedDataset:
    """config: the `data.train` / `data.val` block of a train YAML
    (configs/train/bridge.yaml). Iterate with `.iterator(batch_size)`."""

    @log_execution_time(log)
    def __init__(self, config, train: bool = True, seed: int = 0):
        kwargs_list, sample_weights = make_oxe_dataset_kwargs_and_weights(
            config.dataset_mix,
            config.data_path,
            load_proprio=bool(config.get("load_proprio", True)),
            load_camera_views=tuple(config.get("load_camera_views", ("primary",))),
        )
        resize = tuple(config.get("resize_size", (224, 224)))
        self.dataset = make_interleaved_dataset(
            kwargs_list,
            sample_weights,
            train=train,
            split=config.get("split") or None,
            shuffle_buffer_size=int(config.get("shuffle_buffer_size", 10_000)),
            batch_size=None,  # batched per host in iterator()
            balance_weights=True,
            traj_transform_kwargs=dict(
                window_size=int(config.get("window_size", 1)),
                action_horizon=int(config.get("action_horizon", 4)),
                subsample_length=100,
                skip_unlabeled=bool(config.get("skip_unlabeled", True)),
                # cross-FAMILY mixes (e.g. bridge 7-dim POS_EULER proprio +
                # fractal 8-dim POS_QUAT) zero-pad trailing dims to one
                # width after per-dataset normalization
                # (traj_transforms.pad_actions_and_proprio, reference
                # traj_transforms.py:141-165); single-family configs leave
                # these unset like the reference wrapper does
                max_action_dim=(
                    int(config["max_action_dim"])
                    if config.get("max_action_dim") else None
                ),
                max_proprio_dim=(
                    int(config["max_proprio_dim"])
                    if config.get("max_proprio_dim") else None
                ),
            ),
            frame_transform_kwargs=dict(
                # `augment: false` disables train-time image augmentation
                # (fixed-camera sim tasks: random_resized_crop perturbs the
                # pixel<->world mapping the policy must read absolutely)
                image_augment_kwargs=(
                    {"primary": PRIMARY_AUGMENT_KWARGS, "wrist": WRIST_AUGMENT_KWARGS}
                    if train and bool(config.get("augment", True))
                    else None
                ),
                resize_size=dict(primary=resize, wrist=resize),
                num_parallel_calls=int(config.get("num_parallel_calls", 16)),
            ),
            traj_transform_threads=config.get("traj_transform_threads"),
            traj_read_threads=config.get("traj_read_threads"),
            seed=seed,
        )

    def iterator(self, batch_size: int, shard_per_process: bool = True):
        """numpy frame-batch iterator; shards across JAX processes so the
        global batch is disjoint per host (replaces per-rank DataLoaders,
        reference train.py:142-156)."""
        ds = self.dataset
        if shard_per_process:
            import jax

            if jax.process_count() > 1:
                ds = ds.shard(jax.process_count(), jax.process_index())
        ds = ds.batch(batch_size, drop_remainder=True)
        ds = ds.prefetch(tf.data.AUTOTUNE)
        return ds.as_numpy_iterator()
