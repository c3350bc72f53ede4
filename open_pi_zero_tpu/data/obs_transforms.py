"""Frame-level observation transforms: decode, resize, augment, dropout
(reference src/data/obs_transforms.py + dlimp/augmentations.py + the
Lanczos3 uint8 resize of dlimp/utils.py:12-17).

All augmentations are stateless (seed-driven) so per-frame seeds derived
from one dataset seed give reproducible pipelines."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import tensorflow as tf


def decode_image(x: tf.Tensor, channels: int = 3) -> tf.Tensor:
    """Encoded bytes -> uint8 tensor; empty string -> zeros placeholder is
    handled by the caller (pad cameras)."""
    return tf.io.decode_image(x, expand_animations=False, channels=channels)


def resize_image(image: tf.Tensor, size: Tuple[int, int]) -> tf.Tensor:
    """Lanczos3 resize on float, rounded back to uint8 (matches dlimp)."""
    image = tf.image.resize(
        tf.cast(image, tf.float32), size, method="lanczos3", antialias=True
    )
    return tf.cast(tf.clip_by_value(tf.round(image), 0, 255), tf.uint8)


def maybe_decode_and_resize(
    x: tf.Tensor, size: Optional[Tuple[int, int]], channels: int = 3
) -> tf.Tensor:
    """bytes -> decoded+resized uint8; '' -> zeros [**size, C]
    (reference obs_transforms.py decode_and_resize)."""

    def decode():
        img = decode_image(x, channels)
        return resize_image(img, size) if size is not None else img

    if x.dtype == tf.string:
        assert size is not None, "padding image requires a target size"
        return tf.cond(
            tf.strings.length(x) > 0,
            decode,
            lambda: tf.zeros((*size, channels), tf.uint8),
        )
    return resize_image(x, size) if size is not None else x


# --------------------------------------------------------------------------- #
# stateless augmentations (dlimp/augmentations.py registry equivalents)
# --------------------------------------------------------------------------- #


def _random_resized_crop(image, seed, scale, ratio):
    height = tf.shape(image)[-3]
    width = tf.shape(image)[-2]
    area = tf.cast(height * width, tf.float32)
    s = tf.random.stateless_uniform((), seed, scale[0], scale[1])
    log_r = tf.random.stateless_uniform(
        (), seed + 1, tf.math.log(ratio[0]), tf.math.log(ratio[1])
    )
    r = tf.exp(log_r)
    target_area = s * area
    w = tf.cast(tf.round(tf.sqrt(target_area * r)), tf.int32)
    h = tf.cast(tf.round(tf.sqrt(target_area / r)), tf.int32)
    w = tf.minimum(w, width)
    h = tf.minimum(h, height)
    x0 = tf.random.stateless_uniform((), seed + 2, 0, width - w + 1, tf.int32)
    y0 = tf.random.stateless_uniform((), seed + 3, 0, height - h + 1, tf.int32)
    crop = tf.image.crop_to_bounding_box(image, y0, x0, h, w)
    # stay in the float [0,1] domain of the augmentation chain
    return tf.image.resize(crop, (height, width), method="lanczos3", antialias=True)


AUGMENT_OPS = {
    "random_resized_crop": lambda img, seed, scale, ratio: _random_resized_crop(
        img, seed, scale, ratio
    ),
    "random_brightness": lambda img, seed, d: tf.image.stateless_random_brightness(
        img, d, seed
    ),
    "random_contrast": lambda img, seed, lo, hi: tf.image.stateless_random_contrast(
        img, lo, hi, seed
    ),
    "random_saturation": lambda img, seed, lo, hi: tf.image.stateless_random_saturation(
        img, lo, hi, seed
    ),
    "random_hue": lambda img, seed, d: tf.image.stateless_random_hue(img, d, seed),
    "random_flip_left_right": lambda img, seed: tf.image.stateless_random_flip_left_right(
        img, seed
    ),
}


def augment_image(image: tf.Tensor, seed: tf.Tensor, **kwargs) -> tf.Tensor:
    """Apply kwargs["augment_order"] ops with per-op derived seeds. Works on
    uint8, computes in float, returns uint8 (dlimp semantics)."""
    order: Sequence[str] = kwargs.get("augment_order", [])
    image = tf.cast(image, tf.float32) / 255.0
    for i, name in enumerate(order):
        op_seed = tf.cast(seed, tf.int32) + 13 * (i + 1)
        args = kwargs.get(name, [])
        if name == "random_resized_crop":
            d = kwargs[name]
            image = _random_resized_crop(
                image, op_seed,
                tf.constant(d["scale"], tf.float32),
                tf.constant(d["ratio"], tf.float32),
            )
        elif isinstance(args, dict):
            image = AUGMENT_OPS[name](image, op_seed, **args)
        else:
            if not isinstance(args, (list, tuple)):
                args = [args]
            image = AUGMENT_OPS[name](image, op_seed, *args)
        image = tf.clip_by_value(image, 0.0, 1.0)
    return tf.cast(tf.round(image * 255.0), tf.uint8)


def image_dropout(obs: dict, seed: tf.Tensor, dropout_prob: float) -> dict:
    """Independently drop each REAL camera image with prob `dropout_prob`,
    but always keep one randomly chosen real image; padding images are left
    alone; the pad mask is updated for dropped cameras (reference
    obs_transforms.py image_dropout semantics)."""
    image_keys = [k for k in obs if k.startswith("image_")]
    if not image_keys:
        return obs
    pad = obs.get("pad_mask_dict", {})
    valid = tf.stack(
        [
            tf.reshape(pad[k], [-1])[0] if k in pad else tf.constant(True)
            for k in image_keys
        ]
    )
    shuffle_seed, drop_seed = tf.unstack(
        tf.random.split(tf.cast(seed, tf.int64)), 2
    )
    keep_idx = tf.cond(
        tf.reduce_any(valid),
        lambda: tf.random.experimental.stateless_shuffle(
            tf.where(valid)[:, 0], seed=shuffle_seed
        )[0],
        lambda: tf.constant(0, tf.int64),
    )
    rands = tf.random.stateless_uniform([len(image_keys)], seed=drop_seed)
    keep = tf.logical_and(
        valid,
        tf.logical_or(
            tf.range(len(image_keys), dtype=tf.int64) == keep_idx,
            rands > dropout_prob,
        ),
    )
    obs = dict(obs)
    if "pad_mask_dict" in obs:
        obs["pad_mask_dict"] = dict(obs["pad_mask_dict"])
    for i, k in enumerate(image_keys):
        obs[k] = tf.cond(keep[i], lambda k=k: obs[k], lambda k=k: tf.zeros_like(obs[k]))
        if "pad_mask_dict" in obs and k in obs["pad_mask_dict"]:
            obs["pad_mask_dict"][k] = tf.logical_and(obs["pad_mask_dict"][k], keep[i])
    return obs


def apply_obs_transforms(
    frame: dict,
    seed: tf.Tensor,
    resize_size: Dict[str, Tuple[int, int]],
    image_augment_kwargs: Optional[Dict[str, dict]] = None,
    image_dropout_prob: float = 0.0,
    train: bool = True,
) -> dict:
    """Decode/resize all image_<name> keys of a chunked observation dict
    ([W] history of encoded strings), then optionally augment
    (reference obs_transforms.py:15-172 + dataset.py:178-254)."""
    obs = dict(frame["observation"])
    for key in list(obs):
        if not key.startswith("image_"):
            continue
        name = key[len("image_"):]
        size = resize_size.get(name)
        imgs = obs[key]  # [W] strings or [W, H, W, C]
        decoded = tf.map_fn(
            lambda x: maybe_decode_and_resize(x, size),
            imgs,
            fn_output_signature=tf.uint8,
        )
        if train and image_augment_kwargs and name in image_augment_kwargs:
            aug_seed = tf.stack(
                [tf.cast(seed, tf.int32), tf.cast(seed, tf.int32) + 1]
            )
            decoded = tf.map_fn(
                lambda x: augment_image(x, aug_seed, **image_augment_kwargs[name]),
                decoded,
                fn_output_signature=tf.uint8,
            )
        obs[key] = decoded
    if train and image_dropout_prob > 0:
        drop_seed = tf.stack(
            [tf.cast(seed, tf.int64) + 7, tf.cast(seed, tf.int64) + 11]
        )
        obs = image_dropout(obs, drop_seed, image_dropout_prob)
    frame = dict(frame)
    frame["observation"] = obs
    return frame
