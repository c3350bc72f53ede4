"""Block-wise causal masks and per-mixture position ids, fully vectorized.

Semantics match reference src/model/vla/pizero.py:271-336 exactly, but are
built with broadcasted iota instead of per-sample Python loops (static
shapes; jit-friendly). Layout of the joint sequence:

    [ 0 .. I-1 ]               image+text (I = max_image_text_tokens, 276),
                                of which only the first `cnt` are valid
    [ I ]                       proprio (cond_steps tokens)
    [ I+P .. I+P+A-1 ]          action (horizon_steps tokens)

Mask rules (additive; 0 = attend, MASK_NEG = blocked):
  - img/text rows < cnt attend to img/text cols < cnt
  - padding rows attend to nothing (all MASK_NEG, like the reference;
    fp32 softmax of a uniform row is finite, outputs are discarded)
  - proprio+action rows attend to img/text cols < cnt
  - proprio rows attend to proprio cols
  - action rows attend to proprio and action cols

Position ids are *static* (identical across the batch):
  vlm 1..I, proprio 1..P, action P+1..P+A
(the proprio/action experts share weights, so action continues proprio's
positions — reference pizero.py:312-323).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Matches torch.finfo(float32).min usage in the reference. Using a large
# negative constant (not -inf) keeps the fp32 softmax NaN-free on fully
# masked padding rows.
MASK_NEG = float(jnp.finfo(jnp.float32).min)


def build_block_causal_mask(
    image_text_cnt: jax.Array,  # [B] int: valid image+text tokens per sample
    max_image_text_tokens: int,
    num_proprio_tokens: int,
    num_action_tokens: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Return additive mask [B, 1, T, T], T = I + P + A."""
    total = max_image_text_tokens + num_proprio_tokens + num_action_tokens
    proprio_start = max_image_text_tokens
    action_start = max_image_text_tokens + num_proprio_tokens

    rows = jax.lax.broadcasted_iota(jnp.int32, (total, total), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (total, total), 1)
    cnt = image_text_cnt.astype(jnp.int32)[:, None, None]  # [B,1,1]

    row_is_valid_it = rows < cnt  # img/text row within valid count
    row_is_suffix = rows >= proprio_start  # proprio or action row
    row_is_action = rows >= action_start
    col_is_valid_it = cols < cnt
    col_is_proprio = (cols >= proprio_start) & (cols < action_start)
    col_is_action = cols >= action_start

    attend = (
        # img/text (valid) and suffix rows attend to valid img/text cols
        ((row_is_valid_it | row_is_suffix) & col_is_valid_it)
        # proprio + action rows attend to proprio cols
        | (row_is_suffix & col_is_proprio)
        # action rows attend to action cols
        | (row_is_action & col_is_action)
    )  # [B, T, T]
    # clamp the fill to the target dtype's own min: float32 min overflows
    # to -inf in bf16, which would NaN fully-masked rows
    neg = float(jnp.finfo(dtype).min)
    mask = jnp.where(attend, 0.0, neg).astype(dtype)
    return mask[:, None, :, :]


def split_prefix_and_action_masks(
    mask: jax.Array,  # [B, 1, T, T]
    max_image_text_tokens: int,
    num_proprio_tokens: int,
    num_action_tokens: int,
) -> Tuple[jax.Array, jax.Array]:
    """(prefix_mask [B,1,I+P,I+P], action_mask [B,1,A,T]) — reference
    pizero.py:326-336 (split_full_mask_into_submasks)."""
    prefix = max_image_text_tokens + num_proprio_tokens
    prefix_mask = mask[..., :prefix, :prefix]
    action_mask = mask[..., -num_action_tokens:, :]
    return prefix_mask, action_mask


def vlm_position_ids(max_image_text_tokens: int) -> jax.Array:
    """1..I — constant regardless of padding (reference pizero.py:313)."""
    return jnp.arange(1, max_image_text_tokens + 1, dtype=jnp.int32)


def proprio_position_ids(num_proprio_tokens: int) -> jax.Array:
    return jnp.arange(1, num_proprio_tokens + 1, dtype=jnp.int32)


def action_position_ids(num_proprio_tokens: int, num_action_tokens: int) -> jax.Array:
    return jnp.arange(
        num_proprio_tokens + 1,
        num_proprio_tokens + num_action_tokens + 1,
        dtype=jnp.int32,
    )
