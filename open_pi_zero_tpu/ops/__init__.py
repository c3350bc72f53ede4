from open_pi_zero_tpu.ops.norms import (
    adaptive_layerscale,
    adaptive_rms_norm,
    layer_norm,
    rms_norm,
)
from open_pi_zero_tpu.ops.rope import apply_rope, rope_cos_sin
from open_pi_zero_tpu.ops.embeddings import sinusoidal_time_embedding
from open_pi_zero_tpu.ops.masks import (
    MASK_NEG,
    action_position_ids,
    build_block_causal_mask,
    proprio_position_ids,
    split_prefix_and_action_masks,
    vlm_position_ids,
)
from open_pi_zero_tpu.ops.attention import (
    mha_attention,
    mot_attention,
    mot_attention_xla,
)
from open_pi_zero_tpu.ops.pallas_attention import mot_attention_fused

__all__ = [
    "rms_norm",
    "layer_norm",
    "adaptive_rms_norm",
    "adaptive_layerscale",
    "apply_rope",
    "rope_cos_sin",
    "sinusoidal_time_embedding",
    "MASK_NEG",
    "build_block_causal_mask",
    "split_prefix_and_action_masks",
    "vlm_position_ids",
    "proprio_position_ids",
    "action_position_ids",
    "mha_attention",
    "mot_attention",
    "mot_attention_xla",
    "mot_attention_fused",
]
