"""Dual-group optimizer with freeze surgery, matching the reference's
training setup (src/agent/train.py:169-210):

  - "action" group: action encoder/decoder, proprio encoder, action-expert
    mixture (proprio shares its weights) — AdamW at `action_lr`.
  - "vlm" group: SigLIP tower, projector, vlm mixture — AdamW at `vlm_lr`,
    or frozen entirely when `train_vlm=False`.
  - "frozen": embed_tokens (reference pizero.py:251-256).

The reference additionally marks the *last layer's* vlm post-attention
norm, MLP, o_proj and v_proj as unused/untrained
(`_check_gemma_unused_parameter_by_name`, pizero.py:224-234 — o_proj/MLP
outputs of non-output mixtures are skipped at the final layer). With
stacked [L, ...] params those are slices, not leaves, so freezing is done
by gradient surgery: a transform that zeroes the [L-1] slice of those
leaves *before* the global-norm clip, so the clip norm matches the
reference's clip over trained parameters only (train.py:371-379).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from open_pi_zero_tpu.config import TrainingConfig
from open_pi_zero_tpu.training import schedules

# vlm layer-stacked leaves whose last-layer slice is untrained
# (path inside joint.mixtures.vlm.layers)
_UNUSED_LAST_LAYER_PATHS = (
    ("post_norm", "weight"),
    ("mlp", "gate"),
    ("mlp", "up"),
    ("mlp", "down"),
    ("attn", "o"),
    ("attn", "v"),
)


def _tree_update(tree: dict, path, fn) -> dict:
    """Immutable set: returns a copy of `tree` with fn applied at path."""
    if not path:
        return fn(tree)
    head, rest = path[0], path[1:]
    new = dict(tree)
    new[head] = _tree_update(tree[head], rest, fn)
    return new


def _zero_last_layer(g):
    """g.at[-1] = 0 on every leaf — the grad at a kernel path may be a
    dict (quantized QLoRA base: {q4, absmax} / {q, scale} zero-grads)."""
    if isinstance(g, dict):
        return {k: _zero_last_layer(v) for k, v in g.items()}
    return g.at[-1].set(0.0)


def zero_unused_vlm_last_layer(grads: dict) -> dict:
    """Zero gradient slices of the untrained last-layer vlm params."""
    for path in _UNUSED_LAST_LAYER_PATHS:
        full = ("joint", "mixtures", "vlm", "layers") + path
        grads = _tree_update(grads, full, _zero_last_layer)
    return grads


def apply_freeze_surgery(grads: dict) -> dict:
    """Zero the gradients of permanently-frozen leaves (embed_tokens and
    the unused last-layer VLM weights) — the exact surgery the optimizer
    applies; exposed so metrics can report the post-surgery norm."""
    grads = _tree_update(grads, ("embed_tokens",), lambda g: jnp.zeros_like(g))
    return zero_unused_vlm_last_layer(grads)


def freeze_surgery() -> optax.GradientTransformation:
    """Stateless transform: zero embed_tokens grads + unused vlm last-layer
    slices. Must precede clip_by_global_norm."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = _tree_update(
            updates, ("embed_tokens",), lambda g: jnp.zeros_like(g)
        )
        updates = zero_unused_vlm_last_layer(updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def param_labels(params: dict, train_vlm: bool = True, lora: bool = False) -> dict:
    """Label pytree for optax.multi_transform. Top-level routing mirrors the
    reference's param-group properties (pizero.py:114-158). With lora=True,
    the VLM-side subtrees (vision tower, projector, vlm mixture) train ONLY
    their `<name>_lora` adapters — the reference's
    freeze_non_lora_weights_in_vlm (src/agent/train.py:101-102,
    pizero.py:236-248); the action expert still trains fully."""
    from open_pi_zero_tpu.ops.lora import is_quantized_base

    vlm_label = "vlm" if train_vlm else "frozen"
    top = {
        "embed_tokens": "frozen",
        "siglip": vlm_label,
        "projector": vlm_label,
        "action_encoder": "action",
        "proprio_encoder": "action",
        "action_decoder": "action",
    }

    def label_tree(subtree, label):
        # Quantized base dicts ({q4, absmax} / {q|qa, scale})
        # are ALWAYS frozen, lora flag or not: the reference keeps
        # bnb-quantized modules fully frozen (train.py:90-93 "fully
        # frozen"). Without this, quantize=true + lora=false would give the
        # fp32 absmax/scale leaves real AdamW updates through the
        # differentiable dequant, silently corrupting the bases.
        def walk(d):
            if is_quantized_base(d):
                return jax.tree.map(lambda _: "frozen", d)
            if isinstance(d, dict):
                return {k: walk(v) for k, v in d.items()}
            return label

        return walk(subtree)

    def label_lora_only(subtree, trained_label):
        def walk(d, in_lora):
            if isinstance(d, dict):
                return {
                    k: walk(v, in_lora or k.endswith("_lora"))
                    for k, v in d.items()
                }
            return trained_label if in_lora else "frozen"

        return walk(subtree, False)

    def vlm_side(subtree):
        return (
            label_lora_only(subtree, vlm_label)
            if lora
            else label_tree(subtree, vlm_label)
        )

    out = {}
    for k, sub in params.items():
        if k == "joint":
            out[k] = {
                "mixtures": {
                    name: (
                        vlm_side(t) if name == "vlm" else label_tree(t, "action")
                    )
                    for name, t in sub["mixtures"].items()
                }
            }
        elif k in ("siglip", "projector"):
            out[k] = vlm_side(sub)
        else:
            out[k] = label_tree(sub, top[k])
    return out


def build_optimizer(
    cfg: TrainingConfig, params: dict
) -> optax.GradientTransformation:
    """freeze surgery -> global-norm clip (trained params only, since frozen
    grads are already zero) -> per-group AdamW with cosine-warmup schedules.

    NB: weight decay is 0 in every reference config; a nonzero decay here
    would slowly move the surgically-frozen slices (decay is decoupled from
    the gradient), so we assert it for safety."""
    action_tx = _adamw(cfg, cfg.action_lr, cfg.action_lr_scheduler, cfg.action_weight_decay)
    if cfg.train_vlm:
        vlm_tx = _adamw(cfg, cfg.vlm_lr, cfg.vlm_lr_scheduler, cfg.vlm_weight_decay)
        if cfg.vlm_weight_decay:
            raise NotImplementedError(
                "nonzero vlm weight decay would decay the frozen last-layer "
                "slices; mask it per-slice before enabling"
            )
    else:
        vlm_tx = optax.set_to_zero()
    labels = param_labels(params, cfg.train_vlm, lora=cfg.lora)
    return optax.chain(
        freeze_surgery(),
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(
            {"action": action_tx, "vlm": vlm_tx, "frozen": optax.set_to_zero()},
            param_labels=labels,
        ),
    )


def _adamw(cfg: TrainingConfig, lr, sched_cfg, weight_decay):
    schedule = schedules.from_config(lr, sched_cfg)
    if cfg.quantize_optimizer_states:
        from open_pi_zero_tpu.training.quantized_adam import adamw8bit

        return adamw8bit(
            schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=weight_decay,
        )
    return optax.adamw(
        schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
        weight_decay=weight_decay,
    )


def trainable_param_count(params: dict, train_vlm: bool = True) -> dict:
    """Param counts per group in units of 1e9, mirroring the reference's
    logging (train.py:167-208). The action group includes proprio via
    weight tying exactly once (params hold one subtree)."""
    labels = param_labels(params, train_vlm)
    counts = {"action": 0, "vlm": 0, "frozen": 0}
    for lab, leaf in zip(jax.tree.leaves(labels), jax.tree.leaves(params)):
        counts[lab] += leaf.size
    # subtract the surgically-frozen last-layer vlm slices
    if train_vlm:
        vlm_layers = params["joint"]["mixtures"]["vlm"]["layers"]
        for path in _UNUSED_LAST_LAYER_PATHS:
            node: Any = vlm_layers
            for p in path:
                node = node[p]
            if isinstance(node, dict):
                # quantized base ({q4, absmax} / {q, scale}): the whole
                # mixture is already labeled frozen — nothing to move
                continue
            counts["vlm"] -= node[0].size
            counts["frozen"] += node[0].size
    return {k: v / 1e9 for k, v in counts.items()}
