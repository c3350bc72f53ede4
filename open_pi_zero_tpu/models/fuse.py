"""Serving-time projection fusion: concatenate the q/k/v and gate/up
kernels so each attention block issues ONE input matmul instead of three
and each geglu MLP one instead of two.

Why this matters on TPU at batch 1: the trunk's proprio/action experts and
the 27 SigLIP layers run many small matmuls whose cost is dominated by
per-op overhead and weight-streaming setup, not FLOPs — halving the op
count recovers real latency. The canonical (checkpoint) layout keeps
separate kernels; this is a pure tree-to-tree transform applied after
loading (and after `merge_lora` — fusion refuses trees that still carry
adapters or quantized bases, which need their own layouts).

The forward paths (models/mixture.py, models/siglip.py) detect the fused
keys ("qkv", "gateup") and split the single matmul's output; numerics are
identical up to XLA reassociation (concatenating columns of the weight
matrix does not change any dot product).

Tensor parallelism: fuse AFTER deciding the layout — parallel/sharding.py
deliberately has no rule for "qkv"/"gateup" (sharding a concatenated out
dim would misalign the q|k|v segment boundaries with shard boundaries), so
fused trees stay replicated on the model axis. TP serving should keep the
canonical layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def _assert_fusable(d: dict, names):
    for n in names:
        if f"{n}_lora" in d:
            raise ValueError(
                "cannot fuse projections with live LoRA adapters — apply "
                "ops.lora.merge_lora first"
            )
        if isinstance(d.get(n), dict) and "q" in d.get(n, {}):
            raise ValueError(
                "cannot fuse int8-quantized bases — fusion is for the "
                "float serving path"
            )


def fuse_mixture_layers(layers: dict) -> dict:
    out = dict(layers)
    attn = dict(layers["attn"])
    _assert_fusable(attn, ("q", "k", "v"))
    out["attn"] = {
        "qkv": jnp.concatenate([attn.pop("q"), attn.pop("k"), attn.pop("v")], axis=-1),
        **attn,  # o (+ anything else) unchanged
    }
    mlp = dict(layers["mlp"])
    _assert_fusable(mlp, ("gate", "up"))
    out["mlp"] = {
        "gateup": jnp.concatenate([mlp.pop("gate"), mlp.pop("up")], axis=-1),
        **mlp,  # down unchanged
    }
    return out


def fuse_siglip_layers(layers: dict) -> dict:
    out = dict(layers)
    attn = dict(layers["attn"])
    _assert_fusable(attn, ("q", "k", "v"))
    q, k, v = attn.pop("q"), attn.pop("k"), attn.pop("v")
    out["attn"] = {
        "qkv": {
            "kernel": jnp.concatenate(
                [q["kernel"], k["kernel"], v["kernel"]], axis=-1
            ),
            "bias": jnp.concatenate([q["bias"], k["bias"], v["bias"]], axis=-1),
        },
        **attn,  # o (+ any future keys) preserved
    }
    return out


def fuse_for_serving(params: dict) -> dict:
    """Full PiZero param tree -> fused-serving layout (new tree; the input
    is not mutated)."""
    out = dict(params)
    if "siglip" in out:
        sig = dict(out["siglip"])
        sig["layers"] = fuse_siglip_layers(sig["layers"])
        out["siglip"] = sig
    if "joint" in out:
        joint = dict(out["joint"])  # preserve any sibling keys
        joint["mixtures"] = {
            name: {**m, "layers": fuse_mixture_layers(m["layers"])}
            for name, m in joint["mixtures"].items()
        }
        out["joint"] = joint
    return out
