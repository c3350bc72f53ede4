"""Tensor-parallel sharding rules for the PiZero parameter tree.

Beyond-reference capability (the reference is DDP-only, SURVEY.md §2.6):
Megatron-style TP over the `model` mesh axis, expressed purely as
PartitionSpecs — XLA's SPMD partitioner inserts the all-reduces, no
hand-written collectives.

Rules (kernels are stored [(...L,), in, out]):
  column-parallel (shard OUT dim):  attn q/k/v, mlp gate/up, siglip fc1
  row-parallel    (shard IN dim):   attn o, mlp down, siglip fc2
  replicated:                       norms, embeddings, encoders, decoders
LoRA adapters follow their base kernel: the rank dim stays replicated, so
a column-parallel base shards lora `b`'s out dim and a row-parallel base
shards lora `a`'s in dim.

A dim is sharded only when divisible by the mesh's model-axis size (the
bridge geometry has Hkv=1 -> k/v out dim 256: sharded at tp<=2... any tp
dividing 256). Anything non-divisible stays replicated — correctness first.

Note: multi-device programs take the XLA attention path (ops/attention.py
dispatch); the Pallas kernel is opaque to GSPMD (see pallas_attention.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from open_pi_zero_tpu.parallel.mesh import MODEL_AXIS

# (path-suffix match, dim to shard counted from the END: -1 = out, -2 = in)
_COL = {"q", "k", "v", "gate", "up", "fc1"}
_ROW = {"o", "down", "fc2"}


def _spec_for(path: Tuple[str, ...], leaf, tp: int):
    """PartitionSpec for one leaf; P() when no rule applies or not divisible."""
    if leaf is None or not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return P()
    names = [p for p in path]
    last = names[-1]

    def dim_spec(shard_dim_from_end: int):
        if leaf.shape[shard_dim_from_end] % tp != 0:
            return P()
        spec = [None] * leaf.ndim
        spec[leaf.ndim + shard_dim_from_end] = MODEL_AXIS
        return P(*spec)

    # lora adapters: follow the base kernel's rule
    if len(names) >= 2 and names[-2].endswith("_lora"):
        base = names[-2][: -len("_lora")]
        if base in _COL and last == "b":
            return dim_spec(-1)
        if base in _ROW and last == "a":
            return dim_spec(-2)
        return P()
    # quantized bases {q: int8, scale}: shard like the float kernel
    if last == "q" and len(names) >= 2 and names[-2] in (_COL | _ROW):
        return dim_spec(-1) if names[-2] in _COL else dim_spec(-2)
    if last == "kernel" and len(names) >= 2 and names[-2] in (_COL | _ROW):
        return dim_spec(-1) if names[-2] in _COL else dim_spec(-2)
    if last in _COL:
        return dim_spec(-1)
    if last in _ROW:
        return dim_spec(-2)
    return P()


def tp_param_specs(params: dict, mesh: Mesh):
    """PartitionSpec tree matching `params` for TP over the model axis."""
    tp = mesh.shape[MODEL_AXIS]

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return _spec_for(path, node, tp)

    return walk(params, ())


def shard_params_tp(params: dict, mesh: Mesh) -> dict:
    """device_put the param tree with TP specs (model axis; data axis sees
    params replicated)."""
    specs = tp_param_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
