"""Device mesh & sharding helpers.

The reference's only parallelism is multi-node DDP over NCCL
(SURVEY.md §2.6; slurm/train_multi_node.sh + DDP wrap in train.py:121-126).
The TPU-native equivalent is a `jax.sharding.Mesh` with a leading `data`
axis: params replicated, batch sharded, gradient psum inserted by XLA under
jit — no hand-written collectives (grad all-reduce rides the ICI).

A `model` axis is part of the mesh signature from day one so tensor
parallelism over the 16384-wide Gemma MLP is a sharding-rule change, not a
rewrite; v1 ships data-parallel like the reference (model axis size 1).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D (data, model) mesh. Defaults to all devices on the data axis.

    On multi-host TPU slices, `jax.devices()` is global — the same call
    builds the cross-host mesh (DCN-aware ordering can be layered on via
    mesh_utils when multi-slice arrives)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    # register for the fused-attention shard_map wrapper: multi-device pjit
    # keeps the Pallas kernel instead of silently falling back to the XLA
    # path (ops/pallas_attention.py; the round-1 multi-chip perf cliff)
    from open_pi_zero_tpu.ops import pallas_attention as _pa

    _pa.set_attention_mesh(mesh)
    return mesh


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split across `data` (and nothing else)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch, spec: P = P(DATA_AXIS)):
    """Place every leaf with its batch axis over `data`. On multi-host
    meshes the input is the HOST-LOCAL shard (each process feeds a disjoint
    slice) and must be assembled into the global array — device_put with a
    global sharding would silently treat the local batch as the whole
    global batch (1/num_hosts of the configured tokens)."""
    s = NamedSharding(mesh, spec)

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    return jax.tree.map(put, batch)


def put_global(x, sharding: NamedSharding):
    """device_put that also works on multi-process meshes, where plain
    jax.device_put cannot target non-addressable devices. Each process must
    hold the FULL host value (identical across processes — every caller
    constructs it deterministically from seeds);
    make_array_from_process_local_data slices out this process's shards
    when global_shape == local shape."""
    if jax.process_count() > 1:
        if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            # typed PRNG keys can't pass through numpy: ship the uint32
            # key data and re-wrap (same impl) on the global mesh
            kd = np.asarray(jax.random.key_data(x))
            data = jax.make_array_from_process_local_data(sharding, kd, kd.shape)
            return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)
    return jax.device_put(x, sharding)


def replicate(mesh: Mesh, tree):
    """Fully replicate every leaf over the mesh (multi-process safe)."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: put_global(x, s), tree)
