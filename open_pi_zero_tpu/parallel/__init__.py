from open_pi_zero_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "replicated", "replicate", "batch_sharding", "shard_batch"]
