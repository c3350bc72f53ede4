from open_pi_zero_tpu.data import (
    normalization,
    obs_transforms,
    oxe,
    pipeline,
    rlds,
    traj_transforms,
)

__all__ = [
    "rlds",
    "normalization",
    "traj_transforms",
    "obs_transforms",
    "oxe",
    "pipeline",
]
