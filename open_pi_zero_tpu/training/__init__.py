from open_pi_zero_tpu.training import (
    averaging,
    optimizer,
    quantized_adam,
    sampling,
    schedules,
    train_step,
)

__all__ = [
    "averaging",
    "optimizer",
    "quantized_adam",
    "sampling",
    "schedules",
    "train_step",
]
