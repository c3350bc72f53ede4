from open_pi_zero_tpu.utils import geometry, metric, monitor, spec

__all__ = ["geometry", "metric", "monitor", "spec"]
