"""Timing / logging / device-memory probes (reference src/utils/monitor.py),
re-targeted at JAX: CUDA memory probes become `device.memory_stats()`, the
rank filter keys off `jax.process_index()`."""

from __future__ import annotations

import functools
import logging
import time
from typing import Optional


def log_device_memory(log=None, stage: str = "loading model", device=None):
    """Log live HBM usage of one device (reference log_allocated_gpu_memory,
    monitor.py:8-12)."""
    import jax

    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    in_use = stats.get("bytes_in_use", 0)
    msg = f"Device memory after {stage}: {in_use / 1024**3:.2f} GB"
    (log.info if log else print)(msg)
    return in_use


def log_execution_time(logger: Optional[logging.Logger] = None):
    """Decorator logging wall-clock runtime of heavy calls
    (reference monitor.py:15-35)."""

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            start = time.time()
            result = func(*args, **kwargs)
            elapsed = time.time() - start
            msg = f"{func.__name__} took {elapsed:.2f} seconds to execute."
            (logger.info if logger else print)(msg)
            return result

        return wrapper

    return decorator


class Timer:
    """Wall-clock timer returning seconds since last call
    (reference monitor.py:38-47)."""

    def __init__(self):
        self._start = time.time()

    def __call__(self, reset: bool = True) -> float:
        now = time.time()
        diff = now - self._start
        if reset:
            self._start = now
        return diff


class MainRankFilter(logging.Filter):
    """Log only on the main host (reference monitor.py:51-58 keyed on DDP
    rank; here on jax.process_index)."""

    def __init__(self, main_rank: Optional[bool] = None):
        super().__init__()
        self._forced = main_rank  # None -> decide per record

    def filter(self, record):
        if self._forced is not None:
            return bool(self._forced)
        # evaluated lazily: a filter built before jax.distributed.initialize()
        # would otherwise snapshot process_index()==0 on every host
        try:
            import jax

            return jax.process_index() == 0
        except Exception:
            return True


def main_process_only(func):
    """Run only on host 0 of a multi-host job (reference main_rank_only,
    src/utils/decorator.py:31-37; `NoSyncBase` has no JAX equivalent —
    gradient accumulation lives inside the jitted step, so there is no
    per-microbatch collective to suppress)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        import jax

        if jax.process_index() == 0:
            return func(*args, **kwargs)
        return None

    return wrapper


class profile_trace:
    """`jax.profiler` trace context (SURVEY.md §5: the reference only has
    wall-clock decorators; on TPU a real trace is one context manager away).

    with profile_trace("/tmp/opz_trace"):
        step(...)
    then: tensorboard --logdir /tmp/opz_trace  (or xprof)."""

    def __init__(self, log_dir: str, create_perfetto_link: bool = False):
        self.log_dir = log_dir
        self.create_perfetto_link = create_perfetto_link

    def __enter__(self):
        import jax

        jax.profiler.start_trace(
            self.log_dir, create_perfetto_link=self.create_perfetto_link
        )
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False


def annotate(name: str):
    """Named region that shows up in profiler traces
    (jax.profiler.TraceAnnotation wrapper)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
