"""Test configuration: force an 8-device virtual CPU platform so sharding
and collective paths are exercised without TPU hardware (SURVEY.md §4 —
the reference has no multi-device tests; we simulate a mesh per the
xla_force_host_platform_device_count recipe)."""

import os

# Force CPU: the session environment exports JAX_PLATFORMS=axon (TPU) and a
# sitecustomize module imports jax at interpreter startup, so both the env var
# and the live config must be overridden before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism & quieter logs
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() >= 8, "expected 8 virtual CPU devices for mesh tests"
