"""Agent layer: train / eval workspaces and environment adapters
(reference src/agent/ — SURVEY.md §2.2)."""

from open_pi_zero_tpu.agents.env_adapter import (
    BaseEnvAdapter,
    BridgeSimplerAdapter,
    EDRSimplerAdapter,
    SimplerAdapter,
    make_adapter,
)

__all__ = [
    "BaseEnvAdapter",
    "SimplerAdapter",
    "BridgeSimplerAdapter",
    "EDRSimplerAdapter",
    "make_adapter",
]
