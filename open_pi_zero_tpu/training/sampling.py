"""Flow-matching timestep sampling (reference src/agent/train.py:239-247).

  uniform: stratified — one shared uniform offset + per-sample stride,
           modulo (1 - eps), so the batch covers [0,1) evenly.
  beta:    π0 paper — z ~ Beta(alpha=1.5, beta=1), t = (1-σmin)(1-z),
           emphasizing early (noisier) timesteps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open_pi_zero_tpu.config import PiZeroConfig


def sample_flow_time(rng: jax.Array, bsz: int, cfg: PiZeroConfig) -> jax.Array:
    if cfg.flow_sampling == "uniform":
        eps = 1e-5
        offset = jax.random.uniform(rng, ())
        t = (offset + jnp.arange(bsz) / bsz) % (1 - eps)
        return t.astype(jnp.float32)
    if cfg.flow_sampling == "beta":
        z = jax.random.beta(rng, cfg.flow_alpha, cfg.flow_beta, (bsz,))
        t_max = 1.0 - cfg.flow_sig_min
        return (t_max * (1.0 - z)).astype(jnp.float32)
    raise ValueError(f"invalid flow_sampling: {cfg.flow_sampling}")
