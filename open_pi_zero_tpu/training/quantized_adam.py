"""AdamW with blockwise-int8 moment storage — the TPU equivalent of the
reference's bnb.optim.AdamW8bit (src/agent/train.py:171,194; bitsandbytes
CUDA kernels, SURVEY.md §2.5).

Moments live in HBM as int8 payloads + per-block fp32 absmax scales (4x
memory saving vs fp32 states); each update dequantizes, applies the exact
AdamW math in fp32, and re-quantizes. Quantize/dequantize are elementwise
and fuse into the update under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from open_pi_zero_tpu.ops.quantization import (
    dequantize_blockwise,
    quantize_blockwise,
)


class Adam8bitState(NamedTuple):
    count: jax.Array
    mu: dict  # pytree of QTensor
    nu: dict  # pytree of QTensor


def adamw8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    block: int = 2048,
) -> optax.GradientTransformation:
    # power-law codes approximate bnb's dynamic map: signed near-log for m,
    # unsigned near-log for v (v spans g^2's dynamic range; linear int8
    # would collapse small entries to 0 and blow up 1/(sqrt(v)+eps))
    M_POWER, V_POWER = 3, 4

    def init(params):
        zqm = lambda p: quantize_blockwise(jnp.zeros(p.shape, jnp.float32), block, M_POWER)
        zqv = lambda p: quantize_blockwise(jnp.zeros(p.shape, jnp.float32), block, V_POWER)
        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(zqm, params),
            nu=jax.tree.map(zqv, params),
        )

    def update(updates, state, params=None):
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate

        def leaf(g, mu_q, nu_q, p):
            g = g.astype(jnp.float32)
            mu = b1 * dequantize_blockwise(mu_q) + (1 - b1) * g
            nu = b2 * dequantize_blockwise(nu_q) + (1 - b2) * g * g
            mhat = mu / bc1
            vhat = nu / bc2
            step = mhat / (jnp.sqrt(vhat) + eps)
            if weight_decay:
                step = step + weight_decay * p.astype(jnp.float32)
            new_update = (-lr * step).astype(p.dtype)
            return (
                new_update,
                quantize_blockwise(mu, block, M_POWER),
                quantize_blockwise(nu, block, V_POWER),
            )

        flat_u, treedef = jax.tree.flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        flat_p = jax.tree.leaves(params)
        outs = [leaf(g, m, n, p) for g, m, n, p in zip(flat_u, flat_mu, flat_nu, flat_p)]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_mu = treedef.unflatten([o[1] for o in outs])
        new_nu = treedef.unflatten([o[2] for o in outs])
        return new_updates, Adam8bitState(count, new_mu, new_nu)

    return optax.GradientTransformation(init, update)
