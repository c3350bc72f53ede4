"""Split training step: compiler-workload route-around for billion-param
full fine-tunes with blockwise-int8 Adam (round-4 verdict task 4).

This toolchain's remote TPU compiler crashes (HTTP 500, tpu_compile_helper
exit 1) on ONE jit containing backward pass + blockwise-int8 moment
update above ~1.45-1.6 B params (attribution matrix:
scripts/probe_depth5.py; standalone repro: scripts/repro_int8_donate_crash.py
— int8-Adam graphs at >=1.2 B params crash even without donation, while
fp32-Adam and sub-0.5 B int8 graphs compile fine). The reference recipe
(full FT of the 2.6 B model, reference src/agent/train.py:167-210,
README.md:68) needs exactly that combination, so the fused
make_train_step hits a hard wall at trunk depth 5 of 18.

Route-around — split the step into jits that each stay BELOW the
compiler's workload threshold, preserving the recipe's math and memory
model (6 bytes/param static: bf16 param + bf16 grad + 2x int8 moments):

  jit G (no int8 anywhere): value_and_grad -> freeze surgery ->
        global-norm clip -> clipped grads + loss + grad_norm.
  jit A_i (one per chunk, donated): blockwise-int8 AdamW over a
        size-binned slice of the flattened param list. Each chunk holds
        <= chunk_gparams x 1e9 params, far under the crash threshold at
        any model depth; donation double-buffers only one chunk at a
        time (peak overhead = largest chunk, not the whole state).

Step semantics match the fused path: same freeze surgery, same global
clip, same per-group schedules (each chunk optimizer steps its count
once per update), same quantize/dequantize math per leaf
(tests/test_split_step.py asserts parameter equality vs the fused step).

Cost: grads round-trip HBM between jit G and the chunk applies instead
of fusing the update into the backward. At 1.7 B params that is ~17 GB
of extra HBM traffic ~= 21 ms on a v5e — measured, not modeled, in
BENCH_TRAIN_ROOFLINE.json's depth >= 5 rows.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from open_pi_zero_tpu.config import PiZeroConfig, TrainingConfig
from open_pi_zero_tpu.training import optimizer as opt_lib
from open_pi_zero_tpu.training.train_step import batch_loss


class SplitTrainState(NamedTuple):
    params: dict
    opt_states: Tuple[optax.OptState, ...]  # one per chunk
    step: jax.Array
    rng: jax.Array


def partition_leaf_indices(sizes: List[int], chunk_elems: int) -> List[List[int]]:
    """Greedy first-fit-decreasing bin packing of leaf indices so every
    chunk's total element count stays <= chunk_elems (a single leaf larger
    than chunk_elems gets its own chunk — leaves are never split)."""
    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    bins: List[Tuple[int, List[int]]] = []  # (used, indices)
    for i in order:
        for b, (used, idx) in enumerate(bins):
            if used + sizes[i] <= chunk_elems:
                bins[b] = (used + sizes[i], idx + [i])
                break
        else:
            bins.append((sizes[i], [i]))
    return [sorted(idx) for _, idx in bins]


def make_split_train_step(
    cfg: PiZeroConfig,
    train_cfg: TrainingConfig,
    params: dict,
    chunk_gparams: float = 0.4,
    donate: bool = True,
):
    """Returns (init_state, step) where step(state, batch) ->
    (state, metrics) matches make_train_step's fused semantics.

    `params` is consumed into the returned initial state (donated to the
    chunk layout). EMA/SWA is not threaded through this path (the
    reference's full-FT recipe is benchmarked without it); use the fused
    step when averaging is needed.
    """
    labels = opt_lib.param_labels(params, train_cfg.train_vlm,
                                  lora=train_cfg.lora)
    flat, treedef = jax.tree_util.tree_flatten(params)
    labels_flat = treedef.flatten_up_to(labels)
    chunks = partition_leaf_indices(
        [x.size for x in flat], int(chunk_gparams * 1e9)
    )

    # one optimizer per chunk: the SAME per-group transforms as
    # build_optimizer's multi_transform, minus freeze surgery and the
    # global clip (both live in jit G where the global view exists)
    action_tx = opt_lib._adamw(
        train_cfg, train_cfg.action_lr, train_cfg.action_lr_scheduler,
        train_cfg.action_weight_decay,
    )
    vlm_tx = (
        opt_lib._adamw(
            train_cfg, train_cfg.vlm_lr, train_cfg.vlm_lr_scheduler,
            train_cfg.vlm_weight_decay,
        )
        if train_cfg.train_vlm
        else optax.set_to_zero()
    )

    txs = []
    for idx in chunks:
        txs.append(
            optax.multi_transform(
                {"action": action_tx, "vlm": vlm_tx,
                 "frozen": optax.set_to_zero()},
                param_labels=[labels_flat[i] for i in idx],
            )
        )

    def grads_and_clip(params_tree, rng, batch):
        loss, g = jax.value_and_grad(batch_loss, allow_int=True)(
            params_tree, cfg, rng, batch
        )
        g = jax.tree.map(
            lambda p, gg: (
                gg if jnp.issubdtype(p.dtype, jnp.inexact)
                else jnp.zeros(p.shape, jnp.float32)
            ),
            params_tree, g,
        )
        g = opt_lib.apply_freeze_surgery(g)
        grad_norm = optax.global_norm(g)
        scale = jnp.minimum(1.0, train_cfg.max_grad_norm / (grad_norm + 1e-16))
        g = jax.tree.map(lambda x: x * scale, g)
        return loss, grad_norm, g

    jit_grads = jax.jit(grads_and_clip)

    def apply_chunk(tx):
        def apply(pc, oc, gc):
            updates, oc = tx.update(gc, oc, pc)
            return optax.apply_updates(pc, updates), oc

        return jax.jit(apply, donate_argnums=(0, 1) if donate else ())

    jit_applies = [apply_chunk(tx) for tx in txs]

    def init_state(rng: jax.Array) -> SplitTrainState:
        opt_states = tuple(
            tx.init([flat[i] for i in idx]) for tx, idx in zip(txs, chunks)
        )
        return SplitTrainState(
            params=params,
            opt_states=opt_states,
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )

    def step(state: SplitTrainState, batch: dict):
        rng, sub = jax.random.split(state.rng)
        loss, grad_norm, grads = jit_grads(state.params, sub, batch)
        flat_p = treedef.flatten_up_to(state.params)
        flat_g = treedef.flatten_up_to(grads)
        del grads
        new_opts = list(state.opt_states)
        for k, (idx, apply) in enumerate(zip(chunks, jit_applies)):
            pc, new_opts[k] = apply(
                [flat_p[i] for i in idx], new_opts[k],
                [flat_g[i] for i in idx],
            )
            for j, i in enumerate(idx):
                flat_p[i] = pc[j]
        new_params = jax.tree_util.tree_unflatten(treedef, flat_p)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return (
            SplitTrainState(new_params, tuple(new_opts), state.step + 1, rng),
            metrics,
        )

    return init_state, step, len(chunks)
