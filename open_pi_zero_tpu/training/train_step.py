"""The jitted training step: flow-matching loss -> grads -> dual-group
AdamW -> EMA/SWA, with gradient accumulation as a `lax.scan` inside the
step (reference: the torch loop accumulates with DDP no_sync,
train.py:349-386; on TPU the accumulation lives inside one compiled step
so the gradient psum happens once per update, not per microbatch)."""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from open_pi_zero_tpu.config import PiZeroConfig, TrainingConfig
from open_pi_zero_tpu.models import pizero
from open_pi_zero_tpu.training import averaging as avg_lib
from open_pi_zero_tpu.training import optimizer as opt_lib
from open_pi_zero_tpu.training.sampling import sample_flow_time


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array  # int32: number of optimizer updates applied
    rng: jax.Array
    avg: Optional[avg_lib.AveragingState]  # EMA/SWA, None when disabled


def init_train_state(
    params: dict,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    train_cfg: TrainingConfig,
) -> TrainState:
    avg = (
        avg_lib.init_averaging(params)
        if (train_cfg.use_ema or train_cfg.use_swa)
        else None
    )
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), rng, avg)


def batch_loss(
    params: dict, cfg: PiZeroConfig, rng: jax.Array, batch: dict
) -> jax.Array:
    """Sample flow times + noise and evaluate the flow-matching MSE.
    batch: {input_ids, pixel_values, attention_mask, proprios, actions}."""
    rng_t, rng_x0 = jax.random.split(rng)
    bsz = batch["actions"].shape[0]
    t = sample_flow_time(rng_t, bsz, cfg)
    return pizero.flow_matching_loss(
        params, cfg, rng_x0,
        batch["input_ids"], batch["pixel_values"], batch["attention_mask"],
        batch["proprios"], batch["actions"], t,
    )


def make_train_step(
    cfg: PiZeroConfig,
    train_cfg: TrainingConfig,
    tx: optax.GradientTransformation,
    grad_accum: int = 1,
):
    """Returns step(state, batch) -> (state, metrics).

    With grad_accum > 1 every batch leaf carries a leading [accum] axis;
    microbatch grads are averaged by a scan before one optimizer update
    (matching the reference's normalized-loss accumulation,
    train.py:355-368)."""

    def grads_of(params, rng, batch):
        # allow_int: QLoRA trees carry integer payload leaves (NF4/int8
        # frozen bases, reference bnb Linear4bit) — they get float0
        # tangents, which we replace with f32 zeros so accumulation,
        # norms, and the frozen optimizer group all see ordinary arrays
        loss, g = jax.value_and_grad(batch_loss, allow_int=True)(
            params, cfg, rng, batch
        )
        g = jax.tree.map(
            lambda p, gg: (
                gg
                if jnp.issubdtype(p.dtype, jnp.inexact)
                else jnp.zeros(p.shape, jnp.float32)
            ),
            params,
            g,
        )
        return loss, g

    def step(state: TrainState, batch: dict) -> Tuple[TrainState, dict]:
        rng, sub = jax.random.split(state.rng)
        if grad_accum == 1:
            loss, grads = grads_of(state.params, sub, batch)
        else:
            subs = jax.random.split(sub, grad_accum)

            def micro(carry, xs):
                acc_loss, acc_grads = carry
                r, mb = xs
                l, g = grads_of(state.params, r, mb)
                return (
                    acc_loss + l / grad_accum,
                    jax.tree.map(lambda a, b: a + b / grad_accum, acc_grads, g),
                ), None

            zero = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (loss, grads), _ = jax.lax.scan(
                micro, (jnp.zeros((), jnp.float32), zero), (subs, batch)
            )

        # trained-grad norm for logging (post freeze surgery, pre clip —
        # same quantity torch's clip_grad_norm_ returns, train.py:371)
        grad_norm = optax.global_norm(opt_lib.apply_freeze_surgery(grads))

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        avg = (
            avg_lib.maybe_update(state.avg, params, new_step, train_cfg)
            if state.avg is not None
            else None
        )
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return TrainState(params, opt_state, new_step, rng, avg), metrics

    return step


def zero1_state_sharding(state: TrainState, mesh) -> TrainState:
    """ZeRO-1 sharding tree for a TrainState: params replicated, optimizer
    states and EMA/SWA averages sharded over the `data` axis (each leaf's
    first data-divisible axis). Full fine-tune of the 3B model with Adam
    does not fit one 16 GB v5e (params+grads+states ~16 GB before
    activations); sharding the states (and averages) over N chips removes
    (N-1)/N of that term — the JAX form of ZeRO stage 1, with XLA inserting
    the gather/reduce collectives (SURVEY.md §2.6 "optional optax state
    sharding")."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape["data"]
    rep = NamedSharding(mesh, P())

    def shard_spec(leaf):
        if hasattr(leaf, "ndim"):
            for ax in range(leaf.ndim):
                if leaf.shape[ax] >= n and leaf.shape[ax] % n == 0:
                    return NamedSharding(mesh, P(*([None] * ax + ["data"])))
        return rep

    return TrainState(
        params=jax.tree.map(lambda _: rep, state.params),
        opt_state=jax.tree.map(shard_spec, state.opt_state),
        step=rep,
        rng=rep,
        avg=(jax.tree.map(shard_spec, state.avg) if state.avg is not None else None),
    )


def shard_state_zero1(state: TrainState, mesh) -> TrainState:
    """Place a TrainState with ZeRO-1 shardings (multi-process safe: each
    process holds the full deterministic host state and contributes its
    shards via parallel.mesh.put_global)."""
    from open_pi_zero_tpu.parallel.mesh import put_global

    shardings = zero1_state_sharding(state, mesh)
    return jax.tree.map(put_global, state, shardings)


def make_jitted_train_step(
    cfg: PiZeroConfig,
    train_cfg: TrainingConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    grad_accum: int = 1,
    state_sharding: Optional[TrainState] = None,
    compiler_options: Optional[dict] = None,
):
    """jit the step; with a mesh, shard the batch over `data` and keep the
    state replicated — XLA inserts the gradient psum (DP, SURVEY.md §2.6).
    Pass state_sharding=zero1_state_sharding(state, mesh) for ZeRO-1.
    `compiler_options` feeds through to the top-level jit (used by the
    CPU-mesh dryrun to raise XLA:CPU's collective rendezvous timeouts)."""
    step = make_train_step(cfg, train_cfg, tx, grad_accum)
    if mesh is None:
        return jax.jit(step, donate_argnums=0, compiler_options=compiler_options)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    sspec = state_sharding if state_sharding is not None else rep
    # batch axis over data; with accumulation the accum axis leads, so the
    # sharded batch axis is axis 1
    bspec = NamedSharding(mesh, P(None, "data") if grad_accum > 1 else P("data"))
    return jax.jit(
        step,
        in_shardings=(sspec, bspec),
        out_shardings=(sspec, rep),
        donate_argnums=0,
        compiler_options=compiler_options,
    )
