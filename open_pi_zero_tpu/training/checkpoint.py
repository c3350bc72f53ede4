"""Checkpoint save/restore via orbax (reference: single-file torch.save of
{cnt_update, cnt_batch, model, both optimizers, both schedulers, wandb_id,
n_averaged}, src/agent/train.py:497-560).

Here the whole TrainState (params + optimizer states + step counter + rng +
EMA/SWA averages) is one pytree; schedulers need no state (pure functions
of the step counter). `extra` carries host-side metadata (cnt_batch,
wandb run id, config digest)."""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from open_pi_zero_tpu.training.train_step import TrainState

STATE_DIR = "state"
META_FILE = "meta.json"


def save_checkpoint(path: str, state: TrainState, extra: Optional[dict] = None):
    """A checkpoint is COMPLETE only when both the orbax state dir and
    meta.json exist (auto-resume checks both, agents/train.py). meta.json
    is written atomically (tmp + rename) so a preemption can never leave a
    truncated file that parses as valid-but-empty metadata."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        # collective: EVERY process must call save (orbax barriers inside)
        ckptr.save(os.path.join(path, STATE_DIR), state, force=True)
    if jax.process_index() == 0:
        tmp = os.path.join(path, META_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(extra or {}, f)
        os.replace(tmp, os.path.join(path, META_FILE))


def restore_checkpoint(path: str, abstract_state: TrainState) -> tuple:
    """abstract_state: a TrainState with the target structure (e.g. from
    init_train_state — values may be real or jax.ShapeDtypeStruct)."""
    path = os.path.abspath(path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape")
        else x,
        abstract_state,
    )
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(path, STATE_DIR), abstract)
    meta_path = os.path.join(path, META_FILE)
    extra: dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            extra = json.load(f)
    return state, extra


def save_params(path: str, params: dict):
    """Params-only export (for eval/serving)."""
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(os.path.abspath(path), "params"), params, force=True)


def restore_params(path: str, abstract_params: dict) -> dict:
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), abstract_params
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(os.path.abspath(path), "params"), abstract)
