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


def save_checkpoint(
    path: str,
    state: TrainState,
    extra: Optional[dict] = None,
    eval_params: Optional[dict] = None,
):
    """A checkpoint is COMPLETE only when both the orbax state dir and
    meta.json exist (auto-resume checks both, agents/train.py). meta.json
    is written atomically (tmp + rename) so a preemption can never leave a
    truncated file that parses as valid-but-empty metadata.

    `eval_params` (typically the EMA-blended averaging.eval_params) is
    additionally exported under `params/` so the SAME checkpoint directory
    feeds both auto-resume (full state) and EvalAgent/serving
    (restore_params) — the reference's .pt bundles model+EMA+optimizers in
    one file for the same reason (reference src/agent/train.py:497-560).
    Written before meta.json, which stays the completion marker."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        # collective: EVERY process must call save (orbax barriers inside)
        ckptr.save(os.path.join(path, STATE_DIR), state, force=True)
        if eval_params is not None:
            ckptr.save(os.path.join(path, "params"), eval_params, force=True)
    if jax.process_index() == 0:
        extra = dict(extra or {})
        extra.update(_quant_meta(state.params))
        tmp = os.path.join(path, META_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(extra, f)
        os.replace(tmp, os.path.join(path, META_FILE))


def _quant_meta(params) -> dict:
    """Stamp the 4-bit nibble-packing layout version when the tree carries
    quantized bases, so a payload saved under an older packing fails loudly
    at restore instead of silently dequantizing scrambled weights (the
    version lives in metadata, not the payload dict — an extra scalar leaf
    would break lax.scan over stacked layer dicts)."""
    from open_pi_zero_tpu.ops.lora import has_quantized_bases
    from open_pi_zero_tpu.ops.quantization import QUANT_LAYOUT_VERSION

    if has_quantized_bases(params):
        return {"quant_layout_version": QUANT_LAYOUT_VERSION}
    return {}


def _check_quant_meta(params, extra: dict, path: str) -> None:
    from open_pi_zero_tpu.ops.lora import has_quantized_bases
    from open_pi_zero_tpu.ops.quantization import QUANT_LAYOUT_VERSION

    if not has_quantized_bases(params):
        return
    got = extra.get("quant_layout_version")
    if got != QUANT_LAYOUT_VERSION:
        raise ValueError(
            f"checkpoint {path} carries quantized bases with packing layout "
            f"version {got!r}, but this code expects "
            f"{QUANT_LAYOUT_VERSION} — dequantizing would silently scramble "
            "the weights. Re-quantize from the float checkpoint "
            "(ops.lora.quantize_per_model_config)."
        )


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
    _check_quant_meta(state.params, extra, path)
    return state, extra


def save_params(path: str, params: dict):
    """Params-only export (for eval/serving)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
    if jax.process_index() == 0:
        meta = _quant_meta(params)
        if meta:
            tmp = os.path.join(path, META_FILE + ".tmp")
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, os.path.join(path, META_FILE))


def restore_params(path: str, abstract_params: dict) -> dict:
    path = os.path.abspath(path)
    if not os.path.exists(os.path.join(path, "params")) and os.path.exists(
        os.path.join(path, STATE_DIR)
    ):
        raise FileNotFoundError(
            f"checkpoint {path} holds a full TrainState ('{STATE_DIR}/') but "
            "no eval-params export ('params/') — it was saved before "
            "TrainAgent exported eval params alongside the state. Load it "
            "with restore_checkpoint(...) and take "
            "averaging.eval_params(state.avg, state.params), or re-save."
        )
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), abstract_params
    )
    with ocp.StandardCheckpointer() as ckptr:
        try:
            params = ckptr.restore(os.path.join(path, "params"), abstract)
        except ValueError:
            # Cross-topology restore (e.g. an 8-device CPU-mesh checkpoint
            # loaded on the single axon TPU chip): orbax cannot infer a
            # sharding from the saved metadata, so pin a concrete
            # single-device sharding. Same-topology restores keep the
            # inference path above (no behavior change).
            sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
                abstract_params,
            )
            params = ckptr.restore(os.path.join(path, "params"), abstract)
    meta_path = os.path.join(path, META_FILE)
    extra: dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            extra = json.load(f)
    _check_quant_meta(params, extra, path)
    return params
