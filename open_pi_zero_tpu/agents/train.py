"""TrainAgent: the full training workspace (reference src/agent/train.py).

TPU-shape differences from the reference (by design, not omission):
  - DDP + no_sync + autocast + bnb 8-bit Adam become ONE jitted train step
    over a `data` mesh (gradient psum inserted by XLA; grad accumulation is
    a lax.scan inside the step; optional int8 optimizer states in optax).
  - preprocess_batch (tokenize + image normalize) stays on host numpy,
    exactly like the reference's CPU-side VLAProcessor call
    (train.py:271-314), then one device_put of the sharded batch.
  - checkpointing is orbax on the whole TrainState pytree; schedulers are
    pure functions of the step counter so they need no saved state.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np

from open_pi_zero_tpu.config import (
    ConfigDict,
    pizero_config_from_dict,
    training_config_from_dict,
)
from open_pi_zero_tpu.models import convert, pizero
from open_pi_zero_tpu.parallel import make_mesh, replicate, shard_batch
from open_pi_zero_tpu.processing import FakeTokenizer, VLAProcessor
from open_pi_zero_tpu.training import averaging as avg_lib
from open_pi_zero_tpu.training import checkpoint as ckpt_lib
from open_pi_zero_tpu.training import optimizer as opt_lib
from open_pi_zero_tpu.training.train_step import (
    init_train_state,
    make_jitted_train_step,
)
from open_pi_zero_tpu.utils.metric import get_action_accuracy, l1_loss
from open_pi_zero_tpu.utils.monitor import Timer, log_execution_time

log = logging.getLogger(__name__)


def _strip_lora(tree):
    """Drop `<name>_lora` adapter subtrees — the abstract shape of a plain
    float checkpoint (ops/lora.py stores adapters as sibling leaves)."""
    if isinstance(tree, dict):
        return {
            k: _strip_lora(v) for k, v in tree.items() if not k.endswith("_lora")
        }
    return tree


def _graft(dst, src):
    """Deep-merge `src` values into `dst` where keys exist (adapter leaves
    absent from `src` keep their fresh initialization)."""
    if isinstance(src, dict) and isinstance(dst, dict):
        out = dict(dst)
        for k, v in src.items():
            out[k] = _graft(dst[k], v)
        return out
    return src


def _load_tokenizer(cfg: ConfigDict):
    path = cfg.get("pretrained_model_path")
    if path and os.path.exists(str(os.path.expanduser(path))):
        from open_pi_zero_tpu.processing import load_paligemma_tokenizer

        return load_paligemma_tokenizer(os.path.expanduser(path))
    log.warning("pretrained_model_path missing; using FakeTokenizer (tests only)")
    return FakeTokenizer(image_token_id=int(cfg.get("image_token_index", 257152)))


class TrainAgent:
    def __init__(self, cfg: ConfigDict, dataset=None, val_dataset=None):
        self.cfg = cfg
        self.seed = int(cfg.get("seed", 42))
        self.debug = bool(cfg.get("debug", False))
        self.log_dir = os.path.expanduser(str(cfg.get("log_dir", "/tmp/opz_train")))
        self.ckpt_dir = os.path.join(self.log_dir, "checkpoint")
        os.makedirs(self.ckpt_dir, exist_ok=True)

        self.model_cfg = pizero_config_from_dict(cfg)
        self.train_cfg = training_config_from_dict(cfg)

        # ---- parallelism / batch math (reference train.py:134-139) ----
        n_devices = jax.device_count()
        self.mesh = make_mesh(n_data=n_devices)
        gbs = self.train_cfg.global_batch_size
        pbs = self.train_cfg.per_device_batch_size
        self.grad_accum = max(1, gbs // (pbs * n_devices))
        assert gbs % (pbs * n_devices) == 0, (
            f"global_batch_size {gbs} not divisible by per_device {pbs} x "
            f"devices {n_devices}"
        )
        self.step_batch_size = pbs * jax.local_device_count()  # per microbatch, host
        log.info(
            "devices=%d accum=%d per-device=%d global=%d",
            n_devices, self.grad_accum, pbs, gbs,
        )

        # ---- model params ----
        self.params = self._build_params()

        # ---- optimizer / state ----
        self.tx = opt_lib.build_optimizer(self.train_cfg, self.params)
        state = init_train_state(
            self.params, self.tx, jax.random.key(self.seed), self.train_cfg
        )
        self._state_sharding = None
        if bool(cfg.get("zero1", False)) and n_devices > 1:
            # ZeRO-1: optimizer states + EMA sharded over data (the 3B model
            # with Adam states does not fit a 16 GB v5e otherwise)
            from open_pi_zero_tpu.training.train_step import (
                shard_state_zero1,
                zero1_state_sharding,
            )

            self.state = shard_state_zero1(state, self.mesh)
            self._state_sharding = zero1_state_sharding(state, self.mesh)
        else:
            self.state = replicate(self.mesh, state)
        del self.params  # single source of truth: state.params

        self.cnt_batch = 0
        self._wandb_id: Optional[str] = None
        resume = cfg.get("resume_checkpoint_path")
        if resume == "auto":
            # elastic restarts: pick up the newest checkpoint if any
            # (replaces torchrun --max-restarts + resume path plumbing,
            # reference slurm/train_multi_node.sh:45-49)
            resume = self._latest_checkpoint()
        if resume:
            self.state, extra = ckpt_lib.restore_checkpoint(str(resume), self.state)
            self.cnt_batch = int(extra.get("cnt_batch", 0))
            self._wandb_id = extra.get("wandb_id")
            log.info("resumed from %s at update %d", resume, int(self.state.step))

        # ---- data ----
        self.dataset = dataset
        self.val_dataset = val_dataset
        if self.dataset is None and cfg.get("data") is not None:
            from open_pi_zero_tpu.agents.dataset import RLDSInterleavedDataset

            self.dataset = RLDSInterleavedDataset(
                cfg.data.train, train=True, seed=self.seed
            )
            if cfg.data.get("val") is not None and cfg.get("eval_freq"):
                val_cfg = ConfigDict({**cfg.data.train, **cfg.data.val})
                self.val_dataset = RLDSInterleavedDataset(
                    val_cfg, train=False, seed=self.seed
                )

        # ---- host-side processor ----
        self.processor = VLAProcessor(
            _load_tokenizer(cfg),
            num_image_tokens=self.model_cfg.siglip.num_image_tokens,
            max_seq_len=self.model_cfg.max_image_text_tokens,
            tokenizer_padding=str(cfg.get("tokenizer_padding", "max_length")),
        )

        # ---- compiled steps ----
        self.train_step = make_jitted_train_step(
            self.model_cfg, self.train_cfg, self.tx, self.mesh, self.grad_accum,
            state_sharding=self._state_sharding,
        )
        self._infer_fn = None  # compiled lazily on first validate()

        # ---- schedule ----
        self.n_updates = int(cfg.get("n_updates", 0))
        self.log_freq = int(cfg.get("log_freq", 16))
        self.save_model_freq = int(cfg.get("save_model_freq", 0) or 0)
        self.save_model_start = int(cfg.get("save_model_start", 0) or 0)
        self.eval_freq = int(cfg.get("eval_freq", 0) or 0)
        self.eval_size = int(cfg.get("eval_size", 0) or 0)
        self.eval_thresholds = list(cfg.get("eval_thresholds", [0.05, 0.1, 0.2, 0.3, 0.5]))

        self.wandb = None
        if cfg.get("wandb") and not self.debug:
            try:
                import wandb

                # NOTE: on resume, wandb drops log() calls at steps the run
                # already has (updates between the restored checkpoint and
                # the crash) — same gap the reference leaves.
                run = wandb.init(
                    project=str(cfg.wandb.get("project", "open-pi-zero-tpu")),
                    name=str(cfg.get("name", "run")),
                    config=dict(cfg),
                    id=self._wandb_id,  # resume the run across restarts
                    resume="allow" if self._wandb_id else None,
                )
                self._wandb_id = run.id
                self.wandb = wandb  # only after a successful init
            except Exception as e:  # pragma: no cover - wandb not in test env
                log.warning("wandb disabled: %s", e)

    def _latest_checkpoint(self) -> Optional[str]:
        """Newest COMPLETE checkpoint (state dir + meta present — a save
        interrupted by preemption leaves a partial ckpt_N that must not be
        picked, or elastic restarts would crash-loop on it). On multi-host
        pods the choice is made by process 0 and broadcast so every host
        restores the same step."""
        import re

        best, best_step = None, -1
        if jax.process_index() == 0 and os.path.isdir(self.ckpt_dir):
            for d in os.listdir(self.ckpt_dir):
                m = re.fullmatch(r"ckpt_(\d+)", d)
                path = os.path.join(self.ckpt_dir, d)
                complete = os.path.isdir(
                    os.path.join(path, ckpt_lib.STATE_DIR)
                ) and os.path.exists(os.path.join(path, ckpt_lib.META_FILE))
                if m and complete and int(m.group(1)) > best_step:
                    best, best_step = path, int(m.group(1))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            best_step = int(
                multihost_utils.broadcast_one_to_all(np.int32(best_step))
            )
            best = (
                os.path.join(self.ckpt_dir, f"ckpt_{best_step}")
                if best_step >= 0
                else None
            )
        return best

    # ------------------------------------------------------------------ #
    @log_execution_time(log)
    def _build_params(self) -> dict:
        params = pizero.init_params(jax.random.key(self.seed), self.model_cfg)
        path = self.cfg.get("pretrained_model_path")
        if bool(self.cfg.get("load_pretrained_weights", False)) and path:
            path = os.path.expanduser(str(path))
            tensors = convert.load_safetensors_dir(path)
            pretrained = convert.convert_paligemma(tensors, self.model_cfg)
            params = convert.merge_pretrained(params, pretrained)
            log.info("loaded pretrained PaliGemma weights from %s", path)
        base_ckpt = self.cfg.get("base_params_checkpoint")
        if base_ckpt:
            # warm-start base weights from a trained checkpoint's exported
            # (EMA-blended) float params — the QLoRA fine-tune entry: the
            # loaded kernels become the frozen NF4 bases below while the
            # freshly-initialized LoRA adapters stay. The saved tree has no
            # adapter leaves, so restore against the adapter-stripped
            # abstract and graft the result back in. (Reference analogue:
            # resume/pretrained load feeding the `quantize`+`lora` train
            # tier, src/agent/train.py:94-128 + lora.py:83-100.)
            loaded = ckpt_lib.restore_params(
                os.path.expanduser(str(base_ckpt)), _strip_lora(params)
            )
            params = _graft(params, loaded)
            log.info("warm-started base weights from %s", base_ckpt)
        # QLoRA: mixtures flagged use_quantize keep their (frozen) base in
        # blockwise NF4 — the reference's bnb Linear4bit training tier
        # (get_layer quantize branches, reference lora.py:83-100; enabled
        # by the train configs' `quantize` flag). Adapters stay float;
        # train_step gives integer payload leaves zero gradients and the
        # optimizer labels them frozen.
        from open_pi_zero_tpu.ops import lora as lora_lib

        qparams = lora_lib.quantize_per_model_config(params, self.model_cfg)
        if qparams is not params:
            log.info("quantized frozen base weights (NF4) per config")
        params = qparams
        counts = opt_lib.trainable_param_count(params, self.train_cfg.train_vlm)
        log.info("params: %s", {k: f"{v:.3f}B" for k, v in counts.items()})
        return params

    def _action_lr_at(self, update: int) -> float:
        from open_pi_zero_tpu.training import schedules

        sched = schedules.from_config(
            self.train_cfg.action_lr, self.train_cfg.action_lr_scheduler
        )
        return float(sched(update))

    # ------------------------------------------------------------------ #
    def preprocess_batch(self, batch: dict) -> dict:
        """Frame batch (numpy, from the RLDS pipeline) -> model inputs
        (reference train.py:271-314). Window dim (=1) is squeezed; text is
        tokenized on host; images are [0,255] uint8 -> normalized f32."""
        obs = batch["observation"]
        images = obs["image_primary"]
        if images.ndim == 5:  # [B, W, H, W, C] window
            images = images[:, -1]
        texts = [
            t.decode("utf-8") if isinstance(t, bytes) else str(t)
            for t in np.asarray(batch["task"]["language_instruction"]).reshape(-1)
        ]
        model_inputs = self.processor(texts, images.astype(np.uint8))
        proprios = np.asarray(obs["proprio"], np.float32)
        if proprios.ndim == 2:
            proprios = proprios[:, None]
        actions = np.asarray(batch["action"], np.float32)
        if actions.ndim == 4:  # [B, W, H, A]
            actions = actions[:, -1]
        return {
            "input_ids": model_inputs["input_ids"],
            "pixel_values": model_inputs["pixel_values"],
            "attention_mask": model_inputs["attention_mask"],
            "proprios": proprios,
            "actions": actions,
        }

    def _stack_accum(self, batches: list) -> dict:
        if self.grad_accum == 1:
            return batches[0]
        return jax.tree.map(lambda *xs: np.stack(xs), *batches)

    def _shard_train_batch(self, batch: dict) -> dict:
        """Global batch assembly with the batch axis on `data` — axis 1 when
        the accum axis leads (must agree with make_jitted_train_step's
        in_shardings). Multi-host correctness is handled by shard_batch."""
        from jax.sharding import PartitionSpec as P

        spec = P(None, "data") if self.grad_accum > 1 else P("data")
        return shard_batch(self.mesh, batch, spec)

    # ------------------------------------------------------------------ #
    def run(self):
        """The training loop (reference train.py:249-495)."""
        assert self.dataset is not None, "no dataset configured"
        from collections import deque

        it = self.dataset.iterator(self.step_batch_size)
        timer = Timer()
        # device-side metrics, host-synced only at log boundaries — a
        # float() per step would block the host on every dispatch and
        # serialize batch preprocessing into the step time
        losses = deque(maxlen=self.log_freq)
        update = int(self.state.step)

        while update < self.n_updates:
            micro = []
            for _ in range(self.grad_accum):
                micro.append(self.preprocess_batch(next(it)))
                self.cnt_batch += 1
            batch = self._shard_train_batch(self._stack_accum(micro))

            self.state, metrics = self.train_step(self.state, batch)
            update += 1
            losses.append(metrics["loss"])

            if update % self.log_freq == 0:
                avg_loss = float(np.mean(jax.device_get(list(losses))))
                lr = float(self._action_lr_at(update))
                elapsed = timer()
                log.info(
                    "update %d/%d | loss %.4f | grad_norm %.3f | %.2fs/%d updates",
                    update, self.n_updates, avg_loss,
                    float(metrics["grad_norm"]), elapsed, self.log_freq,
                )
                if self.wandb:
                    self.wandb.log(
                        {"loss": avg_loss, "gradient norm": float(metrics["grad_norm"]),
                         "lr": lr},
                        step=update,
                    )

            if self.eval_freq and update % self.eval_freq == 0 and self.val_dataset:
                self.validate(update)

            if (
                self.save_model_freq
                and update >= self.save_model_start
                and update % self.save_model_freq == 0
            ):
                self.save(update)

        self.save(int(self.state.step))
        return self.state

    # ------------------------------------------------------------------ #
    def validate(self, update: int):
        """Held-out L1 + thresholded action accuracy via full KV-cached
        inference (reference train.py:413-459)."""
        it = self.val_dataset.iterator(self.step_batch_size)
        n_batches = max(1, self.eval_size // max(1, self.step_batch_size))
        if self._infer_fn is None:
            self._infer_fn = jax.jit(
                lambda params, rng, b: pizero.infer_action(
                    params, self.model_cfg, rng,
                    b["input_ids"], b["pixel_values"], b["attention_mask"],
                    b["proprios"],
                )
            )
        eval_params = avg_lib.eval_params(self.state.avg, self.state.params)
        accs, l1s = [], []
        rng = jax.random.key(self.seed + update)
        for i in range(n_batches):
            try:
                batch = self.preprocess_batch(next(it))
            except StopIteration:
                break
            rng, sub = jax.random.split(rng)
            # shard gt through the same global-batch assembly as the inputs:
            # on multi-host, shard_batch builds a GLOBAL batch of
            # local_B * n_hosts, so host-local gt would shape-mismatch pred.
            # Metrics on global arrays reduce to replicated scalars, which
            # every host can convert.
            sharded = shard_batch(self.mesh, batch)
            gt = sharded.pop("actions")
            pred = self._infer_fn(eval_params, sub, sharded)
            accs.append(
                np.asarray(
                    jax.device_get(get_action_accuracy(gt, pred, self.eval_thresholds))
                )
            )
            l1s.append(float(l1_loss(gt, pred)))
        if not accs:
            return
        acc = np.mean(accs, axis=0)
        l1 = float(np.mean(l1s))
        log.info(
            "eval @ %d | l1 %.4f | acc %s",
            update, l1,
            {t: f"{a:.3f}" for t, a in zip(self.eval_thresholds, acc)},
        )
        if self.wandb:
            payload = {f"eval acc - thres {t}": a for t, a in zip(self.eval_thresholds, acc)}
            payload["eval l1"] = l1
            self.wandb.log(payload, step=update)

    # ------------------------------------------------------------------ #
    @log_execution_time(log)
    def save(self, update: int):
        # every process participates — orbax save is a collective with
        # cross-process barriers; rank-0-only would deadlock a pod. Pass the
        # live (possibly ZeRO-1-sharded) state: StandardCheckpointer handles
        # sharded jax.Arrays natively, whereas a device_get would raise on
        # non-fully-addressable optimizer shards and needlessly gather the
        # full 3B state to host on single-host runs.
        path = os.path.join(self.ckpt_dir, f"ckpt_{update}")
        ckpt_lib.save_checkpoint(
            path, self.state,
            extra={"cnt_batch": self.cnt_batch, "wandb_id": self._wandb_id},
            # eval-ready export (EMA-blended) so EvalAgent/serving can load
            # this directory directly via restore_params
            eval_params=avg_lib.eval_params(self.state.avg, self.state.params),
        )
        log.info("saved checkpoint %s", path)
