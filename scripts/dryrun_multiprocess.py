#!/usr/bin/env python
"""REAL multi-process distributed execution test (2 x jax.distributed).

The reference's only genuinely-exercised distributed mode is 3-node DDP
via torchrun (reference slurm/train_multi_node.sh:43-56: c10d rendezvous,
per-rank dataloaders, DDP grad all-reduce). This script runs our
equivalent with TWO REAL PROCESSES — `jax.distributed.initialize` over a
localhost coordinator, 4 virtual CPU devices per process, one 8-device
global mesh — and checks the multi-process code paths that a
single-process virtual mesh can never execute:

  raw-step   global batch assembly from per-process local shards
             (`shard_batch` -> jax.make_array_from_process_local_data),
             one DP train step; the loss must EQUAL the single-process
             8-device run on the identical global batch (the DDP
             grad-all-reduce equivalence, reference train.py:121-126).
  agent      TrainAgent end-to-end with ZeRO-1 sharded optimizer states:
             per-process dataset shards, orbax COLLECTIVE checkpoint save
             (every process writes its optimizer shards), elastic resume
             where the checkpoint choice is made by process 0 and
             broadcast (agents/train.py _latest_checkpoint), two more
             updates, final save.

Run directly (takes ~2-6 min cold on 1 vCPU, compile-dominated):

  python scripts/dryrun_multiprocess.py

The parent spawns 3 subprocesses (1 single-proc reference + 2 distributed
ranks) with clean JAX env (cpu platform, 8/4 forced host devices); it is
itself safe to run under any JAX platform since it does not import jax.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCAL_DEVICES = 4  # per process; 2 processes -> 8-device global mesh
N_PROC = 2


# --------------------------------------------------------------------------- #
# shared deterministic data (identical in every process)
# --------------------------------------------------------------------------- #


def _global_step_batch(cfg, b):
    """Per-row-varied batch so data-sharding mistakes change the loss."""
    import numpy as np

    rng = np.random.default_rng(42)
    ids = np.zeros((b, cfg.max_image_text_tokens), np.int32)
    ids[:, : cfg.siglip.num_image_tokens] = cfg.image_token_index
    ids[:, cfg.siglip.num_image_tokens] = 2
    for i in range(b):  # distinct text per row
        ids[i, cfg.siglip.num_image_tokens + 1] = 10 + i
    am = (ids != cfg.pad_token_id).astype(np.int32)
    img = rng.normal(size=(b, cfg.siglip.image_size, cfg.siglip.image_size, 3))
    prop = rng.normal(size=(b, cfg.cond_steps, cfg.proprio_dim))
    act = rng.uniform(-1, 1, size=(b, cfg.horizon_steps, cfg.action_dim))
    return {
        "input_ids": ids,
        "pixel_values": img.astype(np.float32),
        "attention_mask": am,
        "proprios": prop.astype(np.float32),
        "actions": act.astype(np.float32),
    }


def _raw_dp_step(local_rows=None):
    """Build state + batch, run ONE jitted DP train step, return the loss.

    `local_rows`: slice of the global batch this process feeds (None =
    single-process, feed everything). The global batch and all seeds are
    identical across modes, so the loss must match bitwise-ish."""
    import jax
    import numpy as np

    from open_pi_zero_tpu.config import TrainingConfig, tiny_pizero_config
    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.parallel import make_mesh, replicate, shard_batch
    from open_pi_zero_tpu.training import optimizer as opt_lib
    from open_pi_zero_tpu.training.train_step import (
        init_train_state,
        make_jitted_train_step,
    )

    from __graft_entry__ import _CPU_COLLECTIVE_TIMEOUTS

    n = jax.device_count()
    cfg = tiny_pizero_config()
    tcfg = TrainingConfig(use_ema=True, ema_start=0)
    mesh = make_mesh(n_data=n)
    params = pizero.init_params(jax.random.key(0), cfg)
    tx = opt_lib.build_optimizer(tcfg, params)
    state = replicate(mesh, init_train_state(params, tx, jax.random.key(1), tcfg))

    batch = _global_step_batch(cfg, b=n)
    if local_rows is not None:
        batch = {k: v[local_rows] for k, v in batch.items()}
    batch = shard_batch(mesh, batch)
    step = make_jitted_train_step(
        cfg, tcfg, tx, mesh=mesh, compiler_options=_CPU_COLLECTIVE_TIMEOUTS
    )
    state, metrics = step(state, batch)
    return float(np.asarray(jax.device_get(metrics["loss"])))


# --------------------------------------------------------------------------- #
# TrainAgent phase: per-process data shards, ZeRO-1, collective save, resume
# --------------------------------------------------------------------------- #


class FakeFrameDataset:
    """Deterministic in-memory stand-in for RLDSInterleavedDataset: yields
    frame batches in the pipeline's output schema. Seeded per process so
    each rank feeds a DISJOINT stream (the reference's per-rank DataLoader,
    train.py:142-146)."""

    def __init__(self, seed: int, image_size=28, proprio_dim=7, action_dim=7,
                 horizon=4):
        self.seed = seed
        self.image_size = image_size
        self.proprio_dim = proprio_dim
        self.action_dim = action_dim
        self.horizon = horizon

    def iterator(self, batch_size: int):
        import numpy as np

        rng = np.random.default_rng(self.seed)
        hw = self.image_size
        while True:
            yield {
                "observation": {
                    "image_primary": rng.integers(
                        0, 255, (batch_size, hw, hw, 3), np.uint8
                    ),
                    "proprio": rng.normal(
                        size=(batch_size, self.proprio_dim)
                    ).astype(np.float32),
                },
                "task": {
                    "language_instruction": np.array(
                        [b"move the block"] * batch_size
                    ),
                },
                "action": rng.uniform(
                    -1, 1, (batch_size, self.horizon, self.action_dim)
                ).astype(np.float32),
            }


def _agent_cfg(workdir: str, n_updates: int, resume: bool):
    from open_pi_zero_tpu.config import ConfigDict

    return ConfigDict({
        "name": "multiproc",
        "seed": 0,
        "log_dir": os.path.join(workdir, "train"),
        "load_pretrained_weights": False,
        "n_updates": n_updates,
        "log_freq": 1,
        "save_model_freq": 2,
        "save_model_start": 0,
        "eval_freq": 0,
        "global_batch_size": 16,  # 8 devices x pbs 1 -> grad_accum 2
        "per_device_batch_size": 1,
        "action_lr": 1e-4,
        "vlm_lr": 1e-4,
        "use_ema": True,
        "ema_start": 0,
        "zero1": True,  # sharded optimizer states: the collective-save case
        "resume_checkpoint_path": "auto" if resume else None,
        # tiny geometry (mirrors config.tiny_pizero_config)
        "vocab_size": 10000,
        "image_token_index": 500,
        "pad_token_id": 0,
        "max_image_text_tokens": 12,
        "max_seq_len": 12,
        "cond_steps": 1,
        "horizon_steps": 4,
        "action_dim": 7,
        "proprio_dim": 7,
        "num_inference_steps": 2,
        "time_hidden_size": 32,
        "mixture": {
            "vlm": {"hidden_size": 64, "intermediate_size": 128, "cache": True,
                    "rope_theta": 10000.0},
            "proprio": {"hidden_size": 32, "intermediate_size": 64, "cache": True,
                        "use_final_norm": True, "rope_theta": 100.0},
            "action": {"hidden_size": 32, "intermediate_size": 64,
                       "use_final_norm": True, "rope_theta": 100.0},
        },
        "vision": {"config": {
            "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "image_size": 28, "patch_size": 14,
            "num_image_tokens": 4,
        }},
        "vision_projector": {"config": {"vision_config": {"projection_dim": 64}}},
        "joint": {"config": {
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 1, "head_dim": 16,
        }},
    })


def _agent_phase(workdir: str) -> dict:
    """Train 2 updates + collective save, then a FRESH agent auto-resumes
    (checkpoint choice broadcast from process 0) and trains 2 more."""
    import jax

    from open_pi_zero_tpu.agents.train import TrainAgent

    pid = jax.process_index()
    ds = FakeFrameDataset(seed=100 + pid)

    agent = TrainAgent(_agent_cfg(workdir, n_updates=2, resume=False), dataset=ds)
    state = agent.run()  # saves ckpt_2 collectively (save_model_freq=2)
    assert int(state.step) == 2
    ckpt2 = os.path.join(agent.ckpt_dir, "ckpt_2")
    assert os.path.isdir(os.path.join(ckpt2, "state")), "collective save missing"
    del agent, state

    # elastic resume: a fresh process-group member picks the newest COMPLETE
    # checkpoint; the choice is made on process 0 and broadcast
    agent2 = TrainAgent(_agent_cfg(workdir, n_updates=4, resume=True), dataset=ds)
    resumed_at = int(agent2.state.step)
    assert resumed_at == 2, f"resume picked step {resumed_at}, want 2"
    state2 = agent2.run()
    final = int(state2.step)
    assert final == 4, f"final step {final}, want 4"

    # ZeRO-1: optimizer states must actually be sharded over data (each
    # process holds only its slice) — replicated states would make the
    # collective save trivially single-writer
    sharded = any(
        not x.sharding.is_fully_replicated
        for x in jax.tree.leaves(state2.opt_state)
        if hasattr(x, "sharding")
    )
    assert sharded, "ZeRO-1 states are fully replicated — not the collective case"
    return {"resumed_at": resumed_at, "final_step": final,
            "zero1_sharded": bool(sharded)}


# --------------------------------------------------------------------------- #
# process entry points
# --------------------------------------------------------------------------- #


def _enable_compile_cache():
    """Same persistent cache the in-process dryrun uses — cold compiles of
    the tiny train step are ~1-4 min each on this 1-vCPU host; warm runs
    make the whole multiprocess phase seconds-scale."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


def run_single(workdir: str):
    """Single-process 8-device reference loss."""
    _enable_compile_cache()
    loss = _raw_dp_step(local_rows=None)
    with open(os.path.join(workdir, "single.json"), "w") as f:
        json.dump({"step_loss": loss}, f)
    print(f"[single] step loss {loss:.6f}")


def run_child(pid: int, port: int, workdir: str):
    import jax

    _enable_compile_cache()
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.local_device_count() == LOCAL_DEVICES, jax.local_device_count()
    assert jax.device_count() == N_PROC * LOCAL_DEVICES, jax.device_count()

    # Warm the Gloo contexts on a trivial program FIRST: the transport's
    # key-exchange has a hardcoded ~30 s timeout, and entering it from the
    # big compiled train step lets compile-time skew between ranks (or a
    # contended host) blow it. A tiny all-reduce puts both ranks at the
    # same program point with a near-zero compile, so the contexts form
    # while skew is minimal.
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from open_pi_zero_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=jax.device_count())
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.arange(LOCAL_DEVICES, dtype=np.float32),
    )
    total = float(jax.jit(lambda v: jnp.sum(v))(x))
    expected = sum(range(LOCAL_DEVICES)) * N_PROC
    assert total == expected, (total, expected)
    print(f"[rank {pid}] gloo warmup ok (sum {total})")

    rows = slice(pid * LOCAL_DEVICES, (pid + 1) * LOCAL_DEVICES)
    loss = _raw_dp_step(local_rows=rows)
    print(f"[rank {pid}] step loss {loss:.6f}")

    agent_result = _agent_phase(workdir)
    print(f"[rank {pid}] agent phase: {agent_result}")

    with open(os.path.join(workdir, f"rank{pid}.json"), "w") as f:
        json.dump({"step_loss": loss, **agent_result}, f)
    jax.distributed.shutdown()


# --------------------------------------------------------------------------- #
# parent: spawn 1 single-proc reference + 2 distributed ranks, compare
# --------------------------------------------------------------------------- #


def _spawn(args, n_devices: int, logfile: str):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["PYTHONPATH"] = REPO  # drop the axon TPU plugin site dir
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
    out = open(logfile, "w")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), *args],
        env=env, cwd=REPO, stdout=out, stderr=subprocess.STDOUT,
    ), out


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_parent(workdir: str | None = None, timeout: int = 1800) -> dict:
    workdir = workdir or tempfile.mkdtemp(prefix="opz_multiproc_")
    os.makedirs(workdir, exist_ok=True)
    port = _free_port()

    # single-process reference first (its own interpreter: 8 local devices)
    p, f = _spawn(["--single", "--workdir", workdir], 2 * LOCAL_DEVICES,
                  os.path.join(workdir, "single.log"))
    rc = p.wait(timeout=timeout)
    f.close()
    if rc != 0:
        sys.stdout.write(open(os.path.join(workdir, "single.log")).read()[-4000:])
        raise RuntimeError(f"single-process reference failed rc={rc}")

    procs = []
    for pid in range(N_PROC):
        args = ["--child", str(pid), "--port", str(port), "--workdir", workdir]
        procs.append(_spawn(args, LOCAL_DEVICES,
                            os.path.join(workdir, f"rank{pid}.log")))
    rcs = []
    for p, f in procs:
        rcs.append(p.wait(timeout=timeout))
        f.close()
    if any(rcs):
        for pid in range(N_PROC):
            log = open(os.path.join(workdir, f"rank{pid}.log")).read()
            sys.stdout.write(f"----- rank {pid} log tail -----\n{log[-4000:]}\n")
        raise RuntimeError(f"distributed ranks failed rcs={rcs}")

    with open(os.path.join(workdir, "single.json")) as fh:
        single = json.load(fh)
    ranks = []
    for pid in range(N_PROC):
        with open(os.path.join(workdir, f"rank{pid}.json")) as fh:
            ranks.append(json.load(fh))

    diff0 = abs(ranks[0]["step_loss"] - single["step_loss"])
    diff_ranks = abs(ranks[0]["step_loss"] - ranks[1]["step_loss"])
    assert diff0 < 5e-5, (
        f"2-process DP loss {ranks[0]['step_loss']} != single-process "
        f"{single['step_loss']} (diff {diff0:.2e})"
    )
    assert diff_ranks < 1e-7, f"ranks disagree on the replicated loss: {diff_ranks}"
    for r in ranks:
        assert r["resumed_at"] == 2 and r["final_step"] == 4 and r["zero1_sharded"]

    result = {
        "n_processes": N_PROC,
        "devices_per_process": LOCAL_DEVICES,
        "single_loss": single["step_loss"],
        "multiproc_loss": ranks[0]["step_loss"],
        "loss_diff_vs_single": diff0,
        "agent": {k: ranks[0][k] for k in ("resumed_at", "final_step",
                                           "zero1_sharded")},
        "ok": True,
    }
    print("multiprocess dryrun:", json.dumps(result))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    if args.single:
        run_single(args.workdir)
    elif args.child is not None:
        run_child(args.child, args.port, args.workdir)
    else:
        run_parent(args.workdir)


if __name__ == "__main__":
    main()
