"""End-to-end closed-loop learning demonstration on SimplerLite.

Proves the ENTIRE stack learns, not just that each stage runs: scripted
expert -> RLDS demos written by data/rlds.py -> the unmodified production
bridge pipeline (bridge_transform: gripper binarize + action relabel +
bound-normalization) -> TrainAgent (jitted DP train step over the device
mesh, flow-matching loss) -> orbax checkpoint -> EvalAgent episode loop
through the real BridgeSimplerAdapter (Lanczos4 resize, proprio frame
math, denormalization, euler->axangle) -> closed-loop success rate, the
reference's acceptance metric (reference README.md:90-114,
src/agent/eval.py:60-179). A random-init control policy is scored on the
same episode seeds as the floor.

Run on the CPU mesh (training a tiny model; the axon TPU decomposes fp32
einsums to bf16 — CLAUDE.md):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo python scripts/demo_closed_loop.py \
      --workdir /tmp/opz_demo --out E2E_CLOSED_LOOP.json
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np


def model_geometry(hidden: int, layers: int, proprio_dim: int = 7,
                   heads: int = 4, kv_heads: int = 1,
                   head_dim: int = 0) -> dict:
    """Config-dict geometry block shared by train and eval (image 56x56,
    patch 14 -> 16 image tokens; text budget 8 -> seq 24). proprio_dim is
    7 for the bridge-family tasks (POS_EULER) and 8 for the fractal family
    (POS_QUAT, reference oxe/__init__.py:40-62). heads/kv_heads/head_dim
    expose the trunk GQA ratio for scale-up runs (the bridge recipe is
    8Q/1KV, reference config/train/bridge.yaml:174-177)."""
    h2 = hidden // 2
    return {
        "vocab_size": 10_000,
        "image_token_index": 500,
        "pad_token_id": 0,
        "max_image_text_tokens": 24,
        "max_seq_len": 24,
        "cond_steps": 1,
        "horizon_steps": 4,
        "action_dim": 7,
        "proprio_dim": proprio_dim,
        "num_inference_steps": 10,
        "time_hidden_size": 2 * h2,
        "mixture": {
            "vlm": {"hidden_size": hidden, "intermediate_size": 2 * hidden,
                    "cache": True, "rope_theta": 10000.0},
            "proprio": {"hidden_size": h2, "intermediate_size": 2 * h2,
                        "cache": True, "use_final_norm": True, "rope_theta": 100.0},
            "action": {"hidden_size": h2, "intermediate_size": 2 * h2,
                       "use_final_norm": True, "rope_theta": 100.0},
        },
        "vision": {"config": {
            "hidden_size": h2, "intermediate_size": 2 * h2,
            "num_hidden_layers": layers, "num_attention_heads": 4,
            "image_size": 56, "patch_size": 14, "num_image_tokens": 16,
        }},
        "vision_projector": {"config": {"vision_config": {"projection_dim": hidden}}},
        "joint": {"config": {
            "num_hidden_layers": layers, "num_attention_heads": heads,
            "num_key_value_heads": kv_heads,
            "head_dim": head_dim or max(16, hidden // 4),
        }},
    }


def run_eval(cfg_geometry, params, stats_path, tokenizer, n_episodes, seed,
             act_steps=4, refine_from_prev=0.0, task="reach", adapter_name="bridge",
             pad_proprio_to=None, env_task=None):
    from open_pi_zero_tpu.agents.env_adapter import make_adapter
    from open_pi_zero_tpu.agents.eval import EvalAgent
    from open_pi_zero_tpu.config import ConfigDict
    from open_pi_zero_tpu.envs import make_env

    adapter = make_adapter(
        adapter_name,
        dataset_statistics_path=stats_path,
        num_image_tokens=16,
        image_size=(56, 56),
        max_seq_len=24,
        tokenizer=tokenizer,
        pad_proprio_to=pad_proprio_to,
    )
    cfg = ConfigDict({
        "seed": seed,
        "log_dir": "/tmp/opz_demo_eval",
        "n_eval_episode": n_episodes,
        "n_video": 0,
        "record_video": False,
        "act_steps": act_steps,
        "refine_from_prev": refine_from_prev,
        "env": {"task": f"simpler_lite_{env_task or task}"},  # first reset keys placement
        **cfg_geometry,
    })
    env = make_env(f"simpler_lite_{env_task or task}", seed=seed)
    agent = EvalAgent(cfg, env=env, adapter=adapter, params=params)
    return agent.run()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/opz_demo")
    ap.add_argument("--out", default=None, help="artifact JSON path")
    # defaults = the measured recipe behind E2E_CLOSED_LOOP.json (95%
    # success on 40 unseen layouts; loss breaks ~0.13 -> 0.07 around
    # update 5-6k, so 8k updates is the budget that actually learns)
    ap.add_argument("--task", default="reach",
                    choices=["reach", "pick_place", "multi", "drawer",
                             "drawer_lever", "multi_family", "tri_family", "tri_lever"])
    ap.add_argument("--n-demos", type=int, default=600)
    ap.add_argument("--drawer-n-demos", type=int, default=None,
                    help="demo count for the drawer dataset in mixed runs "
                         "(default: --n-demos); drawer needs more demos per "
                         "language target than the bridge tasks")
    ap.add_argument("--n-updates", type=int, default=8000)
    ap.add_argument("--n-eval-episodes", type=int, default=40)
    ap.add_argument("--global-batch", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=96)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--kv-heads", type=int, default=1)
    ap.add_argument("--head-dim", type=int, default=0,
                    help="0 = max(16, hidden//4)")
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval-seed", type=int, default=1000,
                    help="episode layouts disjoint from the demo seed 0")
    ap.add_argument("--drawer-target", default=None,
                    choices=["top", "middle", "bottom"],
                    help="restrict the drawer task to ONE language target "
                         "(demos AND eval) — isolates per-target data "
                         "efficiency from the 3-target mix")
    ap.add_argument("--drawer-start-coverage", action="store_true",
                    help="collect drawer demos from full-workspace eef "
                         "starts (anti-covariate-shift; eval starts stay "
                         "episode-keyed defaults)")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the newest checkpoint in --workdir "
                         "(raise --n-updates past the finished run's count)")
    ap.add_argument("--save-freq", type=int, default=0,
                    help="also checkpoint every N updates (0 = final only); "
                         "intermediate checkpoints let the learning curve be "
                         "scored without retraining")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("demo")
    import jax

    from open_pi_zero_tpu.config import ConfigDict
    from open_pi_zero_tpu.envs import warm_tokenizer, write_demo_dataset
    from open_pi_zero_tpu.processing import FakeTokenizer

    os.makedirs(args.workdir, exist_ok=True)
    t0 = time.time()

    # ---- 1. expert demos -> RLDS (our writer) ----
    # "multi": one policy on BOTH tasks via the interleaved multi-dataset
    # path (sample_from_datasets + transition-count weight balancing +
    # per-dataset statistics — the reference's OXE-mix machinery)
    multi = args.task in ("multi", "multi_family", "tri_family", "tri_lever",
                          "drawer_lever")
    drawer = args.task in ("drawer", "drawer_lever")  # fractal/EDR family: raw RT-1 schema,
    # rt1_transform standardization, EDR sticky-gripper adapter at eval
    multi_family = args.task == "multi_family"  # bridge reach (7-dim
    # POS_EULER proprio) + fractal drawer (8-dim POS_QUAT) in ONE policy
    # via the stock `oxe_simple` mix — exercises cross-family proprio
    # zero-padding (pad_actions_and_proprio) in a learned loop
    tri_family = args.task in ("tri_family", "tri_lever")  # three-task cross-
    # family policy: reach + pick_place (bridge) + drawer (fractal)
    if args.task == "tri_lever":
        # tri-family WITH the drawer language-grounding lever: drawer
        # primary = no-coverage per-target-balanced, + coverage secondary
        from open_pi_zero_tpu.envs import register_simpler_lite_tri_lever_mix

        mix = register_simpler_lite_tri_lever_mix()
        demo_sets = [("reach", "bridge_dataset"),
                     ("pick_place", "simpler_lite_pp"),
                     ("drawer", "fractal20220817_data"),
                     ("drawer_cov", "fractal_drawer_cov")]
    elif tri_family:
        from open_pi_zero_tpu.envs import register_simpler_lite_tri_mix

        mix = register_simpler_lite_tri_mix()
        demo_sets = [("reach", "bridge_dataset"),
                     ("pick_place", "simpler_lite_pp"),
                     ("drawer", "fractal20220817_data")]
    elif multi_family:
        mix = "oxe_simple"
        demo_sets = [("reach", "bridge_dataset"), ("drawer", "fractal20220817_data")]
    elif args.task == "multi":
        from open_pi_zero_tpu.envs import register_simpler_lite_mix

        mix = register_simpler_lite_mix()
        demo_sets = [("reach", "bridge_dataset"), ("pick_place", "simpler_lite_pp")]
    elif args.task == "drawer_lever":
        # the language-grounding lever (round-4 verdict task 3 /
        # docs/DRAWER_INVESTIGATION.md): PRIMARY no-coverage per-target-
        # balanced demos + SECONDARY coverage-start demos at half weight,
        # through the same interleaved weighted-mix machinery as the
        # cross-family runs
        from open_pi_zero_tpu.envs import register_drawer_lever_mix

        mix = register_drawer_lever_mix()
        demo_sets = [("drawer", "fractal20220817_data"),
                     ("drawer_cov", "fractal_drawer_cov")]
    elif drawer:
        mix = "fractal"
        demo_sets = [("drawer", "fractal20220817_data")]
    else:
        mix = "bridge"
        demo_sets = [(args.task, "bridge_dataset")]
    # demo-cache key: collection settings are encoded in the rlds dir name
    # so a rerun with different --n-demos / --drawer-target /
    # --drawer-start-coverage can never silently train on stale demos
    # (the per-dataset dir names inside must stay registry names)
    tag = f"_n{args.n_demos}"
    if args.task in ("drawer_lever", "tri_lever"):
        tag += "_lever"
    if args.drawer_n_demos:
        tag += f"_dn{args.drawer_n_demos}"
    if args.drawer_target:
        tag += f"_{args.drawer_target}"
    if args.drawer_start_coverage:
        tag += "_cov"
    data_dir = os.path.join(args.workdir, "rlds" + tag)
    expert_rate = {}
    for task, name in demo_sets:
        ds_dir = os.path.join(data_dir, name)
        if not os.path.exists(os.path.join(ds_dir, "features.json")):
            if task in ("drawer", "drawer_cov"):
                from open_pi_zero_tpu.envs import write_fractal_demo_dataset

                lever = args.task in ("drawer_lever", "tri_lever")
                n = args.drawer_n_demos or args.n_demos
                expert_rate[task] = write_fractal_demo_dataset(
                    ds_dir,
                    # lever: secondary coverage set is half the primary
                    n // 2 if task == "drawer_cov" else n,
                    # distinct demo seed for the secondary set so its
                    # layouts/episodes don't duplicate the primary's
                    seed=1000 if task == "drawer_cov" else 0,
                    dataset_name=name,
                    target=args.drawer_target,
                    start_coverage=(args.drawer_start_coverage
                                    or task == "drawer_cov"),
                    balance_targets=lever,
                )
            else:
                expert_rate[task] = write_demo_dataset(
                    ds_dir, args.n_demos, seed=0, task=task, dataset_name=name
                )
        else:
            expert_rate[task] = None
            log.info("reusing demos at %s", ds_dir)
    expert_rate = expert_rate if multi else expert_rate[args.task]
    t_demos = time.time()

    # ---- 2. train through the production pipeline ----
    fractal_proprio = drawer or multi_family or tri_family  # POS_QUAT width
    geometry = model_geometry(args.hidden, args.layers,
                              proprio_dim=8 if fractal_proprio else 7,
                              heads=args.heads, kv_heads=args.kv_heads,
                              head_dim=args.head_dim)
    n_dev = jax.device_count()
    per_dev = max(1, args.global_batch // n_dev)
    train_cfg = ConfigDict({
        "name": "simpler_lite_demo",
        "seed": 0,
        "log_dir": os.path.join(args.workdir, "train"),
        "load_pretrained_weights": False,
        "n_updates": args.n_updates,
        "log_freq": 50,
        "save_model_freq": args.save_freq,
        "eval_freq": 0,
        "global_batch_size": per_dev * n_dev,
        "per_device_batch_size": per_dev,
        "action_lr": args.lr,
        "vlm_lr": args.lr,
        "action_lr_scheduler": {"warmup_steps": min(100, args.n_updates // 5),
                                "first_cycle_steps": args.n_updates, "min_lr": 1e-5},
        "vlm_lr_scheduler": {"warmup_steps": min(100, args.n_updates // 5),
                             "first_cycle_steps": args.n_updates, "min_lr": 1e-5},
        "use_ema": True,
        "ema_start": max(0, args.n_updates // 2),
        "resume_checkpoint_path": "auto" if args.resume else None,
        **geometry,
        "data": {"train": {
            "dataset_mix": mix,
            "data_path": data_dir,
            "split": "train",
            "window_size": 1,
            "action_horizon": 4,
            "skip_unlabeled": True,
            "load_proprio": True,
            "augment": False,  # fixed camera: crops corrupt pixel<->world

            "shuffle_buffer_size": 20_000,
            "num_parallel_calls": 4,
            # allocate_threads needs >= 1 thread per dataset in the mix
            "traj_transform_threads": max(2, len(demo_sets)),
            "traj_read_threads": max(2, len(demo_sets)),
            "resize_size": [56, 56],
            # cross-family mix: pad bridge's 7-dim proprio to fractal's 8
            "max_proprio_dim": 8 if (multi_family or tri_family) else None,
        }},
    })
    from open_pi_zero_tpu.agents.train import TrainAgent
    from open_pi_zero_tpu.training import averaging as avg_lib

    agent = TrainAgent(train_cfg)
    warm_tokenizer(agent.processor.tokenizer)

    # ---- 3. export per-dataset pipeline statistics for the eval adapter
    # BEFORE training starts (they are pipeline properties, available as
    # soon as the dataset is built) so a run cut short mid-budget can
    # still be evaluated by scripts/eval_scaleup_ckpt.py from its
    # intermediate checkpoints (round-4 ADVICE.md). dataset_statistics
    # order == mix order; per-task stats must match what training
    # normalizes that task's actions with.
    all_stats = agent.dataset.dataset.dataset_statistics
    stats_paths = {}
    for (task, _), stats in zip(demo_sets, all_stats):
        suffix = "" if task == demo_sets[0][0] else f"_{task}"
        p = os.path.join(args.workdir, f"statistics{suffix}.json")
        with open(p, "w") as f:
            json.dump({"action": stats["action"], "proprio": stats["proprio"]}, f)
        stats_paths[task] = p

    state = agent.run()
    t_train = time.time()

    params = jax.device_get(avg_lib.eval_params(state.avg, state.params))

    # ---- 4. closed-loop eval: trained vs random-init control ----
    def fresh_tokenizer():
        tok = FakeTokenizer(image_token_id=500)
        warm_tokenizer(tok)
        return tok

    from open_pi_zero_tpu.config import pizero_config_from_dict
    from open_pi_zero_tpu.models import pizero

    rand_params = pizero.init_params(
        jax.random.key(123), pizero_config_from_dict(ConfigDict(geometry))
    )
    trained, control = {}, {}
    # drawer_cov is a TRAINING-mix-only dataset (coverage-start demos of
    # the same drawer env); closed-loop scoring happens once, on the
    # canonical episode-keyed drawer eval
    eval_sets = [(t, n) for t, n in demo_sets if t != "drawer_cov"]
    for task, _ in eval_sets:
        # adapter family follows the TASK (bridge adapter for reach/
        # pick_place, EDR sticky-gripper adapter for drawer); bridge tasks
        # under a cross-family policy pad their 7-dim proprio to 8
        adapter_name = "edr" if task == "drawer" else "bridge"
        pad_to = 8 if ((multi_family or tri_family) and task != "drawer") else None
        env_task = (f"drawer_{args.drawer_target}"
                    if task == "drawer" and args.drawer_target else None)
        trained[task] = run_eval(
            geometry, params, stats_paths[task], fresh_tokenizer(),
            args.n_eval_episodes, args.eval_seed, task=task,
            adapter_name=adapter_name, pad_proprio_to=pad_to, env_task=env_task)
        log.info("trained policy [%s]: %s", task, trained[task])
        control[task] = run_eval(
            geometry, rand_params, stats_paths[task], fresh_tokenizer(),
            args.n_eval_episodes, args.eval_seed, task=task,
            adapter_name=adapter_name, pad_proprio_to=pad_to, env_task=env_task)
        log.info("random-init control [%s]: %s", task, control[task])

    def rates(d):
        if args.task == "drawer_lever":
            return d["drawer"]["success_rate"]
        if multi:
            return {t: d[t]["success_rate"] for t, _ in eval_sets}
        return d[args.task]["success_rate"]

    result = {
        "task": f"simpler_lite_{args.task}"
                + (f"_{args.drawer_target}" if args.drawer_target else ""),
        "n_demos": args.n_demos,
        "n_updates": args.n_updates,
        "n_eval_episodes": args.n_eval_episodes,
        "expert_success_rate": expert_rate,
        "trained_success_rate": rates(trained),
        "random_init_success_rate": rates(control),
        "model": {"hidden": args.hidden, "layers": args.layers,
                  "params": int(sum(
                      np.prod(x.shape) for x in jax.tree.leaves(params)))},
        "timings_s": {"demos": round(t_demos - t0, 1),
                      "train": round(t_train - t_demos, 1),
                      "eval": round(time.time() - t_train, 1)},
        "devices": n_dev,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
