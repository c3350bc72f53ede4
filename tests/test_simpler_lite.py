"""SimplerLite closed-loop env tests: expert competence, episode-keyed
determinism, proprio parity with the bridge adapter, RLDS demo round-trip
through the production pipeline, and (slow) the full demo script driving
expert -> pipeline -> TrainAgent -> EvalAgent closed loop."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import tensorflow as tf

tf.config.set_visible_devices([], "GPU")

from open_pi_zero_tpu.agents import env_adapter as ea
from open_pi_zero_tpu.agents.dataset import RLDSInterleavedDataset
from open_pi_zero_tpu.config import ConfigDict
from open_pi_zero_tpu.envs import (
    INSTRUCTIONS,
    ReachEnv,
    bridge_proprio,
    scripted_expert,
    warm_tokenizer,
    write_demo_dataset,
)
from open_pi_zero_tpu.processing import FakeTokenizer

STATS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs/statistics/bridge_statistics.json",
)


def _rollout(env, ep_id, policy=None, max_iter=80):
    obs, _ = env.reset(options={"obj_init_options": {"episode_id": ep_id}})
    rng = np.random.default_rng(ep_id)
    success = False
    while True:
        act = policy(env, rng) if policy else scripted_expert(env, rng)
        obs, _, success, trunc, _ = env.step(act)
        if trunc:
            return success


def test_expert_reaches_every_episode():
    env = ReachEnv(seed=3)
    assert all(_rollout(env, ep) for ep in range(10))


def test_episode_keyed_placement():
    a, b = ReachEnv(seed=5), ReachEnv(seed=5)
    oa, _ = a.reset(options={"obj_init_options": {"episode_id": 9}})
    ob, _ = b.reset(options={"obj_init_options": {"episode_id": 9}})
    np.testing.assert_array_equal(oa["image"], ob["image"])
    assert a.instruction == b.instruction
    ob2, _ = b.reset(options={"obj_init_options": {"episode_id": 10}})
    assert not np.array_equal(oa["image"], ob2["image"])


def test_blocks_separated_and_not_presolved():
    env = ReachEnv(seed=0)
    for ep in range(25):
        env.reset(options={"obj_init_options": {"episode_id": ep}})
        from open_pi_zero_tpu.envs import reach_env as re_mod

        assert np.linalg.norm(env.blocks[0] - env.blocks[1]) >= re_mod.MIN_BLOCK_SEP
        assert (
            np.linalg.norm(env.blocks - env.eef, axis=1).min()
            >= re_mod.MIN_START_DIST
        )
        assert not env._success


def test_multi_subtask_switches_instruction_and_requires_both_legs():
    env = ReachEnv(seed=4, multi_subtask=True, max_steps=96)
    obs, _ = env.reset(options={"obj_init_options": {"episode_id": 1}})
    first = env.get_language_instruction()
    rng = np.random.default_rng(0)
    switched_at = None
    while True:
        obs, _, success, trunc, _ = env.step(scripted_expert(env, rng))
        if switched_at is None and env.get_language_instruction() != first:
            switched_at = env.t
            assert not success  # leg 1 alone must NOT latch success
        if trunc:
            break
    assert switched_at is not None, "instruction never switched"
    assert success, "expert should complete both legs"
    assert {first, env.get_language_instruction()} == set(INSTRUCTIONS)


class TestPickPlace:
    def _run_expert(self, env, ep):
        from open_pi_zero_tpu.envs import pick_place_expert

        obs, _ = env.reset(options={"obj_init_options": {"episode_id": ep}})
        rng = np.random.default_rng(ep)
        closed_seen = False
        while True:
            a = pick_place_expert(env, rng)
            cmd = np.concatenate([a[:6], [2.0 * (a[6] > 0.5) - 1.0]])
            obs, _, success, trunc, _ = env.step(cmd)
            closed_seen = closed_seen or not env.gripper_open
            if trunc:
                return success, closed_seen

    def test_expert_grasps_carries_releases(self):
        from open_pi_zero_tpu.envs import PickPlaceEnv

        env = PickPlaceEnv(seed=2)
        for ep in range(8):
            success, closed_seen = self._run_expert(env, ep)
            assert success and closed_seen

    def test_release_outside_zone_is_not_success(self):
        from open_pi_zero_tpu.envs import PickPlaceEnv
        from open_pi_zero_tpu.envs import pick_place_env as pp

        env = PickPlaceEnv(seed=3)
        env.reset(options={"obj_init_options": {"episode_id": 0}})
        # teleport-grasp, then release far from the zone
        env.eef = env.block.copy()
        env.step(np.concatenate([np.zeros(6), [-1.0]]))  # close
        assert env.attached
        far = env.zone + 4 * pp.ZONE_RADIUS
        env.eef = np.clip(far, *pp.WORKSPACE)
        env.block = env.eef.copy()
        env.step(np.concatenate([np.zeros(6), [1.0]]))  # open
        assert not env.attached and not env._success

    def test_demo_gripper_dim_is_informative(self):
        """Unlike reach (gripper constant 1.0), pick-place demos must carry
        BOTH raw gripper values, and the proprio gripper channel must
        reflect open/closed."""
        from open_pi_zero_tpu.envs import collect_demos

        eps, rate = collect_demos(4, seed=0, task="pick_place")
        assert rate == 1.0
        acts = np.concatenate([np.asarray(e["steps"]["action"]) for e in eps])
        assert set(np.unique(acts[:, -1])) == {0.0, 1.0}
        states = np.concatenate(
            [np.asarray(e["steps"]["observation"]["state"]) for e in eps]
        )
        assert set(np.unique(states[:, -1])) == {0.0, 1.0}

    def test_make_env_dispatch(self):
        from open_pi_zero_tpu.envs import PickPlaceEnv, ReachEnv, make_env

        assert isinstance(make_env("simpler_lite_reach"), ReachEnv)
        m = make_env("simpler_lite_reach_multi")
        assert isinstance(m, ReachEnv) and m.multi_subtask
        assert isinstance(make_env("simpler_lite_pick_place"), PickPlaceEnv)
        from open_pi_zero_tpu.envs import DrawerEnv

        assert isinstance(make_env("simpler_lite_drawer"), DrawerEnv)
        with pytest.raises(ValueError):
            make_env("simpler_lite_nope")


def test_bridge_proprio_matches_adapter():
    """The demo recorder's proprio formula must be byte-identical to what
    BridgeSimplerAdapter computes at eval time (train==eval proprio)."""
    adapter = ea.BridgeSimplerAdapter(
        dataset_statistics_path=STATS_PATH,
        num_image_tokens=4,
        image_size=(28, 28),
        max_seq_len=12,
        tokenizer=FakeTokenizer(image_token_id=500),
    )
    env = ReachEnv(seed=1)
    obs, _ = env.reset(options={"obj_init_options": {"episode_id": 2}})
    np.testing.assert_allclose(
        bridge_proprio(obs), adapter.preprocess_proprio(obs), atol=1e-7
    )
    # the constant orientation lands at exactly zero bridge-frame rpy
    assert np.allclose(bridge_proprio(obs)[3:6], 0.0, atol=1e-9)


def test_adapter_get_image_hook():
    env = ReachEnv(seed=0)
    obs, _ = env.reset()
    np.testing.assert_array_equal(ea._get_simpler_image(env, obs), obs["image"])


def test_demo_dataset_through_production_pipeline(tmp_path):
    d = str(tmp_path / "rlds")
    rate = write_demo_dataset(os.path.join(d, "bridge_dataset"), 6, seed=0)
    assert rate == 1.0
    cfg = ConfigDict(
        {
            "dataset_mix": "bridge",
            "data_path": d,
            "split": "train",
            "window_size": 1,
            "action_horizon": 4,
            "skip_unlabeled": True,
            "load_proprio": True,
            "augment": False,
            "shuffle_buffer_size": 256,
            "num_parallel_calls": 2,
            "traj_transform_threads": 1,
            "traj_read_threads": 1,
            "resize_size": [56, 56],
        }
    )
    ds = RLDSInterleavedDataset(cfg, train=True)
    batch = next(ds.iterator(64, shard_per_process=False))
    img = batch["observation"]["image_primary"]
    assert img.shape[0] == 64 and img.shape[-3:] == (56, 56, 3)
    assert batch["action"].shape[-2:] == (4, 7)
    # bound-normalized xyz/rpy; gripper binarized to 1.0 (always open)
    assert np.abs(batch["action"][..., :-1]).max() <= 1.0
    assert np.all(batch["action"][..., -1] == 1.0)
    instrs = {
        t.decode() for t in batch["task"]["language_instruction"].reshape(-1)
    }
    assert instrs <= set(INSTRUCTIONS) and len(instrs) == 2
    stats = ds.dataset.dataset_statistics[0]
    assert set(stats["action"]) >= {"mean", "std", "p01", "p99"}


def test_warm_tokenizer_order_independent():
    """Two tokenizers warmed then fed instructions in opposite orders agree
    on every id (train/eval vocab identity across processes)."""
    ta, tb = FakeTokenizer(image_token_id=500), FakeTokenizer(image_token_id=500)
    warm_tokenizer(ta)
    warm_tokenizer(tb)
    ta._encode(INSTRUCTIONS[0]), ta._encode(INSTRUCTIONS[1])
    tb._encode(INSTRUCTIONS[1]), tb._encode(INSTRUCTIONS[0])
    assert ta.vocab == tb.vocab


@pytest.mark.slow
def test_config_driven_simpler_lite_eval(tmp_path):
    """configs/eval/simpler_lite.yaml end-to-end with NOTHING injected:
    EvalAgent builds the ReachEnv from env.task, the bridge adapter falls
    back to the warmed FakeTokenizer (no hub access), and params load from
    a saved checkpoint dir."""
    import jax

    from open_pi_zero_tpu.agents.eval import EvalAgent
    from open_pi_zero_tpu.config import load_config, pizero_config_from_dict
    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.training import checkpoint as ckpt_lib

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = str(tmp_path / "ckpt")
    cfg = load_config(
        os.path.join(repo, "configs/eval/simpler_lite.yaml"),
        overrides=[
            "n_eval_episode=1",
            f"log_dir={tmp_path}",
            f"checkpoint_path={ckpt}",
            "num_inference_steps=2",
            "env.adapter.dataset_statistics_path="
            + os.path.join(repo, "configs/statistics/bridge_statistics.json"),
        ],
    )
    params = pizero.init_params(jax.random.key(0), pizero_config_from_dict(cfg))
    ckpt_lib.save_params(ckpt, params)

    agent = EvalAgent(cfg)
    from open_pi_zero_tpu.envs import ReachEnv

    assert isinstance(agent.env, ReachEnv)
    result = agent.run()
    assert result["n_episodes"] == 1


@pytest.mark.slow
def test_demo_closed_loop_script(tmp_path):
    """The full demo script at miniature scale: demos -> production bridge
    pipeline -> TrainAgent -> orbax save -> EvalAgent closed loop through
    the real BridgeSimplerAdapter + a random-init control. Learning is NOT
    asserted (30 updates); the machinery and the artifact schema are."""
    out = tmp_path / "e2e.json"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/demo_closed_loop.py",
            "--workdir", str(tmp_path / "wd"),
            "--out", str(out),
            "--n-demos", "16",
            "--n-updates", "3",
            "--n-eval-episodes", "2",
            "--global-batch", "16",
            "--hidden", "64",
            "--layers", "2",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(out.read_text())
    assert result["expert_success_rate"] == 1.0
    assert 0.0 <= result["trained_success_rate"] <= 1.0
    assert result["n_eval_episodes"] == 2
    assert result["model"]["params"] > 0


@pytest.mark.slow
def test_demo_closed_loop_tri_family_script(tmp_path):
    """The three-task CROSS-FAMILY path at miniature scale: reach +
    pick_place (bridge, 7-dim proprio) + drawer (fractal, 8-dim POS_QUAT,
    coverage starts) through ONE interleaved mix (simpler_lite_tri), with
    per-dataset drawer demo count. Learning is NOT asserted (3 updates);
    the three-dataset mix machinery, cross-family proprio padding, and the
    per-task eval/adapters are."""
    out = tmp_path / "tri.json"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/demo_closed_loop.py",
            "--task", "tri_family",
            "--workdir", str(tmp_path / "wd"),
            "--out", str(out),
            "--n-demos", "12",
            "--drawer-n-demos", "15",
            "--drawer-start-coverage",
            "--n-updates", "3",
            "--n-eval-episodes", "2",
            "--global-batch", "16",
            "--hidden", "64",
            "--layers", "2",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(out.read_text())
    assert set(result["trained_success_rate"]) == {"reach", "pick_place", "drawer"}
    assert result["expert_success_rate"]["drawer"] == 1.0
    # drawer demo count honored + encoded in the cache dir name
    assert os.path.isdir(
        tmp_path / "wd" / "rlds_n12_dn15_cov" / "fractal20220817_data"
    )
