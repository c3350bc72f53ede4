"""SimplerLite drawer (fractal/EDR family) tests: expert competence, drawer
dynamics, fractal-schema proprio parity with the EDR adapter, the oracle
policy driven through the REAL sticky-gripper state machine, and the raw
RT-1 demo schema flowing through the unmodified production fractal
pipeline (rt1_transform: dict-action flatten + rel2abs gripper + POS_QUAT
proprio; reference oxe_standardization_transforms.py:43-68)."""

import copy
import json
import os

import numpy as np
import pytest
import tensorflow as tf

tf.config.set_visible_devices([], "GPU")

from open_pi_zero_tpu.agents.env_adapter import EDRSimplerAdapter
from open_pi_zero_tpu.envs import warm_tokenizer
from open_pi_zero_tpu.envs.drawer_env import (
    CLOSE_THRESH,
    D_MAX,
    GRASP_RADIUS,
    INSTRUCTIONS,
    MAX_STEP,
    SUCCESS_EXT,
    DrawerEnv,
    drawer_expert,
    fractal_proprio_parts,
    write_fractal_demo_dataset,
)
from open_pi_zero_tpu.processing import FakeTokenizer

_ORACLE_STATS = {
    "action": {"p01": [-0.03] * 6 + [0.0], "p99": [0.03] * 6 + [1.0]},
    "proprio": {"p01": [-1.0] * 8, "p99": [1.0] * 8},
}


def _edr_adapter(tmp_path) -> EDRSimplerAdapter:
    sp = os.path.join(str(tmp_path), "stats.json")
    with open(sp, "w") as f:
        json.dump(_ORACLE_STATS, f)
    tok = FakeTokenizer(image_token_id=500)
    warm_tokenizer(tok)
    return EDRSimplerAdapter(
        dataset_statistics_path=sp,
        num_image_tokens=16,
        image_size=(56, 56),
        max_seq_len=24,
        tokenizer=tok,
    )


def test_expert_opens_instructed_drawer():
    env = DrawerEnv(seed=3)
    for ep in range(8):
        env.reset(options={"obj_init_options": {"episode_id": ep}})
        rng = np.random.default_rng(ep)
        closed_seen = False
        while True:
            _, _, success, trunc, _ = env.step(drawer_expert(env, rng))
            closed_seen = closed_seen or env.closedness >= CLOSE_THRESH
            if success or trunc:
                break
        assert success and closed_seen
        # only the instructed drawer moved
        others = [i for i in range(3) if i != env.target_idx]
        assert env.ext[env.target_idx] >= SUCCESS_EXT
        assert all(env.ext[i] == 0.0 for i in others)


def test_episode_keyed_placement():
    a, b = DrawerEnv(seed=5), DrawerEnv(seed=5)
    oa, _ = a.reset(options={"obj_init_options": {"episode_id": 9}})
    ob, _ = b.reset(options={"obj_init_options": {"episode_id": 9}})
    np.testing.assert_array_equal(oa["image"], ob["image"])
    assert a.instruction == b.instruction
    ob2, _ = b.reset(options={"obj_init_options": {"episode_id": 10}})
    assert not np.array_equal(oa["image"], ob2["image"])


def test_grasp_needs_closed_gripper_and_proximity():
    env = DrawerEnv(seed=1)
    env.reset(options={"obj_init_options": {"episode_id": 0}})
    env.eef = env.handle_pos(env.target_idx).copy()
    # hovering open on the handle: no grasp
    env.step(np.concatenate([np.zeros(6), [0.0]]))
    assert env.attached is None
    # close fully (slow gripper integrates over steps)
    for _ in range(10):
        env.step(np.concatenate([np.zeros(6), [1.0]]))
    assert env.attached == env.target_idx
    # pull out along +x; drawer follows the rail
    for _ in range(4):
        env.step(np.concatenate([[MAX_STEP], np.zeros(5), [1.0]]))
    assert env._success and env.ext[env.target_idx] >= SUCCESS_EXT
    assert env.ext[env.target_idx] <= D_MAX + 1e-9


def test_release_detaches_and_drawer_stays():
    env = DrawerEnv(seed=2)
    env.reset(options={"obj_init_options": {"episode_id": 4}})
    env.eef = env.handle_pos(env.target_idx).copy()
    for _ in range(10):
        env.step(np.concatenate([np.zeros(6), [1.0]]))
    env.step(np.concatenate([[MAX_STEP], np.zeros(5), [1.0]]))
    ext_before = env.ext[env.target_idx]
    assert env.attached is not None and ext_before > 0
    # open: detach, then motion no longer moves the drawer
    for _ in range(10):
        env.step(np.concatenate([np.zeros(6), [-1.0]]))
    assert env.attached is None
    env.step(np.concatenate([[MAX_STEP], np.zeros(5), [-1.0]]))
    assert env.ext[env.target_idx] == ext_before


def test_wrong_drawer_is_not_success():
    env = DrawerEnv(seed=7)
    env.reset(options={"obj_init_options": {"episode_id": 2}})
    wrong = (env.target_idx + 1) % 3
    env.eef = env.handle_pos(wrong).copy()
    for _ in range(10):
        env.step(np.concatenate([np.zeros(6), [1.0]]))
    assert env.attached == wrong
    for _ in range(4):
        _, _, success, _, _ = env.step(
            np.concatenate([[MAX_STEP], np.zeros(5), [1.0]])
        )
    assert env.ext[wrong] >= SUCCESS_EXT and not success


def test_fractal_proprio_matches_edr_adapter(tmp_path):
    """The demo recorder's raw fractal observation (base_pose_tool_reached
    + gripper_closed) concatenates to EXACTLY the proprio the EDR adapter
    computes at eval time (env_adapter.py:220-224): train == eval."""
    adapter = _edr_adapter(tmp_path)
    env = DrawerEnv(seed=1)
    obs, _ = env.reset(options={"obj_init_options": {"episode_id": 2}})
    # drive the gripper partly closed so the closedness channel is nontrivial
    env.step(np.concatenate([np.zeros(6), [1.0]]))
    obs = env._obs()
    base, gc = fractal_proprio_parts(obs)
    np.testing.assert_allclose(
        np.concatenate([base, gc]), adapter.preprocess_proprio(obs), atol=1e-7
    )
    assert gc[0] > 0.0  # closedness, not openness


def _oracle_chunk(env):
    """What a perfectly-trained chunk policy would output: simulate the
    expert 4 steps ahead under DEMO dynamics (raw relative gripper, no
    sticky machine), emitting normalized movement + the rel2abs-style
    absolute-openness labels the pipeline teaches."""
    sim = copy.copy(env)
    sim.eef = env.eef.copy()
    sim.ext = env.ext.copy()
    sim._obs = lambda: {}  # skip rendering in the simulation
    rng = np.random.default_rng(0)
    state = 1.0 if sim.closedness < 0.5 else 0.0
    rows = []
    for _ in range(4):
        a = drawer_expert(sim, rng, noise=0.0)
        if a[6] > 0.1:
            state = 0.0
        elif a[6] < -0.1:
            state = 1.0
        rows.append(np.concatenate([a[:6] / 0.03, [state]]))
        sim.step(a)
    return np.stack(rows).astype(np.float32)


def test_oracle_through_sticky_adapter_closed_loop(tmp_path):
    """End-to-end eval-side gripper chain: model-space openness chunks ->
    EDRSimplerAdapter.postprocess (denormalize + euler->axangle + the
    15-step STICKY state machine, reference simpler.py:190-253) -> drawer
    dynamics. The sticky machine delays both the open latch and the close
    trigger; the task must remain solvable through it."""
    adapter = _edr_adapter(tmp_path)
    for ep in range(4):
        env = DrawerEnv(seed=100)
        env.reset(options={"obj_init_options": {"episode_id": ep}})
        adapter.reset()
        success = trunc = False
        while not (success or trunc):
            chunk = adapter.postprocess(_oracle_chunk(env))
            for a in chunk[:4]:
                _, _, success, trunc, _ = env.step(a)
                if trunc:
                    break
        assert success, f"episode {ep} failed through the sticky machine"


def test_fractal_demos_through_production_pipeline(tmp_path):
    """Raw RT-1 schema (nested action dict, per-step
    natural_language_instruction) -> the UNMODIFIED fractal registry entry
    + rt1_transform -> training batches: rel2abs gripper labels in {0,1}
    (absolute openness), 8-dim POS_QUAT proprio, instructions extracted."""
    from open_pi_zero_tpu.agents.dataset import RLDSInterleavedDataset
    from open_pi_zero_tpu.config import ConfigDict

    d = str(tmp_path / "rlds")
    rate = write_fractal_demo_dataset(
        os.path.join(d, "fractal20220817_data"), 6, seed=0
    )
    assert rate == 1.0
    cfg = ConfigDict(
        {
            "dataset_mix": "fractal",
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
    assert batch["observation"]["proprio"].shape[-1] == 8
    # rel2abs gripper: absolute openness, both states present in demos
    g = np.unique(batch["action"][..., -1])
    assert set(g.tolist()) <= {0.0, 1.0} and len(g) == 2
    # movement dims bound-normalized
    assert np.abs(batch["action"][..., :-1]).max() <= 1.0
    instrs = {
        t.decode() for t in batch["task"]["language_instruction"].reshape(-1)
    }
    assert instrs <= set(INSTRUCTIONS) and len(instrs) >= 2
    stats = ds.dataset.dataset_statistics[0]
    assert len(stats["proprio"]["p01"]) == 8


def test_adapter_pad_proprio_to(tmp_path):
    """Cross-family policies: the bridge adapter zero-pads its normalized
    7-dim proprio to the model width, mirroring the training pipeline's
    normalize-then-pad order (pad_actions_and_proprio)."""
    from open_pi_zero_tpu.agents.env_adapter import BridgeSimplerAdapter
    from open_pi_zero_tpu.envs import ReachEnv

    sp = os.path.join(str(tmp_path), "bstats.json")
    with open(sp, "w") as f:
        json.dump(
            {"action": {"p01": [-0.03] * 6 + [0.0], "p99": [0.03] * 6 + [1.0]},
             "proprio": {"p01": [-1.0] * 7, "p99": [1.0] * 7}}, f)
    tok = FakeTokenizer(image_token_id=500)
    warm_tokenizer(tok)
    kw = dict(dataset_statistics_path=sp, num_image_tokens=16,
              image_size=(56, 56), max_seq_len=24, tokenizer=tok)
    env = ReachEnv(seed=0)
    obs, _ = env.reset(options={"obj_init_options": {"episode_id": 1}})
    plain = BridgeSimplerAdapter(**kw).preprocess(env, obs, "reach the red block")
    padded = BridgeSimplerAdapter(pad_proprio_to=8, **kw).preprocess(
        env, obs, "reach the red block"
    )
    assert plain["proprios"].shape == (1, 1, 7)
    assert padded["proprios"].shape == (1, 1, 8)
    np.testing.assert_array_equal(padded["proprios"][..., :7], plain["proprios"])
    assert padded["proprios"][..., 7] == 0.0


@pytest.mark.slow
def test_cross_family_mix_through_pipeline(tmp_path):
    """The stock `oxe_simple` mix (bridge_dataset + fractal20220817_data)
    interleaves bridge reach demos (7-dim POS_EULER proprio) with fractal
    drawer demos (8-dim POS_QUAT): max_proprio_dim=8 zero-pads bridge
    frames so one policy trains on both families (reference
    traj_transforms.py:141-165 is this exact mechanism)."""
    from open_pi_zero_tpu.agents.dataset import RLDSInterleavedDataset
    from open_pi_zero_tpu.config import ConfigDict
    from open_pi_zero_tpu.envs import write_demo_dataset

    d = str(tmp_path / "rlds")
    assert write_demo_dataset(os.path.join(d, "bridge_dataset"), 4, seed=0) == 1.0
    assert write_fractal_demo_dataset(
        os.path.join(d, "fractal20220817_data"), 4, seed=0
    ) == 1.0
    cfg = ConfigDict(
        {
            "dataset_mix": "oxe_simple",
            "data_path": d,
            "split": "train",
            "window_size": 1,
            "action_horizon": 4,
            "skip_unlabeled": True,
            "load_proprio": True,
            "augment": False,
            "max_proprio_dim": 8,
            "shuffle_buffer_size": 256,
            "num_parallel_calls": 2,
            # thread allocation needs >= 1 thread per dataset in the mix
            # (allocate_threads, reference data_utils.py:424-454)
            "traj_transform_threads": 2,
            "traj_read_threads": 2,
            "resize_size": [56, 56],
        }
    )
    ds = RLDSInterleavedDataset(cfg, train=True)
    batch = next(ds.iterator(96, shard_per_process=False))
    prop = batch["observation"]["proprio"]
    assert prop.shape[-1] == 8
    names = {n.decode() for n in batch["dataset_name"].reshape(-1)}
    assert names == {"bridge_dataset", "fractal20220817_data"}
    # bridge frames are zero-padded in the 8th proprio dim; fractal frames
    # carry a real quaternion component there
    is_bridge = np.array(
        [n == b"bridge_dataset" for n in batch["dataset_name"].reshape(-1)]
    )
    assert np.all(prop.reshape(len(is_bridge), 8)[is_bridge, 7] == 0.0)
    assert len(ds.dataset.dataset_statistics) == 2


def test_handle_positions_track_extension():
    env = DrawerEnv(seed=0)
    env.reset(options={"obj_init_options": {"episode_id": 0}})
    h0 = env.handle_pos(1).copy()
    env.ext[1] = 0.04
    h1 = env.handle_pos(1)
    assert h1[0] - h0[0] == pytest.approx(0.04) and h1[1] == h0[1]
    # drawers are vertically ordered: top above middle above bottom
    ys = [env.handle_pos(i)[1] for i in range(3)]
    assert ys[0] < ys[1] < ys[2]


def test_grasp_radius_excludes_neighbor_handles():
    """Handle spacing must exceed the grasp radius so the instructed drawer
    is unambiguous."""
    env = DrawerEnv(seed=0)
    for ep in range(10):
        env.reset(options={"obj_init_options": {"episode_id": ep}})
        for i in range(3):
            for j in range(i + 1, 3):
                assert (
                    np.linalg.norm(env.handle_pos(i) - env.handle_pos(j))
                    > 2 * GRASP_RADIUS
                )


def test_fixed_target_restriction_preserves_layouts():
    """target= pins the instructed drawer for per-target data-efficiency
    runs while keeping cabinet/eef placement for a given episode_id
    IDENTICAL to the 3-target env (the unrestricted RNG draw still
    happens), so single-target and mixed runs see the same layout
    distribution."""
    from open_pi_zero_tpu.envs import make_env
    from open_pi_zero_tpu.envs.drawer_env import collect_fractal_demos

    free = DrawerEnv(seed=5)
    pinned = make_env("simpler_lite_drawer_bottom", seed=5)
    for ep in range(8):
        free.reset(options={"obj_init_options": {"episode_id": ep}})
        pinned.reset(options={"obj_init_options": {"episode_id": ep}})
        assert np.allclose(free.cab, pinned.cab)
        assert np.allclose(free.eef, pinned.eef)
        assert pinned.target_idx == 2
        assert pinned.instruction == "open the bottom drawer"
    # demo collection honors the restriction end-to-end
    eps, rate = collect_fractal_demos(3, target="middle")
    for e in eps:
        instr = e["steps"]["observation"]["natural_language_instruction"][0]
        assert instr == b"open the middle drawer"
