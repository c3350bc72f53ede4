"""Extended OXE registry: every mix resolves, normalization masks per
encoding, and behavioral tests of representative standardization
transforms on synthetic trajectories (quat->euler golden vs our geometry
utils, Hz-resampling relabels, unicode instruction decode, compressed
proprio decode)."""

import numpy as np
import pytest
import tensorflow as tf

tf.config.set_visible_devices([], "GPU")

from open_pi_zero_tpu.data import oxe, oxe_registry
from open_pi_zero_tpu.utils.geometry import quat2euler


def test_registry_size_and_mixes():
    assert len(oxe.REGISTRY) >= 55  # reference table covers ~55 datasets
    for mix in ("bridge", "fractal", "rtx", "rtx_franka", "oxe_magic_soup",
                "oxe_flex_act_soup", "oxe_full"):
        kwargs, weights = oxe.make_oxe_dataset_kwargs_and_weights(mix, "/data")
        assert len(kwargs) == len(weights) > 0
        for kw in kwargs:
            assert callable(kw["standardize_fn"])
            assert isinstance(kw["action_normalization_mask"], list)


def test_normalization_masks():
    AE = oxe.ActionEncoding
    assert oxe.action_normalization_mask(AE.EEF_POS) == [True] * 6 + [False]
    assert oxe.action_normalization_mask(AE.JOINT_POS) == [True] * 7 + [False]
    assert (
        oxe.action_normalization_mask(AE.JOINT_POS_BIMANUAL_NAV)
        == [True] * 6 + [False] + [True] * 6 + [False] + [True] * 2
    )


def test_quat_to_euler_matches_geometry():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)  # xyzw
    got = oxe_registry._quat_to_euler(tf.constant(q, tf.float32)).numpy()
    for i in range(5):
        # geometry.quat2euler takes wxyz
        want = quat2euler(np.concatenate([q[i, 3:], q[i, :3]]))
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_furniture_bench_transform():
    T = 4
    rng = np.random.default_rng(1)
    q = rng.normal(size=(T, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    traj = {
        "action": tf.constant(
            np.concatenate(
                [rng.normal(size=(T, 3)).astype(np.float32), q,
                 np.array([[0.0], [1.0], [0.2], [0.9]], np.float32)],
                axis=-1,
            )
        ),
        "observation": {"state": tf.constant(rng.normal(size=(T, 8)).astype(np.float32))},
    }
    out = oxe_registry.furniture_bench(traj)
    act = out["action"].numpy()
    assert act.shape == (T, 7)
    # gripper inverted+clipped: 0->1, 1->0
    np.testing.assert_allclose(act[:, -1], [1.0, 0.0, 0.8, 0.1], atol=1e-6)
    assert out["observation"]["proprio"].shape == (T, 8)


def test_berkeley_rpt_resample():
    T = 31
    rng = np.random.default_rng(2)
    traj = {
        "action": tf.constant(rng.normal(size=(T, 8)).astype(np.float32)),
        "observation": {
            "joint_pos": tf.constant(rng.normal(size=(T, 7)).astype(np.float32)),
            "gripper": tf.constant(rng.integers(0, 2, size=(T,)).astype(np.int32)),
        },
    }
    out = oxe_registry.berkeley_rpt(dict(traj))
    n = (T + 2) // 3 - 1  # subsample by 3, then drop last
    assert out["action"].shape == (n, 8)
    # joint actions are deltas of the downsampled joint positions
    jp = traj["observation"]["joint_pos"].numpy()[::3]
    np.testing.assert_allclose(
        out["action"].numpy()[:, :7], jp[1:, :7] - jp[:-1, :7], rtol=1e-5
    )


def test_language_table_instruction_decode():
    text = "move the red block"
    codes = np.zeros((3, 32), np.int32)
    codes[:, : len(text)] = [ord(c) for c in text]
    traj = {
        "action": tf.constant(np.zeros((3, 2), np.float32)),
        "observation": {
            "effector_translation": tf.constant(np.zeros((3, 2), np.float32)),
            "instruction": tf.constant(codes),
        },
    }
    out = oxe_registry.language_table(traj)
    assert out["language_instruction"].numpy()[0].decode() == text
    assert out["action"].shape == (3, 7)


def test_kuka_compressed_proprio():
    T = 3
    eef = np.arange(T * 7, dtype=np.float32).reshape(T, 7)
    grip = np.ones((T, 1), np.float32)
    import zlib

    traj = {
        "action": {
            "world_vector": tf.constant(np.zeros((T, 3), np.float32)),
            "rotation_delta": tf.constant(np.zeros((T, 3), np.float32)),
            "gripper_closedness_action": tf.constant(np.zeros((T, 1), np.float32)),
        },
        "observation": {
            "clip_function_input/base_pose_tool_reached": tf.constant(
                [zlib.compress(eef[i].tobytes()) for i in range(T)]
            ),
            "gripper_closed": tf.constant(
                [zlib.compress(grip[i].tobytes()) for i in range(T)]
            ),
            "natural_language_instruction": tf.constant(["x"] * T),
        },
    }
    out = oxe_registry.kuka(traj)
    np.testing.assert_allclose(out["observation"]["proprio"].numpy()[:, :7], eef)
    assert out["language_instruction"].numpy()[0] == b""


def test_gnm_nav_transform():
    T = 10
    pos = np.cumsum(np.ones((T, 2), np.float32) * 0.5, axis=0)
    traj = {
        "action": tf.constant(np.ones((T, 2), np.float32) * 0.5),
        "observation": {
            "position": tf.constant(pos),
            "yaw": tf.constant(np.zeros((T, 1), np.float32)),
            "state": tf.constant(np.zeros((T, 3), np.float32)),
        },
    }
    out = oxe_registry.gnm(dict(traj))
    act = out["action"].numpy()
    assert act.shape[1] == 2 and act.shape[0] > 0
    assert np.isfinite(act).all()
