"""Data-layer tests: RLDS read/write roundtrip, gripper canonicalization
(golden vs the documented loop semantics), chunking edge behavior,
normalization, and the full interleaved pipeline on a synthetic
bridge-like dataset."""

import os

import numpy as np
import pytest
import tensorflow as tf

tf.config.set_visible_devices([], "GPU")

from open_pi_zero_tpu.data import normalization as norm_lib
from open_pi_zero_tpu.data import oxe, pipeline, rlds, traj_transforms
from open_pi_zero_tpu.data.obs_transforms import resize_image


def _bridge_leaves(img_hw=32, state_dim=7, act_dim=7):
    return [
        rlds.LeafSpec("steps/observation/image_0", "uint8", (img_hw, img_hw, 3), "image", True, "jpeg"),
        rlds.LeafSpec("steps/observation/state", "float32", (state_dim,), "tensor", True),
        rlds.LeafSpec("steps/action", "float32", (act_dim,), "tensor", True),
        rlds.LeafSpec("steps/language_instruction", "string", (), "text", True),
        rlds.LeafSpec("steps/is_first", "bool", (), "tensor", True),
        rlds.LeafSpec("episode_metadata/file_path", "string", (), "text", False),
    ]


def _make_episode(rng, T, img_hw=32, labeled=True):
    imgs = rng.integers(0, 255, size=(T, img_hw, img_hw, 3), dtype=np.uint8)
    encoded = [tf.io.encode_jpeg(x).numpy() for x in imgs]
    state = rng.normal(size=(T, 7)).astype(np.float32)
    action = rng.normal(size=(T, 7)).astype(np.float32)
    action[:, -1] = rng.choice([0.0, 1.0, 0.5], size=T, p=[0.4, 0.4, 0.2])
    lang = b"pick up the spoon" if labeled else b""
    return {
        "steps": {
            "observation": {"image_0": encoded, "state": state},
            "action": action,
            "language_instruction": [lang] * T,
            "is_first": np.asarray([1] + [0] * (T - 1), bool),
        },
        "episode_metadata": {"file_path": b"/tmp/ep"},
    }


@pytest.fixture(scope="module")
def bridge_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = str(tmp_path_factory.mktemp("rlds") / "bridge_dataset")
    eps = [_make_episode(rng, T, labeled=(i != 2)) for i, T in enumerate([8, 5, 6, 10])]
    rlds.write_rlds_dataset(d, "bridge_dataset", eps, _bridge_leaves(), shards=2)
    return d, eps


class TestRldsReader:
    def test_roundtrip(self, bridge_dir):
        d, eps = bridge_dir
        spec = rlds.load_spec(d)
        assert spec.name == "bridge_dataset"
        assert spec.num_episodes("train") == 4
        out = list(rlds.episode_dataset(d, "train").as_numpy_iterator())
        assert len(out) == 4
        for got, want in zip(out, eps):
            np.testing.assert_allclose(
                got["steps"]["action"], want["steps"]["action"], rtol=1e-6
            )
            np.testing.assert_allclose(
                got["steps"]["observation"]["state"],
                want["steps"]["observation"]["state"], rtol=1e-6,
            )
            assert got["steps"]["observation"]["image_0"].shape == (
                len(want["steps"]["action"]),
            )
            assert got["episode_metadata"]["file_path"][0] == b"/tmp/ep"
            # encoded images decode back to [H, W, 3]
            img = tf.io.decode_jpeg(got["steps"]["observation"]["image_0"][0])
            assert img.shape == (32, 32, 3)

    def test_split_spec(self, bridge_dir):
        d, _ = bridge_dir
        assert len(list(rlds.episode_dataset(d, "train[:50%]").as_numpy_iterator())) == 2
        assert len(list(rlds.episode_dataset(d, "train[50%:]").as_numpy_iterator())) == 2
        assert len(list(rlds.episode_dataset(d, "train[1:3]").as_numpy_iterator())) == 2
        name, a, b = rlds.parse_split("train[:95%]", 100)
        assert (name, a, b) == ("train", 0, 95)


class TestGripperOps:
    def _binarize_ref(self, actions):
        """Documented loop semantics (reference data_utils.py docstring)."""
        open_mask = actions > 0.95
        in_between = (actions <= 0.95) & (actions >= 0.05)
        out = np.empty_like(actions)
        carry = actions[-1]
        for i in reversed(range(len(actions))):
            if not in_between[i]:
                carry = float(open_mask[i])
            out[i] = carry
        return out

    def test_binarize_matches_loop(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            a = rng.choice([0.0, 1.0, 0.3, 0.7, 0.96, 0.04], size=12).astype(np.float32)
            got = oxe.binarize_gripper_actions(tf.constant(a)).numpy()
            np.testing.assert_allclose(got, self._binarize_ref(a))

    def test_rel2abs(self):
        # close at t=1, open at t=4; initial inferred open
        rel = tf.constant([0.0, 0.5, 0.0, 0.0, -0.5, 0.0], tf.float32)
        out = oxe.rel2abs_gripper_actions(rel).numpy()
        np.testing.assert_allclose(out, [1, 0, 0, 0, 1, 1])

    def test_relabel_actions(self):
        state = np.arange(24, dtype=np.float32).reshape(4, 6)
        traj = {
            "observation": {"state": tf.constant(np.concatenate([state, np.ones((4, 1), np.float32)], 1))},
            "action": tf.constant(np.zeros((4, 7), np.float32)),
        }
        out = oxe.relabel_actions_from_proprio(traj)
        assert out["action"].shape == (3, 7)
        np.testing.assert_allclose(out["action"].numpy()[:, :6], 6.0)  # deltas


class TestChunking:
    def test_chunk_edges(self):
        T, A = 5, 2
        traj = {
            "observation": {"x": tf.range(T)},
            "task": {},
            "action": tf.cast(tf.stack([tf.range(T)] * A, 1), tf.float32),
            "action_pad_mask": tf.ones((T, A), tf.bool),
        }
        out = traj_transforms.chunk_act_obs(dict(traj), window_size=2, action_horizon=3)
        act = out["action"].numpy()  # [T, W, H, A]
        assert act.shape == (T, 2, 3, A)
        # history: frame 0's window is clamped to frame 0
        np.testing.assert_allclose(out["observation"]["x"].numpy()[0], [0, 0])
        assert not out["observation"]["timestep_pad_mask"].numpy()[0, 0]
        # future chunk clamps at the last action
        np.testing.assert_allclose(act[-1, -1, :, 0], [4, 4, 4])
        np.testing.assert_allclose(act[1, -1, :, 0], [1, 2, 3])
        # actions past the goal timestep are marked padding. Reference
        # formula (traj_transforms.py:80-101): completed iff
        # goal - (t - (window_size+1) + w + h) <= 0; with T=5, W=2: the
        # (t=4, w=1, h=2) slot hits rel=0 while h=1 stays valid.
        assert out["action_pad_mask"].numpy()[-1, -1, 1, 0]
        assert not out["action_pad_mask"].numpy()[-1, -1, 2, 0]

    def test_subsample(self):
        traj = {
            "observation": {"x": tf.range(10)},
            "action": tf.zeros((10, 2)),
        }
        out = traj_transforms.subsample(dict(traj), 4)
        assert out["action"].shape[0] == 4


class TestNormalization:
    def test_bounds_roundtrip_with_mask(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(100, 7)).astype(np.float32) * 3
        stats = {
            "p01": np.percentile(x, 1, 0).tolist(),
            "p99": np.percentile(x, 99, 0).tolist(),
            "mean": x.mean(0).tolist(),
            "std": x.std(0).tolist(),
        }
        mask = [True] * 6 + [False]
        traj = {"observation": {}, "action": tf.constant(x)}
        out = norm_lib.normalize_traj(
            traj, {"action": stats}, norm_lib.BOUNDS, action_mask=mask
        )["action"].numpy()
        assert (out[:, :6] >= -1 - 1e-6).all() and (out[:, :6] <= 1 + 1e-6).all()
        np.testing.assert_allclose(out[:, -1], x[:, -1])  # gripper untouched
        back = norm_lib.denormalize(out, stats, norm_lib.BOUNDS, mask)
        inner = (x[:, :6] > stats["p01"][:6]) & (x[:, :6] < np.asarray(stats["p99"])[:6])
        np.testing.assert_allclose(
            back[:, :6][inner], x[:, :6][inner], rtol=1e-3, atol=1e-4
        )


class TestFullPipeline:
    def test_bridge_pipeline_end_to_end(self, bridge_dir, tmp_path):
        d, _ = bridge_dir
        kwargs_list, weights = oxe.make_oxe_dataset_kwargs_and_weights(
            "bridge", os.path.dirname(d)
        )
        kwargs_list[0]["statistics_cache_dir"] = str(tmp_path)
        ds = pipeline.make_interleaved_dataset(
            kwargs_list,
            weights,
            train=True,
            split="train",
            shuffle_buffer_size=50,
            batch_size=4,
            traj_transform_kwargs=dict(
                window_size=1, action_horizon=4, subsample_length=100,
                skip_unlabeled=True,
            ),
            frame_transform_kwargs=dict(
                resize_size=dict(primary=(24, 24)),
                image_augment_kwargs={
                    "primary": dict(
                        random_resized_crop=dict(scale=[0.8, 1.0], ratio=[0.9, 1.1]),
                        random_brightness=[0.1],
                        random_contrast=[0.9, 1.1],
                        random_saturation=[0.9, 1.1],
                        random_hue=[0.05],
                        augment_order=[
                            "random_resized_crop", "random_brightness",
                            "random_contrast", "random_saturation", "random_hue",
                        ],
                    )
                },
            ),
            seed=0,
        )
        batch = next(iter(ds.as_numpy_iterator()))
        # contract consumed by the train agent (reference train.py:271-314)
        img = batch["observation"]["image_primary"]
        assert img.shape == (4, 1, 24, 24, 3) and img.dtype == np.uint8
        assert batch["observation"]["proprio"].shape == (4, 1, 7)
        assert batch["action"].shape == (4, 1, 4, 7)
        # actions normalized to [-1, 1] on non-gripper dims
        assert np.abs(batch["action"][..., :6]).max() <= 1 + 1e-5
        # all frames carry language (skip_unlabeled)
        assert all(t != b"" for t in batch["task"]["language_instruction"])
        # action chunks: relabel drops last step; horizons clamp at edges
        assert np.isfinite(batch["action"]).all()

    def test_allocate_threads(self):
        out = pipeline.allocate_threads(10, np.asarray([0.5, 0.3, 0.2]))
        assert out.sum() == 10 and (out >= 1).all()
        out = pipeline.allocate_threads(3, np.asarray([0.9, 0.05, 0.05]))
        assert out.sum() == 3 and (out >= 1).all()


def test_resize_is_lanczos_uint8():
    img = tf.constant(np.full((8, 8, 3), 128, np.uint8))
    out = resize_image(img, (4, 4))
    assert out.dtype == tf.uint8 and out.shape == (4, 4, 3)
    assert abs(int(out.numpy().mean()) - 128) <= 1


class TestImageDropout:
    def _frame(self, n_cams=2):
        rng = np.random.default_rng(0)
        obs = {"pad_mask_dict": {}}
        for i in range(n_cams):
            img = rng.integers(1, 255, size=(24, 24, 3), dtype=np.uint8)
            obs[f"image_cam{i}"] = tf.constant(tf.io.encode_jpeg(img).numpy())[None]
            obs["pad_mask_dict"][f"image_cam{i}"] = tf.constant([True])
        return {"observation": obs}

    def test_dropout_keeps_exactly_one_at_prob_one(self):
        from open_pi_zero_tpu.data.obs_transforms import apply_obs_transforms

        out = apply_obs_transforms(
            self._frame(2), seed=tf.constant(3),
            resize_size={"cam0": (24, 24), "cam1": (24, 24)},
            image_dropout_prob=1.0, train=True,
        )
        obs = out["observation"]
        kept = [
            k for k in ("image_cam0", "image_cam1")
            if int(tf.reduce_sum(tf.cast(obs[k], tf.int32))) > 0
        ]
        assert len(kept) == 1  # one randomly chosen camera always survives
        dropped = ({"image_cam0", "image_cam1"} - set(kept)).pop()
        assert not bool(obs["pad_mask_dict"][dropped].numpy()[0])
        assert bool(obs["pad_mask_dict"][kept[0]].numpy()[0])

    def test_no_dropout_at_prob_zero(self):
        from open_pi_zero_tpu.data.obs_transforms import apply_obs_transforms

        out = apply_obs_transforms(
            self._frame(2), seed=tf.constant(3),
            resize_size={"cam0": (24, 24), "cam1": (24, 24)},
            image_dropout_prob=0.0, train=True,
        )
        obs = out["observation"]
        for k in ("image_cam0", "image_cam1"):
            assert int(tf.reduce_sum(tf.cast(obs[k], tf.int32))) > 0

    def test_padding_image_never_counts_as_kept(self):
        from open_pi_zero_tpu.data.obs_transforms import apply_obs_transforms

        frame = self._frame(1)
        frame["observation"]["image_pad"] = tf.constant([b""])
        frame["observation"]["pad_mask_dict"]["image_pad"] = tf.constant([False])
        out = apply_obs_transforms(
            frame, seed=tf.constant(5),
            resize_size={"cam0": (24, 24), "pad": (24, 24)},
            image_dropout_prob=1.0, train=True,
        )
        obs = out["observation"]
        # the only real camera survives; padding stays padding
        assert int(tf.reduce_sum(tf.cast(obs["image_cam0"], tf.int32))) > 0
        assert not bool(obs["pad_mask_dict"]["image_pad"].numpy()[0])
