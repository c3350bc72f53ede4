"""Octo-parity data extras: goal relabeling, task augmentation (rephrase +
modality dropout), and the offline resize/re-encode tool."""

import json
import os

import numpy as np
import pytest
import tensorflow as tf

tf.config.set_visible_devices([], "GPU")

from open_pi_zero_tpu.data import goal_relabeling, rlds, task_augmentation
from open_pi_zero_tpu.data.preprocess import resize_rlds_dataset


def _traj(T=6):
    return {
        "observation": {
            "image_primary": tf.constant([f"img{i}".encode() for i in range(T)]),
            "proprio": tf.random.stateless_normal((T, 3), seed=[0, 1]),
        },
        "task": {"language_instruction": tf.constant([b"wipe the table"] * T)},
        "action": tf.random.stateless_normal((T, 4), seed=[0, 2]),
    }


class TestGoalRelabeling:
    def test_uniform_goals_are_future_states(self):
        tf.random.set_seed(0)
        traj = goal_relabeling.uniform(_traj())
        goals = traj["task"]["image_primary"].numpy()
        for i, g in enumerate(goals):
            idx = int(g.decode().removeprefix("img"))
            assert i <= idx < 6

    def test_max_goal_distance(self):
        tf.random.set_seed(0)
        traj = goal_relabeling.uniform(_traj(), max_goal_distance=1)
        goals = traj["task"]["image_primary"].numpy()
        for i, g in enumerate(goals):
            idx = int(g.decode().removeprefix("img"))
            assert i <= idx <= min(i + 1, 5)


class TestTaskAugmentation:
    def test_rephrase_always(self, tmp_path):
        table = {"wipe the table": "clean the table.scrub the surface"}
        p = str(tmp_path / "para.json")
        json.dump(table, open(p, "w"))
        tf.random.set_seed(1)
        traj = task_augmentation.rephrase_instruction(
            _traj(), task_augmentation.Rephraser.from_file(p), rephrase_prob=1.0
        )
        lang = {x.decode() for x in traj["task"]["language_instruction"].numpy()}
        assert lang <= {"wipe the table", "clean the table", "scrub the surface"}

    def test_rephrase_never(self, tmp_path):
        p = str(tmp_path / "para.json")
        json.dump({"wipe the table": "x"}, open(p, "w"))
        traj = task_augmentation.rephrase_instruction(
            _traj(), task_augmentation.Rephraser.from_file(p), rephrase_prob=0.0
        )
        assert traj["task"]["language_instruction"].numpy()[0] == b"wipe the table"

    def test_delete_task_conditioning_keeps_one_modality(self):
        T = 32
        traj = _traj(T)
        traj["task"]["image_primary"] = tf.constant([b"goal"] * T)
        traj["task"]["pad_mask_dict"] = {
            "language_instruction": tf.ones((T,), tf.bool),
            "image_primary": tf.ones((T,), tf.bool),
        }
        tf.random.set_seed(2)
        out = task_augmentation.delete_task_conditioning(traj, keep_image_prob=0.5)
        img_kept = out["task"]["pad_mask_dict"]["image_primary"].numpy()
        lang_kept = out["task"]["pad_mask_dict"]["language_instruction"].numpy()
        assert (img_kept ^ lang_kept).all()  # exactly one modality per step
        # dropped entries are padded out
        imgs = out["task"]["image_primary"].numpy()
        langs = out["task"]["language_instruction"].numpy()
        assert all((imgs[i] == b"") == (not img_kept[i]) for i in range(T))
        assert all((langs[i] == b"") == (not lang_kept[i]) for i in range(T))


class TestOfflineResize:
    def test_resize_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        src = str(tmp_path / "src" / "dummy_dataset")
        leaves = [
            rlds.LeafSpec("steps/observation/image_0", "uint8", (48, 48, 3), "image", True, "jpeg"),
            rlds.LeafSpec("steps/action", "float32", (4,), "tensor", True),
        ]
        eps = []
        for T in [3, 5]:
            imgs = rng.integers(0, 255, size=(T, 48, 48, 3), dtype=np.uint8)
            eps.append({
                "steps": {
                    "observation": {
                        "image_0": [tf.io.encode_jpeg(x).numpy() for x in imgs]
                    },
                    "action": rng.normal(size=(T, 4)).astype(np.float32),
                }
            })
        rlds.write_rlds_dataset(src, "dummy_dataset", eps, leaves, shards=1)

        dst = str(tmp_path / "dst" / "dummy_dataset")
        resize_rlds_dataset(src, dst, size=(16, 16), num_workers=2)

        spec = rlds.load_spec(dst)
        img_leaf = [l for l in spec.leaves if l.kind == "image"][0]
        assert tuple(img_leaf.shape) == (16, 16, 3)
        out = list(rlds.episode_dataset(dst, "train").as_numpy_iterator())
        assert len(out) == 2
        decoded = tf.io.decode_jpeg(out[0]["steps"]["observation"]["image_0"][0])
        assert decoded.shape == (16, 16, 3)
        np.testing.assert_allclose(
            out[0]["steps"]["action"], eps[0]["steps"]["action"], rtol=1e-6
        )
