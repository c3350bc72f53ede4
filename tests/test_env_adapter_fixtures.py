"""Recorded-schema fixtures for the Simpler environment boundary.

SimplerEnv is not installable here, so the ManiSkill2 observation schema is
reconstructed from the public SimplerEnv source
(simpler_env/utils/env/observation_utils.py: `get_image_from_maniskill2_obs_dict`
selects obs["image"][camera]["rgb"] with camera = "overhead_camera" for
google-robot uids / "3rd_view_camera" for widowx uids) and
ManiSkill2_real2sim (obs["agent"]["eef_pos"] = [xyz, wxyz quat, gripper
openness in [0,1]], length 8).

The same stub module is installed for BOTH our adapters and the reference
adapters (/root/reference/src/agent/env_adapter/simpler.py:53-253), and the
full preprocess/postprocess paths are asserted byte-equal on identical obs
dicts — so any drift in image-key assumptions, proprio frame math, sticky
gripper, normalization, or euler→axis-angle conversion fails here.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
    ),
]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BRIDGE_STATS = os.path.join(ROOT, "configs/statistics/bridge_statistics.json")
FRACTAL_STATS = os.path.join(ROOT, "configs/statistics/fractal_statistics.json")


# --------------------------------------------------------------------------- #
# simpler_env stub: faithful reconstruction of the public observation_utils
# --------------------------------------------------------------------------- #


def _get_image_from_maniskill2_obs_dict(env, obs, camera_name=None):
    """Reconstruction of simpler_env.utils.env.observation_utils (public
    SimplerEnv source): camera picked from env.robot_uid, rgb frame from
    the nested obs["image"] dict."""
    if camera_name is None:
        if "google_robot" in env.robot_uid:
            camera_name = "overhead_camera"
        elif "widowx" in env.robot_uid:
            camera_name = "3rd_view_camera"
        else:
            raise NotImplementedError()
    return obs["image"][camera_name]["rgb"]


def _install_simpler_stub():
    if "simpler_env.utils.env.observation_utils" in sys.modules:
        return
    import importlib.machinery

    names = [
        "simpler_env",
        "simpler_env.utils",
        "simpler_env.utils.env",
        "simpler_env.utils.env.observation_utils",
    ]
    for n in names:
        # a real __spec__ keeps later find_spec(n) probes from raising
        mod = types.ModuleType(n)
        mod.__spec__ = importlib.machinery.ModuleSpec(n, loader=None)
        sys.modules.setdefault(n, mod)
    sys.modules[
        "simpler_env.utils.env.observation_utils"
    ].get_image_from_maniskill2_obs_dict = _get_image_from_maniskill2_obs_dict


class FakeManiskillEnv:
    def __init__(self, robot_uid):
        self.robot_uid = robot_uid


def _widowx_obs(rng, h=480, w=640):
    """Bridge/WidowX obs: 3rd_view_camera rgb + 8-dim eef_pos (xyz, wxyz
    quat, gripper openness)."""
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    return {
        "image": {
            "3rd_view_camera": {
                "rgb": rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            }
        },
        "agent": {
            "eef_pos": np.concatenate(
                [rng.uniform(-0.3, 0.3, 3), quat, [rng.uniform(0, 1)]]
            ).astype(np.float64)
        },
    }


def _google_robot_obs(rng, h=512, w=640):
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    return {
        "image": {
            "overhead_camera": {
                "rgb": rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            }
        },
        "agent": {
            "eef_pos": np.concatenate(
                [rng.uniform(-0.5, 0.8, 3), quat, [rng.uniform(0, 1)]]
            ).astype(np.float64)
        },
    }


# --------------------------------------------------------------------------- #
# reference adapter, in-process
# --------------------------------------------------------------------------- #


def _load_reference_adapters(monkeypatch):
    _install_simpler_stub()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from open_pi_zero_tpu.processing import FakeTokenizer

    import transformers

    monkeypatch.setattr(
        transformers.AutoTokenizer,
        "from_pretrained",
        staticmethod(lambda *a, **k: FakeTokenizer(image_token_id=500)),
    )
    from src.agent.env_adapter import simpler as ref_simpler

    return ref_simpler


def _pair(monkeypatch, kind):
    """(our adapter, reference adapter) with identical config + FakeTokenizer."""
    from open_pi_zero_tpu.agents import env_adapter as ea
    from open_pi_zero_tpu.processing import FakeTokenizer

    ref_simpler = _load_reference_adapters(monkeypatch)
    stats = BRIDGE_STATS if kind == "bridge" else FRACTAL_STATS
    common = dict(
        dataset_statistics_path=stats,
        num_image_tokens=4,
        image_size=(96, 96),
        max_seq_len=20,
    )
    ours = ea.make_adapter(
        kind, tokenizer=FakeTokenizer(image_token_id=500), **common
    )
    ref_cls = (
        ref_simpler.BridgeSimplerAdapter
        if kind == "bridge"
        else ref_simpler.EDRSimplerAdapter
    )
    ref = ref_cls(
        pretrained_model_path="unused-stubbed",
        tokenizer_padding="max_length",
        **common,
    )
    return ours, ref


class TestPreprocessParity:
    @pytest.mark.parametrize(
        "kind,uid,obs_fn",
        [
            ("bridge", "widowx", _widowx_obs),
            ("fractal", "google_robot_static", _google_robot_obs),
        ],
    )
    def test_model_inputs_byte_equal(self, monkeypatch, kind, uid, obs_fn):
        ours, ref = _pair(monkeypatch, kind)
        rng = np.random.default_rng(7)
        env = FakeManiskillEnv(uid)
        obs = obs_fn(rng)
        instruction = "put the spoon on the towel"

        got = ours.preprocess(env, obs, instruction)
        want = ref.preprocess(env, obs, instruction)

        np.testing.assert_array_equal(
            np.asarray(got["input_ids"]), np.asarray(want["input_ids"])
        )
        np.testing.assert_array_equal(
            np.asarray(got["attention_mask"]), np.asarray(want["attention_mask"])
        )
        # ours NHWC float32, reference torch NCHW — same bytes modulo layout
        ref_px = want["pixel_values"].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(got["pixel_values"], ref_px.astype(np.float32))
        # proprio: frame conversion + normalization byte-parity
        np.testing.assert_allclose(
            np.asarray(got["proprios"], np.float64),
            want["proprios"].double().numpy(),
            rtol=0,
            atol=1e-7,
        )

    def test_video_frame_is_raw_camera_rgb(self, monkeypatch):
        ours, ref = _pair(monkeypatch, "bridge")
        rng = np.random.default_rng(3)
        env = FakeManiskillEnv("widowx")
        obs = _widowx_obs(rng)
        np.testing.assert_array_equal(
            ours.get_video_frame(env, obs), ref.get_video_frame(env, obs)
        )


class TestPostprocessParity:
    def test_bridge_chunk_byte_equal(self, monkeypatch):
        ours, ref = _pair(monkeypatch, "bridge")
        rng = np.random.default_rng(11)
        chunk = rng.uniform(-1, 1, size=(4, 7))
        chunk[:, -1] = rng.uniform(0, 1, size=4)  # gripper logits in [0,1]
        np.testing.assert_allclose(
            ours.postprocess(chunk.copy()), ref.postprocess(chunk.copy()),
            rtol=0, atol=1e-12,
        )

    def test_fractal_sticky_gripper_sequence(self, monkeypatch):
        """Run 40 consecutive single-action steps through both EDR adapters:
        the sticky state machines must stay in lock-step across chunk
        boundaries and the 15-repeat release."""
        ours, ref = _pair(monkeypatch, "fractal")
        rng = np.random.default_rng(13)
        ours.reset(), ref.reset()
        for t in range(40):
            a = rng.uniform(-1, 1, size=(1, 7))
            # drive the gripper through open/close flips to trip the machine
            a[0, -1] = [0.9, 0.1, 0.9, 0.95][t % 4]
            np.testing.assert_allclose(
                ours.postprocess(a.copy()), ref.postprocess(a.copy()),
                rtol=0, atol=1e-12,
            )
            assert ours.sticky_action_is_on == ref.sticky_action_is_on
            assert ours.gripper_action_repeat == ref.gripper_action_repeat
