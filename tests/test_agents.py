"""Agent-layer tests: env adapters (normalization, gripper state machines,
rotation postprocessing), the interleaved-dataset wrapper, a TrainAgent
end-to-end smoke on a synthetic RLDS bridge dataset, and an EvalAgent
episode loop against a fake environment — all hermetic (FakeTokenizer, no
simpler_env / hub access)."""

import json
import os

import numpy as np
import pytest
import tensorflow as tf

tf.config.set_visible_devices([], "GPU")

import jax

from open_pi_zero_tpu.agents import env_adapter as ea
from open_pi_zero_tpu.agents.dataset import RLDSInterleavedDataset
from open_pi_zero_tpu.config import ConfigDict
from open_pi_zero_tpu.data import rlds
from open_pi_zero_tpu.processing import FakeTokenizer
from open_pi_zero_tpu.utils.geometry import euler2axangle

STATS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "configs/statistics/bridge_statistics.json",
)


def _adapter(cls=ea.BridgeSimplerAdapter, **kw):
    kw.setdefault("dataset_statistics_path", STATS_PATH)
    kw.setdefault("num_image_tokens", 4)
    kw.setdefault("image_size", (28, 28))
    kw.setdefault("max_seq_len", 12)
    kw.setdefault("tokenizer", FakeTokenizer(image_token_id=500))
    return cls(**kw)


class TestBaseNormalization:
    def test_bound_roundtrip(self):
        rng = np.random.default_rng(0)
        lo, hi = -np.ones(6), np.ones(6) * 3
        x = rng.uniform(-1, 3, size=(10, 6))
        n = ea.BaseEnvAdapter.normalize_bound(x, lo, hi)
        assert (n >= -1).all() and (n <= 1).all()
        back = ea.BaseEnvAdapter.denormalize_bound(n, lo, hi)
        np.testing.assert_allclose(back, x, atol=1e-6)

    def test_gaussian_roundtrip(self):
        rng = np.random.default_rng(1)
        mean, std = rng.normal(size=4), rng.uniform(0.5, 2, size=4)
        x = rng.normal(size=(5, 4))
        n = ea.BaseEnvAdapter.normalize_gaussian(x, mean, std)
        back = ea.BaseEnvAdapter.denormalize_gaussian(n, mean, std)
        np.testing.assert_allclose(back, x, atol=1e-6)


class TestBridgeAdapter:
    def test_gripper_binarization(self):
        a = _adapter()
        assert a.postprocess_gripper(0.9) == 1.0
        assert a.postprocess_gripper(0.1) == -1.0
        assert a.postprocess_gripper(0.5) == -1.0  # strict >

    def test_postprocess_rotation_and_denorm(self):
        a = _adapter()
        chunk = np.zeros((2, 7), np.float32)
        chunk[:, -1] = 1.0  # open
        out = a.postprocess(chunk)
        assert out.shape == (2, 7)
        # gripper converted to +1 (open)
        np.testing.assert_allclose(out[:, -1], 1.0)
        # normalized zeros denormalize to the midpoint of [p01, p99]
        stats = json.load(open(STATS_PATH))["action"]
        mid = (np.asarray(stats["p01"]) + np.asarray(stats["p99"]))[:3] / 2
        np.testing.assert_allclose(out[0, :3], mid, atol=1e-5)
        # rotation columns are axis*angle of the denormalized euler angles
        eul = ea.BaseEnvAdapter.denormalize_bound(
            chunk[:1, 3:6], np.asarray(stats["p01"])[3:6], np.asarray(stats["p99"])[3:6]
        )[0]
        ax, ang = euler2axangle(*eul)
        np.testing.assert_allclose(out[0, 3:6], ax * ang, atol=1e-6)

    def test_preprocess_proprio_topdown_frame(self):
        a = _adapter()
        # identity quaternion -> rotation = default_rot^T's euler
        obs = {"agent": {"eef_pos": np.array([0.1, 0.2, 0.3, 1, 0, 0, 0, 0.7])}}
        p = a.preprocess_proprio(obs)
        assert p.shape == (7,)
        np.testing.assert_allclose(p[:3], [0.1, 0.2, 0.3])
        np.testing.assert_allclose(p[-1], 0.7)

    def test_preprocess_full(self, monkeypatch):
        a = _adapter()
        img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
        monkeypatch.setattr(ea, "_get_simpler_image", lambda env, obs: img)
        obs = {"agent": {"eef_pos": np.array([0.1, 0.2, 0.3, 1, 0, 0, 0, 0.7])}}
        inputs = a.preprocess(None, obs, "pick up the carrot")
        assert inputs["pixel_values"].shape == (1, 28, 28, 3)
        assert inputs["pixel_values"].min() >= -1 and inputs["pixel_values"].max() <= 1
        assert inputs["input_ids"].shape == (1, 12)
        assert (inputs["input_ids"][0, :4] == 500).all()  # image tokens first
        assert inputs["proprios"].shape == (1, 1, 7)
        assert np.abs(inputs["proprios"]).max() <= 1.0  # bound-normalized


class TestEDRAdapter:
    def test_proprio_quat_roll_and_closedness(self):
        a = _adapter(ea.EDRSimplerAdapter)
        obs = {"agent": {"eef_pos": np.array([1, 2, 3, 0.5, 0.1, 0.2, 0.3, 0.8])}}
        p = a.preprocess_proprio(obs)
        np.testing.assert_allclose(p[3:7], [0.1, 0.2, 0.3, 0.5])  # wxyz -> xyzw
        np.testing.assert_allclose(p[-1], 0.2)  # closedness = 1 - width

    def test_sticky_gripper_machine(self):
        a = _adapter(ea.EDRSimplerAdapter)
        a.reset()
        # action 0.0 (close command): relative = -(0*2-1) = 1 -> sticky on
        first = a.postprocess_gripper(0.0)
        assert first == 1.0 and a.sticky_action_is_on
        # subsequent conflicting commands keep repeating the sticky action
        for i in range(ea.EDRSimplerAdapter.STICKY_NUM_REPEAT - 1):
            assert a.postprocess_gripper(1.0) == 1.0
        # machine resets after STICKY_NUM_REPEAT repeats
        assert not a.sticky_action_is_on
        assert a.gripper_action_repeat == 0
        # neutral command (0.5 -> relative 0) does not trigger sticky
        a.reset()
        assert a.postprocess_gripper(0.5) == 0.0
        assert not a.sticky_action_is_on

    def test_reset_clears_state(self):
        a = _adapter(ea.EDRSimplerAdapter)
        a.postprocess_gripper(0.0)
        a.reset()
        assert not a.sticky_action_is_on and a.gripper_action_repeat == 0


def test_make_adapter_dispatch():
    a = ea.make_adapter(
        "bridge",
        dataset_statistics_path=STATS_PATH,
        num_image_tokens=4,
        image_size=(28, 28),
        max_seq_len=12,
        tokenizer=FakeTokenizer(image_token_id=500),
    )
    assert isinstance(a, ea.BridgeSimplerAdapter)
    with pytest.raises(ValueError):
        ea.make_adapter("nope")


# --------------------------------------------------------------------------- #
# Synthetic RLDS bridge dataset (same layout as tests/test_data_pipeline.py)
# --------------------------------------------------------------------------- #


def _bridge_leaves(img_hw=32):
    return [
        rlds.LeafSpec("steps/observation/image_0", "uint8", (img_hw, img_hw, 3), "image", True, "jpeg"),
        rlds.LeafSpec("steps/observation/state", "float32", (7,), "tensor", True),
        rlds.LeafSpec("steps/action", "float32", (7,), "tensor", True),
        rlds.LeafSpec("steps/language_instruction", "string", (), "text", True),
        rlds.LeafSpec("episode_metadata/file_path", "string", (), "text", False),
    ]


def _make_episode(rng, T, img_hw=32):
    imgs = rng.integers(0, 255, size=(T, img_hw, img_hw, 3), dtype=np.uint8)
    return {
        "steps": {
            "observation": {
                "image_0": [tf.io.encode_jpeg(x).numpy() for x in imgs],
                "state": rng.normal(size=(T, 7)).astype(np.float32),
            },
            "action": rng.uniform(-0.5, 0.5, size=(T, 7)).astype(np.float32),
            "language_instruction": [b"pick up the spoon"] * T,
        },
        "episode_metadata": {"file_path": b"/tmp/ep"},
    }


@pytest.fixture(scope="module")
def bridge_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = str(tmp_path_factory.mktemp("rlds_agents") / "bridge_dataset")
    eps = [_make_episode(rng, T) for T in [10, 8, 12, 9]]
    rlds.write_rlds_dataset(d, "bridge_dataset", eps, _bridge_leaves(), shards=2)
    return os.path.dirname(d)


def _data_cfg(bridge_dir):
    return ConfigDict(
        {
            "dataset_mix": "bridge",
            "data_path": bridge_dir,
            "split": "train",
            "window_size": 1,
            "action_horizon": 4,
            "skip_unlabeled": True,
            "load_proprio": True,
            "shuffle_buffer_size": 64,
            "num_parallel_calls": 2,
            "traj_transform_threads": 1,
            "traj_read_threads": 1,
            "resize_size": [28, 28],
        }
    )


def test_interleaved_dataset_wrapper(bridge_dir):
    ds = RLDSInterleavedDataset(_data_cfg(bridge_dir), train=True)
    batch = next(ds.iterator(4, shard_per_process=False))
    img = batch["observation"]["image_primary"]
    assert img.shape[0] == 4 and img.shape[-3:] == (28, 28, 3)
    assert batch["action"].shape[-2:] == (4, 7)
    assert np.abs(batch["action"][..., :-1]).max() <= 1.0  # bound-normalized
    assert batch["observation"]["proprio"].shape[-1] == 7


# --------------------------------------------------------------------------- #
# TrainAgent end-to-end smoke (tiny model, 2 updates, checkpoint, resume)
# --------------------------------------------------------------------------- #


def _tiny_train_cfg(bridge_dir, tmp_path, **over):
    cfg = {
        "name": "tiny",
        "seed": 0,
        "log_dir": str(tmp_path / "log"),
        "load_pretrained_weights": False,
        "n_updates": 2,
        "log_freq": 1,
        "save_model_freq": 2,
        "save_model_start": 0,
        "eval_freq": 2,
        "eval_size": 4,
        "global_batch_size": 16,
        "per_device_batch_size": 1,  # 8 devices -> grad_accum = 2
        "action_lr": 1e-4,
        "vlm_lr": 1e-4,
        "use_ema": True,
        "ema_start": 0,
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
        "data": {
            "train": dict(_data_cfg(bridge_dir)),
            "val": {"split": "train", "shuffle_buffer_size": 8},
        },
    }
    cfg.update(over)
    return ConfigDict(cfg)


@pytest.mark.slow
def test_train_agent_end_to_end(bridge_dir, tmp_path):
    from open_pi_zero_tpu.agents.train import TrainAgent

    cfg = _tiny_train_cfg(bridge_dir, tmp_path)
    agent = TrainAgent(cfg)
    assert agent.grad_accum == 2  # 16 / (1 * 8 devices)
    state = agent.run()
    assert int(state.step) == 2

    ckpt = os.path.join(agent.ckpt_dir, "ckpt_2")
    assert os.path.isdir(ckpt)

    # resume from the checkpoint and take one more step
    cfg2 = _tiny_train_cfg(
        bridge_dir, tmp_path, resume_checkpoint_path=ckpt, n_updates=3
    )
    agent2 = TrainAgent(cfg2)
    assert int(agent2.state.step) == 2
    state2 = agent2.run()
    assert int(state2.step) == 3


# --------------------------------------------------------------------------- #
# EvalAgent loop against a fake environment
# --------------------------------------------------------------------------- #


class FakeEnv:
    """Minimal maniskill-like episode protocol: truncates every 6 steps,
    succeeds on even episodes."""

    def __init__(self):
        self.episode = -1
        self.t = 0

    def reset(self, seed=None, options=None):
        self.episode += 1
        self.t = 0
        return self._obs(), {}

    def _obs(self):
        return {"agent": {"eef_pos": np.array([0.1, 0.2, 0.3, 1, 0, 0, 0, 0.5])}}

    def step(self, action):
        assert action.shape == (7,)
        self.t += 1
        truncated = self.t >= 6
        success = truncated and (self.episode % 2 == 0)
        return self._obs(), 0.0, success, truncated, {}

    def get_language_instruction(self):
        return "put the spoon on the towel"


def _tiny_eval_cfg(tmp_path, **extra):
    """Tiny-geometry EvalAgent ConfigDict shared by the episode-loop tests."""
    cfg = ConfigDict(
        {
            "seed": 0,
            "log_dir": str(tmp_path / "eval"),
            "n_eval_episode": 4,
            "n_video": 0,
            "record_video": False,
            "act_steps": 4,
            "horizon_steps": 4,
            "num_inference_steps": 2,
            "max_image_text_tokens": 12,
            "image_token_index": 500,
            "vocab_size": 10000,
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
        }
    )
    cfg.update(extra)
    return cfg


def _tiny_eval_agent(tmp_path, monkeypatch, **extra):
    from open_pi_zero_tpu.agents.eval import EvalAgent
    from open_pi_zero_tpu.config import tiny_pizero_config
    from open_pi_zero_tpu.models import pizero

    img = np.zeros((64, 64, 3), np.uint8)
    monkeypatch.setattr(ea, "_get_simpler_image", lambda env, obs: img)
    cfg = _tiny_eval_cfg(tmp_path, **extra)
    model_cfg = tiny_pizero_config(
        vocab_size=10000, max_image_text_tokens=12, num_inference_steps=2
    )
    params = pizero.init_params(jax.random.key(0), model_cfg)
    return EvalAgent(cfg, env=FakeEnv(), adapter=_adapter(), params=params)


@pytest.mark.slow
def test_eval_agent_loop(tmp_path, monkeypatch):
    agent = _tiny_eval_agent(tmp_path, monkeypatch)
    result = agent.run()
    assert result["n_episodes"] == 4
    assert result["success_rate"] == 0.5  # even episodes succeed
    assert result["mean_inference_time_s"] is not None
    # per-instruction breakdown: FakeEnv issues one instruction for all
    # episodes, so the single bucket carries the 2/4 aggregate
    assert result["success_by_instruction"] == {"put the spoon on the towel": "2/4"}


@pytest.mark.slow
def test_eval_agent_refine_from_prev(tmp_path, monkeypatch):
    """refine_from_prev=0.5: the first chunk of each episode runs the full
    flow; steady-state chunks run the refined (warm-started) path; the
    cache is dropped at every episode reset. FakeEnv truncates at 6 env
    steps with act_steps=4 -> exactly 2 chunks per episode."""
    agent = _tiny_eval_agent(tmp_path, monkeypatch, refine_from_prev=0.5)
    calls = {"full": 0, "refined": 0}
    full_fn, ref_fn = agent._infer, agent._infer_refined

    def count_full(*a):
        calls["full"] += 1
        return full_fn(*a)

    def count_ref(*a):
        calls["refined"] += 1
        assert agent._prev_chunk is not None
        return ref_fn(*a)

    agent._infer, agent._infer_refined = count_full, count_ref
    result = agent.run()
    assert result["n_episodes"] == 4
    assert result["success_rate"] == 0.5  # accounting unchanged by the tier
    assert calls == {"full": 4, "refined": 4}, calls
    # cache cleared after the final episode's reset bookkeeping path
    agent.reset_policy_cache()
    assert agent._prev_chunk is None


_TINY_GEOMETRY_OVERRIDES = [
    "num_inference_steps=2",
    "vocab_size=10000",
    "image_token_index=500",
    "max_image_text_tokens=12",
    "env.adapter.max_seq_len=12",
    "env.adapter.num_image_tokens=4",
    "time_hidden_size=32",
    "mixture.vlm.hidden_size=64",
    "mixture.vlm.intermediate_size=128",
    "mixture.proprio.hidden_size=32",
    "mixture.proprio.intermediate_size=64",
    "mixture.action.hidden_size=32",
    "mixture.action.intermediate_size=64",
    "vision.config.hidden_size=32",
    "vision.config.intermediate_size=64",
    "vision.config.num_hidden_layers=2",
    "vision.config.num_attention_heads=4",
    "vision.config.image_size=28",
    "vision.config.num_image_tokens=4",
    "vision_projector.config.vision_config.projection_dim=64",
    "joint.config.num_hidden_layers=2",
    "joint.config.num_attention_heads=4",
    "joint.config.head_dim=16",
]


@pytest.mark.slow
@pytest.mark.parametrize(
    "name",
    ["fractal_coke", "fractal_move", "fractal_drawer", "fractal_apple"],
)
def test_eval_agent_per_task_fractal_smoke(name, tmp_path, monkeypatch):
    """Each per-task fractal config (reference config/eval/fractal_*.yaml)
    drives a full EvalAgent episode at tiny geometry: config -> typed model
    config -> EDR sticky-gripper adapter -> episode loop."""
    from open_pi_zero_tpu.agents.eval import EvalAgent
    from open_pi_zero_tpu.config import load_config, pizero_config_from_dict
    from open_pi_zero_tpu.models import pizero

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, f"configs/eval/{name}.yaml"),
        overrides=[
            "n_eval_episode=1",
            "record_video=false",
            f"log_dir={tmp_path}",
            *_TINY_GEOMETRY_OVERRIDES,
        ],
    )
    assert cfg.act_steps == 2  # fractal protocol: run 2 of 4 chunk steps
    model_cfg = pizero_config_from_dict(cfg)
    params = pizero.init_params(jax.random.key(0), model_cfg)

    img = np.zeros((64, 64, 3), np.uint8)
    monkeypatch.setattr(ea, "_get_simpler_image", lambda env, obs: img)
    adapter = _adapter(
        ea.EDRSimplerAdapter,
        dataset_statistics_path=os.path.join(
            repo, "configs/statistics/fractal_statistics.json"
        ),
    )
    agent = EvalAgent(cfg, env=FakeEnv(), adapter=adapter, params=params)
    result = agent.run()
    assert result["n_episodes"] == 1


@pytest.mark.slow
def test_eval_agent_loads_lora_checkpoint(tmp_path, monkeypatch):
    """_load_params must merge LoRA adapters before fuse_for_serving /
    quantize (ADVICE r1: the fusion guard rejected adapter-carrying trees,
    so LoRA fine-tuned checkpoints could not be served at all)."""
    from open_pi_zero_tpu.agents.eval import EvalAgent
    from open_pi_zero_tpu.config import (
        LoraConfig,
        dataclass_replace,
        pizero_config_from_dict,
        tiny_pizero_config,
    )
    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.ops import lora as lora_lib
    from open_pi_zero_tpu.training import checkpoint as ckpt_lib

    img = np.zeros((64, 64, 3), np.uint8)
    monkeypatch.setattr(ea, "_get_simpler_image", lambda env, obs: img)

    cfg = ConfigDict(
        {
            "seed": 0,
            "log_dir": str(tmp_path / "eval"),
            "checkpoint_path": str(tmp_path / "ckpt"),
            "n_eval_episode": 1,
            "act_steps": 4,
            "horizon_steps": 4,
            "num_inference_steps": 2,
            "max_image_text_tokens": 12,
            "image_token_index": 500,
            "vocab_size": 10000,
            "time_hidden_size": 32,
            "lora_r": 2,
            "mixture": {
                "vlm": {"hidden_size": 64, "intermediate_size": 128, "cache": True,
                        "rope_theta": 10000.0, "use_lora": True},
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
        }
    )
    model_cfg = pizero_config_from_dict(cfg)
    params = pizero.init_params(jax.random.key(0), model_cfg)
    assert lora_lib.has_lora(params)
    # fake "trained" adapters so the merge actually moves weights
    params = jax.tree.map(lambda x: x + 0.01, params)
    ckpt_lib.save_params(cfg.checkpoint_path, params)

    agent = EvalAgent(cfg, env=FakeEnv(), adapter=_adapter())
    assert not lora_lib.has_lora(agent.params)  # merged away
    assert "qkv" in agent.params["joint"]["mixtures"]["vlm"]["layers"]["attn"]
    # default serving config: int8 weight-only action expert, W8A8 vlm
    act_attn = agent.params["joint"]["mixtures"]["action"]["layers"]["attn"]
    assert isinstance(act_attn["qkv"], dict) and "q" in act_attn["qkv"]
    vlm_attn = agent.params["joint"]["mixtures"]["vlm"]["layers"]["attn"]
    assert isinstance(vlm_attn["qkv"], dict) and "qa" in vlm_attn["qkv"]
    # ...and SigLIP stays float by default: the round-3 drift budget
    # (DRIFT_BUDGET.json) attributes the largest drift share to the vision
    # tower; bf16 SigLIP puts the chunk mid-band
    sig_attn = agent.params["siglip"]["layers"]["attn"]
    assert not isinstance(sig_attn["qkv"]["kernel"], dict)
    result = agent.run()
    assert result["n_episodes"] == 1

    # explicit opt-in recovers the minimum-latency full-W8A8 tier
    cfg_s = ConfigDict(
        {**cfg, "w8a8_siglip": True, "log_dir": str(tmp_path / "evals")}
    )
    agent_s = EvalAgent(cfg_s, env=FakeEnv(), adapter=_adapter())
    assert "qa" in agent_s.params["siglip"]["layers"]["attn"]["qkv"]["kernel"]

    # pure-bf16 serving: merge still happens before fusion
    cfg_b = ConfigDict({**cfg, "quantize": False, "log_dir": str(tmp_path / "evalb")})
    agent_b = EvalAgent(cfg_b, env=FakeEnv(), adapter=_adapter())
    assert not lora_lib.has_lora(agent_b.params)
    act_attn_b = agent_b.params["joint"]["mixtures"]["action"]["layers"]["attn"]
    assert not (isinstance(act_attn_b["qkv"], dict) and "scale" in act_attn_b["qkv"])

    # 4-bit (NF4) serving tier: quantize_bits=4 loads, serves, runs
    cfg_q4 = ConfigDict(
        {**cfg, "quantize_bits": 4, "log_dir": str(tmp_path / "evalq4")}
    )
    agent_q4 = EvalAgent(cfg_q4, env=FakeEnv(), adapter=_adapter())
    act_attn_q4 = agent_q4.params["joint"]["mixtures"]["action"]["layers"]["attn"]
    assert isinstance(act_attn_q4["qkv"], dict) and "q4" in act_attn_q4["qkv"]
    result_q4 = agent_q4.run()
    assert result_q4["n_episodes"] == 1


@pytest.mark.slow
def test_train_agent_auto_resume(bridge_dir, tmp_path):
    """resume_checkpoint_path='auto' picks the newest COMPLETE checkpoint
    (elastic-restart semantics), round-trips wandb_id, and skips partial
    checkpoints left by preemption."""
    from open_pi_zero_tpu.agents.train import TrainAgent

    cfg = _tiny_train_cfg(bridge_dir, tmp_path, eval_freq=0)
    agent = TrainAgent(cfg)
    agent._wandb_id = "run-abc123"
    agent.run()  # saves ckpt_2

    # a partial newer checkpoint (no state/meta) must be skipped
    os.makedirs(os.path.join(agent.ckpt_dir, "ckpt_99"))

    cfg2 = _tiny_train_cfg(
        bridge_dir, tmp_path, resume_checkpoint_path="auto", eval_freq=0
    )
    agent2 = TrainAgent(cfg2)
    assert int(agent2.state.step) == 2
    assert agent2._wandb_id == "run-abc123"  # persisted through meta.json

    # no checkpoints -> auto resolves to fresh start
    cfg3 = _tiny_train_cfg(
        bridge_dir, tmp_path / "fresh", resume_checkpoint_path="auto", eval_freq=0
    )
    agent3 = TrainAgent(cfg3)
    assert int(agent3.state.step) == 0


@pytest.mark.slow
def test_train_agent_zero1(bridge_dir, tmp_path):
    """TrainAgent with zero1=true trains and shards its optimizer states."""
    from jax.sharding import PartitionSpec as P

    from open_pi_zero_tpu.agents.train import TrainAgent

    cfg = _tiny_train_cfg(
        bridge_dir, tmp_path, zero1=True, eval_freq=0, save_model_freq=0,
        use_ema=False, n_updates=1,
    )
    agent = TrainAgent(cfg)
    state = agent.run()
    assert int(state.step) == 1
    big = [
        x for x in jax.tree.leaves(state.opt_state)
        if hasattr(x, "sharding") and getattr(x, "ndim", 0) >= 2 and x.size > 1000
    ]
    assert any(x.sharding.spec != P() for x in big)


@pytest.mark.slow
def test_eval_agent_loads_qlora_checkpoint(tmp_path, monkeypatch):
    """QLoRA checkpoint (NF4 frozen bases on vlm + vision, live adapters):
    EvalAgent must restore the quantized structure, merge the adapters
    (dequantizing bases), and serve — the reference's quantize+lora eval
    path (src/model/lora.py:83-100 tiers)."""
    from open_pi_zero_tpu.agents import env_adapter as ea
    from open_pi_zero_tpu.agents.eval import EvalAgent
    from open_pi_zero_tpu.config import ConfigDict, pizero_config_from_dict
    from open_pi_zero_tpu.models import pizero
    from open_pi_zero_tpu.ops import lora as lora_lib
    from open_pi_zero_tpu.training import checkpoint as ckpt_lib

    img = np.zeros((64, 64, 3), np.uint8)
    monkeypatch.setattr(ea, "_get_simpler_image", lambda env, obs: img)

    cfg = ConfigDict(
        {
            "seed": 0,
            "log_dir": str(tmp_path / "eval"),
            "checkpoint_path": str(tmp_path / "ckpt"),
            "n_eval_episode": 1,
            "act_steps": 4,
            "horizon_steps": 4,
            "num_inference_steps": 2,
            "max_image_text_tokens": 12,
            "image_token_index": 500,
            "vocab_size": 10000,
            "time_hidden_size": 32,
            "lora_r": 2,
            "mixture": {
                "vlm": {"hidden_size": 64, "intermediate_size": 128, "cache": True,
                        "rope_theta": 10000.0, "use_lora": True,
                        "use_quantize": True},
                "proprio": {"hidden_size": 32, "intermediate_size": 64, "cache": True,
                            "use_final_norm": True, "rope_theta": 100.0},
                "action": {"hidden_size": 32, "intermediate_size": 64,
                           "use_final_norm": True, "rope_theta": 100.0},
            },
            "vision": {
                "use_lora": True,
                "use_quantize": True,
                "config": {
                    "hidden_size": 32, "intermediate_size": 64,
                    "num_hidden_layers": 2, "num_attention_heads": 4,
                    "image_size": 28, "patch_size": 14, "num_image_tokens": 4,
                    "lora": {"r": 2},
                },
            },
            "vision_projector": {"config": {"vision_config": {"projection_dim": 64}}},
            "joint": {"config": {
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "num_key_value_heads": 1, "head_dim": 16,
            }},
        }
    )
    model_cfg = pizero_config_from_dict(cfg)
    params = pizero.init_params(jax.random.key(0), model_cfg)
    params = lora_lib.quantize_per_model_config(params, model_cfg)
    vlm = params["joint"]["mixtures"]["vlm"]["layers"]["attn"]
    assert "q4" in vlm["q"] and "q_lora" in vlm
    assert "q4" in params["siglip"]["layers"]["attn"]["q"]["kernel"]
    # "trained" adapters
    import jax.numpy as jnp

    params = jax.tree.map(
        lambda x: x + 0.01 if x.dtype == jnp.float32 else x, params
    )
    ckpt_lib.save_params(cfg.checkpoint_path, params)

    agent = EvalAgent(cfg, env=FakeEnv(), adapter=_adapter())
    assert not lora_lib.has_lora(agent.params)
    assert not lora_lib.has_lora(agent.params.get("siglip", {}))
    # served tree re-quantized into the serving tiers, not the NF4 format
    act_attn = agent.params["joint"]["mixtures"]["action"]["layers"]["attn"]
    assert isinstance(act_attn["qkv"], dict) and "q" in act_attn["qkv"]
    result = agent.run()
    assert result["n_episodes"] == 1

