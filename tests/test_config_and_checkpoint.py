"""Config YAML loading + typed-config construction + orbax checkpoint
roundtrip (incl. resume-equivalence of a training run)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_pi_zero_tpu.config import (
    TrainingConfig,
    load_config,
    pizero_config_from_dict,
    tiny_pizero_config,
    training_config_from_dict,
)
from open_pi_zero_tpu.models import pizero
from open_pi_zero_tpu.training import optimizer as opt_lib
from open_pi_zero_tpu.training.checkpoint import (
    restore_checkpoint,
    restore_params,
    save_checkpoint,
    save_params,
)
from open_pi_zero_tpu.training.train_step import init_train_state, make_train_step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestConfigYaml:
    def test_bridge_train_config(self):
        cfg = load_config(os.path.join(REPO, "configs/train/bridge.yaml"))
        # ${eval:} arithmetic resolved
        assert cfg.n_updates == 1550000 // 1024 * 15
        assert cfg.save_model_start == 1550000 // 1024 * 5
        model_cfg = pizero_config_from_dict(cfg)
        assert model_cfg.joint.num_hidden_layers == 18
        assert model_cfg.mixture("vlm").hidden_size == 2048
        assert model_cfg.mixture("vlm").rope_theta == 10000.0
        assert model_cfg.mixture("action").rope_theta == 100.0
        assert model_cfg.mixture("action").cache is False
        assert model_cfg.siglip.num_hidden_layers == 27
        assert model_cfg.total_tokens == 276 + 1 + 4
        tcfg = training_config_from_dict(cfg)
        assert tcfg.action_lr == 5e-5
        assert tcfg.action_lr_scheduler.warmup_steps == 200
        assert tcfg.max_grad_norm == 1.0

    def test_fractal_train_config(self):
        cfg = load_config(os.path.join(REPO, "configs/train/fractal.yaml"))
        model_cfg = pizero_config_from_dict(cfg)
        assert model_cfg.proprio_dim == 8
        assert cfg.data.train.dataset_mix == "fractal"
        assert cfg.data.train.split == "train[:95%]"

    def test_eval_configs(self):
        for name, theta in (("bridge", 10000.0), ("fractal", 10000.0)):
            cfg = load_config(os.path.join(REPO, f"configs/eval/{name}.yaml"))
            model_cfg = pizero_config_from_dict(cfg)
            assert model_cfg.mixture("action").rope_theta == theta
            assert model_cfg.time_max_period == 10000.0

    def test_per_task_fractal_configs(self):
        """The 4 per-task fractal eval configs (reference
        config/eval/fractal_{coke,move,drawer,apple}.yaml) inherit the
        shared fractal base via `_base_` and set task + episode count."""
        expect = {
            "fractal_coke": ("google_robot_pick_horizontal_coke_can", 25 * 4 * 10),
            "fractal_move": ("google_robot_move_near_v0", 60 * 4 * 10),
            "fractal_drawer": ("google_robot_open_drawer", 3 * 4 * 9 * 10),
            "fractal_apple": (
                "google_robot_place_apple_in_closed_top_drawer",
                9 * 4 * 3 * 10,
            ),
        }
        for name, (task, n) in expect.items():
            cfg = load_config(os.path.join(REPO, f"configs/eval/{name}.yaml"))
            assert cfg.env.task == task
            assert cfg.n_eval_episode == n
            assert cfg.act_steps == 2  # fractal runs 2 of 4 chunk steps
            assert cfg.env.adapter.name == "fractal"
            model_cfg = pizero_config_from_dict(cfg)
            assert model_cfg.proprio_dim == 8
            assert model_cfg.joint.num_hidden_layers == 18

    def test_base_include_cycle_raises(self, tmp_path):
        a = tmp_path / "a.yaml"
        b = tmp_path / "b.yaml"
        a.write_text("_base_: b.yaml\nx: 1\n")
        b.write_text("_base_: a.yaml\ny: 2\n")
        with pytest.raises(ValueError, match="cycle"):
            load_config(str(a))

    def test_base_include_deep_merge(self, tmp_path):
        base = tmp_path / "base.yaml"
        leaf = tmp_path / "leaf.yaml"
        base.write_text("env:\n  task: t0\n  adapter: {name: bridge}\nn: 1\n")
        leaf.write_text("_base_: base.yaml\nenv:\n  task: t1\n")
        cfg = load_config(str(leaf), overrides=["n=5"])
        assert cfg.env.task == "t1"
        assert cfg.env.adapter.name == "bridge"  # sibling keys survive
        assert cfg.n == 5  # overrides apply after inheritance

    def test_overrides(self):
        cfg = load_config(
            os.path.join(REPO, "configs/train/bridge.yaml"),
            overrides=["global_batch_size=512", "mixture.vlm.hidden_size=64"],
        )
        assert cfg.global_batch_size == 512
        assert cfg.n_updates == 1550000 // 512 * 15  # arithmetic sees override
        assert cfg.mixture.vlm.hidden_size == 64

    def test_statistics_json_present(self):
        import json

        for name in ("bridge", "fractal"):
            with open(os.path.join(REPO, f"configs/statistics/{name}_statistics.json")) as f:
                stats = json.load(f)
            # reference schema (SURVEY.md §2.4)
            key = next(iter(stats)) if "action" not in stats else None
            node = stats[key] if key else stats
            assert "action" in node and "proprio" in node
            for field in ("mean", "std", "p99", "p01"):
                assert field in node["action"]


class TestCheckpoint:
    @pytest.mark.slow
    def test_trainstate_roundtrip_and_resume_equivalence(self, tmp_path):
        cfg = tiny_pizero_config()
        tcfg = TrainingConfig(use_ema=True, ema_start=0)
        params = pizero.init_params(jax.random.key(0), cfg)
        tx = opt_lib.build_optimizer(tcfg, params)
        step = jax.jit(make_train_step(cfg, tcfg, tx))
        state = init_train_state(params, tx, jax.random.key(1), tcfg)

        rng = np.random.default_rng(0)
        S, n_img = cfg.max_image_text_tokens, cfg.siglip.num_image_tokens
        ids = np.zeros((2, S), np.int32)
        ids[:, :n_img] = cfg.image_token_index
        ids[:, n_img] = 9
        batch = {
            "input_ids": jnp.asarray(ids),
            "pixel_values": jnp.asarray(
                rng.normal(size=(2, cfg.siglip.image_size, cfg.siglip.image_size, 3)),
                jnp.float32,
            ),
            "attention_mask": jnp.asarray((ids != 0).astype(np.int32)),
            "proprios": jnp.zeros((2, cfg.cond_steps, cfg.proprio_dim)),
            "actions": jnp.zeros((2, cfg.horizon_steps, cfg.action_dim)),
        }

        state, _ = step(state, batch)
        save_checkpoint(str(tmp_path / "ckpt"), state, extra={"cnt_batch": 7})

        # continue two more steps from live state
        s_live = state
        for _ in range(2):
            s_live, m_live = step(s_live, batch)

        # restore and continue identically
        abstract = init_train_state(params, tx, jax.random.key(1), tcfg)
        restored, extra = restore_checkpoint(str(tmp_path / "ckpt"), abstract)
        assert extra == {"cnt_batch": 7}
        assert int(restored.step) == 1
        s_res = restored
        for _ in range(2):
            s_res, m_res = step(s_res, batch)
        np.testing.assert_allclose(float(m_live["loss"]), float(m_res["loss"]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s_live.params), jax.tree.leaves(s_res.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_params_only_roundtrip(self, tmp_path):
        cfg = tiny_pizero_config()
        params = pizero.init_params(jax.random.key(3), cfg)
        save_params(str(tmp_path / "p"), params)
        out = restore_params(str(tmp_path / "p"), params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(out)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_checkpoint_carries_eval_params(self, tmp_path):
        """One checkpoint dir must feed BOTH auto-resume (full TrainState)
        and EvalAgent/serving (restore_params) — the train->eval handoff
        the closed-loop demo exercises. A state-only legacy checkpoint must
        fail restore_params with a clear pointer, not a raw orbax error."""
        import pytest

        from open_pi_zero_tpu.training import averaging as avg_lib

        cfg = tiny_pizero_config()
        tcfg = TrainingConfig(use_ema=True, ema_start=0)
        params = pizero.init_params(jax.random.key(5), cfg)
        tx = opt_lib.build_optimizer(tcfg, params)
        state = init_train_state(params, tx, jax.random.key(1), tcfg)

        ev = avg_lib.eval_params(state.avg, state.params)
        save_checkpoint(str(tmp_path / "full"), state, eval_params=ev)
        out = restore_params(str(tmp_path / "full"), params)
        for a, b in zip(jax.tree.leaves(ev), jax.tree.leaves(out)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        save_checkpoint(str(tmp_path / "legacy"), state)
        with pytest.raises(FileNotFoundError, match="eval-params export"):
            restore_params(str(tmp_path / "legacy"), params)

    def test_quant_layout_version_stamped_and_checked(self, tmp_path):
        """4-bit payloads save with a packing-layout version in meta; a
        payload with an old/absent version fails LOUDLY at restore (the
        halves-vs-interleave nibble layouts restore without structural
        error but dequantize to scrambled weights)."""
        import json

        import pytest

        from open_pi_zero_tpu.ops import lora as lora_lib
        from open_pi_zero_tpu.ops.quantization import QUANT_LAYOUT_VERSION

        cfg = tiny_pizero_config()
        params = pizero.init_params(jax.random.key(3), cfg)
        params = {
            **params,
            "joint": {
                "mixtures": {
                    name: (
                        lora_lib.quantize_base_weights(m, bits=4)
                        if name == "vlm"
                        else m
                    )
                    for name, m in params["joint"]["mixtures"].items()
                }
            },
        }
        save_params(str(tmp_path / "q"), params)
        meta = json.loads((tmp_path / "q" / "meta.json").read_text())
        assert meta["quant_layout_version"] == QUANT_LAYOUT_VERSION
        out = restore_params(str(tmp_path / "q"), params)
        assert "q4" in out["joint"]["mixtures"]["vlm"]["layers"]["attn"]["q"]

        # simulate a pre-version checkpoint: drop the marker
        (tmp_path / "q" / "meta.json").write_text("{}")
        with pytest.raises(ValueError, match="packing layout"):
            restore_params(str(tmp_path / "q"), params)

        # float-only trees are exempt (no marker, no check)
        fparams = pizero.init_params(jax.random.key(4), cfg)
        save_params(str(tmp_path / "f"), fparams)
        assert not (tmp_path / "f" / "meta.json").exists()
        restore_params(str(tmp_path / "f"), fparams)


def test_bridge_width_dryrun_config_geometry():
    """The dryrun config must hold every production WIDTH (that is its
    point — catching TP-divisibility bugs) while shrinking depth/seq."""
    from open_pi_zero_tpu.config import PiZeroConfig, bridge_width_dryrun_config

    full, c = PiZeroConfig(), bridge_width_dryrun_config()
    assert c.joint.num_hidden_layers == 2 and c.siglip.num_hidden_layers == 2
    for name in ("vlm", "action"):
        assert c.joint.mixture(name).hidden_size == full.joint.mixture(name).hidden_size
        assert (
            c.joint.mixture(name).intermediate_size
            == full.joint.mixture(name).intermediate_size
        )
    assert c.joint.num_attention_heads == full.joint.num_attention_heads == 8
    assert c.joint.num_key_value_heads == full.joint.num_key_value_heads == 1
    assert c.joint.head_dim == full.joint.head_dim == 256
    assert c.siglip.hidden_size == full.siglip.hidden_size == 1152
    assert c.siglip.intermediate_size == full.siglip.intermediate_size
    # shrunk axes
    assert c.siglip.num_image_tokens == 16
    assert c.vocab_size < 10000 and c.image_token_index < c.vocab_size
    assert (c.siglip.image_size // c.siglip.patch_size) ** 2 == c.siglip.num_image_tokens
