"""Smoke tests for the repo-root utility scripts (argparse surfaces the
reference exposes as runnable checks — SURVEY.md §4)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, *args],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_check_sampling_runs():
    r = _run(["scripts/check_sampling.py", "--n", "5000"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "sampling distributions ok" in r.stdout


@pytest.mark.slow
def test_model_memory_tiny_runs():
    r = _run(["scripts/model_memory.py", "--tiny"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "NF4 whole trunk" in r.stdout
    # the 4-bit tier must actually be smaller than bf16
    lines = {
        l.rsplit(None, 2)[0].strip(): float(l.rsplit(None, 2)[1])
        for l in r.stdout.strip().splitlines()
        if l.endswith(("GiB", "MiB"))
    }
    assert lines["NF4 whole trunk (memory tier)"] < lines["bf16 fused"]


@pytest.mark.slow
def test_check_simpler_reports_missing_env():
    r = _run(["scripts/check_simpler.py"])
    # without the external simulator installed the script must exit
    # nonzero with a clear message (and run fine where it is installed)
    if r.returncode != 0:
        assert "simpler_env is not installed" in (r.stdout + r.stderr)


@pytest.mark.slow
def test_verify_checkpoint_self_test():
    """The checkpoint-arrival readiness harness must run its whole chain
    (load -> textgen -> parity -> oracle -> drift -> episodes[SKIP])
    against the in-process torch reference."""
    r = _run(["scripts/verify_checkpoint.py", "--self-test"], timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ALL STAGES PASSED" in r.stdout
    for stage in ("load", "textgen", "parity", "oracle", "drift"):
        assert f"[{stage:9s}] PASS" in r.stdout, r.stdout


@pytest.mark.slow
def test_bench_serving_daemon_tiny():
    """Through-socket daemon bench runs end-to-end on the tiny model."""
    r = _run(
        ["scripts/bench_serving_daemon.py", "--tiny", "--batches", "1",
         "--requests", "3", "--out", "/tmp/opz_daemon_test.json"],
        timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    import json as _json

    with open("/tmp/opz_daemon_test.json") as f:
        payload = _json.load(f)
    assert payload["through_socket"][0]["chunks_per_s"] > 0
    assert "binary" in payload["codec"] and "json" in payload["codec"]


TINY_EVAL_YAML = """\
name: tiny_serve
seed: 42
log_dir: /tmp/opz_tiny_serve
checkpoint_path:
use_bf16: true
env:
  task: widowx_carrot_on_plate
  adapter:
    name: bridge
    dataset_statistics_path: configs/statistics/bridge_statistics.json
    tokenizer_padding: max_length
    max_seq_len: 12
    num_image_tokens: 4
    image_size: [28, 28]
flow_sampling: beta
flow_sig_min: 0.001
num_inference_steps: 2
final_action_clip_value: 1.0
cond_steps: 1
horizon_steps: 4
act_steps: 4
action_dim: 7
proprio_dim: 7
image_token_index: 500
vocab_size: 512
pad_token_id: 0
time_hidden_size: 32
time_max_period: 10000.0
action_expert_adaptive_mode:
action_expert_rope_theta: 10000.0
quantize: true
lora: false
max_seq_len: 12
max_image_text_tokens: ${env.adapter.max_seq_len}
mixture:
  vlm:
    hidden_size: 64
    intermediate_size: 128
    use_final_norm: false
    cache: true
    use_quantize: false
    use_lora: false
    adaptive_mode:
    rope_theta: 10000.0
  proprio:
    hidden_size: 32
    intermediate_size: 64
    use_final_norm: true
    cache: true
    use_quantize: false
    use_lora: false
    adaptive_mode: ${action_expert_adaptive_mode}
    rope_theta: ${action_expert_rope_theta}
  action:
    hidden_size: 32
    intermediate_size: 64
    use_final_norm: true
    cache: false
    use_quantize: false
    use_lora: false
    adaptive_mode: ${action_expert_adaptive_mode}
    rope_theta: ${action_expert_rope_theta}
vision:
  config:
    {hidden_size: 32, intermediate_size: 64, num_hidden_layers: 2,
     num_attention_heads: 4, num_channels: 3, image_size: 28,
     patch_size: 14, layer_norm_eps: 1e-6, num_image_tokens: 4}
vision_projector:
  config:
    vision_config: {projection_dim: 64}
joint:
  config:
    {num_hidden_layers: 2, num_attention_heads: 4, num_key_value_heads: 1,
     head_dim: 16, rms_norm_eps: 1e-6, attention_bias: false,
     attention_dropout: 0.0}
"""


@pytest.mark.slow
def test_serve_random_init_through_socket(tmp_path):
    """scripts/serve.py --random-init (streaming builder, no checkpoint)
    comes up and serves finite chunks over both codecs — the pre-weights
    load-test path."""
    import socket
    import time

    cfg_path = tmp_path / "tiny_eval.yaml"
    cfg_path.write_text(TINY_EVAL_YAML)
    port = 7491
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--config", str(cfg_path),
         "--random-init", "--port", str(port), "--batch-sizes", "1",
         "refine_from_prev=0.5"],
        cwd=ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(f"daemon died:\n{proc.stdout.read()}")
            try:
                socket.create_connection(("127.0.0.1", port), timeout=1).close()
                break
            except OSError:
                time.sleep(1.0)
        else:
            raise AssertionError("daemon never opened its port")

        import numpy as np

        from open_pi_zero_tpu.serving import request_action

        rng = np.random.default_rng(0)
        obs = {
            "input_ids": np.full((12,), 500, np.int32),
            "pixel_values": rng.normal(size=(28, 28, 3)).astype(np.float32),
            "attention_mask": np.ones((12,), np.int32),
            "proprios": rng.normal(size=(1, 7)).astype(np.float32),
        }
        for binary in (True, False):
            chunk = request_action("127.0.0.1", port, obs, binary=binary)
            assert chunk.shape == (4, 7) and np.isfinite(chunk).all()
        # refined steady-state tier: same observation + the previous chunk
        # rides the request; served by infer_action_refined (t_start=0.5)
        refined = request_action(
            "127.0.0.1", port, {**obs, "prev_chunk": chunk}, binary=True
        )
        assert refined.shape == (4, 7) and np.isfinite(refined).all()
        assert np.abs(refined - chunk).max() > 0  # not an echo
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.mark.slow
def test_qlora_finetune_script(tmp_path):
    """The QLoRA-learns harness at miniature scale: train a tiny reach
    base, then fine-tune it on pick_place through the production QLoRA
    step (NF4-frozen trunk + fresh adapters). Learning is NOT asserted
    (3 updates); the warm-start graft, the bitwise-frozen-payload check,
    and the new/old-task eval chain are."""
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")

    def run(args, timeout=900):
        return subprocess.run([sys.executable, *args], cwd=ROOT, env=env,
                              capture_output=True, text=True, timeout=timeout)

    base = run(["scripts/demo_closed_loop.py", "--workdir",
                str(tmp_path / "base"), "--n-demos", "12", "--n-updates", "3",
                "--n-eval-episodes", "2", "--global-batch", "16",
                "--hidden", "64", "--layers", "2", "--save-freq", "3"])
    assert base.returncode == 0, base.stderr[-3000:]

    out = tmp_path / "qlora.json"
    ft = run(["scripts/demo_qlora_finetune.py",
              "--base-workdir", str(tmp_path / "base"),
              "--workdir", str(tmp_path / "ft"), "--n-demos", "12",
              "--n-updates", "3", "--n-eval-episodes", "2",
              "--global-batch", "16", "--hidden", "64", "--layers", "2",
              "--retention-weight", "0.5",  # exercise the old-task replay
              # mix (second dataset in the OXE-mix registry + per-stream
              # statistics) — the round-4 catastrophic-forgetting fix
              "--out", str(out)])
    assert ft.returncode == 0, ft.stderr[-3000:]
    import json as _json

    result = _json.loads(out.read_text())
    assert result["frozen_nf4_payloads_bitwise_unchanged"] is True
    assert result["n_frozen_payload_leaves"] > 0
    assert result["retention_weight"] == 0.5
    assert "finetuned" in result["new_task_success"]
    assert "base_policy" in result["old_task_success"]
