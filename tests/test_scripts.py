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
