"""Planner fleet launcher: shard math, verification, and a real 2-worker
subprocess fan-out over the synthetic dataset (CPU)."""

import json
import os
import subprocess
import sys

import pytest

from t2onet_tpu.cli.plan_fleet import shard_range, verify


def test_shard_range_covers_everything_once():
    total, shards = 103, 8
    seen = []
    for s in range(shards):
        start, end = shard_range(total, s, shards)
        seen.extend(range(start, end))
    assert seen == list(range(total))


def test_shard_range_single():
    assert shard_range(10, 0, 1) == (0, 10)


def test_verify_detects_missing_and_bad(tmp_path):
    out = str(tmp_path)
    # good item 0
    os.makedirs(os.path.join(out, "train0"))
    with open(os.path.join(out, "train0", "00000.json"), "w") as f:
        json.dump({"operation sequence": []}, f)
    # bad item 1 (unparsable)
    os.makedirs(os.path.join(out, "train1"))
    with open(os.path.join(out, "train1", "00001.json"), "w") as f:
        f.write("{truncated")
    # item 2 missing entirely
    assert verify(out, "train", 0, 3) == [1, 2]


@pytest.mark.slow
def test_two_worker_fanout_end_to_end(tmp_path):
    """Launch the real fleet CLI: 2 CPU workers x 2 pairs each."""
    out = str(tmp_path / "actions")
    cmd = [sys.executable, "-m", "t2onet_tpu.cli.plan_fleet",
           "--synthetic", "--synthetic_n", "4", "--total", "4",
           "--workers", "2", "--worker_cpu", "--img_size", "16",
           "--out_dir", out, "--n_iters", "8", "--n_starts", "1",
           "--beam_size", "2"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                         env=env, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert res.returncode == 0, res.stdout + res.stderr
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["missing_after"] == 0
    assert summary["worker_failures"] == 0
    # every pair wrote the reference-layout JSON with global indices
    for i in range(4):
        path = os.path.join(out, f"train{i}", f"{i:05d}.json")
        with open(path) as f:
            info = json.load(f)
        assert "operation sequence" in info and "request" in info
        assert len(info["operation sequence"]) >= 1
