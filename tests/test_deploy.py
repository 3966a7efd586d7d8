"""CI-fashion smoke of the deployment pipeline: the exact record -> run
commands deploy/launch.sh (and the Dockerfile CMD) execute, through the
module CLI in subprocesses.  Reference counterpart: startup.sh:17-24 (which
was never testable outside its Docker/simulator stack)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    out = subprocess.run(
        [sys.executable, "-m", "fastslam_tpu", *args],
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_launch_pipeline(tmp_path):
    log = str(tmp_path / "log.npz")
    rec = run_cli("record", "--ticks", "200", "--seed", "3",
                  "--out", log, "--cpu")
    blob = json.loads(rec.strip().splitlines()[-1])
    assert blob["ticks"] == 200 and os.path.exists(log)

    res = run_cli("run", "--log", log, "--particles", "256",
                  "--production", "--cpu")
    metrics = json.loads(res.strip().splitlines()[-1])
    # 200 ticks is mostly warmup; the pipeline must produce finite,
    # sane-magnitude metrics end-to-end
    assert 0.0 <= metrics["ate_rmse_m"] < 1.0
    assert 0.0 <= metrics["mean_angular_error_rad"] < 0.5


def test_launch_script_exists_and_is_executable():
    path = os.path.join(REPO, "deploy", "launch.sh")
    assert os.path.exists(path)
    assert os.access(path, os.X_OK)
    # the Dockerfile CMD runs this script; both must stay in the tree
    assert os.path.exists(os.path.join(REPO, "Dockerfile"))
