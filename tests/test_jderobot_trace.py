"""JdeRobot HAL trace format: the engine must consume the reference's native
laser-data shape (values/minRange/maxRange/timeStamp per robot.py:32-58,
pose3d per evaluation_utils.py:32-34) end-to-end — record through the HAL
surface, load, replay, and hold an ATE bound."""

import json
import os

import numpy as np
import pytest

from fastslam_tpu.app.runner import run_driver
from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.drivers.jderobot_hal import SimHAL
from fastslam_tpu.drivers.replay import ReplayDriver
from fastslam_tpu.drivers.sim_world import SimWorld
from fastslam_tpu.io.jderobot_trace import load_hal_trace, record_hal_trace

CANNED = os.path.join(os.path.dirname(__file__), "..", "data", "jderobot",
                      "corridor_seed3_300.jsonl")


def test_record_and_load_round_trip(tmp_path):
    path = str(tmp_path / "trace.jsonl")
    n = record_hal_trace(path, SimHAL(SimWorld(seed=7)), 40)
    assert n == 40
    log = load_hal_trace(path)
    assert len(log) == 40
    assert log.scans.shape == (40, 180)
    assert log.min_range == pytest.approx(0.06)
    # timestamps must be the laser timeStamp stream (reference derives dt
    # from it, robot.py:131-138): strictly increasing
    assert np.all(np.diff(log.timestamps) > 0)
    # the JSONL records carry the exact HAL field names
    with open(path) as f:
        rec = json.loads(f.readline())
    assert set(rec) == {"laserData", "pose3d", "bumper", "cmd"}
    assert set(rec["laserData"]) == {"values", "minRange", "maxRange",
                                     "timeStamp"}


def test_loader_rejects_garbage_and_ragged(tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text("not json\n")
    with pytest.raises(ValueError, match="not a JSON record"):
        load_hal_trace(str(p))

    ragged = tmp_path / "ragged.jsonl"
    rows = []
    for n in (4, 5):
        rows.append(json.dumps({
            "laserData": {"values": [1.0] * n, "minRange": 0.1,
                          "maxRange": 10.0, "timeStamp": float(n)},
        }))
    ragged.write_text("\n".join(rows) + "\n")
    with pytest.raises(ValueError, match="inconsistent beam counts"):
        load_hal_trace(str(ragged))
    # explicit num_beams pads/truncates instead
    log = load_hal_trace(str(ragged), num_beams=6)
    assert log.scans.shape == (2, 6)
    assert (log.scans[:, 5] > 10.0).all()  # padded beams are out-of-range


def test_canned_trace_replays_with_ate_bound():
    """The committed JdeRobot-format trace drives the production engine to
    the same accuracy class as the native SimWorld logs (EVAL.md)."""
    log = load_hal_trace(CANNED)
    assert len(log) == 300 and log.scans.shape[1] == 180

    cfg = FastSLAMConfig(num_particles=128, max_landmarks=32,
                         warmup_iterations=150, parity_mode=False)
    hist = run_driver(ReplayDriver(log), cfg, rng=0)
    m = hist.metrics()
    assert np.isfinite(m["ate_rmse_m"])
    assert m["ate_rmse_m"] < 0.1, m
