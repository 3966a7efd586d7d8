"""JdeRobot HAL trace format — record, load, and replay the reference's
native laser-data shape.

The reference consumes sensors exclusively through the JdeRobot ``HAL``
surface (``/root/reference/fast_slam_2/models/robot.py:38-58``):
``HAL.getLaserData()`` -> ``.values`` (180 ranges), ``.minRange``,
``.maxRange``, ``.timeStamp``; ``HAL.getPose3d()`` -> ``.x/.y/.yaw``;
``HAL.getBumperData()`` -> ``.state/.bumper``.  JdeRobot defines no on-disk
trace — the reference can only run against the live Gazebo simulator.  This
module defines one: a JSONL file of per-tick HAL records, so

* a trace can be RECORDED from any live ``HAL`` (via
  :class:`~fastslam_tpu.drivers.jderobot_hal.HALDriver`'s duck-typed hal, or
  the real simulator) with :func:`record_hal_trace`;
* a recorded trace REPLAYS through the engine offline with
  :func:`load_hal_trace` -> :class:`~fastslam_tpu.drivers.replay.LaserLog`
  (the replay/eval harness's native input), reproducing the reference's
  exact scan conversion and odometry semantics:

  - beam ``i`` points at ``radians(i - 90)`` (robot.py:51);
  - beams outside ``[minRange, maxRange]`` are gated out (robot.py:48);
  - ``dt`` comes from consecutive laser ``timeStamp`` differences
    (robot.py:131-138) and odometry is ``rotation = w*dt`` XOR
    ``translation = v*dt*0.6`` (robot.py:141-149, the 0.6 sim velocity
    fudge) — the loader stores the raw ``(v, w, dt)`` stream and the
    replay driver applies the same rule the live loop does.

Trace schema (one JSON object per line)::

    {"laserData": {"values": [...], "minRange": 0.06, "maxRange": 10.0,
                   "timeStamp": 12.345},
     "pose3d": {"x": 0.0, "y": 0.0, "yaw": 0.0},
     "bumper": {"state": 0, "bumper": 0},
     "cmd": {"v": 0.3, "w": 0.5}}

``pose3d`` is the simulator ground truth the reference's
``EvaluationUtils`` reads (evaluation_utils.py:32-34) — used here for ATE
only, never by the filter.  ``cmd`` is the commanded velocity the loop sent
that tick (jde_robots_main.py:25), the input to command odometry.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from fastslam_tpu.drivers.replay import LaserLog


def record_hal_trace(
    path: str,
    hal,
    num_ticks: int,
    *,
    v_cmd: float = 0.3,
    w_cmd: float = 0.5,
    drive: bool = True,
) -> int:
    """Drive a ``HAL`` (live simulator or fake) with the reference's control
    policy and append one JSONL record per tick.  Returns ticks written.

    ``drive=True`` runs the reference's bumper-reactive move (robot.py:61-88
    via the duck-typed ``hal``): reverse-and-turn on bumper hit, else the
    constant ``(v_cmd, w_cmd)`` of jde_robots_main.py:25.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = 0
    with open(path, "w") as f:
        for _ in range(num_ticks):
            laser = hal.getLaserData()
            pose = hal.getPose3d()
            bumper = hal.getBumperData()
            # reference bumper policy (robot.py:61-88, same as
            # drivers.replay.record_log): stop and rotate away from the
            # pressed side until free, else drive straight
            if int(bumper.state) == 1:
                v = 0.0
                w = w_cmd if int(bumper.bumper) == 0 else -w_cmd
            else:
                v, w = v_cmd, 0.0
            if drive:
                hal.setV(float(v))
                hal.setW(float(w))
            rec = {
                "laserData": {
                    "values": np.asarray(laser.values, np.float64)
                    .round(6).tolist(),
                    "minRange": float(laser.minRange),
                    "maxRange": float(laser.maxRange),
                    "timeStamp": float(laser.timeStamp),
                },
                "pose3d": {"x": float(pose.x), "y": float(pose.y),
                           "yaw": float(pose.yaw)},
                "bumper": {"state": int(bumper.state),
                           "bumper": int(bumper.bumper)},
                "cmd": {"v": float(v), "w": float(w)},
            }
            f.write(json.dumps(rec) + "\n")
            n += 1
            if hasattr(hal, "step"):
                hal.step()  # fake HALs advance explicitly; live ones free-run
    return n


def load_hal_trace(path: str, *, num_beams: Optional[int] = None) -> LaserLog:
    """Parse a JdeRobot HAL JSONL trace into a :class:`LaserLog`.

    The result replays through :class:`ReplayDriver`/``run_driver`` exactly
    like a recorded SimWorld log: scans keep the raw HAL ranges (the replay
    path re-applies the min/max gating and the ``radians(i - 90)`` beam
    geometry of robot.py:42-58), ``cmd_v``/``cmd_w`` carry the commanded
    velocities, and ``timestamps`` carry the laser ``timeStamp`` stream the
    reference differentiates for dt (robot.py:131-138).
    """
    values_rows = []
    stamps = []
    cmd_v = []
    cmd_w = []
    b_state = []
    b_id = []
    gt = []
    min_range = max_range = None
    with open(path) as f:
        for line_no, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError as e:
                raise ValueError(
                    f"{path}:{line_no + 1}: not a JSON record: {e}"
                ) from e
            laser = rec["laserData"]
            row = np.asarray(laser["values"], np.float32)
            if num_beams is not None and row.shape[0] != num_beams:
                out = np.full(num_beams, float(laser["maxRange"]) + 1.0,
                              np.float32)
                out[: min(row.shape[0], num_beams)] = row[:num_beams]
                row = out
            values_rows.append(row)
            if min_range is None:
                min_range = float(laser["minRange"])
                max_range = float(laser["maxRange"])
            stamps.append(float(laser["timeStamp"]))
            cmd = rec.get("cmd", {})
            cmd_v.append(float(cmd.get("v", 0.0)))
            cmd_w.append(float(cmd.get("w", 0.0)))
            bumper = rec.get("bumper", {})
            b_state.append(int(bumper.get("state", 0)))
            b_id.append(int(bumper.get("bumper", 0)))
            pose = rec.get("pose3d", {})
            gt.append([float(pose.get("x", 0.0)), float(pose.get("y", 0.0)),
                       float(pose.get("yaw", 0.0))])
    if not values_rows:
        raise ValueError(f"{path}: empty trace")
    widths = {r.shape[0] for r in values_rows}
    if len(widths) != 1:
        raise ValueError(
            f"{path}: inconsistent beam counts {sorted(widths)}; pass "
            "num_beams= to pad/truncate"
        )
    return LaserLog(
        scans=np.stack(values_rows),
        min_range=min_range,
        max_range=max_range,
        timestamps=np.asarray(stamps, np.float64),
        cmd_v=np.asarray(cmd_v, np.float32),
        cmd_w=np.asarray(cmd_w, np.float32),
        bumper_state=np.asarray(b_state, np.int32),
        bumper_id=np.asarray(b_id, np.int32),
        gt_poses=np.asarray(gt, np.float64),
    )
