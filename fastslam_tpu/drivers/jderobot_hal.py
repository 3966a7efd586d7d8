"""Live JdeRobot ``HAL`` bridge — bind the engine to the real simulator.

The reference imports a ``HAL`` module the JdeRobot Robotics Academy
injects into uploaded scripts (``fast_slam_2/models/robot.py:3``) and calls
``HAL.getLaserData()`` (``.values``/``.minRange``/``.maxRange``/
``.timeStamp``, robot.py:38-58,131), ``HAL.getBumperData()``
(``.state``/``.bumper``, robot.py:66-76), ``HAL.getPose3d()``
(``.x``/``.y``/``.yaw``, evaluation_utils.py:32-34) and
``HAL.setV/setW`` (robot.py:85-86).  This adapter exposes exactly that
surface as a :class:`~fastslam_tpu.drivers.base.Driver`, so inside the
JdeRobot web IDE the whole engine runs with three lines::

    import HAL
    from fastslam_tpu import FastSLAMConfig, run_driver, HALDriver
    run_driver(HALDriver(HAL), FastSLAMConfig(num_particles=1024,
                                              parity_mode=False))

The ``hal`` argument is duck-typed (anything with the four calls above), so
the bridge is testable without the simulator — ``tests/test_hal_bridge.py``
drives it with a fake HAL wrapped around :class:`SimWorld`.

Unlike :class:`SimWorld`/:class:`ReplayDriver`, a live simulator advances on
wall-clock: ``step()`` optionally sleeps to hold a target tick rate (the
reference loop free-runs, jde_robots_main.py:18) and never reports
exhaustion.  The run ends by ``max_ticks`` in :func:`run_driver` or by the
operator.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from fastslam_tpu.drivers.base import BumperState, LaserScan, Pose


class SimHAL:
    """A duck-typed JdeRobot ``HAL`` over :class:`SimWorld` — the same four
    calls the reference makes (``getLaserData``/``getPose3d``/
    ``getBumperData``/``setV``/``setW``), for testing the bridge and for
    recording JdeRobot-format traces (:mod:`fastslam_tpu.io.jderobot_trace`)
    without the simulator.  A live HAL's world advances on wall-clock; here
    the world steps when the ``setW`` actuation lands, keeping one sim tick
    per control tick."""

    class _Obj:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    def __init__(self, world):
        self._world = world
        self._v = 0.0

    def getLaserData(self):
        s = self._world.get_laser()
        return self._Obj(values=s.values, minRange=s.min_range,
                         maxRange=s.max_range, timeStamp=s.timestamp)

    def getPose3d(self):
        p = self._world.get_pose()
        return self._Obj(x=p.x, y=p.y, yaw=p.yaw)

    def getBumperData(self):
        b = self._world.get_bumper()
        return self._Obj(state=b.state, bumper=b.bumper)

    def setV(self, v):
        self._v = float(v)

    def setW(self, w):
        self._world.set_velocity(self._v, float(w))
        self._world.step()


class HALDriver:
    """Adapter from an injected JdeRobot ``HAL`` module to the Driver
    protocol."""

    def __init__(self, hal, *, num_beams: int = 180,
                 tick_hz: Optional[float] = None):
        """``hal``: the injected module/object; ``tick_hz``: optional rate
        limit for ``step()`` (None = free-run like the reference loop)."""
        self._hal = hal
        self._num_beams = num_beams
        self._tick_dt = None if not tick_hz else 1.0 / float(tick_hz)
        self._last_step = None

    def get_laser(self) -> LaserScan:
        data = self._hal.getLaserData()
        values = np.asarray(data.values, np.float32)
        if values.shape[0] != self._num_beams:
            # static shapes: pad with an out-of-range value / truncate
            out = np.full(self._num_beams, float(data.maxRange) + 1.0,
                          np.float32)
            n = min(values.shape[0], self._num_beams)
            out[:n] = values[:n]
            values = out
        return LaserScan(
            values=values,
            min_range=float(data.minRange),
            max_range=float(data.maxRange),
            # the reference's timestamps are seconds-valued numbers
            # (robot.py:131-138 computes dt by subtraction)
            timestamp=float(data.timeStamp),
        )

    def get_pose(self) -> Pose:
        p = self._hal.getPose3d()
        return Pose(float(p.x), float(p.y), float(p.yaw))

    def get_bumper(self) -> BumperState:
        b = self._hal.getBumperData()
        return BumperState(state=int(b.state), bumper=int(b.bumper))

    def set_velocity(self, v: float, w: float) -> None:
        self._hal.setV(float(v))
        self._hal.setW(float(w))

    def step(self) -> bool:
        """The live simulator advances itself; optionally pace the loop."""
        if self._tick_dt is not None:
            now = time.monotonic()
            if self._last_step is not None:
                remaining = self._tick_dt - (now - self._last_step)
                if remaining > 0:
                    time.sleep(remaining)
            self._last_step = time.monotonic()
        return True
