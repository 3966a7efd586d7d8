"""Record the canned JdeRobot-format HAL trace shipped in data/jderobot/.

The trace is recorded through the same duck-typed ``HAL`` surface the live
JdeRobot bridge uses (SimHAL over SimWorld), so every byte flows through the
reference's native laser-data shape (values/minRange/maxRange/timeStamp per
robot.py:32-58 + pose3d + bumper + commanded velocities).  Deterministic:
re-running reproduces the committed file.

Usage: python scripts/make_jderobot_trace.py [--ticks 300] [--seed 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--seed", type=int, default=3)
    # start pose + sensor noise vary the drive through the fixed room —
    # the second shipped trace (start_seed7_300.jsonl) uses the eval
    # suite's seed-7 start (0, -0.3, 0.4) so the native-format claim does
    # not rest on a single trajectory
    ap.add_argument("--x", type=float, default=0.0)
    ap.add_argument("--y", type=float, default=0.0)
    ap.add_argument("--yaw", type=float, default=0.0)
    ap.add_argument("--range-noise", type=float, default=0.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "data", "jderobot",
        "corridor_seed3_300.jsonl"))
    args = ap.parse_args()

    from fastslam_tpu.drivers.jderobot_hal import SimHAL
    from fastslam_tpu.drivers.sim_world import SimWorld
    from fastslam_tpu.io.jderobot_trace import load_hal_trace, record_hal_trace

    world = SimWorld(seed=args.seed, x=args.x, y=args.y, yaw=args.yaw,
                     range_noise_std=args.range_noise)
    n = record_hal_trace(args.out, SimHAL(world), args.ticks)
    log = load_hal_trace(args.out)  # round-trip sanity
    print(f"wrote {args.out}: {n} ticks, {log.scans.shape[1]} beams, "
          f"range [{log.min_range}, {log.max_range}]")


if __name__ == "__main__":
    main()
