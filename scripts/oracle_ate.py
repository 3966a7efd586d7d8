"""Measure the reference implementation's ATE on a replay log.

BASELINE.md: the reference publishes no numbers, so its accuracy baseline
must be *established* by replaying its exact equations (the NumPy oracle,
tests/oracle/numpy_oracle.py — a transcription of fast_slam_2.py with every
quirk) over the same logs our engine consumes.  The oracle gets the same
front-end measurements (jitted corner extractor) and the same command
odometry; its ATE is the number our parity-mode engine must match.

Prints one JSON line: oracle ATE vs engine ATE (parity + production modes).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def run_oracle(log, cfg, seed=0, odometry_noise=(0.0, 0.0),
               odometry_noise_seed=123):
    """Replay the reference equations over a log.

    ``odometry_noise`` corrupts the (rotation, translation) odometry the
    filter sees the same way app/runner.run_driver does (per-component
    gaussian, only on active ticks, default seed 123), so oracle-vs-engine
    wheel-slip comparisons run at the same slip magnitude.  (The draws land
    on different ticks because the oracle keeps the reference's
    command/laser pairing off-by-one, jde_robots_main.py:25-31.)
    """
    import jax
    import jax.numpy as jnp

    from fastslam_tpu.drivers.base import LaserScan
    from fastslam_tpu.frontend.pipeline import scan_to_measurements
    from oracle import numpy_oracle as oracle

    rng = np.random.default_rng(seed)
    odo_rng = np.random.default_rng(odometry_noise_seed)
    frontend = jax.jit(lambda p, v: scan_to_measurements(p, v, cfg))

    particles = oracle.make_particles(cfg.num_particles)
    robot = np.zeros(3)
    prev_ts = None
    est = []
    for t in range(len(log)):
        scan = LaserScan(log.scans[t], log.min_range, log.max_range,
                         float(log.timestamps[t]))
        pts, valid = scan.to_points()
        v, w = float(log.cmd_v[t]), float(log.cmd_w[t])
        ts = float(log.timestamps[t])
        dt = 0.0 if prev_ts is None else ts - prev_ts
        prev_ts = ts
        if v != 0:
            rotation, translation = 0.0, v * dt * cfg.velocity_fudge
        else:
            rotation, translation = w * dt, 0.0
        if odometry_noise != (0.0, 0.0):
            if rotation != 0.0:
                rotation += odo_rng.normal(0.0, odometry_noise[0])
            if translation != 0.0:
                translation += odo_rng.normal(0.0, odometry_noise[1])

        ms = frontend(jnp.asarray(pts), jnp.asarray(valid))
        mask = np.asarray(ms.valid)
        rb = [tuple(map(float, m)) for m in np.asarray(ms.range_bearing)[mask]]

        rot_noise = rng.normal(0, cfg.rotation_noise, cfg.num_particles)
        trans_noise = rng.normal(0, cfg.translation_noise, cfg.num_particles)
        u0 = float(rng.uniform(0, 1.0 / cfg.num_particles))
        pose = oracle.iterate(particles, rotation, translation, rb,
                              rot_noise, trans_noise, u0)

        if t < cfg.warmup_iterations:
            robot[2] = (robot[2] + rotation + np.pi) % (2 * np.pi) - np.pi
            robot[0] += translation * np.cos(robot[2])
            robot[1] += translation * np.sin(robot[2])
        else:
            robot = np.asarray(pose, float).copy()
        est.append(robot.copy())
    return np.asarray(est)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default=None, help="replay log (.npz); default: record fresh")
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--particles", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=150)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fastslam_tpu.app.runner import run_driver
    from fastslam_tpu.config import FastSLAMConfig
    from fastslam_tpu.drivers.replay import LaserLog, ReplayDriver, record_log
    from fastslam_tpu.drivers.sim_world import SimWorld
    from fastslam_tpu.eval.metrics import ate_rmse

    if args.log:
        log = LaserLog.load(args.log)
    else:
        log = record_log(SimWorld(seed=args.seed), num_ticks=args.ticks)

    cfg = FastSLAMConfig(num_particles=args.particles, max_landmarks=64,
                         warmup_iterations=args.warmup)
    # full SE(2) alignment of ground truth into the start frame
    import numpy as _np
    _p0 = log.gt_poses[0]
    _c, _s = _np.cos(-_p0[2]), _np.sin(-_p0[2])
    _d = log.gt_poses - _p0
    gt = _np.stack([_c * _d[:, 0] - _s * _d[:, 1],
                    _s * _d[:, 0] + _c * _d[:, 1],
                    _d[:, 2]], axis=-1)

    oracle_est = run_oracle(log, cfg, seed=0)
    oracle_ate = ate_rmse(gt[:, :2], oracle_est[:, :2])

    results = {"oracle_ate_m": round(oracle_ate, 4),
               "ticks": len(log), "particles": args.particles}
    for label, overrides in [
        ("engine_parity_ate_m", {}),
        ("engine_production_ate_m", {"parity_mode": False}),
    ]:
        hist = run_driver(ReplayDriver(log), cfg.replace(**overrides), rng=0)
        est = np.asarray(hist.est_poses)
        results[label] = round(ate_rmse(gt[:, :2], est[:, :2]), 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
