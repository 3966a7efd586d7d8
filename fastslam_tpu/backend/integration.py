"""Filter -> backend integration: pose-graph smoothing of a SLAM run.

Takes a replay log plus the filter's estimated trajectory, subsamples
keyframes, re-extracts corner measurements at each keyframe with the jitted
front-end, builds the pose graph, and optimizes.  This is the trajectory
refinement stage the reference never had: the filter's argmax-particle
estimate drifts; the smoother pulls it back onto the loop closures.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fastslam_tpu.backend.builder import (
    build_pose_graph,
    reassociate_pose_graph,
    reinit_landmarks,
)
from fastslam_tpu.backend.pose_graph import optimize
from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.drivers.base import LaserScan
from fastslam_tpu.drivers.replay import LaserLog
from fastslam_tpu.frontend.pipeline import scan_to_measurements


def extract_keyframe_measurements(
    log: LaserLog, keyframe_ticks: np.ndarray, config: FastSLAMConfig
):
    """Run the front-end on each keyframe's scan; returns a list of
    [m_k, 2] (range, bearing) arrays."""
    frontend = jax.jit(lambda p, v: scan_to_measurements(p, v, config))
    out = []
    for t in keyframe_ticks:
        scan = LaserScan(
            values=log.scans[t], min_range=log.min_range,
            max_range=log.max_range, timestamp=float(log.timestamps[t]),
        )
        pts, valid = scan.to_points()
        ms = frontend(jnp.asarray(pts), jnp.asarray(valid))
        mask = np.asarray(ms.valid)
        out.append(np.asarray(ms.range_bearing)[mask])
    return out


def extract_tracked_keyframe_measurements(
    log: LaserLog, keyframe_ticks: np.ndarray, config: FastSLAMConfig
):
    """Run the corner identity tracker over EVERY tick of the log and emit
    (measurements, track_ids) at the keyframes.

    The tracker establishes corner identity frame-to-frame, when inter-frame
    drift is tiny — so the ids are valid loop-closure identities even where
    the trajectory estimate has drifted far beyond any world-frame
    association gate.  Odometry for ego-compensation is reconstructed from
    the log's commanded velocities exactly as the runner does (previous
    commands paired with the current laser dt, rotation XOR translation,
    velocity fudge).
    """
    from fastslam_tpu.frontend.pipeline import extract_corners
    from fastslam_tpu.frontend.tracking import (
        init_tracks, stable_corners, update_tracks,
    )

    frontend = jax.jit(lambda p, v: extract_corners(p, v, config))
    upd = jax.jit(lambda tr, c, cv, r, t: update_tracks(
        tr, c, cv, r, t, gate=config.track_gate, ema=config.track_ema,
        max_misses=config.track_max_misses,
    ))
    stab = jax.jit(lambda tr: stable_corners(
        tr, min_hits=config.track_min_hits
    ))

    tracks = init_tracks(config.track_capacity)
    kf_set = set(int(t) for t in keyframe_ticks)
    out_ms, out_ids = {}, {}
    prev_ts = None
    prev_cmd = (0.0, 0.0)
    for t in range(len(log)):
        scan = LaserScan(
            values=log.scans[t], min_range=log.min_range,
            max_range=log.max_range, timestamp=float(log.timestamps[t]),
        )
        pts, valid = scan.to_points()
        v, w = prev_cmd
        prev_cmd = (float(log.cmd_v[t]), float(log.cmd_w[t]))
        dt = 0.0 if prev_ts is None else scan.timestamp - prev_ts
        prev_ts = scan.timestamp
        if v != 0.0:
            rot, trans = 0.0, v * dt * config.velocity_fudge
        else:
            rot, trans = w * dt, 0.0

        corners, cvalid = frontend(jnp.asarray(pts), jnp.asarray(valid))
        tracks = upd(tracks, corners, cvalid, jnp.float32(rot),
                     jnp.float32(trans))
        if t in kf_set:
            pos, ids, ok = stab(tracks)
            mask = np.asarray(ok)
            p = np.asarray(pos)[mask]
            rb = np.stack(
                [np.hypot(p[:, 0], p[:, 1]), np.arctan2(p[:, 1], p[:, 0])],
                axis=-1,
            ) if len(p) else np.zeros((0, 2))
            out_ms[t] = rb
            out_ids[t] = np.asarray(ids)[mask]
    return ([out_ms[int(t)] for t in keyframe_ticks],
            [out_ids[int(t)] for t in keyframe_ticks])


def smooth_trajectory(
    log: LaserLog,
    est_poses: np.ndarray,
    config: FastSLAMConfig,
    *,
    keyframe_stride: int = 10,
    num_iters: int = 15,
    max_landmarks: int = 64,
    max_factors: int = 1024,
    association_gate: float = 0.8,
    reassociate_rounds: int = 3,
    use_tracking: bool = False,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Pose-graph smoothing over keyframes of a finished run.

    Args:
      log: the replayed laser log.
      est_poses: ``[T, 3]`` filter trajectory.

    Returns (smoothed_keyframe_poses [K, 3], keyframe_ticks [K], info).
    """
    t_total = min(len(log), len(est_poses))
    ticks = np.arange(0, t_total, keyframe_stride)
    kf_poses = np.asarray(est_poses)[ticks]

    if use_tracking:
        # persistent tracker ids as landmark identities: loop closures stay
        # valid under drift beyond the world-frame association gate, so the
        # greedy clustering is unnecessary; the refinement rounds below
        # re-initialize landmark POSITIONS only (identities are settled)
        measurements, ids = extract_tracked_keyframe_measurements(
            log, ticks, config
        )
    else:
        measurements = extract_keyframe_measurements(log, ticks, config)
        ids = None
    graph = build_pose_graph(
        kf_poses, measurements, measurement_ids=ids,
        association_gate=association_gate,
        max_landmarks=max_landmarks, max_factors=max_factors,
    )
    poses, landmarks, err, hist = optimize(graph, num_iters=num_iters)

    # joint re-association: redo data association from the optimized poses
    # and re-optimize; accept a round only if the per-factor error improves
    # (factor counts can differ between graphs — landmark merges free
    # capacity).  Under heavy drift the initial association splits physical
    # corners into duplicates; this loop recovers the loop closures.
    rounds_used = 0
    per_factor = lambda e, g: float(e) / max(int(np.asarray(g.obs_valid).sum()), 1)
    for _ in range(reassociate_rounds):
        if use_tracking:
            g2 = reinit_landmarks(graph, np.asarray(poses))
        else:
            g2 = reassociate_pose_graph(
                graph, np.asarray(poses), association_gate=association_gate
            )
        p2, l2, e2, h2 = optimize(g2, num_iters=num_iters)
        if per_factor(e2, g2) < per_factor(err, graph):
            graph, poses, landmarks, err, hist = g2, p2, l2, e2, h2
            rounds_used += 1
        else:
            break

    info = {
        "final_error": float(err),
        "num_keyframes": len(ticks),
        "num_landmarks": int(np.asarray(graph.lm_valid).sum()),
        "num_factors": int(np.asarray(graph.obs_valid).sum()),
        "reassociation_rounds": rounds_used,
    }
    return np.asarray(poses), ticks, info
