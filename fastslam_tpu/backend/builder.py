"""Pose-graph construction from a SLAM run.

Bridges the filter front-end to the backend: keyframes are subsampled ticks,
odometry factors come from the relative motion between consecutive keyframe
pose estimates, and observation factors are the tick's (range, bearing)
corner measurements.  Landmark identities are established by greedy world-
frame clustering of the projected observations (nearest existing landmark
within a gate, else a new landmark) — the batch analog of the filter's
per-particle association (``landmark_utils.py:92-117``).

Host-side NumPy: graph construction is a one-off per optimization window,
not a hot path; the optimizer itself (backend.pose_graph) is jitted.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from fastslam_tpu.backend.pose_graph import PoseGraph


def _greedy_associate(
    kf: np.ndarray,
    obs_kf: np.ndarray,
    obs_rb: np.ndarray,
    association_gate: float,
    max_landmarks: int,
):
    """World-project each observation from its keyframe pose and greedily
    cluster: nearest existing landmark within the gate, else a new landmark.
    Returns (landmarks list, obs_lm [F] int, keep [F] bool)."""
    landmarks: List[np.ndarray] = []
    obs_lm = np.zeros(len(obs_kf), np.int32)
    keep = np.zeros(len(obs_kf), bool)
    for i, (k_idx, (dist, bearing)) in enumerate(zip(obs_kf, obs_rb)):
        wx = kf[k_idx, 0] + dist * np.cos(kf[k_idx, 2] + bearing)
        wy = kf[k_idx, 1] + dist * np.sin(kf[k_idx, 2] + bearing)
        w = np.array([wx, wy])
        j_best, d_best = -1, association_gate
        for j, lm in enumerate(landmarks):
            d = float(np.linalg.norm(lm - w))
            if d < d_best:
                j_best, d_best = j, d
        if j_best < 0:
            if len(landmarks) >= max_landmarks:
                continue
            j_best = len(landmarks)
            landmarks.append(w.copy())
        else:
            # running average refines the initial estimate
            landmarks[j_best] = 0.5 * (landmarks[j_best] + w)
        obs_lm[i] = j_best
        keep[i] = True
    return landmarks, obs_lm, keep


def _associate_by_ids(
    kf: np.ndarray,
    obs_kf: np.ndarray,
    obs_rb: np.ndarray,
    track_ids: np.ndarray,
    max_landmarks: int,
):
    """Landmark identity from persistent tracker ids: one graph landmark per
    distinct id (first-seen order), initialized at the mean of that id's
    world-projected observations.  Same return shape as _greedy_associate."""
    landmarks: List[np.ndarray] = []
    counts: List[int] = []
    id_to_lm: dict = {}
    obs_lm = np.zeros(len(obs_kf), np.int32)
    keep = np.zeros(len(obs_kf), bool)
    for i, (k_idx, (dist, bearing), tid) in enumerate(
        zip(obs_kf, obs_rb, track_ids)
    ):
        if tid < 0:
            continue
        wx = kf[k_idx, 0] + dist * np.cos(kf[k_idx, 2] + bearing)
        wy = kf[k_idx, 1] + dist * np.sin(kf[k_idx, 2] + bearing)
        w = np.array([wx, wy])
        j = id_to_lm.get(int(tid), -1)
        if j < 0:
            if len(landmarks) >= max_landmarks:
                continue
            j = len(landmarks)
            id_to_lm[int(tid)] = j
            landmarks.append(w.copy())
            counts.append(1)
        else:
            counts[j] += 1
            landmarks[j] += (w - landmarks[j]) / counts[j]  # running mean
        obs_lm[i] = j
        keep[i] = True
    return landmarks, obs_lm, keep


def reinit_landmarks(
    graph: PoseGraph,
    optimized_poses: np.ndarray,
) -> PoseGraph:
    """Identity-preserving landmark re-initialization from optimized poses.

    The tracking-mode analog of :func:`reassociate_pose_graph`: landmark
    *identities* (``obs_lm``) are already right — they came from the
    persistent corner tracker — but the landmark *positions* were initialized
    by world-projecting observations from the drifted input trajectory, which
    under heavy drift leaves the optimizer in a local minimum.  Re-projecting
    every factor from the optimized poses and re-averaging per landmark gives
    the next round a consistent initialization.  Odometry factors, the prior,
    and all factor payloads are unchanged.
    """
    import jax.numpy as jnp

    kf = np.asarray(optimized_poses, np.float64)
    valid = np.asarray(graph.obs_valid)
    obs_kf = np.asarray(graph.obs_kf)
    obs_lm = np.asarray(graph.obs_lm)
    obs_rb = np.asarray(graph.obs_rb, np.float64)
    max_landmarks = graph.landmarks.shape[0]

    sums = np.zeros((max_landmarks, 2))
    counts = np.zeros(max_landmarks)
    for i in np.flatnonzero(valid):
        k_idx, j = obs_kf[i], obs_lm[i]
        dist, bearing = obs_rb[i]
        sums[j, 0] += kf[k_idx, 0] + dist * np.cos(kf[k_idx, 2] + bearing)
        sums[j, 1] += kf[k_idx, 1] + dist * np.sin(kf[k_idx, 2] + bearing)
        counts[j] += 1

    lm_arr = np.asarray(graph.landmarks, np.float64).copy()
    seen = counts > 0
    lm_arr[seen] = sums[seen] / counts[seen, None]

    return graph._replace(
        poses=jnp.asarray(kf.astype(np.float32)),
        landmarks=jnp.asarray(lm_arr.astype(np.float32)),
    )


def reassociate_pose_graph(
    graph: PoseGraph,
    optimized_poses: np.ndarray,
    *,
    association_gate: float = 0.8,
) -> PoseGraph:
    """Joint re-association: redo landmark data association from OPTIMIZED
    keyframe poses.

    The initial greedy association runs at the drifted input poses, so under
    heavy drift one physical corner splits into several graph landmarks and
    the optimizer cannot close the loop across them.  After a Gauss-Newton
    round the poses are better; re-projecting every observation factor from
    the optimized poses and re-clustering merges those duplicates, giving the
    next optimization round the loop-closure constraints the first one was
    missing.  Odometry factors, the prior, and the factor (keyframe, range,
    bearing) payloads are unchanged — only landmark identities move.
    """
    import jax.numpy as jnp

    kf = np.asarray(optimized_poses, np.float64)
    valid = np.asarray(graph.obs_valid)
    obs_kf = np.asarray(graph.obs_kf)
    obs_rb = np.asarray(graph.obs_rb, np.float64)
    max_landmarks = graph.landmarks.shape[0]

    idx = np.flatnonzero(valid)
    landmarks, lm_ids, keep = _greedy_associate(
        kf, obs_kf[idx], obs_rb[idx], association_gate, max_landmarks
    )

    obs_lm_arr = np.asarray(graph.obs_lm).copy()
    obs_valid_arr = valid.copy()
    obs_lm_arr[idx] = lm_ids
    obs_valid_arr[idx] = keep

    lm_arr = np.zeros((max_landmarks, 2), np.float32)
    for j, lm in enumerate(landmarks):
        lm_arr[j] = lm
    lm_valid = np.zeros(max_landmarks, bool)
    lm_valid[: len(landmarks)] = True

    return graph._replace(
        poses=jnp.asarray(kf.astype(np.float32)),
        landmarks=jnp.asarray(lm_arr),
        lm_valid=jnp.asarray(lm_valid),
        obs_lm=jnp.asarray(obs_lm_arr),
        obs_valid=jnp.asarray(obs_valid_arr),
    )


def build_pose_graph(
    keyframe_poses: np.ndarray,
    measurements: Sequence[np.ndarray],
    *,
    measurement_ids: Sequence[np.ndarray] | None = None,
    session_boundaries: Sequence[int] = (),
    association_gate: float = 0.8,
    max_landmarks: int = 256,
    max_factors: int = 4096,
    odo_sigma_xy: float = 0.05,
    odo_sigma_theta: float = 0.02,
    obs_sigma_r: float = 0.1,
    obs_sigma_b: float = 0.05,
    prior_sigma: float = 1e-3,
) -> PoseGraph:
    """Assemble a masked fixed-capacity PoseGraph.

    Args:
      keyframe_poses: ``[K, 3]`` initial pose estimates (e.g. filter output).
      measurements: length-K list of ``[m_k, 2]`` (range, bearing) arrays.
      measurement_ids: optional length-K list of ``[m_k]`` persistent corner
        track ids (``frontend/tracking.py``).  When given, landmark identity
        comes from the tracker — two observations share a graph landmark iff
        they share a track id — instead of greedy world-frame clustering,
        which makes loop closures immune to accumulated drift (the tracker
        established identity frame-to-frame when drift was still tiny).
      session_boundaries: keyframe indices where a NEW session starts (for
        multi-session joint refinement): the odometry factor spanning each
        boundary is invalidated, so independent trajectories are linked only
        through shared landmarks, never by a bogus inter-session "motion".
    """
    import jax.numpy as jnp

    kf = np.asarray(keyframe_poses, np.float64)
    k = kf.shape[0]

    # odometry factors from consecutive keyframe estimates
    odo_rel = np.zeros((k - 1, 3))
    for i in range(k - 1):
        a, b = kf[i], kf[i + 1]
        c, s = np.cos(a[2]), np.sin(a[2])
        dx, dy = b[0] - a[0], b[1] - a[1]
        odo_rel[i] = [
            c * dx + s * dy,
            -s * dx + c * dy,
            (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi,
        ]
    odo_valid = np.ones(k - 1, bool)
    for b in session_boundaries:
        if 0 < b <= k - 1:
            odo_valid[b - 1] = False
    odo_info = np.tile(
        [1.0 / odo_sigma_xy ** 2, 1.0 / odo_sigma_xy ** 2, 1.0 / odo_sigma_theta ** 2],
        (k - 1, 1),
    )

    # landmark association: tracker identity when given, else world-frame
    # greedy clustering
    all_kf, all_rb, all_tid = [], [], []
    for i in range(k):
        ms = np.asarray(measurements[i], np.float64).reshape(-1, 2)
        tids = (np.asarray(measurement_ids[i], np.int64).reshape(-1)
                if measurement_ids is not None else np.full(len(ms), -1))
        for (dist, bearing), tid in zip(ms, tids):
            all_kf.append(i)
            all_rb.append([dist, bearing])
            all_tid.append(tid)
    all_kf = np.asarray(all_kf, np.int32).reshape(-1)
    all_rb = np.asarray(all_rb, np.float64).reshape(-1, 2)

    if measurement_ids is not None:
        landmarks, lm_ids, kept = _associate_by_ids(
            kf, all_kf, all_rb, np.asarray(all_tid, np.int64), max_landmarks
        )
    else:
        landmarks, lm_ids, kept = _greedy_associate(
            kf, all_kf, all_rb, association_gate, max_landmarks
        )
    obs_kf = all_kf[kept].tolist()
    obs_lm = lm_ids[kept].tolist()
    obs_rb = all_rb[kept].tolist()

    f = min(len(obs_kf), max_factors)
    l = max_landmarks

    lm_arr = np.zeros((l, 2))
    for j, lm in enumerate(landmarks):
        lm_arr[j] = lm
    lm_valid = np.zeros(l, bool)
    lm_valid[: len(landmarks)] = True

    obs_kf_arr = np.zeros(max_factors, np.int32)
    obs_lm_arr = np.zeros(max_factors, np.int32)
    obs_rb_arr = np.zeros((max_factors, 2))
    obs_valid = np.zeros(max_factors, bool)
    if f > 0:
        obs_kf_arr[:f] = obs_kf[:f]
        obs_lm_arr[:f] = obs_lm[:f]
        obs_rb_arr[:f] = np.asarray(obs_rb[:f]).reshape(f, 2)
        obs_valid[:f] = True
    obs_info = np.tile([1.0 / obs_sigma_r ** 2, 1.0 / obs_sigma_b ** 2],
                       (max_factors, 1))

    as32 = lambda x: jnp.asarray(np.asarray(x, np.float32))
    return PoseGraph(
        poses=as32(kf),
        landmarks=as32(lm_arr),
        lm_valid=jnp.asarray(lm_valid),
        odo_rel=as32(odo_rel),
        odo_info=as32(odo_info),
        odo_valid=jnp.asarray(odo_valid),
        obs_kf=jnp.asarray(obs_kf_arr),
        obs_lm=jnp.asarray(obs_lm_arr),
        obs_rb=as32(obs_rb_arr),
        obs_info=as32(obs_info),
        obs_valid=jnp.asarray(obs_valid),
        prior_info=as32(np.full(3, 1.0 / prior_sigma ** 2)),
    )
