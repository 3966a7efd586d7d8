"""Pose-graph backend: the optimizer must pull a drifted trajectory back
onto ground truth given loop-closure-style landmark re-observations."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastslam_tpu.backend.builder import build_pose_graph
from fastslam_tpu.backend.pose_graph import (
    PoseGraph,
    gauss_newton_step,
    optimize,
    total_error,
)


def simulate_world(k=12, n_landmarks=6, seed=0, drift=0.15):
    """Ground-truth square-ish loop + landmarks; returns noisy initial poses,
    per-keyframe (range, bearing) observations, and ground truth."""
    rng = np.random.default_rng(seed)
    # ground-truth trajectory: a loop
    t = np.linspace(0, 2 * np.pi, k, endpoint=False)
    gt = np.stack([2 * np.cos(t), 2 * np.sin(t), t + np.pi / 2], axis=-1)
    gt_lms = rng.uniform(-4, 4, (n_landmarks, 2))

    obs = []
    for i in range(k):
        dx = gt_lms[:, 0] - gt[i, 0]
        dy = gt_lms[:, 1] - gt[i, 1]
        r = np.hypot(dx, dy)
        b = np.arctan2(dy, dx) - gt[i, 2]
        b = (b + np.pi) % (2 * np.pi) - np.pi
        keep = r < 5.0
        obs.append(np.stack([r[keep], b[keep]], axis=-1))

    # drifted initial guess: accumulated noise, growing along the trajectory
    noise = rng.normal(0, drift / k, (k, 3)).cumsum(axis=0)
    noisy = gt + noise
    noisy[0] = gt[0]  # anchored
    return noisy, obs, gt, gt_lms


def test_total_error_zero_at_ground_truth():
    noisy, obs, gt, _ = simulate_world(drift=0.0)
    g = build_pose_graph(gt, obs, max_landmarks=16, max_factors=256)
    err = float(total_error(g.poses, g.landmarks, g))
    # landmark init from (averaged) exact observations -> tiny residuals
    assert err < 1e-3


def test_gauss_newton_reduces_error():
    noisy, obs, gt, _ = simulate_world(drift=0.4, seed=1)
    g = build_pose_graph(noisy, obs, max_landmarks=16, max_factors=256)
    e0 = float(total_error(g.poses, g.landmarks, g))
    p1, l1 = gauss_newton_step(g.poses, g.landmarks, g, jnp.float32(1e-4))
    e1 = float(total_error(p1, l1, g))
    assert e1 < e0 * 0.5, f"{e0} -> {e1}"


def test_optimize_recovers_trajectory():
    noisy, obs, gt, _ = simulate_world(k=16, drift=0.5, seed=2)
    g = build_pose_graph(noisy, obs, max_landmarks=16, max_factors=512)

    before = np.linalg.norm(noisy[:, :2] - gt[:, :2], axis=1).mean()
    poses, landmarks, err, hist = optimize(g, num_iters=15)
    poses = np.asarray(poses)
    after = np.linalg.norm(poses[:, :2] - gt[:, :2], axis=1).mean()

    assert np.isfinite(err)
    assert after < before * 0.6, f"mean pos err {before:.4f} -> {after:.4f}"
    # error history monotonically non-increasing (LM accept/reject)
    h = np.asarray(hist)
    assert (np.diff(h) <= 1e-6).all()


def test_optimize_is_jittable():
    import jax

    noisy, obs, gt, _ = simulate_world(k=8, drift=0.2, seed=3)
    g = build_pose_graph(noisy, obs, max_landmarks=16, max_factors=128)
    jitted = jax.jit(lambda graph: optimize(graph, num_iters=5))
    poses, landmarks, err, _ = jitted(g)
    assert np.isfinite(np.asarray(poses)).all()
    assert np.isfinite(float(err))


def test_invalid_factors_are_inert():
    """Masked-out observations must not influence the solution."""
    noisy, obs, gt, _ = simulate_world(k=8, drift=0.2, seed=4)
    g = build_pose_graph(noisy, obs, max_landmarks=16, max_factors=128)
    # corrupt the padding region beyond the valid factors
    n_valid = int(np.asarray(g.obs_valid).sum())
    rb = np.array(g.obs_rb)  # writable copy
    rb[n_valid:] = 1e3
    g2 = g._replace(obs_rb=jnp.asarray(rb))
    e1 = float(total_error(g.poses, g.landmarks, g))
    e2 = float(total_error(g2.poses, g2.landmarks, g2))
    assert e1 == pytest.approx(e2)
    p1, l1 = gauss_newton_step(g.poses, g.landmarks, g, jnp.float32(1e-4))
    p2, l2 = gauss_newton_step(g2.poses, g2.landmarks, g2, jnp.float32(1e-4))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
