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


def test_reassociation_recovers_heavy_drift():
    """Under drift larger than the association gate, the initial greedy
    association splits physical landmarks into duplicates and optimization
    stalls; re-associating from the optimized poses must merge them and
    tighten the trajectory."""
    from fastslam_tpu.backend.builder import reassociate_pose_graph

    noisy, obs, gt, _ = simulate_world(k=16, drift=1.4, seed=7)
    g = build_pose_graph(noisy, obs, max_landmarks=32, max_factors=512,
                         association_gate=0.6)
    n_lm0 = int(np.asarray(g.lm_valid).sum())

    p, _, _, _ = optimize(g, num_iters=15)
    err1 = np.linalg.norm(np.asarray(p)[:, :2] - gt[:, :2], axis=1).mean()
    for _ in range(3):  # converges in 2-4 rounds
        g = reassociate_pose_graph(g, np.asarray(p), association_gate=0.6)
        p, _, _, _ = optimize(g, num_iters=15)
    n_lm2 = int(np.asarray(g.lm_valid).sum())
    err2 = np.linalg.norm(np.asarray(p)[:, :2] - gt[:, :2], axis=1).mean()

    # duplicates merged
    assert n_lm2 < n_lm0, f"{n_lm0} -> {n_lm2} landmarks"
    # trajectory markedly closer to ground truth after re-association rounds
    assert err2 < err1 * 0.7, f"mean pos err {err1:.4f} -> {err2:.4f}"


def test_reassociation_noop_when_association_clean():
    """With mild drift the first association is already right: a
    re-association pass must not make things worse."""
    from fastslam_tpu.backend.builder import reassociate_pose_graph

    noisy, obs, gt, _ = simulate_world(k=12, drift=0.2, seed=6)
    g = build_pose_graph(noisy, obs, max_landmarks=16, max_factors=256)
    p1, _, e1, _ = optimize(g, num_iters=10)
    g2 = reassociate_pose_graph(g, np.asarray(p1))
    p2, _, e2, _ = optimize(g2, num_iters=10)
    err1 = np.linalg.norm(np.asarray(p1)[:, :2] - gt[:, :2], axis=1).mean()
    err2 = np.linalg.norm(np.asarray(p2)[:, :2] - gt[:, :2], axis=1).mean()
    assert err2 < err1 * 1.2 + 1e-3


def test_id_association_beats_greedy_under_extreme_drift():
    """With drift far beyond the association gate, greedy clustering cannot
    link re-observations of the same corner, but persistent track ids can —
    the id-built graph must recover the trajectory where greedy stalls."""
    noisy, obs, gt, gt_lms = simulate_world(k=16, drift=2.5, seed=8)
    # per-keyframe ids: observation j at keyframe i IS landmark j (obs were
    # generated per gt landmark in order, with a visibility cut)
    ids = []
    for i in range(len(gt)):
        dx = gt_lms[:, 0] - gt[i, 0]
        dy = gt_lms[:, 1] - gt[i, 1]
        keep = np.hypot(dx, dy) < 5.0
        ids.append(np.flatnonzero(keep))

    from fastslam_tpu.backend.builder import reinit_landmarks

    g_greedy = build_pose_graph(noisy, obs, max_landmarks=32,
                                max_factors=512, association_gate=0.6)
    g_ids = build_pose_graph(noisy, obs, measurement_ids=ids,
                             max_landmarks=32, max_factors=512)
    p_greedy, _, _, _ = optimize(g_greedy, num_iters=20)
    p_ids, _, _, _ = optimize(g_ids, num_iters=20)
    for _ in range(3):  # identity-preserving landmark re-init rounds
        g_ids = reinit_landmarks(g_ids, np.asarray(p_ids))
        p_ids, _, _, _ = optimize(g_ids, num_iters=20)

    err_g = np.linalg.norm(np.asarray(p_greedy)[:, :2] - gt[:, :2], axis=1).mean()
    err_i = np.linalg.norm(np.asarray(p_ids)[:, :2] - gt[:, :2], axis=1).mean()
    # id graph has exactly the true landmark count; greedy splits them
    assert int(np.asarray(g_ids.lm_valid).sum()) == len(gt_lms)
    assert err_i < err_g * 0.5, f"greedy {err_g:.4f} vs ids {err_i:.4f}"
    # ~0.148 is the MAP compromise between the exact observations and the
    # (drifted) odometry factors — verified cheaper than ground truth under
    # the graph's own objective, so this is the optimum, not a local minimum
    assert err_i < 0.2, err_i


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
