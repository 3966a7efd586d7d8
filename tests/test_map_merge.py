"""Multi-session map merge: alignment recovery + fusion semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastslam_tpu.backend.map_merge import (
    align_landmark_maps,
    merge_landmark_maps,
    merge_sessions,
    transform_points,
    transform_poses,
)


def se2(theta, tx, ty):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]]), np.array([tx, ty])


def make_maps(seed=0, n_shared=12, n_a_only=4, n_b_only=3,
              theta=0.3, tx=0.8, ty=-0.5, noise=0.02, cap=32):
    """Session A and B observe a shared set of corners; B's map is expressed
    in a frame offset by a known SE(2) transform."""
    rng = np.random.default_rng(seed)
    shared = rng.uniform(-6, 6, (n_shared, 2))
    a_only = rng.uniform(-6, 6, (n_a_only, 2))
    b_only = rng.uniform(-6, 6, (n_b_only, 2))

    rot, trans = se2(theta, tx, ty)
    # B sees shared+b_only, but in B's own (offset) frame: x_b = R^-1 (x_w - t)
    b_world = np.concatenate([shared + rng.normal(0, noise, shared.shape),
                              b_only])
    b_frame = (b_world - trans) @ rot  # R^-1 = R^T applied on the right

    lm_a = np.zeros((cap, 2), np.float32)
    lm_a[: n_shared + n_a_only] = np.concatenate([shared, a_only])
    valid_a = np.zeros(cap, bool)
    valid_a[: n_shared + n_a_only] = True

    lm_b = np.zeros((cap, 2), np.float32)
    lm_b[: len(b_frame)] = b_frame
    valid_b = np.zeros(cap, bool)
    valid_b[: len(b_frame)] = True
    return (jnp.asarray(lm_a), jnp.asarray(valid_a),
            jnp.asarray(lm_b), jnp.asarray(valid_b), (rot, trans))


def test_alignment_recovers_known_transform():
    lm_a, va, lm_b, vb, (rot, trans) = make_maps(seed=1)
    al = align_landmark_maps(lm_b, vb, lm_a, va)
    np.testing.assert_allclose(np.asarray(al.rotation), rot, atol=0.02)
    np.testing.assert_allclose(np.asarray(al.translation), trans, atol=0.06)
    assert float(al.mean_residual) < 0.1
    assert int(al.num_matched) >= 12


def test_alignment_robust_to_partial_overlap():
    # many B-only landmarks must not bias the fit (gated ICP)
    lm_a, va, lm_b, vb, (rot, trans) = make_maps(
        seed=2, n_shared=10, n_a_only=8, n_b_only=8
    )
    al = align_landmark_maps(lm_b, vb, lm_a, va)
    np.testing.assert_allclose(np.asarray(al.rotation), rot, atol=0.05)
    np.testing.assert_allclose(np.asarray(al.translation), trans, atol=0.15)


def test_merge_fuses_and_appends():
    lm_a, va, lm_b, vb, (rot, trans) = make_maps(seed=3)
    b_aligned = transform_points(lm_b, jnp.asarray(rot, jnp.float32),
                                 jnp.asarray(trans, jnp.float32))
    merged = merge_landmark_maps(lm_a, va, b_aligned, vb, gate=0.4)
    # 12 shared -> fused; 3 b_only -> appended; none dropped (capacity 32)
    assert int(merged.matched_b.sum()) == 12
    assert int(merged.appended_b.sum()) == 3
    assert int(merged.dropped_b.sum()) == 0
    assert int(merged.valid.sum()) == 12 + 4 + 3
    # every B-only landmark present in the merged map
    mm = np.asarray(merged.landmarks)[np.asarray(merged.valid)]
    for w in np.asarray(b_aligned)[np.asarray(vb & ~merged.matched_b)]:
        assert np.linalg.norm(mm - w, axis=1).min() < 1e-5


def test_merge_respects_capacity():
    lm_a, va, lm_b, vb, (rot, trans) = make_maps(seed=4, cap=18)
    b_aligned = transform_points(lm_b, jnp.asarray(rot, jnp.float32),
                                 jnp.asarray(trans, jnp.float32))
    merged = merge_landmark_maps(lm_a, va, b_aligned, vb, gate=0.4)
    # 16 A landmarks + 3 appends > 18 slots -> 1 dropped
    assert int(merged.valid.sum()) == 18
    assert int(merged.dropped_b.sum()) == 1


def test_merge_sessions_end_to_end():
    lm_a, va, lm_b, vb, (rot, trans) = make_maps(seed=5)
    poses_b = jnp.asarray(
        np.array([[0.0, 0.0, 0.0], [1.0, 0.5, 0.4]], np.float32)
    )
    al, merged, poses_out = merge_sessions(lm_a, va, lm_b, vb, poses_b)
    assert int(merged.valid.sum()) == 19
    # trajectory carried into A's frame by the recovered transform
    want = transform_poses(poses_b, jnp.asarray(rot, jnp.float32),
                           jnp.asarray(trans, jnp.float32))
    np.testing.assert_allclose(np.asarray(poses_out), np.asarray(want),
                               atol=0.12)


def test_repeated_merge_converges_with_weight():
    """Merging the same (noisy) session twice with weight_a growing must not
    drift the fused landmarks."""
    lm_a, va, lm_b, vb, (rot, trans) = make_maps(seed=6, noise=0.05)
    b_aligned = transform_points(lm_b, jnp.asarray(rot, jnp.float32),
                                 jnp.asarray(trans, jnp.float32))
    m1 = merge_landmark_maps(lm_a, va, b_aligned, vb, gate=0.4, weight_a=1.0)
    m2 = merge_landmark_maps(m1.landmarks, m1.valid, b_aligned, vb,
                             gate=0.4, weight_a=2.0)
    d = np.linalg.norm(
        np.asarray(m2.landmarks) - np.asarray(m1.landmarks), axis=1
    )
    assert d[np.asarray(m1.valid)].max() < 0.05


def test_jit_compatible():
    import jax

    lm_a, va, lm_b, vb, _ = make_maps(seed=7)
    f = jax.jit(lambda a, av, b, bv: merge_sessions(a, av, b, bv)[1].landmarks)
    out = f(lm_a, va, lm_b, vb)
    assert np.isfinite(np.asarray(out)).all()


def test_joint_refinement_corrects_per_session_drift():
    """A rigid SE(2) alignment cannot fix drift INSIDE a session; the joint
    pose graph (both trajectories as keyframes, shared landmarks as
    cross-session loop closures, no odometry factor across the boundary)
    must bend both trajectories toward ground truth."""
    from fastslam_tpu.backend.map_merge import refine_merged_sessions
    from tests.test_backend import simulate_world

    # two sessions over the SAME world (same landmarks — the whole point of a
    # merge), independent per-session drifts, common frame
    noisy_a, obs_a, gt, _ = simulate_world(k=14, drift=0.8, seed=31)
    rng = np.random.default_rng(99)
    noisy_b = gt + rng.normal(0, 0.8 / 14, (14, 3)).cumsum(axis=0)
    noisy_b[0] = gt[0]
    obs_b = obs_a  # same ground-truth traversal of the same landmarks

    err_in_a = np.linalg.norm(noisy_a[:, :2] - gt[:, :2], axis=1).mean()
    err_in_b = np.linalg.norm(noisy_b[:, :2] - gt[:, :2], axis=1).mean()

    ref_a, ref_b, info = refine_merged_sessions(
        noisy_a, obs_a, noisy_b, obs_b,
        max_landmarks=32, max_factors=1024, association_gate=0.6,
    )
    err_a = np.linalg.norm(ref_a[:, :2] - gt[:, :2], axis=1).mean()
    err_b = np.linalg.norm(ref_b[:, :2] - gt[:, :2], axis=1).mean()

    assert err_a < err_in_a * 0.5, (err_in_a, err_a)
    assert err_b < err_in_b * 0.5, (err_in_b, err_b)
    assert np.isfinite(info["final_error"])
    assert info["num_factors"] > 0


def test_session_boundary_invalidates_cross_session_odometry():
    from fastslam_tpu.backend.builder import build_pose_graph
    from tests.test_backend import simulate_world

    noisy, obs, _, _ = simulate_world(k=10, drift=0.2, seed=5)
    kf = np.concatenate([noisy[:6], noisy[6:]])
    g = build_pose_graph(kf, obs, session_boundaries=(6,),
                         max_landmarks=16, max_factors=256)
    ov = np.asarray(g.odo_valid)
    assert not ov[5]                      # the boundary factor is off
    assert ov.sum() == len(kf) - 2        # every other factor kept
