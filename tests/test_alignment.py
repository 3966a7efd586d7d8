"""Co-visibility consensus alignment (backend/alignment.py).

The failure mode it exists for: relative drift between temporally-distant
co-observing keyframes exceeds any fixed association gate that still keeps
distinct landmarks apart, so world-frame clustering splits exactly the
same-landmark pairs that carry loop closures (the round-3 1M demo plateaued
at a ~45% merge rate).  These tests pin, at default-suite size:

* the per-pair registration primitive (histogram mode + small-angle
  Procrustes) recovers a known rigid offset through false-pair clutter;
* consensus_align shrinks trajectory error on a drifted survey world using
  only observations (no ground truth);
* association at the corrected poses with a tight gate merges ~100% of
  same-landmark pairs where the drifted poses split them.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from bench_backend_1m import survey_world_chunked

from fastslam_tpu.backend.alignment import consensus_align, register_clouds
from fastslam_tpu.backend.builder import build_pose_graph


def test_register_clouds_recovers_rigid_offset():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.0, 60.0, (400, 2))
    t_true = np.array([1.3, -0.9])
    omega_true = 0.004
    c0 = pts.mean(axis=0)
    rel = pts - c0
    wb = (pts + t_true
          + omega_true * np.stack([-rel[:, 1], rel[:, 0]], -1)
          + rng.normal(0, 0.05, pts.shape))
    # clutter: 200 points only in b (unmatched), 200 only in a
    wa = np.concatenate([pts, rng.uniform(0.0, 60.0, (200, 2))])
    wb = np.concatenate([wb, rng.uniform(0.0, 60.0, (200, 2))])
    r = register_clouds(wa, wb)
    assert r is not None
    t, omega, c, n, rms, spread2 = r
    assert np.linalg.norm(t + omega * np.stack([-(c0 - c)[1], (c0 - c)[0]])
                          - t_true) < 0.05
    assert abs(omega - omega_true) < 5e-4
    assert n >= 300
    assert rms < 0.15


def test_register_clouds_returns_none_without_overlap():
    rng = np.random.default_rng(1)
    wa = rng.uniform(0.0, 20.0, (100, 2))
    wb = rng.uniform(200.0, 220.0, (100, 2))
    assert register_clouds(wa, wb) is None


def test_consensus_align_shrinks_drift():
    n = 20_000
    noisy, obs, gt, _field = survey_world_chunked(n, k=64, sigma_xy=0.05,
                                                  seed=1)
    raw = np.linalg.norm(noisy[:, :2] - gt[:, :2], axis=1).mean()
    corr, info = consensus_align(noisy, obs, sigma_xy=0.05,
                                 sigma_theta=0.001)
    aligned = np.linalg.norm(corr[:, :2] - gt[:, :2], axis=1).mean()
    assert info["n_registered_pairs"] > 10
    assert aligned < 0.5 * raw, f"{raw:.3f} -> {aligned:.3f}"
    th = np.abs(((corr[:, 2] - gt[:, 2] + np.pi) % (2 * np.pi)) - np.pi)
    th_raw = np.abs(((noisy[:, 2] - gt[:, 2] + np.pi) % (2 * np.pi)) - np.pi)
    assert th.mean() < 0.5 * th_raw.mean()


def test_multi_session_consensus_merges_cross_session_landmarks():
    """Two independent passes over one landmark strip, each with its own
    drift plus a residual inter-session misalignment: the boundary-aware
    consensus (random-walk prior cut at the boundary, cross-session pair
    prior for the spanning registrations) must recover the relative drift
    so a tight gate merges the cross-session landmark pairs the drifted
    poses split."""
    rng = np.random.default_rng(2)
    n_side = 60
    spacing = 3.0
    gxy = np.stack(np.meshgrid(np.arange(n_side), np.arange(12),
                               indexing="ij"), axis=-1).reshape(-1, 2)
    lms = (gxy * spacing + spacing / 2
           + rng.uniform(-spacing / 4, spacing / 4, (len(gxy), 2)))
    n = len(lms)

    k_per = 20
    kx = np.linspace(5.0, n_side * spacing - 5.0, k_per)
    gt_one = np.stack([kx, np.full(k_per, 18.0), np.zeros(k_per)], -1)

    def drifted(seed, offset):
        r = np.random.default_rng(seed)
        walk = np.stack([r.normal(0, 0.12, k_per), r.normal(0, 0.12, k_per),
                         r.normal(0, 0.004, k_per)], -1).cumsum(axis=0)
        out = gt_one + walk
        out[:, :2] += offset
        return out

    kf_a = drifted(5, (0.0, 0.0))
    kf_b = drifted(9, (0.25, -0.2))
    kf = np.concatenate([kf_a, kf_b])

    def observe(noisy_kf, base):
        # each landmark observed once per session from its nearest keyframe
        nearest = np.argmin(
            np.abs(lms[:, 0:1] - gt_one[None, :, 0].reshape(1, -1)), axis=1)
        obs = [[] for _ in range(k_per)]
        for j, i in enumerate(nearest):
            d = lms[j] - gt_one[i, :2]
            r_ = np.hypot(d[0], d[1]) + rng.normal(0, 0.01)
            b_ = np.arctan2(d[1], d[0]) - gt_one[i, 2] + rng.normal(0, 1e-3)
            obs[i].append([r_, b_])
        return [np.asarray(o, np.float64).reshape(-1, 2) for o in obs]

    ms = observe(kf_a, 0) + observe(kf_b, k_per)

    from fastslam_tpu.backend.alignment import consensus_align

    corr, info = consensus_align(
        kf, ms, sigma_xy=0.12, sigma_theta=0.004,
        session_boundaries=(k_per,),
    )
    assert info["n_registered_pairs"] > 5

    g_raw = build_pose_graph(
        kf, ms, session_boundaries=(k_per,), association_gate=0.5,
        max_landmarks=2048, max_factors=4096,
    )
    g_con = build_pose_graph(
        kf, ms, association_poses=corr, session_boundaries=(k_per,),
        association_gate=0.5, max_landmarks=2048, max_factors=4096,
    )
    n_raw = int(np.asarray(g_raw.lm_valid).sum())
    n_con = int(np.asarray(g_con.lm_valid).sum())
    # drifted association splits a chunk of the cross-session pairs; the
    # consensus-aligned association merges ~all of them
    assert n_con <= 1.02 * n, (n_con, n)
    assert n_con < n_raw, (n_con, n_raw)


def test_association_at_aligned_poses_merges_everything():
    n = 20_000
    noisy, obs, gt, _field = survey_world_chunked(n, k=64, sigma_xy=0.05,
                                                  seed=1)
    corr, _info = consensus_align(noisy, obs, sigma_xy=0.05,
                                  sigma_theta=0.001)
    g = build_pose_graph(
        noisy, obs, association_poses=corr, association_gate=0.5,
        max_landmarks=1 << 15, max_factors=1 << 17,
    )
    n_lm = int(np.asarray(g.lm_valid).sum())
    # every true landmark observed twice; count == n means every pair merged
    # and no distinct landmarks collapsed
    assert abs(n_lm - n) <= 0.01 * n, n_lm
    # graph poses and landmark inits stay in the honest DRIFTED frame
    assert np.allclose(np.asarray(g.poses), noisy.astype(np.float32))
