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
