"""Unit tests for the online odometry-error estimator
(fastslam_tpu/proposal/adaptive.py) on synthetic residual streams.

The estimator's contract (see the module docstring): clean odometry ->
floors anneal to the minimum and the blend stays 0; sustained slip ->
the translation blend engages (ICP replaces the slipped commands) with
floors tracking the BLENDED odometry's error, and the rotation floor
opens to the slip scale (rotation is never blended); one heavy-tailed
match failure must not whip an annealed floor open.
"""

import numpy as np
import pytest

from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.proposal import adaptive


def make_config(**kw):
    return FastSLAMConfig(
        num_particles=8, max_landmarks=8, parity_mode=False,
        proposal_mode="fastslam2", use_icp_proposal=True,
        adaptive_proposal_floors=True, **kw,
    )


def synth(t_total=300, icp_sigma_th=0.002, icp_sigma_xy=0.001,
          slip_th=0.0, slip_xy=0.0, seed=0, rot_window=(87, 120)):
    """Synthetic residual streams mirroring the standard drive's structure:
    one clustered turn, translation elsewhere.  Returns the floor_schedule
    inputs."""
    rng = np.random.default_rng(seed)
    v_active = np.ones(t_total, bool)
    v_active[rot_window[0]:rot_window[1]] = False

    # ICP-vs-command residual = slip (active component only) + match noise
    sr_th = rng.normal(0.0, icp_sigma_th, t_total).astype(np.float32)
    sr_al = rng.normal(0.0, icp_sigma_xy, t_total).astype(np.float32)
    lat = rng.normal(0.0, icp_sigma_xy, t_total).astype(np.float32)
    sr_th[~v_active] += rng.normal(0.0, slip_th, (~v_active).sum())
    sr_al[v_active] += rng.normal(0.0, slip_xy, v_active.sum())
    sr_th[0] = sr_al[0] = lat[0] = 0.0

    # consistency discrepancy: 3 independent matches -> var 3 sigma^2
    d_ang = rng.normal(0.0, np.sqrt(3) * icp_sigma_th, t_total - 2)
    d_t2 = (rng.normal(0.0, icp_sigma_xy, (t_total - 2, 2)) * np.sqrt(3)
            ) ** 2
    d_t2 = d_t2.sum(-1)
    return sr_th, sr_al, lat, d_ang.astype(np.float32), \
        d_t2.astype(np.float32), v_active


def test_clean_floors_anneal_to_min_and_blend_stays_zero():
    cfg = make_config()
    s = adaptive.floor_schedule(*synth(), cfg)
    # after the windows converge, both floors sit at the minimum
    assert s.floors_xy[60:80].max() < 3 * cfg.proposal_floor_min
    # theta floor bounded by the matcher noise itself (estimator jitter
    # keeps sqrt(m - q) within ~sigma_icp of zero)
    assert s.floors_th[200:].max() < 0.002
    assert s.blend_xy.max() == 0.0
    assert s.blend_th.max() == 0.0


def test_translation_slip_engages_blend_and_floors_stay_tight():
    cfg = make_config()
    s = adaptive.floor_schedule(*synth(slip_xy=0.02), cfg)
    # blend ~ MMSE ~ slip^2/(slip^2+q) ~ 1 once learned
    assert s.blend_xy[50:87].min() > 0.8
    # floors track the BLENDED odometry error: collapsed far below slip
    assert s.floors_xy[50:87].max() < 0.01
    # rotation side unaffected
    assert s.blend_th.max() == 0.0


def test_rotation_slip_engages_gated_blend():
    # round-5 contract revision: rotation blending is GATED, not banned —
    # sustained rotation slip (here 0.02/tick, well above the
    # blend_min_sigma_theta gate) engages the MMSE blend with the
    # debiased match, and the floor then tracks the BLENDED odometry's
    # (much smaller) error.  Below the gate (clean logs, the two tests
    # above) blend_th stays exactly 0 — the round-3 bias rationale.
    cfg = make_config()
    s = adaptive.floor_schedule(*synth(slip_th=0.02), cfg)
    rot = slice(100, 120)  # second half of the turn: windows have samples
    assert s.blend_th[rot].min() > 0.8      # blend engaged (MMSE ~ 1)
    # floor tracks the blended odometry: well below the raw slip scale
    assert s.floors_th[rot].max() < 0.015
    # translation ticks unaffected (slip hits the active component only)
    assert s.blend_th[200:].max() == 0.0
    assert s.floors_th[200:].max() < 0.002


def test_unseen_tick_type_enters_at_the_config_prior():
    cfg = make_config()
    s = adaptive.floor_schedule(*synth(), cfg)
    # the first rotation tick (t=87) has ~no rotation-type samples: the
    # floor must reflect the estimator's config prior
    # (floor_prior_sigma_theta), not the translation ticks' annealed
    # (tiny) moments — a turn can bring an unseen slip regime
    assert s.floors_th[87] > 0.5 * cfg.floor_prior_sigma_theta


def test_single_outlier_cannot_whip_an_annealed_floor():
    sr_th, sr_al, lat, d_ang, d_t2, v_active = synth()
    sr_al[150] = 0.25  # one catastrophic match failure
    cfg = make_config()
    s = adaptive.floor_schedule(sr_th, sr_al, lat, d_ang, d_t2,
                                v_active, cfg)
    # median windows: the outlier's effect stays within noise of the min
    assert s.floors_xy[150:170].max() < 5 * cfg.proposal_floor_min


def test_se2_residuals_zero_for_exact_match():
    t = 10
    rots = np.zeros(t, np.float32)
    trans = np.full(t, 0.1, np.float32)
    # match estimates exactly the command SE(2): ang=-rot, t=(-tr, 0)
    angs = -rots[1:]
    tvecs = np.stack([-trans[1:], np.zeros(t - 1, np.float32)], -1)
    sr_th, sr_al, lat = adaptive.se2_residuals(angs, tvecs, rots, trans)
    np.testing.assert_allclose(sr_th, 0.0, atol=1e-7)
    np.testing.assert_allclose(sr_al, 0.0, atol=1e-7)
    np.testing.assert_allclose(lat, 0.0, atol=1e-7)


def test_consistency_zero_for_exact_composition():
    rng = np.random.default_rng(1)
    t = 12
    angs = rng.normal(0, 0.05, t - 1).astype(np.float32)
    tvecs = rng.normal(0, 0.1, (t - 1, 2)).astype(np.float32)
    # direct two-step = exact composition of the single steps
    a1, t1 = angs[:-1], tvecs[:-1]
    a2, t2 = angs[1:], tvecs[1:]
    c2, s2 = np.cos(a2), np.sin(a2)
    dir_ang = a1 + a2
    dir_t = np.stack([c2 * t1[:, 0] - s2 * t1[:, 1],
                      s2 * t1[:, 0] + c2 * t1[:, 1]], -1) + t2
    d_ang, d_t2 = adaptive.consistency_discrepancy(angs, tvecs,
                                                   dir_ang, dir_t)
    np.testing.assert_allclose(d_ang, 0.0, atol=1e-6)
    np.testing.assert_allclose(d_t2, 0.0, atol=1e-10)
