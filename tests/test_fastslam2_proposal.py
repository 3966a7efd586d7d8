"""FastSLAM 2.0 measurement-informed proposal (production mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastslam_tpu.config import FastSLAMConfig
from fastslam_tpu.core import kernels
from fastslam_tpu.core.state import init_state, pad_measurements


def seeded_state(cfg, true_pose=(1.0, 0.5, 0.3), landmarks=((4.0, 2.0), (-1.0, 3.0))):
    """All particles at true_pose with known landmarks in their maps."""
    st = init_state(cfg, rng=0)
    p = cfg.num_particles
    poses = np.tile(np.asarray(true_pose, np.float32), (p, 1))
    mean = np.zeros((p, cfg.max_landmarks, 2), np.float32)
    cov = np.zeros((p, cfg.max_landmarks, 4), np.float32)
    for j, lm in enumerate(landmarks):
        mean[:, j] = lm
        cov[:, j] = (2e-4, 0, 0, 2e-4)  # well-localized landmarks
    count = np.full(p, len(landmarks), np.int32)
    return st._replace(
        poses=jnp.asarray(poses), lm_mean=jnp.asarray(mean),
        lm_cov=jnp.asarray(cov), lm_count=jnp.asarray(count),
    )


def measurements_from(pose, landmarks, cfg):
    x, y, yaw = pose
    ms = []
    for lx, ly in landmarks:
        dx, dy = lx - x, ly - y
        r = np.hypot(dx, dy)
        b = (np.arctan2(dy, dx) - yaw + np.pi) % (2 * np.pi) - np.pi
        ms.append((r, b))
    return pad_measurements(cfg, np.asarray(ms))


def test_proposal_concentrates_particles():
    """With informative measurements the proposal's pose spread must be far
    tighter than the motion model's, and centred near the true pose."""
    cfg = FastSLAMConfig(
        num_particles=256, max_landmarks=4, max_measurements=4,
        parity_mode=False, proposal_mode="fastslam2",
        translation_noise=0.05,  # deliberately sloppy odometry
    )
    landmarks = ((4.0, 2.0), (-1.0, 3.0))
    true_prev = (1.0, 0.5, 0.0)
    st = seeded_state(cfg, true_prev, landmarks)
    # robot actually moved 0.30 m; odometry claims 0.25 m
    true_pose = (1.30, 0.5, 0.0)
    ms = measurements_from(true_pose, landmarks, cfg)

    noise = jax.random.normal(jax.random.key(1), (cfg.num_particles, 3))
    new_state, pose_pred = kernels.fastslam2_propose(
        st, jnp.float32(0.0), jnp.float32(0.25), ms, noise, cfg
    )
    sampled = np.asarray(new_state.poses)
    err = np.linalg.norm(sampled[:, :2] - np.asarray(true_pose[:2]), axis=1)

    # motion-only baseline for comparison
    rot_noise = np.zeros(cfg.num_particles, np.float32)
    trans_noise = 0.05 * np.asarray(
        jax.random.normal(jax.random.key(2), (cfg.num_particles,))
    )
    motion_poses = np.asarray(kernels.propagate_particles(
        st.poses, jnp.float32(0.0), jnp.float32(0.25),
        jnp.asarray(rot_noise), jnp.asarray(trans_noise),
    ))
    err_motion = np.linalg.norm(motion_poses[:, :2] - np.asarray(true_pose[:2]), axis=1)

    assert err.mean() < 0.5 * err_motion.mean(), (
        f"proposal err {err.mean():.4f} vs motion err {err_motion.mean():.4f}"
    )
    assert err.mean() < 0.05


def test_proposal_without_matches_falls_back_to_motion_prior():
    """No associated landmarks -> the proposal is just the motion prior."""
    cfg = FastSLAMConfig(
        num_particles=64, max_landmarks=4, max_measurements=4,
        parity_mode=False, proposal_mode="fastslam2",
    )
    st = seeded_state(cfg, landmarks=())  # empty maps
    ms = pad_measurements(cfg, np.zeros((0, 2)))
    noise = jax.random.normal(jax.random.key(3), (cfg.num_particles, 3))
    new_state, pose_pred = kernels.fastslam2_propose(
        st, jnp.float32(0.0), jnp.float32(0.3), ms, noise, cfg
    )
    # weights unchanged, poses near the predicted mean with motion spread
    np.testing.assert_allclose(
        np.asarray(new_state.log_weights), np.asarray(st.log_weights)
    )
    d = np.asarray(new_state.poses[:, 0]) - np.asarray(pose_pred[:, 0])
    assert 0.001 < d.std() < 0.02  # ~ translation_noise + floor


def test_full_step_fastslam2_runs_and_is_finite():
    cfg = FastSLAMConfig(
        num_particles=64, max_landmarks=16, max_measurements=4,
        parity_mode=False, proposal_mode="fastslam2",
    )
    st = init_state(cfg, rng=4)
    ms = pad_measurements(cfg, [(2.0, 0.3), (3.5, -0.7)])
    step = jax.jit(lambda s, r, t, m: kernels.fastslam_step(s, r, t, m, cfg))
    for _ in range(6):
        st, pose = step(st, jnp.float32(0.0), jnp.float32(0.4), ms)
    assert np.isfinite(np.asarray(pose)).all()
    assert np.isfinite(np.asarray(st.log_weights)).all()
    assert int(st.lm_count.max()) >= 1


@pytest.mark.slow
def test_fastslam2_tracks_with_tiny_particle_count_and_noisy_odometry():
    """End-to-end stability: at 4 particles with real zero-mean wheel-slip
    noise the FastSLAM 2.0 proposal must keep tracking (the decisive
    mechanism check — 2x tighter posterior sampling — is the unit test
    above; measured e2e means on this regime were fs2 0.138 vs motion
    0.151, a modest edge that is too seed-noisy to assert per-run)."""
    from fastslam_tpu.app.runner import run_driver
    from fastslam_tpu.drivers.replay import ReplayDriver, record_log
    from fastslam_tpu.drivers.sim_world import SimWorld
    from fastslam_tpu.eval.metrics import ate_rmse

    log = record_log(SimWorld(seed=21), num_ticks=220)

    def run(mode, seed):
        cfg = FastSLAMConfig(
            num_particles=4, max_landmarks=24, warmup_iterations=40,
            parity_mode=False, proposal_mode=mode,
            translation_noise=0.02,
        )
        hist = run_driver(
            ReplayDriver(log), cfg, rng=seed,
            odometry_noise=(0.02, 0.02), odometry_noise_seed=seed + 100,
        )
        est = np.asarray(hist.est_poses)
        gt = np.asarray(hist.gt_poses)
        return ate_rmse(gt[40:, :2], est[40:, :2])

    ates_fs2 = [run("fastslam2", s) for s in range(3)]
    assert np.mean(ates_fs2) < 0.25, f"fs2 diverged: {ates_fs2}"


@pytest.mark.slow
def test_adaptive_floors_track_the_real_odometry_error():
    """The floors must TUNE THEMSELVES to the regime: with clean odometry the
    ICP-vs-command residual is tiny and the floors anneal tight (well below
    the 0.01 default); under wheel slip the residual reflects the slip and
    the floors open toward its scale.  (With fixed floors either regime needs
    hand-tuning — config.py's 'TUNE TO THE REAL ODOMETRY ERROR' note.)"""
    from fastslam_tpu.app.runner import run_driver
    from fastslam_tpu.drivers.replay import ReplayDriver, record_log
    from fastslam_tpu.drivers.sim_world import SimWorld
    from fastslam_tpu.eval.metrics import ate_rmse

    log = record_log(SimWorld(seed=21), num_ticks=200)
    cfg = FastSLAMConfig(
        num_particles=32, max_landmarks=24, warmup_iterations=40,
        parity_mode=False, proposal_mode="fastslam2",
        use_icp_proposal=True, icp_blend=0.5,
        adaptive_proposal_floors=True,
    )

    clean = run_driver(ReplayDriver(log), cfg, rng=0)
    slip = run_driver(ReplayDriver(log), cfg, rng=0,
                      odometry_noise=(0.02, 0.02), odometry_noise_seed=7)

    fxy_clean, fth_clean = clean.final_floors
    fxy_slip, fth_slip = slip.final_floors
    # clean: annealed below the hand-tuned default
    assert fxy_clean < 0.01, fxy_clean
    # slip: opened up to the slip scale (0.02/tick), well above clean
    assert fxy_slip > 3 * fxy_clean, (fxy_clean, fxy_slip)
    assert fth_slip > fth_clean, (fth_clean, fth_slip)
    assert fxy_slip > 0.008, fxy_slip

    # both regimes keep tracking without per-regime hand-tuning
    for h in (clean, slip):
        est, gt = np.asarray(h.est_poses), np.asarray(h.gt_poses)
        assert ate_rmse(gt[40:, :2], est[40:, :2]) < 0.25


def test_adaptive_floors_require_icp_and_fs2():
    from fastslam_tpu.app.runner import SLAMRunner

    cfg = FastSLAMConfig(
        num_particles=8, parity_mode=False, adaptive_proposal_floors=True
    )
    with pytest.raises(ValueError, match="adaptive_proposal_floors"):
        SLAMRunner(cfg)
